"""Distinct-count sketches (a brief-named net-new operator family).

:func:`kmv_distinct` — the K-Minimum-Values sketch: hash every element
into [0, 1), keep the k smallest distinct hashes; with the k-th
smallest at fraction ``t``, the distinct count estimates as
``(k - 1) / t`` (Bar-Yossef et al. 2002).  The sketch is MERGEABLE —
the k smallest of a union are among the union of each side's k
smallest — which is exactly how the physical plan computes it: Spark's
``orderBy().limit(k)`` is a TakeOrdered: per-partition top-k, then a
k-sized merge, never a full sort shuffle.

Unlike HyperLogLog (``approx_count_distinct``), the md5-based KMV is
fully DETERMINISTIC: any engine reproduces the exact same sketch and
estimate, so it carries an exact SQL oracle — an *approximate*
operator with an *exact* correctness check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmv_distinct"]

#: 15 hex digits = 60 bits; 16^15 = 2^60 exactly, so the fraction is a
#: dyadic rational any engine computes bit-identically in a double.
_KMV_HEX_DIGITS = 15
_KMV_DENOM = float(1 << 60)


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row estimate of ``count(distinct col)``.

    Output: ``(k_used, kth_fraction, estimate)``.  When there are
    fewer than ``k`` distinct values the sketch is exact
    (``estimate = n_distinct``, ``kth_fraction`` null).
    """
    frac = (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, _KMV_HEX_DIGITS), 16, 10)
        .cast("double")
        / F.lit(_KMV_DENOM)
    )
    # distinct VALUES (duplicates collapse before hashing); TakeOrdered
    # top-k — per-partition k-selection + k-sized driver merge
    mins = df.select(frac.alias("h")).where(F.col("h").isNotNull()).distinct().orderBy("h").limit(k)
    return mins.agg(
        F.count("*").alias("k_used"),
        F.when(F.count("*") >= k, F.max("h")).alias("kth_fraction"),
        F.round(
            F.when(F.count("*") >= k, (F.lit(k - 1)) / F.max("h")).otherwise(
                F.count("*").cast("double")
            ),
            6,
        ).alias("estimate"),
    )
