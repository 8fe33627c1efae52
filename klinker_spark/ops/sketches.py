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

__all__ = [
    "kmv_distinct",
    "kmv_set_ops",
    "hll_distinct",
    "hll_registers",
    "hll_estimate",
    "hll_distinct_by",
    "cm_build",
    "cm_estimate",
    "cm_heavy_hitters",
    "cm_join_size",
]

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


#: HLL bias-correction constant for m = 256 registers (Flajolet et al.
#: 2007, §4): alpha_m = 0.7213 / (1 + 1.079/m).  Computed once in
#: Python so the Spark plan and the SQL oracle embed the IDENTICAL
#: double literal.
_HLL_M = 256
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-count sketch (Flajolet,
    Fusy, Gandouet, Meunier 2007) with ``m = 256`` registers — the
    md5-twin of ``approx_count_distinct`` the same way
    :func:`kmv_distinct` twins it: every engine reproduces the exact
    same registers and estimate, so an APPROXIMATE operator carries an
    EXACT SQL oracle.

    Hash split: md5 hex chars 1-2 (8 bits) pick the register, chars
    3-17 give a 60-bit value whose leading-zero rank
    ``ρ = 61 - bitlength`` (``61`` for the all-zero value) updates the
    register via ``max``.  The indicator ``Z = Σ 2^(-M_j)`` sums exact
    dyadic rationals in REGISTER ORDER (a sequential fold over the
    sorted register array), so the double result is bit-identical on
    any IEEE engine regardless of shuffle order.  Small-range
    correction: ``raw ≤ 2.5m`` with empty registers switches to linear
    counting ``m·ln(m/V)``.

    Output (one row): ``(m, n_zero, registers array<int>,
    raw_estimate, estimate)`` — registers bucket-ordered, estimates
    rounded to 6 dp.

    Plan: one scan → 256-group max aggregate (map-side partials
    collapse each partition to ≤ m cells before the shuffle) → one-row
    fold.  The sketch is MERGEABLE (element-wise register max), the
    reason HLL is the industry standard for distinct counts over
    100 TB: re-aggregate register tables with ``max`` per bucket.
    Duplicates need no pre-``distinct`` — register max absorbs them.
    :func:`hll_registers` / :func:`hll_estimate` expose the mergeable
    split directly (per-shard or per-micro-batch register tables,
    unioned and max-merged, estimated once).
    """
    return hll_estimate(hll_registers(df, col))


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """The mergeable half of :func:`hll_distinct`: the dense
    ``(bucket, mj)`` register table (m rows, absent buckets at 0).
    Merge N sketches — shards, days, micro-batches — by unioning
    register tables and taking ``max(mj)`` per bucket, then
    :func:`hll_estimate` the merge.  This is the streaming /
    incremental distinct-count path: state is m rows per tracked
    scope, never the key space."""
    spark = df.sparkSession
    h = F.md5(F.col(col).cast("string"))
    v = F.conv(F.substring(h, 3, 15), 16, 10).cast("bigint")
    rho = F.when(v == 0, F.lit(61)).otherwise(
        F.lit(61) - F.length(F.conv(F.substring(h, 3, 15), 16, 2))
    )
    maxed = (
        df.where(F.col(col).isNotNull())
        .select(
            F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("mj"))
    )
    return (
        spark.range(_HLL_M)
        .select(F.col("id").alias("bucket"))
        .join(maxed, "bucket", "left")
        .select("bucket", F.coalesce("mj", F.lit(0)).cast("int").alias("mj"))
    )


def _hll_estimate_cols() -> list:
    """Estimate columns over a frame carrying a bucket-ordered
    ``registers`` array — shared by the global and per-group paths."""
    # dyadic 2^-mj via integer shift (the Python shiftleft wrapper only
    # takes a literal shift, so the fold is a SQL expression)
    z = F.expr(
        "aggregate(registers, cast(0.0 AS double),"
        " (acc, mj) -> acc + 1.0 / cast(shiftleft(cast(1 AS bigint), mj) AS double))"
    )
    raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / z
    n_zero = F.size(F.filter(F.col("registers"), lambda x: x == 0))
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (n_zero > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / n_zero.cast("double")),
    ).otherwise(raw)
    return [
        F.lit(_HLL_M).alias("m"),
        n_zero.alias("n_zero"),
        F.col("registers"),
        F.round(raw, 6).alias("raw_estimate"),
        F.round(est, 6).alias("estimate"),
    ]


def _hll_pack():
    """Bucket-ordered register-array aggregate.  A FUNCTION, not a
    module-level Column: building a Column requires an active
    SparkContext, and this module must import session-free."""
    return F.transform(
        F.sort_array(F.collect_list(F.struct("bucket", "mj"))), lambda s: s["mj"]
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Estimate from a ``(bucket, mj)`` register table (possibly a
    max-merge of many) — output contract as :func:`hll_distinct`."""
    # one row: registers sorted by bucket, then a sequential fold for Z
    return regs.agg(_hll_pack().alias("registers")).select(*_hll_estimate_cols())


def hll_distinct_by(df: DataFrame, col: str, by: list[str]) -> DataFrame:
    """Per-group HLL: one sketch (and estimate row) per distinct value
    of the ``by`` columns — distinct tokens per source, per language,
    per day.  The register aggregate groups on ``(by…, bucket)`` (≤
    m·|groups| cells after map-side partials); the dense per-group
    register table comes from a groups × ``range(m)`` cross join
    (|groups| is an aggregate output — small by construction).
    Output: ``by…`` + the :func:`hll_distinct` columns.
    """
    spark = df.sparkSession
    h = F.md5(F.col(col).cast("string"))
    v = F.conv(F.substring(h, 3, 15), 16, 10).cast("bigint")
    rho = F.when(v == 0, F.lit(61)).otherwise(
        F.lit(61) - F.length(F.conv(F.substring(h, 3, 15), 16, 2))
    )
    maxed = (
        df.where(F.col(col).isNotNull())
        .select(
            *by,
            F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*by, "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    groups = df.select(*by).distinct()
    dense = (
        groups.crossJoin(spark.range(_HLL_M).select(F.col("id").alias("bucket")))
        .join(maxed, [*by, "bucket"], "left")
        .select(*by, "bucket", F.coalesce("mj", F.lit(0)).cast("int").alias("mj"))
    )
    packed = dense.groupBy(*by).agg(_hll_pack().alias("registers"))
    return packed.select(*by, *_hll_estimate_cols())


def cm_build(
    df: DataFrame,
    key_col: str,
    width: int = 8192,
    depth: int = 4,
    hash_fn: str = "xxhash64",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the
    multiplicities of ``df[key_col]``: ``depth`` hash rows of
    ``width`` counters.

    Output: ``(row int, col int, cnt long)`` — only NONZERO cells, at
    most ``depth*width`` rows regardless of input size.  The companion
    of :func:`kmv_distinct` (distinct counts) and the Bloom gate
    (membership): approximate FREQUENCIES in bounded memory —
    heavy-hitter detection (hot tokens, boilerplate lines) over a
    100 TB corpus or an unbounded stream, where an exact groupBy's
    key space is itself corpus-sized.

    Plan: explode to ``depth`` scalar (row, col) cells per input row,
    one count aggregate — map-side partials collapse each partition to
    ≤ ``depth*width`` cells before the (tiny) shuffle.  Sketches are
    MERGEABLE by cell-wise addition: union two builds and re-aggregate
    with ``sum``.  ``hash_fn="md5"`` is the cross-engine-deterministic
    twin (exact SQL oracle); NULL keys are ignored.

    ``weight_col``: build from PRE-AGGREGATED ``(key, weight)`` rows —
    each cell sums weights instead of counting rows (count-then-sketch:
    when the caller already holds per-key counts, the ``depth`` hash
    evaluations run once per DISTINCT key instead of once per
    occurrence; identical cells, since Σ_occurrences 1 = Σ_keys count).
    """
    from .bloom import _positions

    key = F.col(key_col)
    cols = [
        F.posexplode(F.array(*_positions(key, depth, width, hash_fn))).alias("row", "col")
    ]
    if weight_col is not None:
        cols.append(F.col(weight_col).alias("_w"))
    pos = df.where(key.isNotNull()).select(*cols)
    agg = F.sum("_w") if weight_col is not None else F.count("*")
    return (
        pos.groupBy("row", "col")
        .agg(agg.cast("long").alias("cnt"))
        .select("row", F.col("col").cast("int"), "cnt")
    )


def cm_estimate(
    df: DataFrame,
    key_col: str,
    sketch: DataFrame,
    width: int = 8192,
    depth: int = 4,
    hash_fn: str = "xxhash64",
    out_col: str = "est_count",
) -> DataFrame:
    """Append ``out_col``: the Count-Min frequency estimate of
    ``df[key_col]`` — ``min`` over the ``depth`` counters the key
    hashes to.  Never underestimates; overestimates only on hash
    collisions (error ≤ ε·N with ε = e/width at the usual depth=ln 1/δ
    sizing).  NULL keys estimate NULL.

    The sketch is collected (bounded: ≤ ``depth*width`` cells) into a
    dense array delivered as a one-row broadcast join — per-row
    probing is then pure expressions; a literal would be re-inlined
    per probe by CollapseProject (the Bloom lesson).
    """
    from ..session import local_df
    from .bloom import _positions

    dense = [0] * (depth * width)
    for r in sketch.collect():  # bounded by construction
        dense[r["row"] * width + r["col"]] = r["cnt"]
    table = local_df(df.sparkSession, [(dense,)], "_cm array<bigint>")

    est = F.least(
        *[
            F.coalesce(
                F.element_at(F.col("_cm"), (F.lit(i * width) + p).cast("int") + 1),
                F.lit(0),
            )
            for i, p in enumerate(_positions(F.col(key_col), depth, width, hash_fn))
        ]
    )
    return (
        df.join(F.broadcast(table))
        .withColumn(out_col, F.when(F.col(key_col).isNotNull(), est))
        .drop("_cm")
    )


def cm_join_size(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    width: int = 1024,
    depth: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Estimate ``|left ⋈_key right|`` WITHOUT running the join — the
    Count-Min inner-product estimator (Cormode & Muthukrishnan 2005,
    §4.2: join size is the inner product of the two frequency vectors;
    per hash row ``Σ_col a·b`` never underestimates it, ``min`` over
    the ``depth`` rows tightens the bound).

    The planner diagnostic that pairs with
    :func:`~klinker_spark.ops.profile.key_skew_stats`: before
    launching a token-blocking or band-bucket join over 100 TB, two
    bounded sketch builds (≤ ``depth·width`` cells each, map-side
    partials) answer "how many pairs will this produce?" — the number
    that decides between the plain join, a ``max_bucket`` cap, or a
    redesign.  Sketches of STREAMS work identically (CM is mergeable),
    so the same estimate gates continuous ingestion.

    Output (one row): ``(depth, width, est_pairs)``.  Cell products
    are BIGINT — exact while per-cell counts stay < ~3·10⁹ (beyond
    that, widen the sketch: more cells ⇒ smaller per-cell counts).
    ``hash_fn="md5"`` is the deterministic oracle twin.
    """
    spark = left.sparkSession
    a = cm_build(left, left_key, width=width, depth=depth, hash_fn=hash_fn).withColumnRenamed(
        "cnt", "ca"
    )
    b = cm_build(right, right_key, width=width, depth=depth, hash_fn=hash_fn).withColumnRenamed(
        "cnt", "cb"
    )
    ip = (
        a.join(b, ["row", "col"])
        .groupBy("row")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    )
    rows = spark.range(depth).select(F.col("id").cast("int").alias("row"))
    return (
        rows.join(ip, "row", "left")
        .agg(F.min(F.coalesce("ip", F.lit(0))).alias("est_pairs"))
        .select(F.lit(depth).alias("depth"), F.lit(width).alias("width"), "est_pairs")
    )


def cm_heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
    width: int = 8192,
    depth: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """EXACT heavy hitters with sketch-bounded shuffle volume:
    ``(key, cnt)`` for every key occurring at least ``min_count``
    times.

    The naive plan groupBys the full key space — at 100 TB the
    vocabulary/shingle space is itself corpus-sized and the shuffle
    carries everything.  Here a Count-Min pass (bounded cells) probes
    every row map-side first; CM NEVER underestimates, so rows whose
    key estimate is below ``min_count`` are provably not heavy and
    drop before the shuffle — the exact groupBy then runs over only
    the surviving sliver (true heavies + hash-collision false
    positives, removed by the final exact filter).  Result is EXACT
    regardless of sketch sizing; sizing only tunes how much the
    shuffle shrinks.

    Two corpus scans (build + probe), both map-side; the only shuffle
    carries heavy-hitter-candidate rows.
    """
    keyed = df.where(F.col(key_col).isNotNull())
    sketch = cm_build(keyed, key_col, width=width, depth=depth, hash_fn=hash_fn)
    probed = cm_estimate(
        keyed, key_col, sketch, width=width, depth=depth, hash_fn=hash_fn
    )
    return (
        probed.where(F.col("est_count") >= min_count)
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )

def kmv_set_ops(a: DataFrame, b: DataFrame, col: str, k: int = 256) -> DataFrame:
    """KMV (theta-style) SET OPERATIONS from two mergeable sketches:
    estimate |A ∪ B|, Jaccard(A, B) and |A ∩ B| without ever comparing
    the sets — the sketch algebra that lets 100 TB corpora answer
    "how much do these two sources overlap" from k-row summaries.

    Union sketch = k smallest of the merged min-sets (the standard KMV
    merge); Jaccard = fraction of the union sketch present in BOTH
    input sketches (Beyer et al. 2007); intersection = jaccard ×
    union.  Deterministic md5 fractions ⇒ all three estimates are
    engine-exact (EXACT oracle for an approximate operator).

    Scale shape: each sketch is a TakeOrdered top-k (per-partition
    k-selection, k-row driver merge); everything after runs on ≤ 3k
    rows.  Output (one row): ``(k_used, union_estimate, n_shared,
    jaccard_micro, intersection_estimate)``.
    """
    def mins(df: DataFrame) -> DataFrame:
        frac = (
            F.conv(
                F.substring(F.md5(F.col(col).cast("string")), 1, _KMV_HEX_DIGITS),
                16,
                10,
            ).cast("double")
            / F.lit(_KMV_DENOM)
        )
        return (
            df.select(frac.alias("h"))
            .where(F.col("h").isNotNull())
            .distinct()
            .orderBy("h")
            .limit(k)
        )

    ma, mb = mins(a), mins(b)
    u = ma.unionAll(mb).distinct().orderBy("h").limit(k)
    tagged = u.join(
        ma.withColumn("_ina", F.lit(1)), "h", "left"
    ).join(mb.withColumn("_inb", F.lit(1)), "h", "left")
    est = F.when(
        F.count("*") >= k, (F.lit(k - 1)) / F.max("h")
    ).otherwise(F.count("*").cast("double"))
    shared = F.sum(
        F.when(F.col("_ina").isNotNull() & F.col("_inb").isNotNull(), 1).otherwise(0)
    )
    return tagged.agg(
        F.count("*").alias("k_used"),
        F.round(est, 6).alias("union_estimate"),
        shared.cast("bigint").alias("n_shared"),
        F.round(1000000.0 * shared / F.count("*"))
        .cast("bigint")
        .alias("jaccard_micro"),
        F.round((shared / F.count("*")) * est, 6).alias("intersection_estimate"),
    )
