"""Probabilistic record-linkage scoring — the Fellegi–Sunter model
(Fellegi & Sunter 1969), the decision layer the reference's blocking
pipeline feeds (blocking produces candidate pairs; FS scores them into
match / non-match).

For each candidate pair and each comparison feature i with match
probability m_i = P(agree | match) and u_i = P(agree | non-match), the
log-likelihood-ratio weight is ``ln(m_i/u_i)`` on agreement and
``ln((1-m_i)/(1-u_i))`` on disagreement; the pair's score is the sum.
The m/u parameters here are CALLER-SUPPLIED constants (production
systems fit them with EM; a fixed-parameter scorer keeps the operator
deterministic and value-checkable — EM would be a stochastic fit, the
same trade documented for DeepBlocker/KMeans).

Engine-exactness: the weights are precomputed in PYTHON as nano-unit
integer literals (libm-free — the rbo_overlap lesson), agreement
predicates are pure integer/string tests, so the score is an exact
bigint on any engine.

Scale: scoring is a pure projection over the candidate-pair frame —
no shuffle beyond what candidate generation already did; name lookups
join on the pair ids (broadcast when one side is dimension-sized).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fs_weights_nano", "fellegi_sunter_score"]


def fs_weights_nano(m: list[float], u: list[float]) -> list[tuple[int, int]]:
    """Per-feature (agreement, disagreement) log-likelihood weights as
    nano-unit integers: ``(round(1e9·ln(m/u)), round(1e9·ln((1-m)/(1-u))))``.
    Computed driver-side so no engine evaluates a logarithm."""
    if len(m) != len(u):
        raise ValueError("fs_weights_nano: m and u must align")
    out = []
    for mi, ui in zip(m, u):
        if not (0 < ui < mi < 1):
            raise ValueError(f"fs_weights_nano: need 0 < u < m < 1, got m={mi}, u={ui}")
        out.append(
            (
                round(1e9 * math.log(mi / ui)),
                round(1e9 * math.log((1 - mi) / (1 - ui))),
            )
        )
    return out


def fellegi_sunter_score(
    pairs: DataFrame,
    agreements: list[tuple[str, Column]],
    weights_nano: list[tuple[int, int]],
    threshold_nano: int = 0,
) -> DataFrame:
    """Score candidate pairs with fixed Fellegi–Sunter weights.

    ``agreements``: (name, boolean Column) per feature, evaluated
    against ``pairs``; ``weights_nano``: aligned (agree, disagree)
    nano weights from :func:`fs_weights_nano`.  Adds one 0/1 column
    per feature, ``score_nano`` (bigint), and ``is_match``
    (score ≥ ``threshold_nano`` — the upper-threshold decision; the
    classic three-way decision adds a lower threshold for clerical
    review, which callers express as a second filter).
    """
    if len(agreements) != len(weights_nano):
        raise ValueError("fellegi_sunter_score: agreements and weights must align")
    out = pairs
    score = F.lit(0).cast("bigint")
    for (name, pred), (wa, wd) in zip(agreements, weights_nano):
        out = out.withColumn(name, pred.cast("int"))
        score = score + F.when(F.col(name) == 1, F.lit(wa)).otherwise(F.lit(wd))
    return out.withColumn("score_nano", score.cast("bigint")).withColumn(
        "is_match", F.col("score_nano") >= F.lit(threshold_nano)
    )
