"""Hypertable rollup — hierarchical multi-granularity time-bucket
aggregates (the TimescaleDB continuous-aggregate pattern; a brief-named
net-new operator, no reference counterpart).

The raw table is scanned ONCE, for the finest granularity; every
coarser level aggregates the next finer level's PARTIALS (count, sum,
min, max all compose; avg derives as sum/count).  At 100 TB that is
the difference between one raw scan + tiny rollup-of-rollup jobs and
one full scan per granularity.  Each level is a plain hash aggregate
with map-side partials; bucket keys are integers, AQE handles skewed
buckets like any other group-by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hypertable_rollup", "value_histogram", "grouped_quantiles", "pareto_frontier", "pareto_frontier_global", "winsorize"]


def hypertable_rollup(
    events: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    granularities: list[int],
) -> DataFrame:
    """Rollup ``value_col`` per key and time bucket at every
    granularity (ts units; must be sorted ascending with each
    granularity a multiple of the previous, so partials nest).

    Output: ``(granularity, bucket, <keys...>, n, sum_value,
    min_value, max_value)`` — one row per (granularity, bucket, keys);
    ``bucket`` is the bucket's start in ts units.
    """
    if not granularities:
        raise ValueError("need at least one granularity")
    for prev, nxt in zip(granularities, granularities[1:]):
        if nxt % prev != 0 or nxt <= prev:
            raise ValueError(
                f"granularities must be ascending and nested; {nxt} is not a "
                f"proper multiple of {prev}"
            )

    g0 = granularities[0]
    level = events.groupBy(
        (F.floor(F.col(ts_col) / g0) * g0).alias("bucket"), *key_cols
    ).agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    out = level.select(F.lit(g0).alias("granularity"), "*")
    for g in granularities[1:]:
        # rollup-of-rollup: aggregate the finer level's partials
        level = level.groupBy(
            (F.floor(F.col("bucket") / g) * g).alias("bucket"), *key_cols
        ).agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        out = out.unionByName(level.select(F.lit(g).alias("granularity"), "*"))
    return out


def value_histogram(
    df: DataFrame,
    col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column — the distribution
    profile a curation pipeline reads before picking filter thresholds
    (doc lengths, quality scores, event values).

    Output: ``(bucket, lo_edge, hi_edge, cnt)`` for non-empty buckets;
    ``bucket = clamp(floor((x−lo)·bins/(hi−lo)), 0, bins−1)`` (edge
    values clamp into the boundary buckets; NULLs excluded).  With
    ``lo``/``hi`` unset they come from one min/max aggregate — a
    bounded two-row driver boundary, deterministic.  Degenerate ranges
    (``hi == lo``) collapse to bucket 0.

    Unlike ``width_bucket`` (which DuckDB lacks) the explicit
    float arithmetic is reproducible on any engine, so the histogram —
    bucket ids, edges, and counts — carries an exact SQL oracle.

    Plan: one map-side-partial aggregate on the bucket id (≤ ``bins``
    groups); a 100 TB column profiles in one pass.
    """
    c = F.col(col).cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).collect()[0]
        if row["lo"] is None:  # empty (or all-NULL) input: empty histogram
            return df.select(
                F.lit(0).alias("bucket"),
                F.lit(0.0).alias("lo_edge"),
                F.lit(0.0).alias("hi_edge"),
                F.lit(0).cast("long").alias("cnt"),
            ).where(F.lit(False))
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if hi == lo:
        bucket = F.lit(0)
    else:
        bucket = F.greatest(
            F.lit(0),
            F.least(
                F.lit(bins - 1),
                F.floor((c - F.lit(lo)) * F.lit(bins) / (F.lit(hi) - F.lit(lo))).cast(
                    "int"
                ),
            ),
        )
    width = (F.lit(hi) - F.lit(lo)) / F.lit(bins)
    return (
        df.where(c.isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * width, 6).alias("lo_edge"),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * width, 6).alias("hi_edge"),
            "cnt",
        )
    )


def grouped_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles of a numeric column — the other half of the
    distribution profile (:func:`value_histogram` shows shape; this
    pins the cut points a curation pipeline thresholds on: doc-length
    p95, quality-score median, event-value p99).

    Output: ``(<group_cols...>, n, p25, p50, ...)`` — one column per
    requested quantile, named ``p{100q}``, linear-interpolation
    PERCENTILE_CONT semantics (identical in Spark's ``percentile`` and
    DuckDB's ``quantile_cont`` — exact-oracle checkable).

    ``approx=False`` (default) is Spark's exact ``percentile``: it
    buffers each group's values in the aggregation buffer, which is
    right for profiling bounded-cardinality groups (sources, langs,
    shards — the sort is per-group, not global).  At 100 TB with huge
    groups, pass ``approx=True`` for ``percentile_approx`` — a
    bounded-memory mergeable quantile sketch (map-side partials
    compose, memory O(accuracy) per group regardless of group size),
    at the cost of approximation → rows-only checkable.
    """
    c = F.col(value_col).cast("double")
    aggs = [F.count(c).cast("bigint").alias("n")]
    for q in quantiles:
        name = f"p{q * 100:g}".replace(".", "_")
        if approx:
            expr = F.percentile_approx(c, F.lit(float(q)), F.lit(accuracy)).cast(
                "double"
            )
        else:
            expr = F.percentile(c, F.lit(float(q)))
        aggs.append(F.round(expr, 6).alias(name))
    return df.groupBy(*group_cols).agg(*aggs)


def pareto_frontier(
    df: DataFrame,
    group_col: str,
    max_col: str,
    min_col: str,
    tie_col: str,
) -> DataFrame:
    """Per-group skyline (Börzsönyi et al.'s Pareto frontier operator):
    the rows not dominated by any other row of the group, maximizing
    ``max_col`` while minimizing ``min_col``.

    One sort per group: ordered by (max desc, min asc, tie asc), a row
    survives iff the running minimum of ``min_col`` over all PRECEDING
    rows (which all have max ≥ its own) is strictly greater than its
    own — the textbook sort-filter skyline.  Duplicate (max, min)
    points keep the smallest ``tie`` (first-wins dedup, deterministic).

    Scale: the window partitions by ``group_col`` — groups compute in
    parallel, no global sort.  For a GLOBAL skyline at 100 TB, run
    this once per partition on a salted group key (local skylines),
    then once on the union of survivors (the standard two-phase
    distributed skyline: local pruning is sound because dominance is
    transitive and partition-local dominance implies global).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(max_col).desc(), F.col(min_col).asc(), F.col(tie_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_min = F.min(min_col).over(w)
    return (
        df.withColumn("_pm", prev_min)
        .where(F.col("_pm").isNull() | (F.col("_pm") > F.col(min_col)))
        .drop("_pm")
    )


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col_int: str,
    lo_num: int = 1,
    hi_num: int = 15,
    denom: int = 16,
) -> DataFrame:
    """Per-group winsorization (tail clipping): values below the group's
    ``lo_num/denom`` quantile or above ``hi_num/denom`` are clipped to
    those fences — the standard outlier-robust preprocessing for
    value/score columns before training-mix statistics.

    Quantiles are DELIBERATELY dyadic (default 1/16, 15/16): with an
    integer-snapped ``value_col_int`` and a power-of-two denominator,
    PERCENTILE_CONT's interpolation ``a + g·(b−a)`` is EXACT in double
    on any IEEE engine (g and the products are dyadic with ≤53-bit
    mantissas) — engine-reproducible fences with no rounding lane.

    Scale: one tiny per-group exact-percentile aggregate broadcast
    back + a codegen least/greatest projection; the percentile buffers
    each GROUP's values (bounded-cardinality groups — for huge groups
    switch the fence computation to ``percentile_approx``, rows-only).
    """
    if denom & (denom - 1):
        raise ValueError(f"winsorize: denom must be a power of two, got {denom}")
    x = F.col(value_col_int)
    fences = df.groupBy(*group_cols).agg(
        F.percentile(x, F.lit(lo_num / denom)).alias("_lo"),
        F.percentile(x, F.lit(hi_num / denom)).alias("_hi"),
    )
    return (
        df.join(F.broadcast(fences), group_cols)
        .withColumn(
            "clipped",
            F.least(F.greatest(x.cast("double"), F.col("_lo")), F.col("_hi")),
        )
        .drop("_lo", "_hi")
    )


def pareto_frontier_global(
    df: DataFrame,
    max_col: str,
    min_col: str,
    tie_col: str,
    n_salts: int = 32,
) -> DataFrame:
    """GLOBAL skyline via the two-phase distributed algorithm: a local
    skyline per hash-salt partition (parallel, prunes the bulk —
    dominance is transitive, so any globally-dominated row is also
    dominated within its salt OR by a surviving local-frontier row),
    then one skyline over the union of survivors.

    For n uniform 2-D points the expected frontier is O(log n), so
    survivors ≈ n_salts·log(n/n_salts) and the second pass is a
    near-trivial single sort; the worst case (all points on the
    frontier — perfectly anti-correlated dimensions) degenerates to a
    global sort, which is the information-theoretic floor for any
    exact skyline.  Duplicate (max, min) points resolve to the
    smallest ``tie`` globally (each local pass keeps its local min,
    the global pass keeps the min of those).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(tie_col)), F.lit(n_salts))
    )
    local = pareto_frontier(salted, "_salt", max_col, min_col, tie_col)
    glob = pareto_frontier(
        local.withColumn("_g", F.lit(0)), "_g", max_col, min_col, tie_col
    )
    return glob.drop("_salt", "_g")
