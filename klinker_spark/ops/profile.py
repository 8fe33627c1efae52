"""Data-distribution profiling — the pre-flight diagnostics a 100 TB
pipeline runs BEFORE choosing a physical strategy.

Every skew mitigation in this engine (minhash ``max_bucket``, SemDeDup
``max_cluster_size``, AQE skew-join, salting) presumes someone first
*measured* the key distribution.  :func:`key_skew_stats` is that
measurement as a first-class operator: one aggregate over the key
column yields the heavy keys, their corpus share, and the hot-partition
ratio that decides whether a plain shuffle join is safe.

Scale: one ``groupBy(key)`` with map-side partials (the only full
shuffle), then a TakeOrdered top-k and a one-row summary broadcast —
output is ``top_k`` rows no matter the input size.  Shares are
integer parts-per-million (``round(cnt * 1e6 / total)``) so the result
is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "key_skew_stats",
    "salted_join",
    "global_rank",
    "sorted_neighborhood_pairs",
    "zscore_outliers",
    "psi_drift",
]


def key_skew_stats(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """Heavy-key profile of ``df[key_col]``: the ``top_k`` most
    frequent keys with corpus shares plus whole-column skew summary.

    Output (``top_k`` rows, rank-ordered): ``(rank, key, cnt,
    share_ppm, cum_share_ppm, total_rows, n_keys, hot_ratio)`` where

    - ``share_ppm``   = ``round(cnt / total * 1e6)`` (bigint),
    - ``cum_share_ppm`` = running share over the rank order (sums the
      already-rounded per-key ppm — integer, order-fixed, exact),
    - ``hot_ratio``   = max key count / mean key count, rounded 6 dp —
      the factor by which the hottest shuffle partition exceeds the
      average one; the go/no-go number for an unsalted shuffle join.

    NULL keys are excluded (they hash to one partition too, but every
    join drops them).  Ties order by ``(cnt DESC, key)`` — total, so
    the profile is deterministic.  Top-k selection is
    ``orderBy().limit(k)`` — Spark's TakeOrdered: per-partition
    k-selection plus a k-sized merge, NEVER a single-task global rank
    window over the (corpus-sized) key table; the rank windows below
    run over the already-k-row result.  The summary is a one-row
    broadcast cross join: the whole profile is a single job.
    """
    counts = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count("*").alias("cnt"))
    )
    summary = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("_max_cnt"),
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    share = F.round(F.col("cnt") * 1e6 / F.col("total_rows")).cast("bigint")
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(summary))
        .withColumn("share_ppm", share)
    )
    cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return top.select(
        "rank",
        "key",
        "cnt",
        "share_ppm",
        F.sum("share_ppm").over(cum).alias("cum_share_ppm"),
        "total_rows",
        "n_keys",
        F.round(
            F.col("_max_cnt") * F.col("n_keys") / F.col("total_rows"), 6
        ).alias("hot_ratio"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = 8,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-defeating equi-join: identical SEMANTICS to
    ``left.join(right, on, how)``, different PHYSICS — the remedy
    :func:`key_skew_stats` prescribes when ``hot_ratio`` says a plain
    shuffle join would funnel one key's rows through one task.

    The fat (``left``) side gets a deterministic salt in ``[0,
    n_salt)`` hashed from ``salt_from`` (default: the whole left row —
    ``xxhash64`` of all columns), so a hot key's rows SPREAD over
    ``n_salt`` shuffle partitions; the slim (``right``) side is
    replicated once per salt value (an ``explode`` of a literal
    sequence — ``n_salt``× the slim side, not the fat side) and the
    join runs on ``(on, salt)``.  Deterministic salting (no ``rand()``)
    keeps the operator replayable under task retries and streaming
    re-execution — a correctness requirement, not a style choice.

    Supported ``how``: inner / left / left_outer (the replicated-right
    forms where unmatched-left semantics survive salting unchanged).
    Output columns match the plain join (salt is internal).

    Use when AQE's runtime skew split is unavailable (stream-stream,
    bucketed inputs it won't touch) or when the skew is KNOWN ahead —
    the planner pattern: ``key_skew_stats`` → ``hot_ratio`` ≥ tasks ⇒
    ``salted_join(n_salt ≈ hot_share · n_partitions)``.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    salt_src = (
        [F.col(salt_from)] if salt_from else [F.col(c) for c in left.columns]
    )
    lsalted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salt)).cast("int")
    )
    rsalted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out_cols = [on] + [c for c in left.columns if c != on] + [
        c for c in right.columns if c != on
    ]
    return lsalted.join(rsalted, [on, "_salt"], how).select(*out_cols)


def global_rank(
    df: DataFrame, order_cols: list[str], rank_col: str = "rank"
) -> DataFrame:
    """Dense 1-based GLOBAL rank over a TOTAL order — without the
    classic scale trap (`row_number() OVER (ORDER BY …)` moves the
    whole input through one task).  Recipe: range-repartition on the
    order columns (partition p's rows all sort before p+1's), rank
    WITHIN each partition (parallel windows keyed by partition id),
    then add per-partition offsets (a cumulative sum over ≤ P count
    rows, broadcast back).

    ``order_cols`` MUST be a total order (include a tie-breaking id):
    the range partitioner may split equal keys across adjacent
    partitions, which is only safe when no two rows compare equal.

    Cost: the range exchange (sampling pass + shuffle — what any
    global sort pays), one tiny count aggregate, one broadcast join.

    ``order_cols`` entries may be names or Column sort expressions
    (``F.col("x").desc()``) — repartitionByRange, sortWithinPartitions
    and the window all accept either.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    tmp = (
        df.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(*cols)
    tmp = tmp.withColumn("_lr", F.row_number().over(w_local))
    counts = tmp.groupBy("_pid").agg(F.count("*").alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        tmp.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lr")).cast("bigint"))
        .drop("_pid", "_lr", "_off")
    )


def ntile_global(
    df: DataFrame,
    order_cols: list,
    n_buckets: int,
    out_col: str,
    n_rows: int | None = None,
) -> DataFrame:
    """Distributed EXACT ``ntile(n_buckets) OVER (ORDER BY …)`` — the
    SQL-standard split (the first ``n % k`` buckets get ``ceil(n/k)``
    rows, the rest ``floor(n/k)``) computed from :func:`global_rank`
    instead of an unpartitioned window, so the frame never funnels
    through one task.  All arithmetic is integer (``div``), no float
    rounding at bucket edges.

    ``order_cols`` must be a total order (tie-breaking id included) and
    may contain ``.desc()`` sort expressions.  Cost: one range exchange
    per call, plus one scalar count broadcast — UNLESS the caller
    passes ``n_rows`` (one driver-side ``count()`` amortized across
    several ntile passes over the same frame), in which case the
    bucket split is a pure literal expression and the plan stays
    linear (no broadcast subtree re-executing the input per pass).
    """
    ranked = global_rank(df, order_cols, "_nt_r")
    k = int(n_buckets)
    if n_rows is not None:
        q, rem = divmod(int(n_rows), k)
        bucket = (
            f"CAST(CASE WHEN _nt_r <= {(q + 1) * rem} "
            f"THEN (_nt_r + {q}) div {q + 1} "
            f"ELSE {rem} + (_nt_r - {(q + 1) * rem} + {max(q, 1) - 1}) div {max(q, 1)} "
            f"END AS INT)"
        )
        return ranked.withColumn(out_col, F.expr(bucket)).drop("_nt_r")
    n = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("_nt_n"))
    expr = (
        f"CAST(CASE WHEN _nt_r <= ((_nt_n div {k}) + 1) * (_nt_n % {k}) "
        f"THEN (_nt_r + (_nt_n div {k})) div ((_nt_n div {k}) + 1) "
        f"ELSE (_nt_n % {k}) + (_nt_r - ((_nt_n div {k}) + 1) * (_nt_n % {k}) "
        f"+ (_nt_n div {k}) - 1) div (_nt_n div {k}) END AS INT)"
    )
    return (
        ranked.join(F.broadcast(n))
        .withColumn(out_col, F.expr(expr))
        .drop("_nt_r", "_nt_n")
    )


def sorted_neighborhood_pairs(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "text",
    id_col: str = "id",
    window: int = 5,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995): union
    both sides, order by the sorting key, and pair every CROSS-SIDE
    couple within a sliding window of ``window`` consecutive records —
    the classic ER method for typo-tolerant blocking (near-equal keys
    sort adjacently even when token blocking misses them).

    Output: ``(left_id, right_id, gap)`` with ``gap`` the rank
    distance (1 … window-1), deterministic under the total order
    ``(key, side, id)``.

    Scale shape: the global order comes from :func:`global_rank` (no
    single-task window); windowed pairing is a BAND equi-join — band
    ``(rank-1) DIV (window-1)``: any in-window pair sits in the same
    or adjacent bands, so two equi-joins (b=b, b=b+1) plus an exact
    distance filter replace a non-equi range join.  Output is ≤
    (window-1)·n pairs by construction — linear, never quadratic.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    u = left.select(
        F.lit("L").alias("side"), F.col(id_col).alias("id"), F.col(key_col).alias("k")
    ).unionByName(
        right.select(
            F.lit("R").alias("side"), F.col(id_col).alias("id"), F.col(key_col).alias("k")
        )
    )
    ranked = global_rank(u, ["k", "side", "id"]).select(
        "side", "id", "rank", ((F.col("rank") - 1) / (window - 1)).cast("bigint").alias("band")
    )
    a = ranked.select(
        F.col("side").alias("sa"), F.col("id").alias("ia"),
        F.col("rank").alias("ra"), F.col("band").alias("ba"),
    )
    b = ranked.select(
        F.col("side").alias("sb"), F.col("id").alias("ib"),
        F.col("rank").alias("rb"), F.col("band").alias("bb"),
    )
    cands = a.join(b, F.col("ba") == F.col("bb")).unionByName(
        a.join(b, F.col("ba") + 1 == F.col("bb"))
    )
    pairs = cands.where(
        (F.col("rb") > F.col("ra"))
        & (F.col("rb") - F.col("ra") <= window - 1)
        & (F.col("sa") != F.col("sb"))
    )
    return pairs.select(
        F.when(F.col("sa") == "L", F.col("ia")).otherwise(F.col("ib")).alias("left_id"),
        F.when(F.col("sa") == "L", F.col("ib")).otherwise(F.col("ia")).alias("right_id"),
        (F.col("rb") - F.col("ra")).cast("int").alias("gap"),
    )


def zscore_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group z-score outlier flagging with FULLY INTEGER
    arithmetic: a row is an outlier when ``(x·n − s)² > z²·(n·q − s²)``
    over integer-snapped values ``x = round(value·scale)`` (s = Σx,
    q = Σx² per group) — algebraically ``|x − μ| > z·σ`` (population
    σ) with no division, no sqrt, no float accumulation, so any
    engine reproduces the exact row set regardless of sum order.

    Products run in decimal(38,0) (Spark) / int128 (DuckDB et al.):
    with |x| ≤ 1e9 and n ≤ 1e10 the largest term (x·n − s)² stays
    under 38 digits — headroom past 100 TB-scale group sizes.

    Scale shape: one map-side-partial aggregate over ``group_cols``
    (groups are typically tiny — the stats frame is broadcast back),
    then a broadcast hash join + codegen filter over the fact rows.
    No second shuffle, no window.
    """
    x = F.round(F.col(value_col) * scale).cast("decimal(20,0)")
    base = df.withColumn("_x", x)
    stats = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("_n"),
        F.sum("_x").cast("decimal(38,0)").alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).cast("decimal(38,0)").alias("_q"),
    )
    dev = F.col("_x") * F.col("_n") - F.col("_s")
    var_num = F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s")
    # Overflow must fail LOUDLY, not filter silently: under non-ANSI
    # mode a decimal(38,0) product past 38 digits yields NULL and the
    # WHERE would drop the row (outliers vanishing beyond the
    # documented |x| ≤ 1e9 / n ≤ 1e10 envelope).  Guard both squares:
    # dev² fits iff |dev| < 1e19, z²·var_num iff var_num < 10³⁸/z².
    dev_bound = F.expr("CAST('9999999999999999999' AS DECIMAL(38,0))")
    var_bound = F.expr(f"CAST('{10**38 // (z * z) - 1}' AS DECIMAL(38,0))")
    overflow = (
        (F.col("_x").isNotNull() & var_num.isNull())
        | (F.abs(dev) > dev_bound)
        | (var_num > var_bound)
    )
    pred = F.when(
        overflow,
        F.expr(
            "raise_error('zscore_outliers: integer envelope exceeded"
            " (|value*scale| <= 1e9, n <= 1e10) - rescale inputs')"
        ).cast("boolean"),
    ).otherwise(dev * dev > F.lit(z * z) * var_num)
    return (
        base.join(F.broadcast(stats), group_cols)
        .where(pred)
        .drop("_n", "_s", "_q")
        .withColumnRenamed("_x", "value_scaled")
    )


def psi_drift(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    bucket_col: str,
) -> DataFrame:
    """Population Stability Index between two cohorts' distributions of
    an integer bucket column — the standard drift monitor a continuously
    ingested corpus runs between snapshots / sources (PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 investigate).

    ``bucket_col`` must be a deterministic integer bucketing the caller
    computed (power-of-2 length buckets, score deciles from
    :func:`ntile_global`, …) — bucketing is where engines diverge, so it
    stays in caller-controlled exact-integer land.

    Laplace add-one smoothing over the UNION bucket set keeps every
    log-ratio finite (a bucket present on one side only is exactly the
    drift signal PSI must not discard): ``p = (c + 1) / (n + B)`` with
    ``B`` = number of distinct buckets observed.  Each bucket's term
    ``(pa - pb) * ln(pa / pb)`` nano-rounds to a bigint BEFORE the sum,
    so the total is shuffle-order-free and engine-exact (the
    ``js_divergence`` lane).

    One shuffle (the bucket group-by; map-side partials over ≤ B cells
    per task) + a one-row broadcast — at 100 TB this is a counting scan.
    Output one row: ``(n_a, n_b, n_buckets, psi_nano, psi)``.
    """
    src = df.where(F.col(group_col).isin(group_a, group_b)).select(
        F.col(group_col).alias("_g"), F.col(bucket_col).cast("bigint").alias("_bk")
    )
    counts = src.groupBy("_bk").agg(
        F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0)).cast("bigint").alias("ca"),
        F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0)).cast("bigint").alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.count(F.lit(1)).alias("nbk"),
    )
    pa = (F.col("ca") + F.lit(1.0)) / (F.col("na") + F.col("nbk"))
    pb = (F.col("cb") + F.lit(1.0)) / (F.col("nb") + F.col("nbk"))
    term = F.round((pa - pb) * F.log(pa / pb) * 1e9).cast("bigint")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select("na", "nb", "nbk", term.alias("t"))
        .groupBy("na", "nb", "nbk")
        .agg(F.sum("t").cast("bigint").alias("psi_nano"))
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.col("nbk").cast("bigint").alias("n_buckets"),
            "psi_nano",
            F.round(F.col("psi_nano") / 1e9, 6).alias("psi"),
        )
    )
