"""Query registrations: behavior family (split from the original single-file registry; registration order preserved by package import order in __init__)."""
from __future__ import annotations
from ._core import F, ORACLES, _t, minhash_lsh_dedup, register
from .ann import _COS_SQL
from .events import _NODE_TAG_SHIFT, _tag_node

# ------------------------------------------------------------------ behavior analytics (funnel / retention / paths / grids)
@register(
    "funnel_conversion",
    """
    WITH s1 AS (SELECT user_id, min({'t': ts, 'i': event_id}) r
                FROM events WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min({'t': e.ts, 'i': e.event_id}) r
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'view' AND {'t': e.ts, 'i': e.event_id} > s1.r
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min({'t': e.ts, 'i': e.event_id}) r
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'click' AND {'t': e.ts, 'i': e.event_id} > s2.r
           GROUP BY e.user_id),
    s4 AS (SELECT e.user_id, min({'t': e.ts, 'i': e.event_id}) r
           FROM events e JOIN s3 USING (user_id)
           WHERE e.event_type = 'purchase' AND {'t': e.ts, 'i': e.event_id} > s3.r
           GROUP BY e.user_id),
    c AS (SELECT (SELECT count(*) FROM s1) n1, (SELECT count(*) FROM s2) n2,
                 (SELECT count(*) FROM s3) n3, (SELECT count(*) FROM s4) n4)
    SELECT 1 step, 'signup' event_type, n1 n_users, (2000000*n1 + n1) // (2*n1) conv_ppm FROM c
    UNION ALL SELECT 2, 'view', n2, (2000000*n2 + n1) // (2*n1) FROM c
    UNION ALL SELECT 3, 'click', n3, (2000000*n3 + n1) // (2*n1) FROM c
    UNION ALL SELECT 4, 'purchase', n4, (2000000*n4 + n1) // (2*n1) FROM c
    ORDER BY step
    """,
)
def funnel_conversion_q(spark, sf_dir):
    """Ordered-funnel conversion signup→view→click→purchase: per step,
    users whose first qualifying event is strictly after their previous
    step completion (total order (ts, event_id)); conv_ppm is integer
    half-up ppm vs step 1.  k user-keyed min-aggregates, one small
    struct per user — no collected event lists, heavy users cost O(1)
    state."""
    from ..ops.behavior import funnel_steps

    ev = _t(spark, sf_dir, "events")
    return funnel_steps(ev, ["signup", "view", "click", "purchase"]).orderBy("step")


@register(
    "retention_cohorts",
    """
    WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 d FROM events),
    f AS (SELECT user_id, min(d) fd FROM d GROUP BY user_id)
    SELECT CAST(floor((fd - 19723) / 7.0) AS INT) cohort_week,
           CAST(floor((d.d - fd) / 7.0) AS INT) week_offset,
           count(DISTINCT d.user_id) n_users
    FROM d JOIN f USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def retention_cohorts_q(spark, sf_dir):
    """Weekly cohort retention: cohort = 7-day epoch-day bucket of the
    user's first event; per (cohort, week offset) the distinct users
    active that week.  Pure integer epoch-day arithmetic — no calendar
    or week-start conventions; one first-touch aggregate + one
    user-keyed join + one small distinct-count aggregate."""
    from ..ops.behavior import retention_cohorts

    return retention_cohorts(_t(spark, sf_dir, "events")).orderBy(
        "cohort_week", "week_offset"
    )


@register(
    "event_transitions",
    """
    WITH t AS (SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 from_type, event_type to_type FROM events),
    c AS (SELECT from_type, to_type, count(*) n FROM t
          WHERE from_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n,
           CAST(round(1000000.0 * n / (sum(n) OVER (PARTITION BY from_type))) AS BIGINT)
             prob_ppm
    FROM c ORDER BY from_type, to_type
    """,
)
def event_transitions_q(spark, sf_dir):
    """First-order Markov transition matrix over each user's
    (ts, event_id)-ordered event stream: counts + row-normalized ppm
    probabilities.  One lag-window pass on the user partitioning +
    one tiny (from, to) aggregate."""
    from ..ops.behavior import event_transitions

    return event_transitions(_t(spark, sf_dir, "events")).orderBy(
        "from_type", "to_type"
    )


@register(
    "top_event_paths",
    """
    WITH r AS (SELECT user_id, event_type,
                      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
               FROM events),
    p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) path
          FROM r WHERE rn <= 3 GROUP BY user_id)
    SELECT path, count(*) n_users FROM p GROUP BY path ORDER BY path
    """,
)
def top_event_paths_q(spark, sf_dir):
    """Path analysis: each user's first 3 event types joined with '>',
    counted across users.  The row_number filter caps per-user state
    at k structs BEFORE the collect — a heavy user can't blow up the
    path assembly."""
    from ..ops.behavior import top_event_paths

    return top_event_paths(_t(spark, sf_dir, "events"), k=3).orderBy("path")


@register(
    "gap_fill_hourly",
    """
    WITH ph AS (
      SELECT user_id, epoch_us(ts) // 3600000000 hour_idx,
             (max({'t': ts, 'i': event_id, 'v': value})).v hv
      FROM events GROUP BY 1, 2),
    sp AS (SELECT user_id, min(hour_idx) h0, max(hour_idx) h1 FROM ph GROUP BY user_id),
    g AS (SELECT user_id, unnest(generate_series(h0, h1)) hour_idx FROM sp),
    j AS (SELECT g.user_id, g.hour_idx, ph.hv
          FROM g LEFT JOIN ph USING (user_id, hour_idx))
    SELECT user_id, hour_idx, hv IS NOT NULL observed,
           last_value(hv IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hour_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) filled
    FROM j ORDER BY user_id, hour_idx
    """,
)
def gap_fill_hourly_q(spark, sf_dir):
    """Time-series regularization (LOCF gap fill): one row per (user,
    hour) between the user's first and last event hour; `filled`
    carries the latest at-or-before value bit-exact (copied via
    last-ignorenulls, never recomputed).  Grid = sequence + explode;
    within-hour winner = one struct max on the (ts, event_id) total
    order."""
    from ..ops.behavior import gap_fill_hourly

    return gap_fill_hourly(_t(spark, sf_dir, "events")).orderBy(
        "user_id", "hour_idx"
    )


# ------------------------------------------------------------------ OLAP rollup & integer z-score outliers
@register(
    "revenue_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) gid,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) revenue_cents,
           count(*) n_orders
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus, o_orderpriority
    """,
)
def revenue_rollup_q(spark, sf_dir):
    """Hierarchical ROLLUP (status → priority → grand total) with
    integer-cents revenue — one pass, Spark expands grouping sets
    map-side (no per-level rescan); grouping_id bit order matches the
    SQL GROUPING() bitmask.  Cents stay bigint: ≲4e18 even at 1.5e11
    orders."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.sum(cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "revenue_cents", "n_orders"
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


@register(
    "event_value_outliers",
    """
    WITH b AS (SELECT event_id, event_type,
                      CAST(round(value * 1000000) AS HUGEINT) x FROM events),
    st AS (SELECT event_type, CAST(count(*) AS HUGEINT) n, sum(x) s, sum(x * x) q
           FROM b GROUP BY event_type)
    SELECT event_id, event_type, CAST(x AS BIGINT) value_micro
    FROM b JOIN st USING (event_type)
    WHERE (x*n - s) * (x*n - s) > 9 * (n*q - s*s)
    ORDER BY event_id
    """,
)
def event_value_outliers_q(spark, sf_dir):
    """Per-type z>3 outliers with FULLY INTEGER math: micro-snapped
    values, the |x−μ|>3σ test as (x·n−s)² > 9(n·q−s²) in decimal(38)/
    int128 — no division, sqrt, or float accumulation, so the row set
    is shuffle-order-free on any engine.  One tiny stats aggregate
    broadcast back + a codegen filter; no second shuffle."""
    from ..ops.profile import zscore_outliers

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = zscore_outliers(ev, ["event_type"], "value", z=3)
    return out.select(
        "event_id",
        "event_type",
        F.col("value_scaled").cast("bigint").alias("value_micro"),
    ).orderBy("event_id")


# ------------------------------------------------------------------ BFS / skyline / reservoir
@register(
    "bfs_reach",
    """
    WITH RECURSIVE eraw AS (
      SELECT 'c:' || CAST(o_custkey AS VARCHAR) u, 'p:' || CAST(l_partkey AS VARCHAR) v
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    e AS (SELECT DISTINCT u, v
          FROM (SELECT u, v FROM eraw UNION ALL SELECT v u, u v FROM eraw)),
    walk(node, dist) AS (
      SELECT 'c:1', 0
      UNION
      SELECT e.v, walk.dist + 1 FROM walk JOIN e ON walk.node = e.u
      WHERE walk.dist < 4
    )
    SELECT node, CAST(min(dist) AS INT) dist FROM walk GROUP BY node ORDER BY node
    """,
)
def bfs_reach_q(spark, sf_dir):
    """Multi-hop reachability: minimum hop distance from customer c:1
    over the bipartite customer–part graph, capped at 4 hops.  Frontier
    expansion — per level one equi-join + distinct + anti-join against
    the settled set (never a path enumeration); the depth-bounded
    recursive-CTE oracle stays polynomial because (node, dist) pairs
    dedup per level."""
    from ..ops.graph import bfs_distances

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # tagged-bigint node ids through the frontier joins; decode at output
    TAG = _NODE_TAG_SHIFT
    edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        _tag_node(1, "o_custkey").alias("a"),
        _tag_node(3, "l_partkey").alias("b"),
    )
    bd = bfs_distances(edges, [1 * TAG + 1], max_depth=4)
    return bd.select(
        F.concat(
            F.when(F.expr(f"node DIV {TAG}") == 1, F.lit("c:")).otherwise(F.lit("p:")),
            (F.col("node") % TAG).cast("string"),
        ).alias("node"),
        "dist",
    ).orderBy("node")


@register(
    "order_pareto_frontier",
    """
    WITH b AS (SELECT o_orderkey, c_nationkey nation,
                      CAST(round(o_totalprice * 100) AS BIGINT) price_cents,
                      epoch_us(o_orderdate) // 86400000000 day_idx
               FROM orders JOIN customer ON o_custkey = c_custkey),
    w AS (SELECT *, min(day_idx) OVER (
            PARTITION BY nation
            ORDER BY price_cents DESC, day_idx ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pm
          FROM b)
    SELECT nation, o_orderkey, price_cents, day_idx
    FROM w WHERE pm IS NULL OR pm > day_idx
    ORDER BY nation, o_orderkey
    """,
)
def order_pareto_frontier_q(spark, sf_dir):
    """Per-nation skyline (Pareto frontier): orders not dominated on
    (max totalprice, min orderdate) — the classic Börzsönyi et al.
    skyline operator as one sort-filter window per nation group
    (parallel across groups; two-phase local→global form documented
    for the global-skyline case).  Integer cents / epoch days."""
    from ..ops.rollup import pareto_frontier

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    base = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey",
        F.col("c_nationkey").alias("nation"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
        # NTZ parquet read; cast-to-timestamp under the UTC session
        # preserves the wall-time instant (data/io.py::load_events)
        F.expr("unix_micros(cast(o_orderdate as timestamp)) DIV 86400000000").alias(
            "day_idx"
        ),
    )
    front = pareto_frontier(base, "nation", "price_cents", "day_idx", "o_orderkey")
    return front.select("nation", "o_orderkey", "price_cents", "day_idx").orderBy(
        "nation", "o_orderkey"
    )


@register(
    "user_event_reservoir",
    """
    WITH r AS (SELECT user_id, event_id,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) rk
               FROM events)
    SELECT user_id, event_id, rk sample_rank FROM r WHERE rk <= 5
    ORDER BY user_id, sample_rank
    """,
)
def user_event_reservoir_q(spark, sf_dir):
    """Deterministic per-key reservoir: exactly min(5, group size)
    events per user by md5-hash rank — seedless, engine-reproducible
    per-key downsampling (caps any hot key's contribution before
    expensive stages).  One key shuffle + one window rank."""
    from ..ops.curation import per_key_reservoir

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id")
    return per_key_reservoir(ev, "user_id", 5, "event_id").orderBy(
        "user_id", "sample_rank"
    )


# ------------------------------------------------------------------ skip-grams / winsorize / target encoding
@register(
    "skipgram_pairs",
    """
    WITH t AS (SELECT list_filter(regexp_split_to_array(text, ' '),
                                  x -> x <> '') tk
               FROM documents),
    arr AS (SELECT tk, len(tk) n FROM t WHERE len(tk) > 0),
    pr AS (SELECT tk[i] center, tk[j] context
           FROM arr, unnest(generate_series(1, n)) s(i),
                unnest(generate_series(greatest(1, i - 2), least(n, i + 2))) s2(j)
           WHERE j <> i)
    SELECT center, context, count(*) n FROM pr GROUP BY center, context
    HAVING count(*) >= 3 ORDER BY center, context
    """,
)
def skipgram_pairs_q(spark, sf_dir):
    """word2vec training-pair generation: ordered (center, context)
    token pairs within distance 2, counted corpus-wide, min count 3.
    Pair enumeration is one nested array transform per document (no
    positional self-join, no UDF); the only shuffle is the pair-count
    aggregate."""
    from ..ops.textstats import skipgram_pairs

    return skipgram_pairs(
        _t(spark, sf_dir, "documents"), window=2, min_count=3
    ).orderBy("center", "context")


@register(
    "ngram_lm_perplexity",
    """
    WITH tkn AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '') tk
                 FROM documents),
    ref AS (SELECT tk FROM tkn WHERE doc_id % 10 = 0),
    cu AS (SELECT w1, CAST(count(*) AS BIGINT) cu
           FROM (SELECT unnest(tk) w1 FROM ref) GROUP BY w1),
    v AS (SELECT CAST(count(*) AS BIGINT) v FROM cu),
    rb AS (SELECT tk[i] w1, tk[i + 1] w2
           FROM (SELECT tk, len(tk) n FROM ref WHERE len(tk) >= 2),
                unnest(generate_series(1, n - 1)) s(i)),
    cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) cb FROM rb GROUP BY w1, w2),
    db AS (SELECT doc_id, tk[i] w1, tk[i + 1] w2
           FROM (SELECT doc_id, tk, len(tk) n FROM tkn WHERE len(tk) >= 2),
                unnest(generate_series(1, n - 1)) s(i)),
    agg AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) occ
            FROM db GROUP BY doc_id, w1, w2),
    sc AS (SELECT a.doc_id, a.occ,
                  CAST(round(1e9 * ln((coalesce(cu.cu, 0) + v.v) * 1.0
                                      / (coalesce(cb.cb, 0) + 1)))
                       AS BIGINT) nll_nano
           FROM agg a LEFT JOIN cb USING (w1, w2) LEFT JOIN cu USING (w1)
           CROSS JOIN v),
    tot AS (SELECT doc_id, CAST(sum(occ) AS BIGINT) n_bigrams,
                   CAST(sum(occ * nll_nano) AS BIGINT) nll_nano_sum
            FROM sc GROUP BY doc_id)
    SELECT doc_id, n_bigrams, nll_nano_sum,
           CAST((2 * nll_nano_sum + n_bigrams) // (2 * n_bigrams) AS BIGINT)
             avg_nll_nano
    FROM tot ORDER BY doc_id
    """,
)
def ngram_lm_perplexity_q(spark, sf_dir):
    """CCNet-style perplexity quality filter: every document scored by
    its average bigram negative log-likelihood under an add-one bigram
    LM trained on the doc_id % 10 == 0 reference slice — lower = closer
    to the trusted distribution.  Per-bigram NLL is nano-rounded before
    the integer per-doc sums (the pmi lane), so the approximate-model
    operator carries an EXACT oracle."""
    from ..ops.textstats import ngram_lm_score

    docs = _t(spark, sf_dir, "documents")
    ref = docs.where(F.col("doc_id") % 10 == 0)
    return ngram_lm_score(docs, ref).orderBy("doc_id")


def _bitext_margin_oracle() -> str:
    cos = _COS_SQL.format(a="l.embedding", b="r.embedding")
    return f"""
    WITH l AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
    r AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
    sims AS (SELECT l.vec_id qid, r.vec_id nid,
                    CAST(round(({cos}) * 1e6) AS BIGINT) cm,
                    {cos} sim
             FROM l CROSS JOIN r),
    rk AS (SELECT qid, nid, cm,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY sim DESC, nid) frk,
                  row_number() OVER (PARTITION BY nid
                                     ORDER BY sim DESC, qid) brk
           FROM sims),
    sx AS (SELECT qid, CAST(sum(cm) AS BIGINT) sx FROM rk WHERE frk <= 4
           GROUP BY qid),
    sy AS (SELECT nid, CAST(sum(cm) AS BIGINT) sy FROM rk WHERE brk <= 4
           GROUP BY nid),
    cand AS (SELECT k.qid query_id, k.nid neighbor_id, k.cm cos_micro,
                    8 * k.cm - sx.sx - sy.sy margin_scaled
             FROM rk k JOIN sx USING (qid) JOIN sy USING (nid)
             WHERE k.frk <= 4)
    SELECT query_id, neighbor_id, cos_micro,
           CAST(margin_scaled AS BIGINT) margin_scaled
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY margin_scaled DESC,
                                                neighbor_id) mrk
          FROM cand)
    WHERE mrk = 1 ORDER BY query_id
    """


@register("bitext_margin_mining", _bitext_margin_oracle())
def bitext_margin_mining_q(spark, sf_dir):
    """LASER-style margin-based bitext / hard-negative mining over the
    embedding table split by vec_id parity (even = source side, odd =
    target side): per source vector the best target by the distance
    margin 2k·cos − Σ kNN-cos(x) − Σ kNN-cos(y), k=4 — the hub-robust
    pairing score used to mine parallel text and hard negatives at
    corpus scale.  Cosines micro-round before the integer margin, so
    the miner is exact-oracled."""
    from ..ops.similarity import margin_bitext_mine

    emb = _t(spark, sf_dir, "embeddings")
    return margin_bitext_mine(
        emb.where(F.col("vec_id") % 2 == 0),
        emb.where(F.col("vec_id") % 2 == 1),
        k=4,
    ).orderBy("query_id")


def _kcenter_oracle(k: int) -> str:
    """Unrolled-CTE twin of ``ops.similarity.kcenter_sample`` — one
    (min-distance, argmax) CTE pair per greedy round."""
    d2 = (
        "CAST(round(1e6 * list_sum(list_transform(list_zip(p.v, c.v),"
        " z -> (z[1] - z[2]) * (z[1] - z[2])))) AS BIGINT)"
    )
    parts = [
        """
    WITH pts AS (SELECT vec_id id, list_transform(embedding, x -> x::DOUBLE) v
                 FROM embeddings),
    c0 AS (SELECT id, v FROM pts ORDER BY id LIMIT 1),"""
    ]
    for r in range(1, k):
        src = "pts p CROSS JOIN c0 c" if r == 1 else f"m{r-1} p CROSS JOIN c{r-1} c"
        mind = d2 if r == 1 else f"least(p.mind, {d2})"
        parts.append(
            f"""
    m{r} AS (SELECT p.id, p.v, {mind} mind FROM {src}),
    c{r} AS (SELECT id, v, mind FROM m{r} ORDER BY mind DESC, id LIMIT 1),"""
        )
    sel = [
        "    SELECT 0 sel_round, (SELECT id FROM c0) vec_id,\n"
        "           CAST(NULL AS BIGINT) mind_micro"
    ]
    for r in range(1, k):
        sel.append(f"    SELECT {r}, (SELECT id FROM c{r}), (SELECT mind FROM c{r})")
    return (
        "".join(parts).rstrip()[:-1]
        + "\n"
        + "\n    UNION ALL\n".join(sel)
        + "\n    ORDER BY sel_round"
    )


@register("kcenter_coreset", _kcenter_oracle(6))
def kcenter_coreset_q(spark, sf_dir):
    """Farthest-point (k-center) coreset over the embedding table:
    6 maximally-spread exemplars with their selection-time min squared
    distances — the diversity-selection primitive for training-data
    curation.  Deterministic seed/tie-breaks + micro-int distances =>
    the full greedy trajectory is exact-oracled (unrolled CTEs)."""
    from ..ops.similarity import kcenter_sample

    return kcenter_sample(_t(spark, sf_dir, "embeddings"), k=6)


@register(
    "perplexity_bucket_mix",
    "WITH lm AS ("
    + ORACLES["ngram_lm_perplexity"]
    + """),
    tok AS (SELECT doc_id, len(list_filter(string_split(text, ' '),
                                           x -> x <> '')) n_tokens
            FROM documents),
    j AS (SELECT lm.doc_id, lm.avg_nll_nano, tok.n_tokens
          FROM lm JOIN tok USING (doc_id)),
    b AS (SELECT *, ntile(4) OVER (ORDER BY avg_nll_nano, doc_id) bucket
          FROM j),
    agg AS (SELECT bucket, CAST(count(*) AS BIGINT) n_docs,
                   CAST(sum(n_tokens) AS BIGINT) n_tokens,
                   CAST(min(avg_nll_nano) AS BIGINT) min_nll_nano,
                   CAST(max(avg_nll_nano) AS BIGINT) max_nll_nano
            FROM b GROUP BY bucket),
    t AS (SELECT CAST(sum(n_tokens) AS BIGINT) tot FROM agg)
    SELECT CAST(bucket AS INT) bucket, n_docs, n_tokens,
           min_nll_nano, max_nll_nano,
           CAST(round(1000000.0 * n_tokens / tot) AS BIGINT) token_share_ppm
    FROM agg CROSS JOIN t ORDER BY bucket
    """,
)
def perplexity_bucket_mix_q(spark, sf_dir):
    """The CCNet recipe end-to-end: documents quartiled by LM
    perplexity (distributed ntile over the nano-NLL scores — head =
    cleanest text) with per-bucket doc/token budgets and corpus token
    shares, the table a data-mixing plan reads to up/down-weight
    quality tiers.  Composes ngram_lm_score × ntile_global × one
    rollup; exact oracle reuses the LM CTE verbatim."""
    from ..ops.profile import ntile_global
    from ..ops.textstats import ngram_lm_score

    docs = _t(spark, sf_dir, "documents")
    lm = ngram_lm_score(docs, docs.where(F.col("doc_id") % 10 == 0))
    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).cast("bigint").alias("n_tokens"),
    )
    j = lm.join(toks, "doc_id")
    b = ntile_global(j, [F.col("avg_nll_nano"), F.col("doc_id")], 4, "bucket")
    agg = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.min("avg_nll_nano").alias("min_nll_nano"),
        F.max("avg_nll_nano").alias("max_nll_nano"),
    )
    tot = agg.agg(F.sum("n_tokens").alias("_tot"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "n_docs",
            "n_tokens",
            "min_nll_nano",
            "max_nll_nano",
            F.round(1000000.0 * F.col("n_tokens") / F.col("_tot"))
            .cast("bigint")
            .alias("token_share_ppm"),
        )
        .orderBy("bucket")
    )


@register(
    "cross_source_dup_matrix",
    "WITH pairs AS ("
    + ORACLES["minhash_dedup_md5"]
    + """),
    lab AS (SELECT p.doc_a, p.doc_b, da.source sa, db.source sb
            FROM pairs p
            JOIN documents da ON p.doc_a = da.doc_id
            JOIN documents db ON p.doc_b = db.doc_id),
    norm AS (SELECT least(sa, sb) source_a, greatest(sa, sb) source_b
             FROM lab)
    SELECT source_a, source_b, CAST(count(*) AS BIGINT) n_dup_pairs
    FROM norm GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """,
)
def cross_source_dup_matrix_q(spark, sf_dir):
    """Provenance view of near-duplication: the MinHash near-dup pair
    list joined back to document sources and rolled up into a
    (source_a, source_b) matrix — the table that tells a corpus owner
    WHERE duplication lives (mirror sites, cross-source scrapes) and
    which source pair to deduplicate first.  Two dimension-key joins +
    one tiny aggregate on top of the exact-oracled pair list."""
    from ..ops.dedup import minhash_lsh_dedup

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(docs, num_perm=32, bands=8, hash_fn="md5")
    src = docs.select("doc_id", "source")
    lab = (
        pairs.join(src.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("source", "sa"), "doc_a")
        .join(src.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("source", "sb"), "doc_b")
    )
    return (
        lab.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
        .orderBy("source_a", "source_b")
    )


@register(
    "leakage_safe_split",
    "WITH pairs AS ("
    + ORACLES["minhash_dedup_md5"]
    + """),
    base AS (SELECT doc_id,
                    CASE WHEN doc_id % 10 = 7 THEN 'test' ELSE 'train' END split0
             FROM documents),
    leak AS (SELECT DISTINCT x.did doc_id FROM (
               SELECT p.doc_a did, p.doc_b other FROM pairs p
               UNION ALL
               SELECT p.doc_b, p.doc_a FROM pairs p) x
             JOIN base bo ON x.other = bo.doc_id AND bo.split0 = 'test'
             JOIN base bd ON x.did = bd.doc_id AND bd.split0 = 'train'),
    lab AS (SELECT b.doc_id,
                   CASE WHEN l.doc_id IS NOT NULL THEN 'dropped'
                        ELSE b.split0 END split
            FROM base b LEFT JOIN leak l USING (doc_id))
    SELECT split, CAST(count(*) AS BIGINT) n_docs,
           CAST(min(doc_id) AS BIGINT) min_doc_id,
           CAST(max(doc_id) AS BIGINT) max_doc_id
    FROM lab GROUP BY split ORDER BY split
    """,
)
def leakage_safe_split_q(spark, sf_dir):
    """Decontaminated train/test split — the eval-hygiene primitive:
    docs split deterministically (doc_id % 10 == 7 → test), then every
    TRAIN doc that MinHash-near-dups a TEST doc is dropped, so eval
    examples cannot leak into training through near-copies.  One
    anti-join against the exact-oracled near-dup pair list; output is
    the per-split census."""
    from ..ops.dedup import minhash_lsh_dedup

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 7, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split0"),
    )
    pairs = minhash_lsh_dedup(docs, num_perm=32, bands=8, hash_fn="md5")
    sym = pairs.select(
        F.col("doc_a").alias("did"), F.col("doc_b").alias("other")
    ).unionAll(pairs.select(F.col("doc_b"), F.col("doc_a")))
    test_ids = base.where(F.col("split0") == "test").select(
        F.col("doc_id").alias("other")
    )
    train_ids = base.where(F.col("split0") == "train").select(
        F.col("doc_id").alias("did")
    )
    leak = (
        sym.join(test_ids, "other", "left_semi")
        .join(train_ids, "did", "left_semi")
        .select(F.col("did").alias("doc_id"))
        .distinct()
    )
    lab = base.join(
        leak.withColumn("_leak", F.lit(True)), "doc_id", "left"
    ).select(
        "doc_id",
        F.when(F.col("_leak"), F.lit("dropped")).otherwise(F.col("split0")).alias("split"),
    )
    return (
        lab.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


@register(
    "event_value_twap",
    """
    WITH b AS (SELECT user_id, epoch_us(ts) t,
                      CAST(round(value * 1e6) AS HUGEINT) v, event_id
               FROM events),
    iv AS (SELECT user_id,
                  CAST(lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                       - t AS HUGEINT) w,
                  v
           FROM b QUALIFY w IS NOT NULL),
    agg AS (SELECT user_id, CAST(count(*) AS BIGINT) n_intervals,
                   sum(w) sw, sum(w * v) swv
            FROM iv GROUP BY user_id)
    SELECT user_id, n_intervals, CAST(sw AS BIGINT) span_us,
           CAST((2 * swv + sw) // (2 * sw) AS BIGINT) twap_micro
    FROM agg ORDER BY user_id
    """,
)
def event_value_twap_q(spark, sf_dir):
    """Time-weighted average event value per user (TWAP): each value
    holds until the user's next event, weights are µs gaps, the mean is
    the integer half-up decimal(38)/HUGEINT ratio — exact across
    engines, one lead window + one aggregate."""
    from ..ops.temporal import event_value_twap

    return event_value_twap(_t(spark, sf_dir, "events")).orderBy("user_id")


@register(
    "event_value_ohlc_hourly",
    """
    WITH b AS (SELECT user_id, epoch_us(ts) // 3600000000 bucket_idx,
                      epoch_us(ts) t, event_id i,
                      CAST(round(value * 1e6) AS BIGINT) v
               FROM events)
    SELECT user_id, bucket_idx, CAST(count(*) AS BIGINT) n_events,
           (min({'t': t, 'i': i, 'v': v})).v open_micro,
           max(v) high_micro, min(v) low_micro,
           (max({'t': t, 'i': i, 'v': v})).v close_micro
    FROM b GROUP BY user_id, bucket_idx
    ORDER BY user_id, bucket_idx
    """,
)
def event_value_ohlc_hourly_q(spark, sf_dir):
    """Hourly OHLC candles per user (open/high/low/close in micro
    units): open/close are struct-min/max on the (ts, event_id) total
    order, high/low plain extremes — ONE aggregate, no window, the
    market-data rollup shape that scales to any bucket count."""
    from ..ops.temporal import event_value_ohlc

    return event_value_ohlc(_t(spark, sf_dir, "events")).orderBy(
        "user_id", "bucket_idx"
    )





@register(
    "event_value_winsorized",
    """
    WITH b AS (SELECT event_id, event_type,
                      CAST(round(value * 1000000) AS BIGINT) value_micro
               FROM events),
    f AS (SELECT event_type, quantile_cont(value_micro, 0.0625) lo,
                 quantile_cont(value_micro, 0.9375) hi
          FROM b GROUP BY event_type)
    SELECT event_id, event_type, value_micro,
           least(greatest(CAST(value_micro AS DOUBLE), lo), hi) clipped
    FROM b JOIN f USING (event_type) ORDER BY event_id
    """,
)
def event_value_winsorized_q(spark, sf_dir):
    """Per-type winsorization at the dyadic 1/16 and 15/16 quantiles:
    with integer-micro values and a power-of-two denominator the
    PERCENTILE_CONT interpolation is EXACT in IEEE double on any
    engine — reproducible fences, no rounding lane.  One tiny fence
    aggregate broadcast back + a codegen clip."""
    from ..ops.rollup import winsorize

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("value_micro"),
    )
    return winsorize(ev, ["event_type"], "value_micro").orderBy("event_id")


@register(
    "order_priority_target_encoding",
    """
    WITH b AS (SELECT o_orderkey, o_orderpriority,
                      CAST(round(o_totalprice * 100) AS HUGEINT) cents
               FROM orders),
    st AS (SELECT o_orderpriority, CAST(count(*) AS HUGEINT) n, sum(cents) s
           FROM b GROUP BY o_orderpriority)
    SELECT o_orderkey, o_orderpriority,
           CASE WHEN n > 1 THEN
             CAST((2000000 * (s - cents) + (n - 1)) // (2 * (n - 1)) AS BIGINT)
           END loo_mean_micro
    FROM b JOIN st USING (o_orderpriority) ORDER BY o_orderkey
    """,
)
def order_priority_target_encoding_q(spark, sf_dir):
    """Leakage-free (leave-one-out) target encoding of order priority
    against price: each row's feature is the mean cents of OTHER rows
    in its category, as the integer half-up micro ratio in decimal(38)
    /int128 — engine-exact, no float accumulation.  One tiny category
    aggregate broadcast back; no second shuffle."""
    from ..ops.textstats import target_encode_loo

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return target_encode_loo(
        o, "o_orderpriority", "cents", ["o_orderkey"]
    ).orderBy("o_orderkey")


