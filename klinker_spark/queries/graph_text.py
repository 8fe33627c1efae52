"""Query registrations: graph_text family (split from the original single-file registry; registration order preserved by package import order in __init__)."""
from __future__ import annotations
from ._core import F, _t, _toks_cte, load_events, local_df, register, tokenize
from .events import _NODE_TAG_SHIFT, _tag_node
from .curation import _qcls_oracle

# --------------------------------------------------------------- BPE tokenizer


def _bpe_ctes(iters: int) -> str:
    """Unrolled-CTE DuckDB twin of ``ops.bpe.bpe_train`` — one
    (pairs → arg-max → replace) CTE block per iteration, mirroring the
    trained-model oracle recipe (``_power_iter_sql``/``_qcls_oracle``).
    ``rep{r}`` and ``m{r}`` are multiply-referenced, so both are
    ``AS MATERIALIZED`` (NOTES lesson (d): inlining a twice-referenced
    chain doubles the plan per iteration → 2^k blow-up)."""
    sql = (
        _toks_cte(", source")
        + """,
    occ AS (SELECT source, unnest(tk) w FROM toks),
    words AS (SELECT w, CAST(count(*) AS BIGINT) cnt FROM occ GROUP BY w),
    rep0 AS MATERIALIZED (
      SELECT w, cnt,
             ' ' || array_to_string(
                      list_append(list_transform(generate_series(1, length(w)),
                                                 i -> substr(w, i, 1)), '_'),
                      '  ') || ' ' AS syms
      FROM words)"""
    )
    for r in range(iters):
        sql += f""",
    ag{r} AS (
      SELECT p.a a, p.b b, CAST(sum(cnt) AS BIGINT) c
      FROM (SELECT cnt,
                   unnest(list_transform(generate_series(1, len(sy) - 1),
                          j -> struct_pack(a := sy[j], b := sy[j + 1]))) p
            FROM (SELECT cnt, string_split(trim(syms), '  ') sy FROM rep{r})
            WHERE len(sy) > 1)
      GROUP BY p.a, p.b),
    m{r} AS MATERIALIZED (
      SELECT {r} AS merge_rank, a, b, c FROM ag{r} ORDER BY c DESC, a, b LIMIT 1),
    rep{r + 1} AS MATERIALIZED (
      SELECT w, cnt,
             replace(syms, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') syms
      FROM rep{r}, m{r})"""
    return sql


def _bpe_merges_oracle(iters: int) -> str:
    union = "\n      UNION ALL ".join(f"SELECT * FROM m{r}" for r in range(iters))
    return f"""
    WITH {_bpe_ctes(iters)}
    SELECT CAST(merge_rank AS INTEGER) AS merge_rank,
           a AS left_sym, b AS right_sym, c AS pair_count
    FROM ({union})
    ORDER BY merge_rank
    """


_BPE_ITERS = 6


@register("bpe_train_merges", _bpe_merges_oracle(_BPE_ITERS))
def bpe_train_merges_q(spark, sf_dir):
    """Distributed BPE tokenizer training (Sennrich 2016) over the
    document corpus: 6 merge rules learned by weighted adjacent-pair
    counting on the word-type vocabulary.  Engine-exact — integer pair
    counts, deterministic (count DESC, pair ASC) tie-break, literal
    left-to-right replace — so the unrolled-CTE oracle is bit-exact.
    One corpus scan total; each iteration is a vocab-sized aggregate +
    1-row collect."""
    from ..ops.bpe import bpe_train

    docs = _t(spark, sf_dir, "documents")
    merges, _ = bpe_train(docs, "text", iters=_BPE_ITERS)
    return local_df(
        spark,
        merges,
        "merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )


@register(
    "bpe_token_count",
    f"""
    WITH {_bpe_ctes(_BPE_ITERS)},
    appl AS (SELECT w, len(string_split(trim(syms), '  ')) n_subwords
             FROM rep{_BPE_ITERS})
    SELECT occ.source,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_subwords) AS BIGINT) AS n_bpe_tokens,
           CAST(round((1000000.0 * CAST(sum(n_subwords) AS BIGINT)) / count(*))
                AS BIGINT) AS subwords_per_word_ppm
    FROM occ JOIN appl USING (w)
    GROUP BY occ.source
    ORDER BY occ.source
    """,
)
def bpe_token_count_q(spark, sf_dir):
    """Corpus-trained BPE applied back to the corpus: per-source word
    count, subword-token count, and compression ratio (ppm — integer
    output, lesson (i)).  The apply step is a broadcast join
    word-type → subword count: no second corpus shuffle."""
    from ..ops.bpe import apply_merges, bpe_train
    from ..functions.text import tokenize as _tok

    docs = _t(spark, sf_dir, "documents")
    _, rep = bpe_train(docs, "text", iters=_BPE_ITERS)
    per_word = apply_merges(rep)
    toks = _tok(F.col("text"), min_token_length=1, stopwords=[], keep_duplicates=True)
    occ = docs.select(F.col("source"), F.explode(toks).alias("w"))
    out = (
        occ.join(F.broadcast(per_word), "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subwords").alias("n_bpe_tokens"),
        )
        .select(
            "source",
            "n_words",
            "n_bpe_tokens",
            F.round(1000000.0 * F.col("n_bpe_tokens") / F.col("n_words"))
            .cast("bigint")
            .alias("subwords_per_word_ppm"),
        )
    )
    return out


# ----------------------------------------------------------- graph structure


@register(
    "token_cooccurrence_triangles",
    f"""
    WITH {_toks_cte()},
    od AS (SELECT DISTINCT doc_id, unnest(tk) tok FROM toks),
    top AS (SELECT tok FROM (SELECT tok, count(*) c FROM od GROUP BY tok
                             ORDER BY c DESC, tok LIMIT 100)),
    ofil AS (SELECT doc_id, tok FROM od JOIN top USING (tok)),
    e0 AS (SELECT DISTINCT a.tok u, b.tok v
           FROM ofil a JOIN ofil b ON a.doc_id = b.doc_id AND a.tok < b.tok),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) degree
            FROM (SELECT u node FROM e0 UNION ALL SELECT v FROM e0)
            GROUP BY node),
    dir AS (SELECT CASE WHEN du.degree < dv.degree
                          OR (du.degree = dv.degree AND u < v) THEN u ELSE v END src,
                   CASE WHEN du.degree < dv.degree
                          OR (du.degree = dv.degree AND u < v) THEN v ELSE u END dst
            FROM e0 JOIN deg du ON e0.u = du.node
                    JOIN deg dv ON e0.v = dv.node),
    tri AS (SELECT w1.src p, w1.dst q, w2.dst r
            FROM dir w1 JOIN dir w2 ON w1.src = w2.src AND w1.dst < w2.dst
            JOIN e0 ON w1.dst = e0.u AND w2.dst = e0.v),
    pern AS (SELECT node, CAST(count(*) AS BIGINT) triangles
             FROM (SELECT p node FROM tri UNION ALL SELECT q FROM tri
                   UNION ALL SELECT r FROM tri)
             GROUP BY node)
    SELECT deg.node, deg.degree,
           COALESCE(pern.triangles, 0) AS triangles,
           CASE WHEN deg.degree < 2 THEN 0
                ELSE CAST(round((2000000.0 * COALESCE(pern.triangles, 0))
                                / (deg.degree * (deg.degree - 1))) AS BIGINT)
           END AS clustering_ppm
    FROM deg LEFT JOIN pern USING (node)
    ORDER BY node
    """,
)
def token_cooccurrence_triangles_q(spark, sf_dir):
    """Exact triangle census of the token co-occurrence graph (top-100
    document-frequency tokens; an edge joins two tokens sharing a
    document): per-node triangle count + local clustering coefficient.
    Uses the degree-ordered orientation so wedge work is bounded by
    O(m^1.5) regardless of hubs — the at-scale triangle algorithm.
    Clustering structure of the co-occurrence graph is a standard
    topical-coherence signal for corpus slices."""
    from ..ops.graph import triangle_count

    docs = _t(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"), min_token_length=1, stopwords=[], keep_duplicates=False)
    occ = docs.select("doc_id", F.explode(toks).alias("tok")).distinct()
    top = (
        occ.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(100)
        .select("tok")
    )
    of = occ.join(F.broadcast(top), "tok")
    a = of.select(F.col("doc_id"), F.col("tok").alias("a"))
    b = of.select(F.col("doc_id"), F.col("tok").alias("b"))
    edges = a.join(b, "doc_id").where(F.col("a") < F.col("b")).select("a", "b")
    return triangle_count(edges).orderBy("node")


@register(
    "neighbor_jaccard_blocking",
    """
    WITH l0 AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) lid,
                                CAST(l_partkey AS VARCHAR) nbr
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    r0 AS (SELECT DISTINCT CAST(l_suppkey AS VARCHAR) rid,
                           CAST(l_partkey AS VARCHAR) nbr
           FROM lineitem),
    hot AS (SELECT nbr FROM (SELECT nbr, count(*) n FROM l0 GROUP BY nbr) WHERE n > 200
            UNION SELECT nbr FROM (SELECT nbr, count(*) n FROM r0 GROUP BY nbr) WHERE n > 200),
    l AS (SELECT * FROM l0 ANTI JOIN hot USING (nbr)),
    r AS (SELECT * FROM r0 ANTI JOIN hot USING (nbr)),
    nl AS (SELECT lid, CAST(count(*) AS BIGINT) na FROM l GROUP BY lid),
    nr AS (SELECT rid, CAST(count(*) AS BIGINT) nb FROM r GROUP BY rid),
    com AS (SELECT lid, rid, CAST(count(*) AS BIGINT) c
            FROM l JOIN r USING (nbr) GROUP BY lid, rid),
    sc AS (SELECT lid, rid,
                  CAST(round((1000000.0 * c) / (na + nb - c)) AS BIGINT) jaccard_ppm
           FROM com JOIN nl USING (lid) JOIN nr USING (rid)),
    ranked AS (SELECT lid, rid, jaccard_ppm,
                      row_number() OVER (PARTITION BY lid
                                         ORDER BY jaccard_ppm DESC, rid) rk
               FROM sc WHERE jaccard_ppm >= 20000)
    SELECT lid, rid, jaccard_ppm, CAST(rk AS INTEGER) rk
    FROM ranked WHERE rk <= 5
    ORDER BY lid, rk
    """,
)
def neighbor_jaccard_blocking_q(spark, sf_dir):
    """Graph-neighborhood blocking: customer × supplier candidates
    scored by Jaccard overlap of their part neighborhoods (customer →
    parts bought, supplier → parts stocked), top-5 per customer above
    2% — the set-similarity counterpart of relational token blocking
    with the relation neighborhood itself as the signature.  Inverted-
    index join on the shared part (never all-pairs); hub parts shared
    by > 200 entities on a side are dropped by the ``max_df`` valve."""
    from ..ops.graph import neighbor_jaccard_join

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    left = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("id"), F.col("l_partkey").alias("nbr")
    )
    right = li.select(F.col("l_suppkey").alias("id"), F.col("l_partkey").alias("nbr"))
    return neighbor_jaccard_join(
        left, right, threshold_ppm=20000, k=5, max_df=200
    ).orderBy("lid", "rk")


def _phonetic_oracle() -> str:
    from ..functions.text import phonetic_key_sql

    return f"""
    WITH keyed AS (
      SELECT p_name,
             array_to_string(list_transform(string_split(p_name, ' '),
                                            x -> {phonetic_key_sql('x')}), '-') pkey
      FROM part)
    SELECT pkey, CAST(count(*) AS BIGINT) n_parts,
           CAST(count(DISTINCT p_name) AS BIGINT) n_names,
           min(p_name) min_name, max(p_name) max_name
    FROM keyed GROUP BY pkey ORDER BY pkey
    """


@register("phonetic_blocking", _phonetic_oracle())
def phonetic_blocking_q(spark, sf_dir):
    """Phonetic (soundex-style) blocking over part names: each name
    word maps to its phonetic key (pure regex chain, engine-exact —
    ``functions.text.phonetic_key``), names sharing the joined key
    land in one block.  Groups spelling variants cheaply before any
    expensive matcher; output is per-block stats (never the quadratic
    pair list)."""
    from ..functions.text import phonetic_key

    parts = _t(spark, sf_dir, "part")
    key = F.array_join(
        F.transform(F.split(F.col("p_name"), " "), lambda t: phonetic_key(t)), "-"
    )
    return (
        parts.select(F.col("p_name"), key.alias("pkey"))
        .groupBy("pkey")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("p_name").alias("n_names"),
            F.min("p_name").alias("min_name"),
            F.max("p_name").alias("max_name"),
        )
        .orderBy("pkey")
    )


@register(
    "quality_classifier_calibration",
    f"""
    SELECT LEAST(CAST(floor(prob * 10) AS INTEGER), 9) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(prob * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_prob_micro,
           CAST(sum(label) AS BIGINT) AS n_pos,
           CAST(round(sum(CAST(round(prob * 1000000) AS BIGINT)) / count(*))
                AS BIGINT) AS mean_pred_ppm,
           CAST(round((1000000.0 * sum(label)) / count(*)) AS BIGINT)
             AS frac_pos_ppm,
           abs(CAST(round(sum(CAST(round(prob * 1000000) AS BIGINT)) / count(*))
                    AS BIGINT)
               - CAST(round((1000000.0 * sum(label)) / count(*)) AS BIGINT))
             AS abs_gap_ppm
    FROM ({_qcls_oracle()}) base
    GROUP BY 1 ORDER BY 1
    """,
)
def quality_classifier_calibration_q(spark, sf_dir):
    """Reliability diagram / expected-calibration-error input for the
    deterministic trained quality classifier: 10 confidence bins, per
    bin the mean predicted probability vs the empirical positive rate
    (both in exact integer ppm — float sums go through per-row micro
    snapping, lesson (i), so the bin aggregates are order-free).  The
    weighted sum of ``abs_gap_ppm`` over bins IS the ECE — the
    standard go/no-go check before using classifier scores as
    curation weights at 100 TB."""
    from ..ops.quality_model import train_quality_scores_deterministic

    scored = train_quality_scores_deterministic(
        _t(spark, sf_dir, "documents"), F.col("source") == "src0"
    )
    pm = F.round(F.col("prob") * 1000000).cast("bigint")
    return (
        scored.select(
            F.least(F.floor(F.col("prob") * 10).cast("int"), F.lit(9)).alias("bin"),
            pm.alias("pm"),
            "label",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("pm").alias("sum_prob_micro"),
            F.sum("label").cast("bigint").alias("n_pos"),
        )
        .select(
            "bin",
            "n",
            "sum_prob_micro",
            "n_pos",
            F.round(F.col("sum_prob_micro") / F.col("n")).cast("bigint").alias("mean_pred_ppm"),
            F.round(1000000.0 * F.col("n_pos") / F.col("n")).cast("bigint").alias("frac_pos_ppm"),
            F.abs(
                F.round(F.col("sum_prob_micro") / F.col("n")).cast("bigint")
                - F.round(1000000.0 * F.col("n_pos") / F.col("n")).cast("bigint")
            ).alias("abs_gap_ppm"),
        )
        .orderBy("bin")
    )


def _lpa_oracle(iters: int = 4) -> str:
    sql = f"""
    WITH {_toks_cte()},
    od AS (SELECT DISTINCT doc_id, unnest(tk) tok FROM toks),
    top AS (SELECT tok FROM (SELECT tok, count(*) c FROM od GROUP BY tok
                             ORDER BY c DESC, tok LIMIT 100)),
    ofil AS (SELECT doc_id, tok FROM od JOIN top USING (tok)),
    e0 AS (SELECT DISTINCT a.tok u, b.tok v
           FROM ofil a JOIN ofil b ON a.doc_id = b.doc_id AND a.tok < b.tok),
    adj AS MATERIALIZED (SELECT u node, v nbr FROM e0
                         UNION ALL SELECT v, u FROM e0),
    lab0 AS MATERIALIZED (SELECT DISTINCT node, node lab FROM adj)"""
    for r in range(iters):
        sql += f""",
    cnt{r} AS (SELECT adj.node, l.lab, count(*) c
               FROM adj JOIN lab{r} l ON adj.nbr = l.node
               GROUP BY adj.node, l.lab),
    lab{r + 1} AS MATERIALIZED (
      SELECT node, lab FROM (
        SELECT node, lab,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) rn
        FROM cnt{r}) WHERE rn = 1)"""
    sql += f"""
    SELECT node, lab AS community FROM lab{iters} ORDER BY node
    """
    return sql


@register("token_community_labels", _lpa_oracle(4))
def token_community_labels_q(spark, sf_dir):
    """Deterministic synchronous label-propagation communities over the
    token co-occurrence graph (top-100 df tokens): 4 rounds, majority
    neighbor label, smallest-label ties — topical clusters for corpus
    slicing.  Engine-exact (integer counts, total ordering), oracle =
    unrolled per-round CTEs, the ``pagerank_importance`` recipe applied
    to a label-valued fixpoint."""
    from ..ops.graph import label_propagation

    docs = _t(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"), min_token_length=1, stopwords=[], keep_duplicates=False)
    occ = docs.select("doc_id", F.explode(toks).alias("tok")).distinct()
    top = (
        occ.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(100)
        .select("tok")
    )
    of = occ.join(F.broadcast(top), "tok")
    a = of.select(F.col("doc_id"), F.col("tok").alias("a"))
    b = of.select(F.col("doc_id"), F.col("tok").alias("b"))
    edges = a.join(b, "doc_id").where(F.col("a") < F.col("b")).select("a", "b")
    return label_propagation(edges, iters=4).orderBy("node")


@register(
    "scd2_user_state",
    """
    WITH s AS (
      SELECT user_id, event_type, epoch_us(ts) ts_us, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) prev
      FROM events),
    c AS (SELECT user_id, event_type, ts_us, event_id FROM s
          WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id, event_type,
           ts_us AS valid_from_us,
           lead(ts_us) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id) AS valid_to_us,
           lead(ts_us) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id) IS NULL AS is_current
    FROM c
    ORDER BY user_id, valid_from_us
    """,
)
def scd2_user_state_q(spark, sf_dir):
    """SCD type-2 dimension history from the event stream: per user,
    validity intervals of their event-type state (no-op repeats
    collapsed, ``valid_to`` = next change, open interval = current
    row).  One key shuffle, two windows over the reused exchange —
    the metadata-table build every incremental 100 TB pipeline
    maintains.  Timestamps compared as epoch micros."""
    from ..ops.temporal import scd2_intervals

    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    out = scd2_intervals(ev, "user_id", "ts_us", "event_type", "event_id")
    return out.select(
        "user_id",
        "event_type",
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "is_current",
    ).orderBy("user_id", "valid_from_us")


def _kcore_oracle(k: int, rounds: int) -> str:
    sql = """
    WITH e AS (SELECT DISTINCT 'c:' || o_custkey u, 'p:' || l_partkey v
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    a0 AS MATERIALIZED (SELECT u, v FROM e)"""
    for r in range(rounds):
        sql += f""",
    d{r} AS (SELECT node, count(*) deg
             FROM (SELECT u node FROM a{r} UNION ALL SELECT v FROM a{r})
             GROUP BY node),
    kp{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k}),
    a{r + 1} AS MATERIALIZED (
      SELECT u, v FROM a{r}
      WHERE u IN (SELECT node FROM kp{r}) AND v IN (SELECT node FROM kp{r}))"""
    sql += f"""
    SELECT node, CAST(count(*) AS BIGINT) core_degree
    FROM (SELECT u node FROM a{rounds} UNION ALL SELECT v FROM a{rounds})
    GROUP BY node HAVING count(*) >= {k}
    ORDER BY node
    """
    return sql


@register("customer_part_kcore", _kcore_oracle(22, 6))
def customer_part_kcore_q(spark, sf_dir):
    """22-core of the bipartite customer–part interaction graph after
    6 peeling rounds: the densely-connected purchasing backbone (the
    subgraph worth full candidate enumeration when budgeting blocks).
    Deterministic synchronous peeling; oracle = unrolled per-round
    CTEs."""
    from ..ops.graph import k_core

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # tagged-bigint node ids through the peeling rounds (the pagerank
    # lane); decode to the oracle's c:/p: strings at output only
    TAG = _NODE_TAG_SHIFT
    edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        _tag_node(1, "o_custkey").alias("a"),
        _tag_node(3, "l_partkey").alias("b"),
    )
    kc = k_core(edges, k=22, rounds=6)
    return kc.select(
        F.concat(
            F.when(F.expr(f"node DIV {TAG}") == 1, F.lit("c:")).otherwise(F.lit("p:")),
            (F.col("node") % TAG).cast("string"),
        ).alias("node"),
        *[c for c in kc.columns if c != "node"],
    ).orderBy("node")


def _fk_oracle_one(name: str, child: str, ck: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{name}' relation,
           (SELECT CAST(count(*) AS BIGINT) FROM {child}) n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM {child} WHERE {ck} IS NULL) n_null_key,
           (SELECT CAST(count(*) AS BIGINT) FROM {child}
            WHERE {ck} IS NOT NULL
              AND {ck} NOT IN (SELECT {pk} FROM {parent} WHERE {pk} IS NOT NULL)) n_orphans,
           CAST(round((1000000.0 * (
               (SELECT count(*) FROM {child} WHERE {ck} IS NULL)
             + (SELECT count(*) FROM {child}
                WHERE {ck} IS NOT NULL
                  AND {ck} NOT IN (SELECT {pk} FROM {parent} WHERE {pk} IS NOT NULL))))
             / (SELECT count(*) FROM {child})) AS BIGINT) violation_ppm
    """


_FK_RELATIONS = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


@register(
    "referential_integrity_audit",
    " UNION ALL ".join(_fk_oracle_one(*r) for r in _FK_RELATIONS) + " ORDER BY relation",
)
def referential_integrity_audit_q(spark, sf_dir):
    """Whole-schema foreign-key audit: per relation, row count, NULL
    keys, orphaned keys (anti-join against the parent), violation rate
    in ppm — the pre-flight data-quality gate an ingest pipeline runs
    before joining 100 TB of facts against dimensions.  One anti-join
    + aggregates per relation, all lazy, unioned into one result."""
    from ..ops.audit import fk_violations
    from functools import reduce

    tables = {
        n: _t(spark, sf_dir, n)
        for n in ("lineitem", "orders", "part", "supplier", "customer", "nation", "region")
    }
    parts = [
        fk_violations(tables[child], ck, tables[parent], pk, name)
        for name, child, ck, parent, pk in _FK_RELATIONS
    ]
    return reduce(lambda a, b: a.unionAll(b), parts).orderBy("relation")


@register(
    "table_column_profile",
    """
    WITH a AS (
      SELECT CAST(count(*) AS BIGINT) n,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) nl1,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) nd1,
             min(CAST(o_orderkey AS VARCHAR)) mn1, max(CAST(o_orderkey AS VARCHAR)) mx1,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) nl2,
             CAST(count(DISTINCT o_custkey) AS BIGINT) nd2,
             min(CAST(o_custkey AS VARCHAR)) mn2, max(CAST(o_custkey AS VARCHAR)) mx2,
             CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) nl3,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) nd3,
             min(CAST(o_orderstatus AS VARCHAR)) mn3, max(CAST(o_orderstatus AS VARCHAR)) mx3,
             CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) nl4,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT) nd4,
             min(CAST(o_orderpriority AS VARCHAR)) mn4, max(CAST(o_orderpriority AS VARCHAR)) mx4
      FROM orders)
    SELECT 'o_orderkey' "column", n n_rows, nl1 n_null, nd1 n_distinct, mn1 min_value, mx1 max_value FROM a
    UNION ALL SELECT 'o_custkey', n, nl2, nd2, mn2, mx2 FROM a
    UNION ALL SELECT 'o_orderstatus', n, nl3, nd3, mn3, mx3 FROM a
    UNION ALL SELECT 'o_orderpriority', n, nl4, nd4, mn4, mx4 FROM a
    ORDER BY "column"
    """,
)
def table_column_profile_q(spark, sf_dir):
    """One-pass column profiling of ``orders`` (key, FK, categorical
    columns): nulls, exact distincts, min/max — the schema health
    snapshot a pipeline records per ingest batch.  Single aggregate
    (Spark multi-distinct expand), long-format output."""
    from ..ops.audit import column_profile

    return column_profile(
        _t(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    ).orderBy("column")


@register(
    "corpus_snapshot_diff",
    """
    WITH old AS (
      SELECT doc_id id,
             md5(concat_ws(chr(1),
                 COALESCE(CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END,
                          chr(0) || 'null'),
                 COALESCE(source, chr(0) || 'null'))) fp
      FROM documents WHERE doc_id % 7 <> 0),
    new AS (
      SELECT doc_id id,
             md5(concat_ws(chr(1), COALESCE(text, chr(0) || 'null'),
                           COALESCE(source, chr(0) || 'null'))) fp
      FROM documents WHERE doc_id % 5 <> 0)
    SELECT COALESCE(old.id, new.id) id,
           CASE WHEN old.fp IS NULL THEN 'added'
                WHEN new.fp IS NULL THEN 'removed'
                WHEN old.fp <> new.fp THEN 'modified'
                ELSE 'unchanged' END status
    FROM old FULL OUTER JOIN new ON old.id = new.id
    ORDER BY id
    """,
)
def corpus_snapshot_diff_q(spark, sf_dir):
    """Dataset-versioning diff between two corpus snapshots (simulated
    from ``documents``: the old snapshot misses ids ≡0 mod 7 and
    upper-cases text for ids ≡0 mod 11; the new one misses ids ≡0 mod
    5): every id classified added/removed/modified/unchanged via full
    outer join on id + content md5 fingerprint.  Downstream curation
    re-processes only added+modified — the incremental-corpus
    primitive."""
    from ..ops.audit import snapshot_diff

    docs = _t(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.upper("text")).otherwise(F.col("text")).alias("text"),
        "source",
    )
    new = docs.where(F.col("doc_id") % 5 != 0).select("doc_id", "text", "source")
    return snapshot_diff(old, new, "doc_id", ["text", "source"]).orderBy("id")


_CDC_POWERS = "[" + ", ".join(str(31**j) for j in range(8)) + "]"


@register(
    "cdc_chunk_dedup",
    f"""
    WITH cuts AS (
      SELECT doc_id id, text,
             list_concat(list_concat([0],
               list_filter(generate_series(8, length(text)),
                 i -> i < length(text) AND
                      list_sum(list_transform(generate_series(0, 7),
                        j -> CAST(ord(substr(text, i - j, 1)) AS BIGINT)
                             * ({_CDC_POWERS}[j + 1]))) % 64 = 0)),
               [length(text)]) cuts
      FROM documents WHERE length(text) > 0),
    ch AS (
      SELECT id, md5(unnest(list_transform(generate_series(1, len(cuts) - 1),
                     k -> substr(text, cuts[k] + 1, cuts[k + 1] - cuts[k])))) ch
      FROM cuts),
    dfreq AS (SELECT ch, count(DISTINCT id) df FROM ch GROUP BY ch),
    per AS (
      SELECT id, CAST(count(*) AS BIGINT) n_chunks,
             CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) n_shared_chunks
      FROM ch JOIN dfreq USING (ch) GROUP BY id)
    SELECT id, n_chunks, n_shared_chunks,
           CAST(round((1000000.0 * n_shared_chunks) / n_chunks) AS BIGINT) shared_ppm
    FROM per ORDER BY id
    """,
)
def cdc_chunk_dedup_q(spark, sf_dir):
    """Content-defined chunking dedup audit: rolling-hash boundaries
    (8-char window, ~64-char average chunks) split every document
    into shift-robust chunks; per doc, how many of its chunks also
    occur in other documents.  The rsync/LBFS primitive — unlike
    fixed shingles, an insertion only perturbs boundaries near the
    edit, so unaffected chunks keep their identity.  Boundary
    computation is one codegen array projection; shuffles: chunk
    frequency + join-back."""
    from ..ops.dedup import cdc_chunk_stats

    return cdc_chunk_stats(_t(spark, sf_dir, "documents")).orderBy("id")


