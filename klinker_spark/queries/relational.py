"""Query registrations: relational family (split from the original single-file registry; registration order preserved by package import order in __init__)."""
from __future__ import annotations
from ._core import BlockManager, EntityFrame, F, MinHashLSHBlocker, StandardBlocker, TokenBlocker, UniqueNameBlocker, Window, _STOP_SQL, _cust_frame, _explode_blocks, _supp_frame, _t, clean_rdf_datatype, local_df, melt, qgrams, register

# ------------------------------------------------------------------ S/J/A: standard blocking
@register(
    "standard_blocking",
    """
    SELECT CAST(c_nationkey AS VARCHAR) AS block_key,
           CAST(c_custkey AS VARCHAR) AS left_id,
           CAST(s_suppkey AS VARCHAR) AS right_id
    FROM customer JOIN supplier ON c_nationkey = s_nationkey
    """,
)
def standard_blocking(spark, sf_dir):
    """J1+A1 via StandardBlocker on the nation key (SURVEY §2.3 J1)."""
    left = EntityFrame.from_wide(
        _t(spark, sf_dir, "customer"), "customer", "c_custkey", ["c_nationkey"]
    )
    right = EntityFrame.from_wide(
        _t(spark, sf_dir, "supplier"), "supplier", "s_suppkey", ["s_nationkey"]
    )
    left = left.with_attrs(left.attrs.withColumn("prop", F.lit("nation")))
    right = right.with_attrs(right.attrs.withColumn("prop", F.lit("nation")))
    return _explode_blocks(StandardBlocker("nation").assign(left, right))


@register(
    "standard_blocking_stats",
    """
    WITH l AS (SELECT CAST(c_nationkey AS VARCHAR) block_key, count(DISTINCT c_custkey) left_size
               FROM customer GROUP BY 1),
         r AS (SELECT CAST(s_nationkey AS VARCHAR) block_key, count(DISTINCT s_suppkey) right_size
               FROM supplier GROUP BY 1)
    SELECT l.block_key, left_size, right_size,
           left_size + right_size AS assignments,
           left_size * right_size AS comparisons
    FROM l JOIN r USING (block_key)
    """,
)
def standard_blocking_stats(spark, sf_dir):
    """A7 per-block stats on the same blocking."""
    left = EntityFrame.from_wide(
        _t(spark, sf_dir, "customer"), "customer", "c_custkey", ["c_nationkey"]
    )
    right = EntityFrame.from_wide(
        _t(spark, sf_dir, "supplier"), "supplier", "s_suppkey", ["s_nationkey"]
    )
    left = left.with_attrs(left.attrs.withColumn("prop", F.lit("nation")))
    right = right.with_attrs(right.attrs.withColumn("prop", F.lit("nation")))
    return StandardBlocker("nation").assign(left, right).with_sizes()


_TOKENS_SQL = """
    WITH lt AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) id, tok FROM (
            SELECT c_custkey, unnest(regexp_split_to_array(lower(c_name), '[^a-z0-9]+')) tok
            FROM customer)
          WHERE length(tok) >= 3 AND tok NOT IN ({stop})),
         rt AS (SELECT DISTINCT CAST(s_suppkey AS VARCHAR) id, tok FROM (
            SELECT s_suppkey, unnest(regexp_split_to_array(lower(s_name), '[^a-z0-9]+')) tok
            FROM supplier)
          WHERE length(tok) >= 3 AND tok NOT IN ({stop}))
"""


@register(
    "token_blocking",
    _TOKENS_SQL.format(stop=_STOP_SQL)
    + """
    SELECT lt.tok AS block_key, lt.id AS left_id, rt.id AS right_id
    FROM lt JOIN rt ON lt.tok = rt.tok
    """,
)
def token_blocking(spark, sf_dir):
    """P5→A1→J1: TokenBlocker over entity names (SURVEY §3.2)."""
    bm = TokenBlocker().assign(_cust_frame(spark, sf_dir), _supp_frame(spark, sf_dir))
    return _explode_blocks(bm)


@register(
    "qgram_blocking_stats",
    """
    WITH lg AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) id, q FROM (
            SELECT c_custkey, c_name, unnest(generate_series(1, length(c_name)-2)) i FROM customer
         ) g CROSS JOIN LATERAL (SELECT substr(c_name, i, 3) q)),
         rg AS (SELECT DISTINCT CAST(s_suppkey AS VARCHAR) id, q FROM (
            SELECT s_suppkey, s_name, unnest(generate_series(1, length(s_name)-2)) i FROM supplier
         ) g CROSS JOIN LATERAL (SELECT substr(s_name, i, 3) q)),
         lb AS (SELECT q block_key, count(*) left_size FROM lg GROUP BY 1),
         rb AS (SELECT q block_key, count(*) right_size FROM rg GROUP BY 1)
    SELECT block_key, left_size, right_size FROM lb JOIN rb USING (block_key)
    """,
)
def qgram_blocking_stats(spark, sf_dir):
    """P6: q-gram blocking on names; per-block sizes (pairs would be
    quadratic on shared grams — stats check the same dataflow)."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("id"),
        F.explode(qgrams(F.col("c_name"), 3)).alias("block_key"),
    ).distinct()
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("string").alias("id"),
        F.explode(qgrams(F.col("s_name"), 3)).alias("block_key"),
    ).distinct()
    lb = cust.groupBy("block_key").agg(F.count("*").alias("left_size"))
    rb = supp.groupBy("block_key").agg(F.count("*").alias("right_size"))
    return lb.join(rb, "block_key")


@register(
    "unique_name_blocking",
    """
    WITH l AS (SELECT CAST(o_custkey AS VARCHAR) block_key,
                      CAST(min(o_orderkey) AS VARCHAR) left_id
               FROM orders GROUP BY o_custkey HAVING count(DISTINCT o_orderkey) = 1),
         r AS (SELECT CAST(c_custkey AS VARCHAR) block_key,
                      CAST(c_custkey AS VARCHAR) right_id
               FROM customer)
    SELECT block_key, left_id, right_id FROM l JOIN r USING (block_key)
    """,
)
def unique_name_blocking(spark, sf_dir):
    """J2/A10: UniqueNameBlocker — orders whose customer is referenced
    by exactly one order, joined to that customer by key value."""
    orders = _t(spark, sf_dir, "orders")
    left = EntityFrame.from_triples(
        orders.select(
            F.col("o_orderkey").alias("head"),
            F.lit("custkey").alias("rel"),
            F.col("o_custkey").alias("tail"),
        ),
        "orders",
    )
    cust = _t(spark, sf_dir, "customer")
    right = EntityFrame.from_triples(
        cust.select(
            F.col("c_custkey").alias("head"),
            F.lit("custkey").alias("rel"),
            F.col("c_custkey").alias("tail"),
        ),
        "customer",
    )
    return _explode_blocks(UniqueNameBlocker().assign(left, right))


# ------------------------------------------------------------------ P: projections / transforms
@register(
    "concat_values",
    """
    WITH m AS (
      SELECT CAST(c_custkey AS VARCHAR) id, c_name v FROM customer
      UNION ALL SELECT CAST(c_custkey AS VARCHAR), c_mktsegment FROM customer
      UNION ALL SELECT CAST(c_custkey AS VARCHAR), CAST(c_nationkey AS VARCHAR) FROM customer
      UNION ALL SELECT CAST(c_custkey AS VARCHAR), CAST(CAST(trunc(c_acctbal) AS BIGINT) AS VARCHAR) FROM customer
    )
    SELECT id, string_agg(v, ' ' ORDER BY v) AS text
    FROM (SELECT DISTINCT id, v FROM m) GROUP BY id
    """,
)
def concat_values(spark, sf_dir):
    """P2/P3: wide→EAV melt + per-entity sorted-set concat."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.col("c_nationkey").cast("string").alias("nation"),
        F.col("c_acctbal").cast("bigint").cast("string").alias("acct"),
    )
    frame = EntityFrame.from_wide(cust, "customer", "c_custkey")
    return frame.concat_values()


@register(
    "rdf_clean",
    """
    SELECT CAST(c_custkey AS VARCHAR) id,
           split_part(c_name || '^^xsd:string', '^^', 1) AS cleaned
    FROM customer
    """,
)
def rdf_clean(spark, sf_dir):
    """S2: strip RDF datatype suffixes."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("id"),
        clean_rdf_datatype(F.concat(F.col("c_name"), F.lit("^^xsd:string"))).alias("cleaned"),
    )


@register(
    "sample_dataset",
    """
    WITH ids AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
    SELECT CAST(o_orderkey AS VARCHAR) id
    FROM orders WHERE o_custkey IN (SELECT c_custkey FROM ids)
    """,
)
def sample_dataset(spark, sf_dir):
    """P9 (deterministic modulo variant): sample entity ids, semi-join
    the dependent frame.  The engine's hash-based ``Dataset.sample``
    has the same plan shape; modulo keeps the oracle exact."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 10 == 0)
    orders = _t(spark, sf_dir, "orders")
    ids = cust.select(F.col("c_custkey").alias("o_custkey"))
    return orders.join(ids, "o_custkey", "left_semi").select(
        F.col("o_orderkey").cast("string").alias("id")
    )


@register(
    "filter_with_unique",
    """
    WITH uniq AS (SELECT min(o_orderkey) ok FROM orders
                  GROUP BY o_custkey HAVING count(DISTINCT o_orderkey) = 1)
    SELECT CAST(o_orderkey AS VARCHAR) id FROM orders
    WHERE o_orderkey NOT IN (SELECT ok FROM uniq)
    """,
)
def filter_with_unique(spark, sf_dir):
    """P10: anti-join entities covered by unique-name blocks."""
    from ..blockers.composite import filter_with_unique as fwu

    orders = _t(spark, sf_dir, "orders")
    left = EntityFrame.from_triples(
        orders.select(
            F.col("o_orderkey").alias("head"),
            F.lit("custkey").alias("rel"),
            F.col("o_custkey").alias("tail"),
        ),
        "orders",
    )
    cust = _t(spark, sf_dir, "customer")
    right = EntityFrame.from_triples(
        cust.select(
            F.col("c_custkey").alias("head"),
            F.lit("custkey").alias("rel"),
            F.col("c_custkey").alias("tail"),
        ),
        "customer",
    )
    unique = UniqueNameBlocker().assign(left, right)
    rest = fwu(left.attrs, unique, "orders")
    return rest.select("id").distinct()


# ------------------------------------------------------------------ A: relational aggregates
@register(
    "count_entities",
    """
    SELECT count(*) AS n FROM (
      SELECT CAST(c_custkey AS VARCHAR) e FROM customer
      UNION SELECT CAST(o_orderkey AS VARCHAR) FROM orders
      UNION SELECT CAST(o_custkey AS VARCHAR) FROM orders
    )
    """,
)
def count_entities_q(spark, sf_dir):
    """A3: distinct entities over attrs ∪ rel heads ∪ rel tails."""
    from ..blockers.relation_aware import count_entities

    attrs = melt(_t(spark, sf_dir, "customer"), "c_custkey", ["c_name"])
    rels = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("head"),
        F.lit("placed_by").alias("rel"),
        F.col("o_custkey").cast("string").alias("tail"),
    )
    n = count_entities(attrs, rels)
    return local_df(spark, [(n,)], "n bigint")


@register(
    "relation_importance",
    """
    WITH rels AS (SELECT CAST(l_orderkey AS VARCHAR) head, l_returnflag rel,
                         CAST(l_partkey AS VARCHAR) tail FROM lineitem),
         n AS (SELECT count(*) c FROM (SELECT head e FROM rels UNION SELECT tail FROM rels)),
         counted AS (SELECT rel, count(rel) rel_count, count(tail) tail_count
                     FROM rels GROUP BY rel)
    SELECT rel, rel_count, tail_count,
           round(2 * ((rel_count / (c*c*1.0)) * (tail_count*1.0/rel_count))
                   / ((rel_count / (c*c*1.0)) + (tail_count*1.0/rel_count)), 6) AS importance
    FROM counted, n
    """,
)
def relation_importance_q(spark, sf_dir):
    """A4 on lineitem FK edges (rel = returnflag)."""
    from ..blockers.relation_aware import relation_importance

    rels = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("head"),
        F.col("l_returnflag").alias("rel"),
        F.col("l_partkey").cast("string").alias("tail"),
    )
    n = rels.select(F.col("head").alias("e")).union(rels.select("tail")).distinct().count()
    counted = rels.groupBy("rel").agg(
        F.count("rel").alias("rel_count"), F.count("tail").alias("tail_count")
    )
    imp = relation_importance(rels, n).withColumn("importance", F.round("importance", 6))
    return counted.join(imp, "rel")


@register(
    "name_importance",
    """
    WITH attrs AS (
      SELECT CAST(c_custkey AS VARCHAR) id, 'c_name' prop, c_name v FROM customer
      UNION ALL SELECT CAST(c_custkey AS VARCHAR), 'c_mktsegment', c_mktsegment FROM customer
    ),
    n AS (SELECT count(DISTINCT id) c FROM attrs),
    counted AS (SELECT prop, count(id) head_count, count(prop) rel_count, count(v) tail_count
                FROM attrs GROUP BY prop)
    SELECT prop, head_count,
           round(2 * ((head_count*1.0/c) * (tail_count*1.0/rel_count))
                   / ((head_count*1.0/c) + (tail_count*1.0/rel_count)), 6) AS importance
    FROM counted, n
    """,
)
def name_importance_q(spark, sf_dir):
    """A5 on the customer attribute melt."""
    from ..blockers.relation_aware import name_importance

    attrs = melt(_t(spark, sf_dir, "customer"), "c_custkey", ["c_name", "c_mktsegment"])
    n = attrs.select("id").distinct().count()
    counted = attrs.groupBy("prop").agg(F.count("id").alias("head_count"))
    imp = name_importance(attrs, n).withColumn("importance", F.round("importance", 6))
    return counted.join(imp, "prop")


@register(
    "top_n_filter",
    """
    WITH ranked AS (
      SELECT s_nationkey, s_suppkey, s_acctbal,
             dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) r
      FROM supplier)
    SELECT CAST(s_nationkey AS VARCHAR) nation, CAST(s_suppkey AS VARCHAR) supplier_id,
           CAST(round(s_acctbal * 100) AS BIGINT) acctbal_cents
    FROM ranked WHERE r <= 2
    """,
)
def top_n_filter(spark, sf_dir):
    """W1: dense-rank top-n per group (top-2 suppliers per nation)."""
    supp = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    return (
        supp.withColumn("r", F.dense_rank().over(w))
        .where(F.col("r") <= 2)
        .select(
            F.col("s_nationkey").cast("string").alias("nation"),
            F.col("s_suppkey").cast("string").alias("supplier_id"),
            F.round(F.col("s_acctbal") * 100).cast("bigint").alias("acctbal_cents"),
        )
    )


@register(
    "neighbor_concat",
    """
    WITH order_blob AS (
      SELECT 'o' || CAST(o_orderkey AS VARCHAR) oid, o_custkey,
             string_agg(v, ' ' ORDER BY v) blob
      FROM (SELECT DISTINCT o_orderkey, o_custkey, v FROM (
              SELECT o_orderkey, o_custkey, o_orderpriority v FROM orders
              UNION ALL SELECT o_orderkey, o_custkey, o_orderstatus FROM orders))
      GROUP BY 1, 2),
    own_blob AS (
      SELECT 'c' || CAST(c_custkey AS VARCHAR) cid, c_mktsegment blob FROM customer),
    all_blobs AS (
      SELECT cid, blob FROM own_blob
      UNION SELECT 'c' || CAST(o_custkey AS VARCHAR), blob FROM order_blob)
    SELECT cid AS id, string_agg(blob, ' ' ORDER BY blob) AS text
    FROM (SELECT DISTINCT cid, blob FROM all_blobs) GROUP BY cid
    """,
)
def neighbor_concat(spark, sf_dir):
    """E3/J3: concat_neighbor_attributes over the customer→order FK
    graph (customers enriched with their orders' priority/status)."""
    from ..blockers.relation_aware import concat_neighbor_attributes

    cust = _t(spark, sf_dir, "customer").select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("id"), "c_mktsegment"
    )
    orders = _t(spark, sf_dir, "orders")
    order_attrs = melt(
        orders.select(
            F.concat(F.lit("o"), F.col("o_orderkey")).alias("id"),
            "o_orderpriority",
            "o_orderstatus",
        ),
        "id",
    )
    attrs = melt(cust, "id").unionByName(order_attrs)
    rels = orders.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("head"),
        F.lit("placed").alias("rel"),
        F.concat(F.lit("o"), F.col("o_orderkey")).alias("tail"),
    )
    conc = concat_neighbor_attributes(EntityFrame(attrs, "g"), rels, include_own_attributes=True)
    return conc.where(F.col("id").startswith("c"))


# ------------------------------------------------------------------ J/U/W: combine, purge, eval
@register(
    "blocks_combine",
    """
    SELECT DISTINCT CAST(c_custkey AS VARCHAR) left_id, CAST(s_suppkey AS VARCHAR) right_id
    FROM customer JOIN supplier ON c_nationkey = s_nationkey
    UNION
    SELECT DISTINCT CAST(c_custkey AS VARCHAR), CAST(s_suppkey AS VARCHAR)
    FROM customer JOIN supplier
      ON CAST(floor(c_acctbal / 1000) AS BIGINT) = CAST(floor(s_acctbal / 1000) AS BIGINT)
    """,
)
def blocks_combine(spark, sf_dir):
    """J5/U2/U3: combine two blockings; candidate-set union semantics
    surfaced as the distinct exploded pair view."""
    cust, supp = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")

    def frames(key_l, key_r):
        left = EntityFrame.from_triples(
            cust.select(F.col("c_custkey").alias("head"), F.lit("k").alias("rel"), key_l.alias("tail")),
            "customer",
        )
        right = EntityFrame.from_triples(
            supp.select(F.col("s_suppkey").alias("head"), F.lit("k").alias("rel"), key_r.alias("tail")),
            "supplier",
        )
        return StandardBlocker("k").assign(left, right)

    by_nation = frames(F.col("c_nationkey"), F.col("s_nationkey"))
    by_bucket = frames(
        F.floor(F.col("c_acctbal") / 1000).cast("bigint"),
        F.floor(F.col("s_acctbal") / 1000).cast("bigint"),
    )
    combined = by_nation.combine(
        BlockManager(
            by_bucket.df.withColumn("block_key", F.concat(F.lit("b_"), F.col("block_key"))),
            "customer",
            "supplier",
        )
    )
    return combined.pairs(distinct=True)


@register(
    "all_pairs_multiplicity",
    """
    WITH p AS (
      SELECT CAST(c_custkey AS VARCHAR) left_id, CAST(s_suppkey AS VARCHAR) right_id
      FROM customer JOIN supplier ON c_nationkey = s_nationkey
      UNION ALL
      SELECT CAST(c_custkey AS VARCHAR), CAST(s_suppkey AS VARCHAR)
      FROM customer JOIN supplier
        ON CAST(floor(c_acctbal / 1000) AS BIGINT) = CAST(floor(s_acctbal / 1000) AS BIGINT)
    )
    SELECT left_id, right_id, count(*) AS n_blocks FROM p GROUP BY 1, 2
    """,
)
def all_pairs_multiplicity(spark, sf_dir):
    """E10 duplicate-pair semantics: pairs(distinct=False) multiplicity
    across stacked block tables (SURVEY §4 delta 2)."""
    cust, supp = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    lb1 = cust.select(F.col("c_nationkey").cast("string").alias("block_key"), F.col("c_custkey").cast("string").alias("id"))
    rb1 = supp.select(F.col("s_nationkey").cast("string").alias("block_key"), F.col("s_suppkey").cast("string").alias("id"))
    lb2 = cust.select(F.concat(F.lit("b_"), F.floor(F.col("c_acctbal") / 1000).cast("bigint")).alias("block_key"), F.col("c_custkey").cast("string").alias("id"))
    rb2 = supp.select(F.concat(F.lit("b_"), F.floor(F.col("s_acctbal") / 1000).cast("bigint")).alias("block_key"), F.col("s_suppkey").cast("string").alias("id"))
    bm1 = BlockManager.from_key_assignments(lb1, rb1, "customer", "supplier")
    bm2 = BlockManager.from_key_assignments(lb2, rb2, "customer", "supplier")
    stacked = BlockManager(bm1.df.unionByName(bm2.df), "customer", "supplier")
    return stacked.pairs(distinct=False).groupBy("left_id", "right_id").agg(
        F.count("*").alias("n_blocks")
    )


@register(
    "purge_blocks",
    _TOKENS_SQL.format(stop=_STOP_SQL)
    + """
    , lb AS (SELECT tok block_key, count(DISTINCT id) left_size FROM lt GROUP BY 1),
      rb AS (SELECT tok block_key, count(DISTINCT id) right_size FROM rt GROUP BY 1),
      sized AS (SELECT block_key, left_size, right_size,
                       left_size + right_size AS assignments,
                       left_size * right_size AS comparisons
                FROM lb JOIN rb USING (block_key)),
      cum AS (SELECT *,
                sum(assignments) OVER w AS cum_assign,
                sum(comparisons) OVER w AS cum_comp,
                lag(comparisons) OVER (ORDER BY comparisons, block_key) AS prev_card
              FROM sized
              WINDOW w AS (ORDER BY comparisons, block_key
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      cc AS (SELECT *, round(cum_assign * 1.0 / cum_comp, 2) AS cc_val FROM cum),
      cc2 AS (SELECT *, lag(cc_val) OVER (ORDER BY comparisons, block_key) AS prev_cc FROM cc),
      thresh AS (SELECT coalesce(min(comparisons), 4611686018427387904) t FROM cc2
                 WHERE cc_val = prev_cc AND comparisons > prev_card)
    SELECT block_key, left_size, right_size, comparisons
    FROM sized, thresh WHERE comparisons <= t
    """,
)
def purge_blocks(spark, sf_dir):
    """W2: cumulative-CC purge over the token blocking."""
    bm = TokenBlocker().assign(_cust_frame(spark, sf_dir), _supp_frame(spark, sf_dir))
    purged = bm.purge(cc_round=2)
    return purged.with_sizes().select("block_key", "left_size", "right_size", "comparisons")


@register(
    "eval_metrics",
    """
    WITH pairs AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) l, CAST(s_suppkey AS VARCHAR) r
                   FROM customer JOIN supplier ON c_nationkey = s_nationkey),
         gold AS (SELECT CAST(c_custkey AS VARCHAR) l, CAST(s_suppkey AS VARCHAR) r
                  FROM customer JOIN supplier ON c_custkey = 10 * s_suppkey),
         counts AS (SELECT
             (SELECT count(*) FROM pairs JOIN gold USING (l, r)) tp,
             (SELECT count(*) FROM pairs) np,
             (SELECT count(*) FROM gold) ng,
             (SELECT count(*) FROM customer) nl,
             (SELECT count(*) FROM supplier) nr)
    SELECT tp, np - tp AS fp, ng - tp AS fn, np AS comparisons,
           round(tp * 1.0 / ng, 6) AS recall,
           round(tp * 1.0 / np, 6) AS precision,
           round(CASE WHEN tp = 0 THEN 0 ELSE 2.0 * (tp*1.0/ng) * (tp*1.0/np)
                 / ((tp*1.0/ng) + (tp*1.0/np)) END, 6) AS f_measure,
           round(1.0 - np * 1.0 / (nl * nr), 6) AS reduction_ratio,
           round(CASE WHEN tp = 0 THEN 0 ELSE
                 2.0 * (1.0 - np*1.0/(nl*nr)) * (tp*1.0/ng)
                 / ((1.0 - np*1.0/(nl*nr)) + (tp*1.0/ng)) END, 6) AS h3r
    FROM counts
    """,
)
def eval_metrics(spark, sf_dir):
    """E7/E8/J9/A9: full evaluation as join-counts against synthetic
    gold (custkey = 10·suppkey)."""
    from ..eval import Evaluation

    cust, supp = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    left = EntityFrame.from_triples(
        cust.select(F.col("c_custkey").alias("head"), F.lit("k").alias("rel"), F.col("c_nationkey").alias("tail")),
        "customer",
    )
    right = EntityFrame.from_triples(
        supp.select(F.col("s_suppkey").alias("head"), F.lit("k").alias("rel"), F.col("s_nationkey").alias("tail")),
        "supplier",
    )
    bm = StandardBlocker("k").assign(left, right)
    gold = cust.join(supp, cust.c_custkey == 10 * supp.s_suppkey).select(
        F.col("c_custkey").cast("string"), F.col("s_suppkey").cast("string")
    )
    ev = Evaluation.from_blocks(bm, gold, left_count=cust, right_count=supp)
    d = ev.to_dict()
    row = (
        d["true_positives"],
        d["false_positives"],
        d["false_negatives"],
        d["comparisons"],
        round(d["recall"], 6),
        round(d["precision"], 6),
        round(d["f_measure"], 6),
        round(d["reduction_ratio"], 6),
        round(d["h3r"], 6),
    )
    return local_df(
        spark,
        [row],
        "tp bigint, fp bigint, fn bigint, comparisons bigint, recall double, "
        "precision double, f_measure double, reduction_ratio double, h3r double",
    )


@register(
    "compare_blockings",
    """
    WITH pa AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) l, CAST(s_suppkey AS VARCHAR) r
                FROM customer JOIN supplier ON c_nationkey = s_nationkey),
         pb AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) l, CAST(s_suppkey AS VARCHAR) r
                FROM customer JOIN supplier ON c_custkey % 7 = s_suppkey % 7),
         gold AS (SELECT CAST(c_custkey AS VARCHAR) l, CAST(s_suppkey AS VARCHAR) r
                  FROM customer JOIN supplier ON c_custkey = 10 * s_suppkey),
         ta AS (SELECT l, r FROM pa INTERSECT SELECT l, r FROM gold),
         tb AS (SELECT l, r FROM pb INTERSECT SELECT l, r FROM gold),
         tc AS (SELECT l, r FROM ta INTERSECT SELECT l, r FROM tb),
         c AS (SELECT (SELECT count(*) FROM ta) na, (SELECT count(*) FROM tb) nb,
                      (SELECT count(*) FROM tc) nc, (SELECT count(*) FROM gold) ng)
    SELECT na AS tp_a, nb AS tp_b, nc AS tp_common,
           round(CASE WHEN na + nb = 0 THEN 0 ELSE 2.0 * nc / (na + nb) END, 6) AS tp_dice,
           na - nc AS only_a, nb - nc AS only_b,
           round(na * 1.0 / ng, 6) AS recall_a, round(nb * 1.0 / ng, 6) AS recall_b,
           round((na + nb - nc) * 1.0 / ng, 6) AS combined_recall
    FROM c
    """,
)
def compare_blockings_q(spark, sf_dir):
    """E9: dice overlap / exclusive TPs / combined recall of two
    blockings (nation-key vs key-mod-7 standard blocking) against the
    synthetic gold — all join-counts, no driver pair sets."""
    from ..eval import compare_blockings

    cust, supp = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")

    def blocks(lcols_df, rcols_df, key):
        left = EntityFrame.from_wide(lcols_df, "customer", "c_custkey", [key + "_l"])
        right = EntityFrame.from_wide(rcols_df, "supplier", "s_suppkey", [key + "_r"])
        left = left.with_attrs(left.attrs.withColumn("prop", F.lit(key)))
        right = right.with_attrs(right.attrs.withColumn("prop", F.lit(key)))
        return StandardBlocker(key).assign(left, right)

    bm_a = blocks(
        cust.withColumn("nat_l", F.col("c_nationkey").cast("string")),
        supp.withColumn("nat_r", F.col("s_nationkey").cast("string")),
        "nat",
    )
    bm_b = blocks(
        cust.withColumn("k7_l", (F.col("c_custkey") % 7).cast("string")),
        supp.withColumn("k7_r", (F.col("s_suppkey") % 7).cast("string")),
        "k7",
    )
    gold = cust.join(supp, cust.c_custkey == 10 * supp.s_suppkey).select(
        F.col("c_custkey").cast("string"), F.col("s_suppkey").cast("string")
    )
    d = compare_blockings(bm_a, bm_b, gold)
    row = (
        d["tp_a"],
        d["tp_b"],
        d["tp_common"],
        round(d["tp_dice"], 6),
        d["only_a"],
        d["only_b"],
        round(d["recall_a"], 6),
        round(d["recall_b"], 6),
        round(d["combined_recall"], 6),
    )
    return local_df(
        spark,
        [row],
        "tp_a bigint, tp_b bigint, tp_common bigint, tp_dice double, only_a bigint, "
        "only_b bigint, recall_a double, recall_b double, combined_recall double",
    )


@register(
    "find_blocks",
    _TOKENS_SQL.format(stop=_STOP_SQL)
    + """
    SELECT lt.tok AS block_key FROM lt JOIN rt ON lt.tok = rt.tok
    WHERE lt.id = '42' GROUP BY 1
    """,
)
def find_blocks(spark, sf_dir):
    """E11: blocks containing a given entity."""
    bm = TokenBlocker().assign(_cust_frame(spark, sf_dir), _supp_frame(spark, sf_dir))
    return bm.find_blocks("42", side="customer").select("block_key")


# ------------------------------------------------------------------ similarity blockers
@register("minhash_lsh_blocking")
def minhash_lsh_blocking(spark, sf_dir):
    """J7: MinHash-LSH blocker on entity names.  Banding uses Spark's
    xxhash64 (not DuckDB-expressible) → rows-only driver check; exact
    Jaccard behavior is oracle-covered by ngram_jaccard_dedup."""
    bm = MinHashLSHBlocker(threshold=0.3, num_perm=32).assign(
        _cust_frame(spark, sf_dir), _supp_frame(spark, sf_dir)
    )
    return _explode_blocks(bm)


@register(
    "minhash_lsh_blocking_md5",
    _TOKENS_SQL.format(stop=_STOP_SQL)
    + """
    , lsig AS (SELECT id, p, min(md5(p::varchar || ':' || tok)) mh
               FROM lt CROSS JOIN (SELECT unnest(generate_series(0, 23)) p)
               GROUP BY id, p),
    lband AS (SELECT id, (p // 2)::varchar || '_'
                         || md5(string_agg(mh, ',' ORDER BY p)) block_key
              FROM lsig GROUP BY id, p // 2),
    rsig AS (SELECT id, p, min(md5(p::varchar || ':' || tok)) mh
             FROM rt CROSS JOIN (SELECT unnest(generate_series(0, 23)) p)
             GROUP BY id, p),
    rband AS (SELECT id, (p // 2)::varchar || '_'
                         || md5(string_agg(mh, ',' ORDER BY p)) block_key
              FROM rsig GROUP BY id, p // 2)
    SELECT l.block_key, l.id AS left_id, r.id AS right_id
    FROM lband l JOIN rband r USING (block_key)
    """,
)
def minhash_lsh_blocking_md5(spark, sf_dir):
    """J7 under an exact oracle: MinHash-LSH blocker in md5 mode
    (deterministic signatures + band digests — threshold 0.3, 32 perms
    → 12 bands × 2 rows), the full signature→band→equi-join blocking
    surface hash-checked against DuckDB.  Same plan as the xxhash64
    fast path in ``minhash_lsh_blocking``."""
    bm = MinHashLSHBlocker(threshold=0.3, num_perm=32, hash_fn="md5").assign(
        _cust_frame(spark, sf_dir), _supp_frame(spark, sf_dir)
    )
    return _explode_blocks(bm)


@register(
    "tfidf_token_blocking",
    """
    WITH lt AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) id, tok FROM (
            SELECT c_custkey, unnest(regexp_split_to_array(lower(c_name), '[^a-z0-9]+')) tok
            FROM customer)
          WHERE length(tok) >= 3 AND tok NOT IN ({stop})),
         rt AS (SELECT DISTINCT CAST(s_suppkey AS VARCHAR) id, tok FROM (
            SELECT s_suppkey, unnest(regexp_split_to_array(lower(s_name), '[^a-z0-9]+')) tok
            FROM supplier)
          WHERE length(tok) >= 3 AND tok NOT IN ({stop})),
         ln AS (SELECT count(DISTINCT id) n FROM lt),
         rn AS (SELECT count(DISTINCT id) n FROM rt),
         lw AS (SELECT id, tok, ln((1 + (SELECT n FROM ln)) / (1.0 + count(*) OVER (PARTITION BY tok))) + 1 idf
                FROM lt),
         lfil AS (SELECT id, tok FROM (
            SELECT id, tok, idf / sqrt(sum(idf * idf) OVER (PARTITION BY id)) wn FROM lw)
            WHERE wn >= 0.5),
         rw AS (SELECT id, tok, ln((1 + (SELECT n FROM rn)) / (1.0 + count(*) OVER (PARTITION BY tok))) + 1 idf
                FROM rt),
         rfil AS (SELECT id, tok FROM (
            SELECT id, tok, idf / sqrt(sum(idf * idf) OVER (PARTITION BY id)) wn FROM rw)
            WHERE wn >= 0.5)
    SELECT lfil.tok AS block_key, lfil.id AS left_id, rfil.id AS right_id
    FROM lfil JOIN rfil ON lfil.tok = rfil.tok
    """.format(stop=_STOP_SQL),
)
def tfidf_token_blocking(spark, sf_dir):
    """M16: tf-idf-filtered token blocking — only tokens with normalized
    tf-idf ≥ 0.5 become block keys (drops the ubiquitous
    'customer'/'supplier' prefix tokens, keeps the discriminative
    zero-padded numbers)."""
    from ..blockers.tfidf import TfIdfFilteredTokenBlocker

    bm = TfIdfFilteredTokenBlocker(threshold=0.5).assign(
        _cust_frame(spark, sf_dir), _supp_frame(spark, sf_dir)
    )
    return _explode_blocks(bm)


_REL_TOK_SQL = """
    WITH lvals AS (
      SELECT 'c' || CAST(c_custkey AS VARCHAR) id, c_mktsegment v FROM customer
      UNION ALL
      SELECT 'c' || CAST(c_custkey AS VARCHAR), n_name
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      UNION ALL
      SELECT 'n' || CAST(n_nationkey AS VARCHAR), n_name FROM nation
      UNION ALL
      SELECT 'n' || CAST(c_nationkey AS VARCHAR), c_mktsegment FROM customer
    ),
    rvals AS (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) id, s_name v FROM supplier
      UNION ALL
      SELECT 's' || CAST(s_suppkey AS VARCHAR), n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      UNION ALL
      SELECT 'n' || CAST(n_nationkey AS VARCHAR), n_name FROM nation
      UNION ALL
      SELECT 'n' || CAST(s_nationkey AS VARCHAR), s_name FROM supplier
    ),
    lt AS (SELECT DISTINCT id, tok FROM (
        SELECT id, unnest(regexp_split_to_array(lower(v), '[^a-z0-9]+')) tok FROM lvals)
      WHERE length(tok) >= 3 AND tok NOT IN ({stop})),
    rt AS (SELECT DISTINCT id, tok FROM (
        SELECT id, unnest(regexp_split_to_array(lower(v), '[^a-z0-9]+')) tok FROM rvals)
      WHERE length(tok) >= 3 AND tok NOT IN ({stop}))
"""


@register(
    "relational_token_blocking",
    _REL_TOK_SQL.format(stop=_STOP_SQL)
    + """
    SELECT lt.tok AS block_key, lt.id AS left_id, rt.id AS right_id
    FROM lt JOIN rt ON lt.tok = rt.tok
    """,
)
def relational_token_blocking(spark, sf_dir):
    """E3/E4: SimpleRelationalTokenBlocker — the reference paper's
    headline method (``relation_aware.py:331-360``) — over a KG built
    from customers/suppliers linked to their nations.  Each entity's
    blocking text is its own attributes plus its graph neighbors'
    (tokens of a space-joined blob == union of value tokens, which is
    what the oracle computes)."""
    from ..blockers.relation_aware import SimpleRelationalTokenBlocker

    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    nat_attrs = melt(
        nat.select(F.concat(F.lit("n"), F.col("n_nationkey")).alias("id"), "n_name"), "id"
    )
    left = EntityFrame(
        melt(
            cust.select(F.concat(F.lit("c"), F.col("c_custkey")).alias("id"), "c_mktsegment"),
            "id",
        ).unionByName(nat_attrs),
        "customer",
    )
    right = EntityFrame(
        melt(
            supp.select(F.concat(F.lit("s"), F.col("s_suppkey")).alias("id"), "s_name"), "id"
        ).unionByName(nat_attrs),
        "supplier",
    )
    left_rel = cust.select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("head"),
        F.lit("in_nation").alias("rel"),
        F.concat(F.lit("n"), F.col("c_nationkey")).alias("tail"),
    )
    right_rel = supp.select(
        F.concat(F.lit("s"), F.col("s_suppkey")).alias("head"),
        F.lit("in_nation").alias("rel"),
        F.concat(F.lit("n"), F.col("s_nationkey")).alias("tail"),
    )
    bm = SimpleRelationalTokenBlocker().assign(left, right, left_rel, right_rel)
    return _explode_blocks(bm)


