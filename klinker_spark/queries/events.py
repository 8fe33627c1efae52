"""Query registrations: events family (split from the original single-file registry; registration order preserved by package import order in __init__)."""
from __future__ import annotations
from ._core import F, ORACLES, QUERIES, Window, _t, brute_force_topk, langid_by_profile, load_events, register

# ------------------------------------------------------------------ events (batch forms of the streaming ops)
def _events_ns(spark, sf_dir):
    """Raw events normalized to exact bigint nanosecond ``ts``.

    Storage-agnostic: handles both a ``timestamp[us]`` column (current
    testdata; with ``nanosAsLong`` from session.py a TIMESTAMP(NANOS)
    file would arrive as bigint instead) by converting through integer
    micros — never a float round-trip (ts ~1.7e18 exceeds double's
    exact range).  No session conf is mutated here (the round-1
    ``spark.conf.set`` made results execution-order dependent in a
    shared driver session); ``nanosAsLong`` is set once at session
    construction in ``session.get_spark``.
    """
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] != "bigint":
        # session tz is UTC, so ntz -> timestamp preserves the instant
        df = df.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
    return df


@register(
    "windowed_event_counts",
    """
    SELECT epoch_ms(time_bucket(INTERVAL 15 MINUTE, ts)) AS window_start_ms,
           event_type, count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_value_cents
    FROM events GROUP BY 1, 2
    """,
)
def windowed_event_counts_q(spark, sf_dir):
    """Tumbling-window per-type counts/sums — the batch form of
    streaming.windowed_event_counts (identical plan modulo watermark).
    Window start from integer ns arithmetic; money as cents.

    Cents are computed as ``floor(value*100 + 0.5)`` on BOTH engines:
    pure IEEE-double arithmetic that Spark and DuckDB evaluate
    bit-identically, unlike ``round()`` (Spark HALF_UPs the *decimal
    repr* via BigDecimal; DuckDB rounds the binary double — they
    disagree on .5-boundary values).  The DuckDB sum is cast back to
    BIGINT because ``sum(BIGINT)`` returns HUGEINT, which some result
    hashers stringify differently (driver red row in round 1).
    """
    ev = _events_ns(spark, sf_dir)
    return (
        ev.groupBy(
            (F.expr("ts DIV 900000000000") * F.lit(900000)).alias("window_start_ms"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias(
                "sum_value_cents"
            ),
        )
    )


@register(
    "sliding_window_counts",
    """
    WITH b AS (SELECT epoch_us(ts) t, event_type,
                      CAST(round(value * 1e6) AS BIGINT) v
               FROM events),
    w AS (SELECT ((t // 900000000) - k.k) * 900000000 window_start_us,
                 event_type, v
          FROM b CROSS JOIN (SELECT unnest(generate_series(0, 3)) k) k)
    SELECT window_start_us, event_type,
           CAST(count(*) AS BIGINT) n_events,
           CAST(sum(v) AS BIGINT) sum_value_micro
    FROM w GROUP BY window_start_us, event_type
    ORDER BY window_start_us, event_type
    """,
)
def sliding_window_counts_q(spark, sf_dir):
    """SLIDING-window rollup (1 h windows every 15 min — each event
    lands in exactly 4 overlapping windows): the trend-smoothing
    variant of the tumbling rollup, one window-explode + aggregate,
    integer micro sums so overlap arithmetic is engine-exact.  The
    same expression runs under a watermark in Structured Streaming
    (F.window's slideDuration)."""
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1e6).cast("bigint")).alias(
                "sum_value_micro"
            ),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            F.col("sum_value_micro").cast("bigint").alias("sum_value_micro"),
        )
        .orderBy("window_start_us", "event_type")
    )
    return out


@register(
    "events_dedup_earliest",
    """
    SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts ASC, event_id ASC) r
      FROM events) WHERE r = 1
    """,
)
def events_dedup_earliest(spark, sf_dir):
    """Keep-earliest dedup per (user_id, event_type) — the deterministic
    batch analogue of streaming_dedup's keep-first semantics."""
    ev = _events_ns(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("user_id", "event_type", "event_id", F.expr("ts DIV 1000000").alias("ts_ms"))
    )


@register(
    "running_user_stats",
    """
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 6) AS sum_value,
           max(epoch_ms(ts)) AS last_ts_ms
    FROM events GROUP BY user_id
    """,
)
def running_user_stats_q(spark, sf_dir):
    """§2.8 custom stateful op: batch analogue of
    streaming.stateful.running_user_stats (applyInPandasWithState
    running per-user totals); the streaming path's final state equals
    this aggregate (asserted in tests/test_streaming.py)."""
    from ..data.io import load_events
    from ..streaming.stateful import running_user_stats

    out = running_user_stats(load_events(spark, sf_dir))
    return out.withColumn("sum_value", F.round("sum_value", 6))


@register(
    "events_json_extract",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def events_json_extract(spark, sf_dir):
    """JSON sidecar extraction (training pipelines carry metadata as
    JSON columns; Catalyst's get_json_object is codegen'd)."""
    return _events_ns(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


@register(
    "events_asof_join",
    """
    WITH l AS (SELECT event_id, user_id, epoch_ms(ts) ts_ms FROM events
               WHERE event_type = 'click'),
    r AS (SELECT user_id, epoch_ms(ts) ts_ms, max(value) v FROM events
          WHERE event_type = 'purchase' GROUP BY user_id, epoch_ms(ts)),
    j AS (SELECT l.event_id, l.user_id, l.ts_ms,
                 r.ts_ms AS m_ts, r.v AS m_v
          FROM l ASOF LEFT JOIN r
               ON l.user_id = r.user_id AND l.ts_ms >= r.ts_ms)
    SELECT event_id, user_id, ts_ms,
           CASE WHEN ts_ms - m_ts <= 86400000 THEN m_ts END AS matched_ts,
           CASE WHEN ts_ms - m_ts <= 86400000
                THEN round(m_v, 6) END AS matched_value
    FROM j
    """,
)
def events_asof_join_q(spark, sf_dir):
    """As-of join (net-new temporal operator): for every click, the
    latest purchase value by the same user within 24 h.  Union-merge
    plan — one sort per key, no candidate explosion; oracle is DuckDB's
    NATIVE ASOF LEFT JOIN, so the semantics are checked against an
    independent first-class implementation."""
    from ..data.io import load_events
    from ..ops.temporal import asof_join

    ev = load_events(spark, sf_dir).withColumn("ts_ms", F.unix_millis("ts"))
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts_ms")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts_ms", "value")
    out = asof_join(
        clicks, purchases, by="user_id", ts_col="ts_ms",
        right_value_col="value", tolerance=86_400_000,
    )
    return out.withColumn("matched_value", F.round("matched_value", 6))


@register(
    "events_range_join",
    """
    WITH l AS (SELECT event_id, user_id, epoch_ms(ts) ts_ms FROM events
               WHERE event_type = 'click'),
    r AS (SELECT event_id, user_id, epoch_ms(ts) ts_ms FROM events
          WHERE event_type = 'purchase')
    SELECT l.user_id, l.event_id AS l_event_id, l.ts_ms AS l_ts_ms,
           r.event_id AS r_event_id, r.ts_ms AS r_ts_ms
    FROM l JOIN r ON l.user_id = r.user_id
                 AND r.ts_ms - l.ts_ms BETWEEN 1 AND 1800000
    """,
)
def events_range_join_q(spark, sf_dir):
    """Range join (net-new temporal operator): click → purchase pairs
    by the same user within the following 30 min.  Banded bucket
    equi-join — ≤ 2·|L| + |R| shuffled rows, no per-key cross product;
    oracle is the plain BETWEEN join."""
    from ..data.io import load_events
    from ..ops.temporal import range_join

    ev = load_events(spark, sf_dir).withColumn("ts_ms", F.unix_millis("ts"))
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts_ms")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts_ms")
    return range_join(
        clicks, purchases, by="user_id", ts_col="ts_ms", lower=1, upper=1_800_000
    )


@register(
    "events_hypertable_rollup",
    """
    WITH e AS (SELECT epoch_ms(ts) ts_ms, user_id, value FROM events),
    grains AS (SELECT unnest([60000, 3600000, 86400000]) g)
    SELECT g AS granularity, (ts_ms // g) * g AS bucket, user_id,
           count(value) AS n, round(sum(value), 6) AS sum_value,
           round(min(value), 6) AS min_value, round(max(value), 6) AS max_value
    FROM e CROSS JOIN grains
    GROUP BY g, (ts_ms // g) * g, user_id
    """,
)
def events_hypertable_rollup_q(spark, sf_dir):
    """Hypertable rollup (net-new): minute/hour/day per-user buckets
    where each coarser grain aggregates the finer grain's PARTIALS —
    one raw scan total.  The oracle aggregates every grain directly
    from raw, so the hash-match proves the partial-aggregation
    composition is exact."""
    from ..data.io import load_events
    from ..ops.rollup import hypertable_rollup

    ev = load_events(spark, sf_dir).withColumn("ts_ms", F.unix_millis("ts"))
    out = hypertable_rollup(
        ev, "ts_ms", ["user_id"], "value",
        granularities=[60_000, 3_600_000, 86_400_000],
    )
    return out.select(
        "granularity", "bucket", "user_id", "n",
        F.round("sum_value", 6).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )


@register(
    "kmv_distinct_sketch",
    f"""
    WITH toks AS (SELECT DISTINCT unnest(string_split(lower(text), ' ')) tok
                  FROM documents),
    h AS (SELECT DISTINCT
            CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT)
            / 1152921504606846976.0 AS hf
          FROM toks),
    mins AS (SELECT hf FROM h ORDER BY hf LIMIT 256)
    SELECT count(*) AS k_used,
           CASE WHEN count(*) >= 256 THEN max(hf) END AS kth_fraction,
           round(CASE WHEN count(*) >= 256 THEN 255.0 / max(hf)
                      ELSE count(*)::DOUBLE END, 6) AS estimate
    FROM mins
    """,
)
def kmv_distinct_sketch_q(spark, sf_dir):
    """KMV distinct-count sketch (net-new): estimate the distinct
    whitespace tokens of the corpus from the 256 smallest md5
    fractions.  Deterministic md5 hashing ⇒ an APPROXIMATE operator
    with an EXACT oracle (sketch contents and estimate both
    hash-checked)."""
    from ..ops.sketches import kmv_distinct

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .distinct()
    )
    return kmv_distinct(toks, "tok", k=256)


# 0.7213/(1 + 1.079/256) · 256² — evaluated ONCE in Python in the same
# op order as ops/sketches.py so the oracle embeds the identical double
_HLL_A2 = repr(0.7213 / (1.0 + 1.079 / 256) * 256 * 256)


@register(
    "kmv_source_overlap",
    """
    WITH ta AS (SELECT DISTINCT
                  CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT)
                  / 1152921504606846976.0 AS h
                FROM (SELECT unnest(string_split(lower(text), ' ')) tok
                      FROM documents WHERE doc_id % 2 = 0)),
    tb AS (SELECT DISTINCT
                  CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT)
                  / 1152921504606846976.0 AS h
                FROM (SELECT unnest(string_split(lower(text), ' ')) tok
                      FROM documents WHERE doc_id % 2 = 1)),
    ma AS (SELECT h FROM ta ORDER BY h LIMIT 256),
    mb AS (SELECT h FROM tb ORDER BY h LIMIT 256),
    u AS (SELECT DISTINCT h FROM (SELECT h FROM ma UNION ALL SELECT h FROM mb)
          ORDER BY h LIMIT 256),
    tagged AS (SELECT u.h,
                      CASE WHEN u.h IN (SELECT h FROM ma) THEN 1 ELSE 0 END ina,
                      CASE WHEN u.h IN (SELECT h FROM mb) THEN 1 ELSE 0 END inb
               FROM u)
    SELECT CAST(count(*) AS BIGINT) k_used,
           round(CASE WHEN count(*) >= 256 THEN 255.0 / max(h)
                      ELSE count(*)::DOUBLE END, 6) union_estimate,
           CAST(sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS BIGINT)
             n_shared,
           CAST(round(1000000.0 * sum(CASE WHEN ina = 1 AND inb = 1
                                           THEN 1 ELSE 0 END) / count(*))
                AS BIGINT) jaccard_micro,
           round((sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)
                  * 1.0 / count(*))
                 * CASE WHEN count(*) >= 256 THEN 255.0 / max(h)
                        ELSE count(*)::DOUBLE END, 6) intersection_estimate
    FROM tagged
    """,
)
def kmv_source_overlap_q(spark, sf_dir):
    """Sketch-algebra set overlap: the distinct-token vocabularies of
    the even and odd document halves compared entirely through KMV
    sketches — union size, Jaccard, and intersection size estimated
    from two 256-row summaries (Beyer et al. 2007), never from the
    sets.  Deterministic md5 fractions make every estimate exact-
    oracled."""
    from ..ops.sketches import kmv_set_ops

    docs = _t(spark, sf_dir, "documents")
    tok = lambda d: d.select(  # noqa: E731
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    return kmv_set_ops(
        tok(docs.where(F.col("doc_id") % 2 == 0)),
        tok(docs.where(F.col("doc_id") % 2 == 1)),
        "tok",
    )


@register(
    "hll_distinct_sketch",
    f"""
    WITH el AS (SELECT md5(unnest(string_split(lower(text), ' '))) h
                FROM documents),
    r AS (SELECT CAST(concat('0x', substr(h, 1, 2)) AS BIGINT) bucket,
                 CAST(concat('0x', substr(h, 3, 15)) AS BIGINT) v
          FROM el),
    mx AS (SELECT bucket,
                  max(CASE WHEN v = 0 THEN 61 ELSE 61 - length(bin(v)) END) mj
           FROM r GROUP BY bucket),
    reg AS (SELECT g.range AS bucket, CAST(coalesce(mx.mj, 0) AS INTEGER) mj
            FROM range(256) g LEFT JOIN mx ON g.range = mx.bucket),
    pk AS (SELECT list(mj ORDER BY bucket) regs FROM reg),
    calc AS (SELECT regs,
                    list_sum(list_transform(regs,
                             x -> 1.0 / CAST(1::BIGINT << x AS DOUBLE))) z,
                    len(list_filter(regs, x -> x = 0)) nz
             FROM pk)
    SELECT 256 AS m, nz AS n_zero,
           array_to_string(regs, ',') AS registers_csv,
           round({_HLL_A2} / z, 6) AS raw_estimate,
           round(CASE WHEN {_HLL_A2} / z <= 640.0 AND nz > 0
                      THEN 256.0 * ln(256.0 / nz)
                      ELSE {_HLL_A2} / z END, 6) AS estimate
    FROM calc
    """,
)
def hll_distinct_sketch_q(spark, sf_dir):
    """Deterministic-md5 HyperLogLog over the corpus token stream
    (duplicates included — register max absorbs them): 256 registers,
    bucket-ordered dyadic-rational indicator fold, linear-counting
    small-range correction.  The mergeable industry-standard distinct
    sketch, with an EXACT oracle (registers AND estimate hashed).

    The register array is serialized to a CSV string for the gate:
    the driver's canonicalizer sorts pandas object cells and cannot
    hash Python lists (the r6 ERR row) — registered queries must emit
    scalar columns only (asserted by test_no_nested_output_columns)."""
    from ..ops.sketches import hll_distinct

    toks = _t(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    sk = hll_distinct(toks, "tok")
    return sk.select(
        "m",
        "n_zero",
        F.array_join("registers", ",").alias("registers_csv"),
        "raw_estimate",
        "estimate",
    )


@register(
    "langid_confusion",
    "WITH pred AS ("
    + ORACLES["langid"]
    + """)
    SELECT d.lang AS true_lang, p.pred_lang, count(*) AS n_docs
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY 1, 2
    """,
)
def langid_confusion_q(spark, sf_dir):
    """Confusion matrix of the n-gram-profile language identifier
    against the labeled lang column — the quality report for the
    heuristic itself.  Oracle re-derives the predictions in SQL and
    cross-tabulates identically."""
    from ..ops.textstats import langid_by_profile

    docs = _t(spark, sf_dir, "documents")
    pred = langid_by_profile(docs)
    return (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred.select("doc_id", "pred_lang"), "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "distinct_ngram_ratio",
    """
    WITH t AS (SELECT source, list_filter(string_split(text, ' '),
                                          x -> x <> '') tk
               FROM documents),
    arr AS (SELECT source, tk, len(tk) nn FROM t WHERE len(tk) >= 2),
    grams AS (SELECT source, array_to_string(tk[i:i+1], ' ') ngram
              FROM arr, unnest(generate_series(1, nn - 1)) s(i)),
    per AS (SELECT source, ngram, count(*) c FROM grams GROUP BY 1, 2)
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_ngrams,
           count(*) AS n_distinct,
           round(count(*) * 1.0 / CAST(sum(c) AS BIGINT), 6) AS distinct_ratio
    FROM per GROUP BY source
    """,
)
def distinct_ngram_ratio_q(spark, sf_dir):
    """Distinct-2 diversity per source (Li et al. 2016): the
    mode-collapse / degeneration monitor for generated or templated
    slices — fraction of bigram occurrences that are distinct types."""
    from ..ops.textstats import distinct_ngram_ratio

    return distinct_ngram_ratio(_t(spark, sf_dir, "documents"), n=2)


@register(
    "zipf_fit",
    """
    WITH toks AS (SELECT unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) tok
                  FROM documents),
    counts AS (SELECT tok, count(*) freq FROM toks GROUP BY tok),
    top AS (SELECT tok, freq FROM counts ORDER BY freq DESC, tok LIMIT 200),
    rk AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, tok) rank
           FROM top),
    terms AS (SELECT
        CAST(round(ln(CAST(rank AS DOUBLE)) * 1e9) AS BIGINT) xn,
        CAST(round(ln(CAST(freq AS DOUBLE)) * 1e9) AS BIGINT) yn,
        CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(freq AS DOUBLE)) * 1e9)
             AS BIGINT) xyn,
        CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)) * 1e9)
             AS BIGINT) xxn
      FROM rk),
    s AS (SELECT count(*) k_used, CAST(sum(xn) AS BIGINT) sx,
                 CAST(sum(yn) AS BIGINT) sy, CAST(sum(xyn) AS BIGINT) sxy,
                 CAST(sum(xxn) AS BIGINT) sxx
          FROM terms)
    SELECT k_used,
           round((k_used * (sxy / 1e9) - (sx / 1e9) * (sy / 1e9))
                 / (k_used * (sxx / 1e9) - (sx / 1e9) * (sx / 1e9)), 6) AS slope,
           round(((sy / 1e9)
                  - ((k_used * (sxy / 1e9) - (sx / 1e9) * (sy / 1e9))
                     / (k_used * (sxx / 1e9) - (sx / 1e9) * (sx / 1e9)))
                    * (sx / 1e9)) / k_used, 6) AS intercept
    FROM s
    """,
)
def zipf_fit_q(spark, sf_dir):
    """Zipf slope of the corpus unigram distribution (top-200 tokens):
    ln-freq on ln-rank least squares with integer nano-unit sums —
    the corpus-naturalness monitor, engine-exact."""
    from ..ops.textstats import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"), top_k=200)


@register(
    "js_divergence_sources",
    """
    WITH bt AS (SELECT source g,
                       unnest(list_filter(string_split(text, ' '),
                                          x -> x <> '')) tok
                FROM documents WHERE source IN ('src0', 'src1')),
    counts AS (SELECT tok,
                      CAST(sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS BIGINT) ca,
                      CAST(sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS BIGINT) cb
               FROM bt GROUP BY tok),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) na, CAST(sum(cb) AS BIGINT) nb,
                   CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) va,
                   CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) vb,
                   count(*) vu
            FROM counts),
    terms AS (SELECT na, nb, va, vb, vu,
      CAST(round((CASE WHEN ca > 0
                       THEN 0.5 * (ca * 1.0 / na)
                            * ln((ca * 1.0 / na)
                                 / (((ca * 1.0 / na) + (cb * 1.0 / nb)) / 2.0))
                       ELSE 0.0 END
                + CASE WHEN cb > 0
                       THEN 0.5 * (cb * 1.0 / nb)
                            * ln((cb * 1.0 / nb)
                                 / (((ca * 1.0 / na) + (cb * 1.0 / nb)) / 2.0))
                       ELSE 0.0 END) * 1e9) AS BIGINT) t
      FROM counts CROSS JOIN tot)
    SELECT na AS n_tokens_a, nb AS n_tokens_b, va AS n_vocab_a,
           vb AS n_vocab_b, vu AS n_vocab_union,
           CAST(sum(t) AS BIGINT) AS js_nano,
           round(CAST(sum(t) AS BIGINT) / 1e9, 6) AS js
    FROM terms GROUP BY na, nb, va, vb, vu
    """,
)
def js_divergence_sources_q(spark, sf_dir):
    """Distribution-shift monitor: Jensen–Shannon divergence between
    the token unigram distributions of two corpus sources — integer
    nano-nat per-term rounding keeps the sum shuffle-order-free and
    engine-exact."""
    from ..ops.textstats import js_divergence_tokens

    return js_divergence_tokens(
        _t(spark, sf_dir, "documents"), "source", "src0", "src1"
    )


@register(
    "sorted_neighborhood_blocking",
    """
    WITH u AS (
      SELECT 'L' side, CAST(c_custkey AS VARCHAR) id, lower(c_name) k
      FROM customer
      UNION ALL
      SELECT 'R', CAST(s_suppkey AS VARCHAR), lower(s_name) FROM supplier),
    r AS (SELECT side, id, k,
                 row_number() OVER (ORDER BY k, side, id) rank
          FROM u),
    p AS (SELECT a.side sa, a.id ia, a.rank ra, b.side sb, b.id ib, b.rank rb
          FROM r a JOIN r b
            ON b.rank > a.rank AND b.rank - a.rank <= 4 AND a.side <> b.side)
    SELECT CASE WHEN sa = 'L' THEN ia ELSE ib END AS left_id,
           CASE WHEN sa = 'L' THEN ib ELSE ia END AS right_id,
           CAST(rb - ra AS INTEGER) AS gap
    FROM p
    """,
)
def sorted_neighborhood_blocking_q(spark, sf_dir):
    """Sorted-neighborhood blocking (Hernández & Stolfo) over
    customer × supplier names, window 5 — typo-tolerant classic-ER
    blocking whose global order comes from the DISTRIBUTED rank recipe
    (range partitions + per-partition windows + offset broadcast —
    never a single-task global window) and whose windowed pairing is a
    band equi-join.  Exact oracle over every emitted pair."""
    from ..ops.profile import sorted_neighborhood_pairs

    left = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("id"),
        F.lower("c_name").alias("text"),
    )
    right = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("string").alias("id"),
        F.lower("s_name").alias("text"),
    )
    return sorted_neighborhood_pairs(left, right, window=5)


def _sn_pass_sql(key_expr_c: str, key_expr_s: str, window: int) -> str:
    return f"""
    SELECT CASE WHEN sa = 'L' THEN ia ELSE ib END AS left_id,
           CASE WHEN sa = 'L' THEN ib ELSE ia END AS right_id,
           CAST(rb - ra AS INTEGER) AS gap
    FROM (SELECT a.side sa, a.id ia, a.rank ra, b.side sb, b.id ib, b.rank rb
          FROM (SELECT side, id, k,
                       row_number() OVER (ORDER BY k, side, id) rank
                FROM (SELECT 'L' side, CAST(c_custkey AS VARCHAR) id,
                             {key_expr_c} k FROM customer
                      UNION ALL
                      SELECT 'R', CAST(s_suppkey AS VARCHAR),
                             {key_expr_s} FROM supplier)) a
          JOIN (SELECT side, id, k,
                       row_number() OVER (ORDER BY k, side, id) rank
                FROM (SELECT 'L' side, CAST(c_custkey AS VARCHAR) id,
                             {key_expr_c} k FROM customer
                      UNION ALL
                      SELECT 'R', CAST(s_suppkey AS VARCHAR),
                             {key_expr_s} FROM supplier)) b
            ON b.rank > a.rank AND b.rank - a.rank <= {window - 1}
           AND a.side <> b.side)"""


@register(
    "sorted_neighborhood_multipass",
    f"""
    WITH p1 AS ({_sn_pass_sql("lower(c_name)", "lower(s_name)", 5)}),
    p2 AS ({_sn_pass_sql("reverse(lower(c_name))", "reverse(lower(s_name))", 5)})
    SELECT left_id, right_id, min(gap) AS gap
    FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
    GROUP BY left_id, right_id
    """,
)
def sorted_neighborhood_multipass_q(spark, sf_dir):
    """Multi-pass sorted neighborhood (the standard multi-key variant:
    a typo near the string HEAD breaks pass 1's ordering but not pass
    2's reversed-key ordering): union of a name-ordered and a
    reversed-name-ordered pass, min gap per surviving pair."""
    from ..ops.profile import sorted_neighborhood_pairs

    def sides(key):
        left = _t(spark, sf_dir, "customer").select(
            F.col("c_custkey").cast("string").alias("id"),
            key(F.lower("c_name")).alias("text"),
        )
        right = _t(spark, sf_dir, "supplier").select(
            F.col("s_suppkey").cast("string").alias("id"),
            key(F.lower("s_name")).alias("text"),
        )
        return left, right

    p1 = sorted_neighborhood_pairs(*sides(lambda c: c), window=5)
    p2 = sorted_neighborhood_pairs(*sides(F.reverse), window=5)
    return (
        p1.unionByName(p2)
        .groupBy("left_id", "right_id")
        .agg(F.min("gap").alias("gap"))
    )


@register(
    "hll_distinct_by_source",
    f"""
    WITH el AS (SELECT source, md5(unnest(string_split(lower(text), ' '))) h
                FROM documents),
    r AS (SELECT source, CAST(concat('0x', substr(h, 1, 2)) AS BIGINT) bucket,
                 CAST(concat('0x', substr(h, 3, 15)) AS BIGINT) v
          FROM el),
    mx AS (SELECT source, bucket,
                  max(CASE WHEN v = 0 THEN 61 ELSE 61 - length(bin(v)) END) mj
           FROM r GROUP BY source, bucket),
    g AS (SELECT DISTINCT source FROM documents),
    reg AS (SELECT g.source, gr.range AS bucket,
                   CAST(coalesce(mx.mj, 0) AS INTEGER) mj
            FROM g CROSS JOIN range(256) gr
            LEFT JOIN mx ON g.source = mx.source AND gr.range = mx.bucket),
    pk AS (SELECT source, list(mj ORDER BY bucket) regs FROM reg
           GROUP BY source),
    calc AS (SELECT source, regs,
                    list_sum(list_transform(regs,
                             x -> 1.0 / CAST(1::BIGINT << x AS DOUBLE))) z,
                    len(list_filter(regs, x -> x = 0)) nz
             FROM pk)
    SELECT source, 256 AS m, nz AS n_zero,
           array_to_string(regs, ',') AS registers_csv,
           round({_HLL_A2} / z, 6) AS raw_estimate,
           round(CASE WHEN {_HLL_A2} / z <= 640.0 AND nz > 0
                      THEN 256.0 * ln(256.0 / nz)
                      ELSE {_HLL_A2} / z END, 6) AS estimate
    FROM calc
    """,
)
def hll_distinct_by_source_q(spark, sf_dir):
    """Per-source HLL: one distinct-token sketch per corpus source —
    the grouped variant (sketch-per-scope: per source / language /
    day), exact-oracled including every group's register array
    (CSV-serialized — the driver canonicalizer hashes scalars only)."""
    from ..ops.sketches import hll_distinct_by

    toks = _t(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    sk = hll_distinct_by(toks, "tok", ["source"])
    return sk.select(
        "source",
        "m",
        "n_zero",
        F.array_join("registers", ",").alias("registers_csv"),
        "raw_estimate",
        "estimate",
    )


@register(
    "key_skew_profile",
    """
    WITH el AS (SELECT unnest(string_split(lower(text), ' ')) kx
                FROM documents),
    cnt AS (SELECT kx, count(*) cnt FROM el WHERE kx IS NOT NULL
            GROUP BY kx),
    sm AS (SELECT CAST(sum(cnt) AS BIGINT) total_rows, count(*) n_keys,
                  max(cnt) max_cnt
           FROM cnt),
    top AS (SELECT kx, cnt FROM cnt ORDER BY cnt DESC, kx LIMIT 50),
    rk AS (SELECT row_number() OVER (ORDER BY cnt DESC, kx) rank, kx, cnt
           FROM top)
    SELECT rank, kx AS "key", cnt,
           CAST(round(cnt * 1e6 / total_rows) AS BIGINT) AS share_ppm,
           CAST(sum(CAST(round(cnt * 1e6 / total_rows) AS BIGINT))
                OVER (ORDER BY rank) AS BIGINT) AS cum_share_ppm,
           total_rows, n_keys,
           round(max_cnt * n_keys / total_rows, 6) AS hot_ratio
    FROM rk CROSS JOIN sm
    """,
)
def key_skew_profile_q(spark, sf_dir):
    """Heavy-key profile of the corpus token stream (the Zipf head):
    top-50 keys with ppm shares plus the hot-partition ratio that
    decides whether an unsalted shuffle join on this key is safe."""
    from ..ops.profile import key_skew_stats

    toks = _t(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    return key_skew_stats(toks, "tok", top_k=50)


def _pagerank_oracle(iters: int = 5, damping: float = 0.85, k: int = 200) -> str:
    """Unrolled-CTE power iteration — the integer-micro-unit PageRank
    twin of ``ops/graph.py`` (the ``quality_classifier_md5`` recipe:
    every float op is a single round over order-free integer sums)."""
    tele = (1.0 - damping) * 1e6
    parts = [
        """WITH edges AS (
      SELECT concat('c:', CAST(o_custkey AS VARCHAR)) head,
             concat('o:', CAST(o_orderkey AS VARCHAR)) tail FROM orders
      UNION ALL
      SELECT concat('o:', CAST(l_orderkey AS VARCHAR)),
             concat('p:', CAST(l_partkey AS VARCHAR)) FROM lineitem),
    nodes AS (SELECT head AS node FROM edges UNION SELECT tail FROM edges),
    n AS (SELECT count(*) c FROM nodes),
    outdeg AS (SELECT head, count(*) outdeg FROM edges GROUP BY head),
    r0 AS (SELECT node, CAST(round(1e6 / c) AS BIGINT) rank_micro
           FROM nodes CROSS JOIN n)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
    r{i + 1} AS (
      SELECT nodes.node,
             CAST(round({tele!r} / n.c) AS BIGINT)
             + CAST(round({damping!r} * coalesce(s.s, 0)) AS BIGINT) AS rank_micro
      FROM nodes CROSS JOIN n
      LEFT JOIN (SELECT e.tail node,
                        CAST(sum(r{i}.rank_micro // od.outdeg) AS BIGINT) s
                 FROM edges e
                 JOIN r{i} ON e.head = r{i}.node
                 JOIN outdeg od ON e.head = od.head
                 GROUP BY e.tail) s ON nodes.node = s.node)"""
        )
    parts.append(
        f"""
    SELECT node, rank_micro, round(rank_micro / 1e6, 6) AS rank
    FROM r{iters} ORDER BY rank_micro DESC, node LIMIT {k}"""
    )
    return "".join(parts)


#: Tagged-bigint node encoding for the graph queries: ``tag·2⁵⁶ + key``.
#: 2⁵⁶ keeps TPC-H keys in-envelope to sf ~1e10 (orderkey ≈ 6e12 at
#: sf 1e6), and 3·2⁵⁶ + 2⁵⁶ ≈ 2.9e17 stays far under int64; keys at or
#: above the shift RAISE in the encode projection (one predictable
#: bigint comparison inside codegen — no extra job, no silent tag-space
#: collision).
_NODE_TAG_SHIFT = 1 << 56


def _tag_node(tag: int, key_col: str):
    kc = F.col(key_col).cast("bigint")
    return F.when(
        (kc < 0) | (kc >= F.lit(_NODE_TAG_SHIFT)),
        F.expr(
            f"raise_error(concat('node key outside tagged-bigint envelope "
            f"[0, 2^56) in column {key_col}: ', CAST(`{key_col}` AS STRING)))"
        ).cast("bigint"),
    ).otherwise(F.lit(tag * _NODE_TAG_SHIFT) + kc)


@register("pagerank_importance", _pagerank_oracle())
def pagerank_importance_q(spark, sf_dir):
    """Global entity importance: 5-iteration integer-micro-unit
    PageRank over the customer→order→part edge graph, top 200 by
    ``(rank_micro DESC, node)``.  Engine-exact (integer mass, one
    round per float op) — the TRAINED-model-style exact oracle applied
    to an iterative graph algorithm.

    Node ids ride the iterative shuffles as BIGINTS (tag·2⁴² + key —
    hashing/comparing long keys beats 12-char strings ~2× in the
    per-iteration join+aggregate) and decode to the oracle's "c:/o:/p:"
    strings only in the final top-200 projection; the rank arithmetic
    is representation-independent, so the string-node oracle is
    unchanged."""
    from ..ops.graph import pagerank

    TAG = _NODE_TAG_SHIFT
    o = _t(spark, sf_dir, "orders").select(
        _tag_node(1, "o_custkey").alias("head"),
        _tag_node(2, "o_orderkey").alias("tail"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        _tag_node(2, "l_orderkey").alias("head"),
        _tag_node(3, "l_partkey").alias("tail"),
    )
    # outdeg_shape pinned: the auto probe costs a full extra pass over
    # the edge lineage per call (sampled 1% scan of orders+lineitem —
    # 1.8-4.8 s at sf1), and this graph's max out-degree is bounded by
    # the TPC-H schema itself (<=7 lineitems per order, <=41 orders per
    # customer at any sf) — orders of magnitude under the window-form
    # skew gate, so the probe's answer is known at the call site (r13,
    # guide §1.2: don't compute things you throw away).
    pr = pagerank(o.union(li), iters=5, damping=0.85, outdeg_shape="window")
    tag = F.expr(f"node DIV {TAG}")
    decoded = pr.select(
        F.concat(
            F.when(tag == 1, F.lit("c:"))
            .when(tag == 2, F.lit("o:"))
            .otherwise(F.lit("p:")),
            (F.col("node") % TAG).cast("string"),
        ).alias("node"),
        "rank_micro",
        "rank",
    )
    return decoded.orderBy(F.col("rank_micro").desc(), "node").limit(200)


@register(
    "pmi_bigrams",
    """
    WITH t AS (SELECT list_filter(regexp_split_to_array(text, ' '),
                                  x -> x <> '') tk
               FROM documents),
    arr AS (SELECT tk, len(tk) n FROM t WHERE len(tk) > 0),
    occ AS (SELECT tk[i] tok FROM arr, unnest(generate_series(1, n)) s(i)),
    uni AS (SELECT tok, count(*) c FROM occ GROUP BY tok),
    nu AS (SELECT count(*) nu FROM occ),
    bg AS (SELECT tk[i] a, tk[i + 1] b, count(*) cab
           FROM arr, unnest(generate_series(1, n - 1)) s(i)
           GROUP BY 1, 2),
    nb AS (SELECT CAST(sum(cab) AS BIGINT) nb FROM bg),
    sc AS (SELECT a, b, cab,
                  CAST(round(ln((cab * 1.0 / nb.nb) /
                                ((ua.c * 1.0 / nu.nu) * (ub.c * 1.0 / nu.nu)))
                             * 1e6) AS BIGINT) pmi_micro
           FROM bg
           JOIN uni ua ON bg.a = ua.tok
           JOIN uni ub ON bg.b = ub.tok
           CROSS JOIN nb CROSS JOIN nu
           WHERE cab >= 5),
    top AS (SELECT * FROM sc ORDER BY pmi_micro DESC, a, b LIMIT 100)
    SELECT row_number() OVER (ORDER BY pmi_micro DESC, a, b) AS rank,
           a, b, cab, pmi_micro, round(pmi_micro / 1e6, 6) AS pmi
    FROM top
    """,
)
def pmi_bigrams_q(spark, sf_dir):
    """Collocation mining: top-100 adjacent word pairs by PMI
    (min bigram count 5) — phrase detection for tokenizer/vocab
    curation, with micro-nat integer rounding (engine-exact)."""
    from ..ops.textstats import pmi_bigrams

    return pmi_bigrams(_t(spark, sf_dir, "documents"), min_count=5, k=100)


@register(
    "join_size_estimate",
    """
    WITH lt AS (SELECT unnest(string_split(lower(c_name), ' ')) k FROM customer),
    rt AS (SELECT unnest(string_split(lower(s_name), ' ')) k FROM supplier),
    hashes AS (SELECT unnest([0,1,2,3]) i),
    ca AS (SELECT i, (('0x' || substr(md5(i::VARCHAR || ':' || k), 1, 15))::BIGINT
                      % 1024) c, count(*) cnt
           FROM lt CROSS JOIN hashes GROUP BY 1, 2),
    cb AS (SELECT i, (('0x' || substr(md5(i::VARCHAR || ':' || k), 1, 15))::BIGINT
                      % 1024) c, count(*) cnt
           FROM rt CROSS JOIN hashes GROUP BY 1, 2),
    ip AS (SELECT ca.i, CAST(sum(ca.cnt * cb.cnt) AS BIGINT) ip
           FROM ca JOIN cb ON ca.i = cb.i AND ca.c = cb.c GROUP BY ca.i),
    est AS (SELECT CAST(min(coalesce(ip.ip, 0)) AS BIGINT) est_pairs
            FROM hashes h LEFT JOIN ip ON h.i = ip.i),
    tru AS (SELECT CAST(coalesce(sum(l.cnt * r.cnt), 0) AS BIGINT) true_pairs
            FROM (SELECT k, count(*) cnt FROM lt GROUP BY k) l
            JOIN (SELECT k, count(*) cnt FROM rt GROUP BY k) r USING (k))
    SELECT 4 AS depth, 1024 AS width, est_pairs, true_pairs
    FROM est CROSS JOIN tru
    """,
)
def join_size_estimate_q(spark, sf_dir):
    """Count-Min inner-product join-cardinality estimate for the
    token-blocking join (customer-name tokens × supplier-name tokens)
    vs the exact pair count — the pre-flight diagnostic that decides
    plain join / skew cap / redesign before paying the shuffle.  md5
    mode ⇒ exact oracle."""
    from ..ops.sketches import cm_join_size

    lt = (
        _t(spark, sf_dir, "customer")
        .select(F.explode(F.split(F.lower("c_name"), " ")).alias("k"))
    )
    rt = (
        _t(spark, sf_dir, "supplier")
        .select(F.explode(F.split(F.lower("s_name"), " ")).alias("k"))
    )
    est = cm_join_size(lt, "k", rt, "k", width=1024, depth=4, hash_fn="md5")
    truth = (
        lt.groupBy("k")
        .agg(F.count("*").alias("cl"))
        .join(rt.groupBy("k").agg(F.count("*").alias("cr")), "k")
        .agg(
            F.coalesce(F.sum(F.col("cl") * F.col("cr")), F.lit(0))
            .cast("bigint")
            .alias("true_pairs")
        )
    )
    return est.crossJoin(F.broadcast(truth))


@register(
    "salted_join_rollup",
    """
    SELECT p.p_brand,
           count(*) AS n_rows,
           CAST(sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS qty_centi
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def salted_join_rollup_q(spark, sf_dir):
    """Skew mechanism correctness: the lineitem ⋈ part join executed
    SALTED (deterministic 8-way salt on the fat side, replicated slim
    side, join on (key, salt)) must aggregate to exactly what the
    PLAIN SQL join gives — the oracle IS the unsalted join.  Broadcast
    is disabled inside the salted plan via hints so the salt actually
    routes the shuffle."""
    from ..ops.profile import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_quantity", "l_orderkey", "l_linenumber"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand").hint("shuffle_hash")
    joined = salted_join(li, part, "p_partkey", n_salt=8, salt_from="l_orderkey")
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.floor(F.col("l_quantity") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("qty_centi"),
    )


@register(
    "remove_duplicated_spans",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') tk FROM documents),
    arr AS (SELECT doc_id, tk, len(tk) n FROM t),
    tokens AS (SELECT doc_id, i, tk[i] tok
               FROM arr, unnest(generate_series(1, n)) s(i)),
    spans AS (SELECT doc_id, i, array_to_string(tk[i:i+9], ' ') span
              FROM arr, unnest(generate_series(1, n - 9)) s(i)
              WHERE n >= 10),
    cnts AS (SELECT doc_id, i, count(*) OVER (PARTITION BY span) cnt
             FROM spans),
    cov AS (SELECT DISTINCT doc_id, i + d j
            FROM cnts, unnest(generate_series(0, 9)) dd(d)
            WHERE cnt >= 2),
    kept AS (SELECT tk2.doc_id, tk2.i, tk2.tok
             FROM tokens tk2
             LEFT JOIN cov ON tk2.doc_id = cov.doc_id AND tk2.i = cov.j
             WHERE cov.j IS NULL),
    agg AS (SELECT doc_id, count(*) n_after,
                   array_to_string(list(tok ORDER BY i), ' ') clean_text
            FROM kept GROUP BY doc_id)
    SELECT arr.doc_id, arr.n AS n_before,
           coalesce(agg.n_after, 0) AS n_after,
           coalesce(agg.clean_text, '') AS clean_text
    FROM arr LEFT JOIN agg USING (doc_id)
    """,
)
def remove_duplicated_spans_q(spark, sf_dir):
    """Substring dedup TRANSFORM (Lee et al. 2022): drop every token
    covered by a 10-gram span occurring ≥2 times corpus-wide, then
    reassemble the documents — the removal companion of
    ``duplicated_span_stats``, value-checked end-to-end including the
    reconstructed text."""
    from ..ops.curation import remove_duplicated_spans

    return remove_duplicated_spans(
        _t(spark, sf_dir, "documents"), span_k=10, min_df=2
    )


@register(
    "temperature_mix",
    """
    WITH per AS (SELECT source, count(*) n_docs,
                        CAST(sum(len(list_filter(string_split(text, ' '),
                                                 x -> x <> ''))) AS BIGINT)
                          n_tokens
                 FROM documents GROUP BY source),
    tz AS (SELECT CAST(sum(n_tokens) AS BIGINT) tot,
                  list_sum(list_transform(list(n_tokens ORDER BY source),
                           t -> exp(0.3 * ln(CAST(t AS DOUBLE))))) z
           FROM per),
    sel AS (SELECT source, n_docs, n_tokens,
                   CAST(round(n_tokens * 1e6 / tot) AS BIGINT) share_ppm,
                   CAST(round(exp(0.3 * ln(CAST(n_tokens AS DOUBLE))) * 1e6 / z)
                        AS BIGINT) p_temp_ppm
            FROM per CROSS JOIN tz)
    SELECT source, n_docs, n_tokens, share_ppm, p_temp_ppm,
           CAST(round(p_temp_ppm * 1e6 / share_ppm) AS BIGINT) AS boost_ppm
    FROM sel
    """,
)
def temperature_mix_q(spark, sf_dir):
    """α=0.3 temperature sampling plan over the corpus sources
    (Lample & Conneau / XLM-R): natural vs tempered token shares and
    the per-source boost multiplier, in integer ppm (engine-exact via
    the exp(α·ln c) composition + source-ordered normalizer fold)."""
    from ..ops.curation import temperature_mix

    return temperature_mix(_t(spark, sf_dir, "documents"), alpha=0.3)


@register(
    "matryoshka_truncate",
    """
    WITH e AS (SELECT vec_id, embedding[1:8] t FROM embeddings),
    n AS (SELECT vec_id, t,
                 sqrt(list_sum(list_transform(t,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) nm
          FROM e)
    SELECT vec_id,
           array_to_string(list_transform(
               CASE WHEN nm = 0
                    THEN list_transform(t, x -> round(CAST(x AS DOUBLE), 6))
                    ELSE list_transform(t, x -> round(CAST(x AS DOUBLE) / nm, 6))
               END,
               x -> CAST(round(x * 1e6) AS BIGINT)), ',') AS tvec_micro
    FROM n
    """,
)
def matryoshka_truncate_q(spark, sf_dir):
    """MRL prefix embeddings: truncate to the first 8 dims and
    L2-renormalize — the coarse-pass representation for two-stage
    search (short prefix scan, full-vector re-rank).  Fixed-order
    slice/fold/divide expressions ⇒ exact oracle on the element
    values.

    Gate shape: elements are serialized as a CSV of micro-units
    (round-6 value × 1e6 as bigint — integral by construction, so the
    ×1e6 re-round only snaps float fuzz) because the driver
    canonicalizer cannot hash list cells."""
    from ..functions.vectors import truncate_normalize

    emb = _t(spark, sf_dir, "embeddings")
    tv = truncate_normalize(F.col("embedding"), 8)
    return emb.select(
        "vec_id",
        F.array_join(
            F.transform(
                tv, lambda x: F.round(x * 1e6).cast("bigint").cast("string")
            ),
            ",",
        ).alias("tvec_micro"),
    )


@register(
    "two_stage_ann",
    """
    WITH pre AS (SELECT vec_id, embedding[1:8] p FROM embeddings),
    q AS (SELECT vec_id, p FROM pre WHERE vec_id % 10 = 0),
    csims AS (
      SELECT q.vec_id query_id, ix.vec_id neighbor_id,
             list_sum(list_transform(list_zip(q.p, ix.p),
                                     z -> z[1]::DOUBLE * z[2]::DOUBLE))
             / (sqrt(list_sum(list_transform(q.p, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(ix.p, x -> x::DOUBLE * x::DOUBLE)))) sim
      FROM q CROSS JOIN pre ix),
    cand AS (SELECT query_id, neighbor_id FROM (
               SELECT *, row_number() OVER (PARTITION BY query_id
                                            ORDER BY sim DESC, neighbor_id) rk
               FROM csims) WHERE rk <= 50),
    fsims AS (
      SELECT c.query_id, c.neighbor_id,
             list_sum(list_transform(list_zip(eq.embedding, ei.embedding),
                                     z -> z[1]::DOUBLE * z[2]::DOUBLE))
             / (sqrt(list_sum(list_transform(eq.embedding, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(ei.embedding, x -> x::DOUBLE * x::DOUBLE)))) sim
      FROM cand c
      JOIN embeddings eq ON c.query_id = eq.vec_id
      JOIN embeddings ei ON c.neighbor_id = ei.vec_id)
    SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) rank
      FROM fsims) WHERE rank <= 10
    """,
)
def two_stage_ann_q(spark, sf_dir):
    """Two-stage retrieval on ONE embedding column (the Matryoshka
    deployment pattern): coarse top-50 by cosine over the 8-dim prefix
    (cosine is scale-invariant, so the raw prefix ranks identically to
    the renormalized one), then an exact full-vector re-rank of only
    those candidates to top-10.  At scale the coarse pass reads 8/dim
    of the bytes and the re-rank touches |Q|·50 rows — not the corpus."""
    from ..functions.vectors import cosine
    from ..ops.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    pre = emb.select("vec_id", F.slice(F.col("embedding"), 1, 8).alias("embedding"))
    cand = brute_force_topk(
        pre.where(F.col("vec_id") % 10 == 0), pre, k=50
    ).select("query_id", "neighbor_id")
    eq = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    ei = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv"))
    f = (
        cand.join(eq, "query_id")
        .join(ei, "neighbor_id")
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        f.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


_RETRIEVAL_EVAL_SQL = """
    WITH run AS ({run_sql}),
    gold AS ({gold_sql}),
    hits AS (SELECT r.query_id, list(r.rank ORDER BY r.rank) ranks
             FROM run r JOIN gold g
               ON r.query_id = g.query_id AND r.neighbor_id = g.neighbor_id
             WHERE r.rank <= 10 GROUP BY r.query_id),
    pg AS (SELECT query_id, count(*) n_gold FROM gold GROUP BY query_id),
    j AS (SELECT pg.query_id, pg.n_gold,
                 coalesce(len(h.ranks), 0) n_hit,
                 coalesce(h.ranks, []) ranks,
                 generate_series(1, least(pg.n_gold, 10)) ideal
          FROM pg LEFT JOIN hits h ON pg.query_id = h.query_id)
    SELECT query_id, n_gold, n_hit,
           round(CASE WHEN n_hit > 0 THEN 1.0 / ranks[1] ELSE 0.0 END, 6) AS rr,
           round(coalesce(list_sum(list_transform(ranks,
                 r -> 1.0 / log2(CAST(r AS DOUBLE) + 1.0))), 0.0), 6) AS dcg,
           round(coalesce(list_sum(list_transform(ideal,
                 r -> 1.0 / log2(CAST(r AS DOUBLE) + 1.0))), 0.0), 6) AS idcg,
           round(coalesce(list_sum(list_transform(ranks,
                 r -> 1.0 / log2(CAST(r AS DOUBLE) + 1.0))), 0.0)
                 / coalesce(list_sum(list_transform(ideal,
                 r -> 1.0 / log2(CAST(r AS DOUBLE) + 1.0))), 0.0), 6) AS ndcg
    FROM j
"""


@register(
    "retrieval_metrics_two_stage",
    _RETRIEVAL_EVAL_SQL.format(
        run_sql=ORACLES["two_stage_ann"], gold_sql=ORACLES["knn_topk"]
    ),
)
def retrieval_metrics_two_stage_q(spark, sf_dir):
    """Ranked-retrieval evaluation: recall@10 / RR / NDCG@10 of the
    two-stage MRL search against the exact kNN gold, per query — the
    eval family extended to the retrieval operators, with an exact
    oracle that re-derives BOTH rankings in SQL."""
    from ..eval import retrieval_metrics

    run = QUERIES["two_stage_ann"](spark, sf_dir)
    gold = QUERIES["knn_topk"](spark, sf_dir)
    return retrieval_metrics(run, gold, k=10)
