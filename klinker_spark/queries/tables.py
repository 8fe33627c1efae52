"""Query registrations: tables family (split from the original single-file registry; registration order preserved by package import order in __init__)."""
from __future__ import annotations
from ._core import F, Window, _t, load_events, register
from .curation import _qcls_oracle

# ------------------------------------------------------------------ frame sampling / PR curve / interval islands
@register(
    "multimodal_frame_sample",
    """
    WITH b AS (SELECT doc_id media_id, text, length(text) ln FROM documents
               WHERE octet_length(encode(text)) = length(text) AND length(text) > 0),
    n AS (SELECT *, least(4, greatest(ln // 64, 1)) nf FROM b),
    fr AS (SELECT media_id, CAST(i AS INT) frame_idx,
                  least(64, ln - i * 64) n_bytes,
                  ord(substr(text, i * 64 + 1, 1)) f0
           FROM n, unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) s(i))
    SELECT media_id, frame_idx, CAST(n_bytes AS BIGINT) n_bytes, CAST(f0 AS BIGINT) f0
    FROM fr ORDER BY media_id, frame_idx
    """,
)
def multimodal_frame_sample_q(spark, sf_dir):
    """Video frame-sampling plumbing under an exact oracle: ASCII doc
    bytes as the opaque payload, 64-byte 'frames', every frame up to 4
    (UDTF shape — one output row per sampled frame).  The decoder is
    the documented stub (byte slices); the oracle reproduces frame
    count, per-frame byte length, and first-byte value, so the check
    proves the Arrow plumbing (batch iteration, row explosion, binary
    slicing) — ffmpeg drops into the same contract."""
    from ..ops.multimodal import pack_media, sample_frames

    docs = _t(spark, sf_dir, "documents").where(
        (F.octet_length(F.col("text")) == F.length(F.col("text")))
        & (F.length("text") > 0)
    )
    media = pack_media(
        docs.select("doc_id", F.encode("text", "utf-8").alias("payload")),
        "doc_id",
        "payload",
        "video",
    )
    frames = sample_frames(media, every_n_bytes=64, max_frames=4)
    return frames.select(
        "media_id",
        "frame_idx",
        F.octet_length("frame").cast("bigint").alias("n_bytes"),
        # frames are ASCII by construction; binary→string then ascii()
        # reads the first byte
        F.ascii(F.col("frame").cast("string")).cast("bigint").alias("f0"),
    ).orderBy("media_id", "frame_idx")


@register(
    "classifier_pr_curve",
    f"""
    WITH scored AS (SELECT CAST(round(prob * 1000000) AS BIGINT) pm, label
                    FROM ({_qcls_oracle()}) base),
    th AS (SELECT CAST(k AS INT) k, k * 100000 t
           FROM unnest(generate_series(1, 9)) s(k)),
    agg AS (SELECT k, t,
                   CAST(sum(CASE WHEN pm >= t THEN label ELSE 0 END) AS BIGINT) tp,
                   CAST(sum(CASE WHEN pm >= t THEN 1 - label ELSE 0 END) AS BIGINT) fp,
                   CAST(sum(label) AS BIGINT) pos
            FROM scored CROSS JOIN th GROUP BY k, t)
    SELECT k AS threshold_decile, tp, fp,
           CASE WHEN tp + fp > 0
                THEN CAST(round((1000000.0 * tp) / (tp + fp)) AS BIGINT) END
             AS precision_ppm,
           CASE WHEN pos > 0
                THEN CAST(round((1000000.0 * tp) / pos) AS BIGINT) END
             AS recall_ppm
    FROM agg ORDER BY threshold_decile
    """,
)
def classifier_pr_curve_q(spark, sf_dir):
    """Precision/recall curve for the deterministic quality classifier
    at the nine decile thresholds — the operating-point picker that
    complements the calibration diagram.  Threshold comparison happens
    on micro-snapped scores (no float boundary lane); ONE aggregate
    pass computes all nine points via conditional sums over the tiny
    broadcast threshold frame."""
    from ..ops.quality_model import train_quality_scores_deterministic

    scored = train_quality_scores_deterministic(
        _t(spark, sf_dir, "documents"), F.col("source") == "src0"
    ).select(
        F.round(F.col("prob") * 1_000_000).cast("bigint").alias("pm"), "label"
    )
    th = spark.range(1, 10).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 100_000).alias("t")
    )
    agg = (
        scored.crossJoin(F.broadcast(th))
        .groupBy("k", "t")
        .agg(
            F.sum(F.when(F.col("pm") >= F.col("t"), F.col("label")).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(F.when(F.col("pm") >= F.col("t"), 1 - F.col("label")).otherwise(0))
            .cast("bigint")
            .alias("fp"),
            F.sum("label").cast("bigint").alias("pos"),
        )
    )
    return agg.select(
        F.col("k").alias("threshold_decile"),
        "tp",
        "fp",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.round(1_000_000.0 * F.col("tp") / (F.col("tp") + F.col("fp"))).cast(
                "bigint"
            ),
        ).alias("precision_ppm"),
        F.when(
            F.col("pos") > 0,
            F.round(1_000_000.0 * F.col("tp") / F.col("pos")).cast("bigint"),
        ).alias("recall_ppm"),
    ).orderBy("threshold_decile")


@register(
    "user_activity_islands",
    """
    WITH iv AS (SELECT user_id, epoch_us(ts) s, epoch_us(ts) + 300000000 e
                FROM events),
    f AS (SELECT user_id, s, e,
                 CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                        OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      THEN 1 ELSE 0 END ni
          FROM iv),
    isl AS (SELECT user_id, s, e,
                   sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) island
            FROM f)
    SELECT user_id, CAST(island AS BIGINT) island, min(s) start_us, max(e) end_us,
           count(*) n_rows
    FROM isl GROUP BY user_id, island ORDER BY user_id, island
    """,
)
def user_activity_islands_q(spark, sf_dir):
    """Gaps-and-islands interval union: each event spans [ts, ts+5min);
    overlapping/touching spans merge into maximal per-user coverage
    islands (session coverage as interval algebra, not inactivity
    gaps).  One key shuffle; the running-max, island-flag, and
    island-id windows all reuse the same Exchange."""
    from ..ops.temporal import merge_intervals

    iv = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 300_000_000).alias("e"),
    )
    return merge_intervals(iv, "user_id", "s", "e").select(
        "user_id",
        "island",
        F.col("start").alias("start_us"),
        F.col("end").alias("end_us"),
        "n_rows",
    ).orderBy("user_id", "island")


# ------------------------------------------------------------------ forward as-of / pivot / unpivot
@register(
    "events_asof_join_forward",
    """
    WITH l AS (SELECT event_id, user_id, epoch_ms(ts) ts_ms FROM events
               WHERE event_type = 'click'),
    r AS (SELECT user_id, epoch_ms(ts) ts_ms, max(value) v FROM events
          WHERE event_type = 'purchase' GROUP BY user_id, epoch_ms(ts)),
    j AS (SELECT l.event_id, l.user_id, l.ts_ms,
                 r.ts_ms AS m_ts, r.v AS m_v
          FROM l ASOF LEFT JOIN r
               ON l.user_id = r.user_id AND l.ts_ms <= r.ts_ms)
    SELECT event_id, user_id, ts_ms,
           CASE WHEN m_ts - ts_ms <= 86400000 THEN m_ts END AS matched_ts,
           CASE WHEN m_ts - ts_ms <= 86400000
                THEN round(m_v, 6) END AS matched_value
    FROM j ORDER BY event_id
    """,
)
def events_asof_join_forward_q(spark, sf_dir):
    """FORWARD as-of join: for every click, the EARLIEST purchase by
    the same user within the NEXT 24 h (time-to-conversion joins).
    Same union-merge plan as the backward operator, scanning each
    key's timeline in reverse — one sort per key, no candidate
    explosion; oracle is DuckDB's native ASOF with the inequality
    flipped."""
    from ..data.io import load_events
    from ..ops.temporal import asof_join

    ev = load_events(spark, sf_dir).withColumn("ts_ms", F.unix_millis("ts"))
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_ms"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts_ms", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        by="user_id",
        ts_col="ts_ms",
        right_value_col="value",
        tolerance=86_400_000,
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_ms",
        "matched_ts",
        F.round("matched_value", 6).alias("matched_value"),
    ).orderBy("event_id")


@register(
    "event_type_hourly_pivot",
    """
    SELECT (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) "view"
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def event_type_hourly_pivot_q(spark, sf_dir):
    """Hour-of-day × event-type PIVOT — the wide-format contingency
    table.  Spark's pivot with an EXPLICIT value list compiles to one
    aggregate with per-column conditional partials (no second pass to
    discover columns, no per-type scan); absent combinations stay
    null, matching SQL conditional sums."""
    ev = _t(spark, sf_dir, "events")
    hour = (F.expr("unix_micros(ts) DIV 3600000000") % 24).alias("hour_of_day")
    return (
        ev.groupBy(hour)
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .orderBy("hour_of_day")
    )


@register(
    "order_status_metrics_unpivot",
    """
    WITH per AS (SELECT o_orderstatus,
                        CAST(count(*) AS BIGINT) n_orders,
                        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          revenue_cents,
                        CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                          max_cents
                 FROM orders GROUP BY o_orderstatus)
    SELECT o_orderstatus, 'n_orders' metric, n_orders "value" FROM per
    UNION ALL SELECT o_orderstatus, 'revenue_cents', revenue_cents FROM per
    UNION ALL SELECT o_orderstatus, 'max_cents', max_cents FROM per
    ORDER BY o_orderstatus, metric
    """,
)
def order_status_metrics_unpivot_q(spark, sf_dir):
    """UNPIVOT/melt: per-status metrics to long form via one `stack`
    projection over the tiny aggregate — the metric-store layout
    (entity, metric, value) downstream monitoring expects.  One
    aggregate pass; the melt is projection-only (no join, no extra
    shuffle)."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    per = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("revenue_cents"),
        F.max(cents).alias("max_cents"),
    )
    return per.select(
        "o_orderstatus",
        F.expr(
            "stack(3, 'n_orders', n_orders, 'revenue_cents', revenue_cents,"
            " 'max_cents', max_cents) AS (metric, value)"
        ),
    ).orderBy("o_orderstatus", "metric")


# ------------------------------------------------------------------ upsert merge / cumulative uniques / RANGE rolling
@register(
    "orders_upsert_merge",
    """
    WITH base AS (SELECT o_orderkey, o_orderstatus,
                         CAST(round(o_totalprice * 100) AS BIGINT) cents
                  FROM orders WHERE o_orderkey % 3 != 0),
    upd AS (SELECT o_orderkey, 'U' o_orderstatus,
                   CAST(round(o_totalprice * 100) AS BIGINT) + 1 cents
            FROM orders WHERE o_orderkey % 5 = 0)
    SELECT coalesce(u.o_orderkey, b.o_orderkey) o_orderkey,
           coalesce(u.o_orderstatus, b.o_orderstatus) o_orderstatus,
           coalesce(u.cents, b.cents) cents,
           CASE WHEN u.o_orderkey IS NULL THEN 'kept'
                WHEN b.o_orderkey IS NULL THEN 'inserted'
                ELSE 'updated' END "action"
    FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
    ORDER BY o_orderkey
    """,
)
def orders_upsert_merge_q(spark, sf_dir):
    """Warehouse MERGE/upsert semantics as one full-outer join +
    coalesce projection (matched → update, unmatched-source → insert,
    unmatched-target → keep) with an `action` audit column — the
    batch analogue of the foreachBatch upsert sink.  One shuffle on
    the merge key; at table scale the target is the bucketed side so
    the join co-locates."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = o.where(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_orderstatus", cents.alias("cents")
    )
    upd = o.where(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (cents + 1).alias("cents"),
    )
    b, u = base.alias("b"), upd.alias("u")
    j = b.join(u, F.col("b.o_orderkey") == F.col("u.o_orderkey"), "full_outer")
    return j.select(
        F.coalesce("u.o_orderkey", "b.o_orderkey").alias("o_orderkey"),
        F.coalesce("u.o_orderstatus", "b.o_orderstatus").alias("o_orderstatus"),
        F.coalesce("u.cents", "b.cents").alias("cents"),
        F.when(F.col("u.o_orderkey").isNull(), "kept")
        .when(F.col("b.o_orderkey").isNull(), "inserted")
        .otherwise("updated")
        .alias("action"),
    ).orderBy("o_orderkey")


@register(
    "cumulative_unique_users",
    """
    WITH f AS (SELECT user_id, min(epoch_us(ts) // 86400000000) first_day
               FROM events GROUP BY user_id),
    d AS (SELECT first_day, count(*) n_new FROM f GROUP BY first_day)
    SELECT first_day AS day_idx, n_new,
           CAST(sum(n_new) OVER (ORDER BY first_day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             cumulative_users
    FROM d ORDER BY day_idx
    """,
)
def cumulative_unique_users_q(spark, sf_dir):
    """Running distinct-user count per day WITHOUT stateful distinct:
    the first-touch trick — distinct-to-date(d) = Σ users whose FIRST
    event day ≤ d, so one per-user min + a tiny per-day count + a
    running sum replace any cumulative-distinct state.  The final
    window is over the days table (≤ tens of thousands of rows at any
    corpus size)."""
    ev = _t(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) DIV 86400000000")
    f = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    d = f.groupBy("first_day").agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, 0)
    return d.select(
        F.col("first_day").alias("day_idx"),
        "n_new",
        F.sum("n_new").over(w).cast("bigint").alias("cumulative_users"),
    ).orderBy("day_idx")


@register(
    "user_value_rolling_7d",
    """
    WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 day_idx,
                      CAST(round(value * 1000000) AS BIGINT) micro
               FROM events),
    pd AS (SELECT user_id, day_idx,
                  CAST(sum(micro) AS BIGINT) day_micro,
                  CAST(count(*) AS BIGINT) day_n
           FROM d GROUP BY user_id, day_idx)
    SELECT user_id, day_idx,
           CAST(sum(day_micro) OVER w AS BIGINT) roll_micro,
           CAST(sum(day_n) OVER w AS BIGINT) roll_n,
           CAST((2 * sum(day_micro) OVER w + sum(day_n) OVER w)
                // (2 * sum(day_n) OVER w) AS BIGINT) roll_mean_micro
    FROM pd
    WINDOW w AS (PARTITION BY user_id ORDER BY day_idx
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, day_idx
    """,
)
def user_value_rolling_7d_q(spark, sf_dir):
    """7-day rolling sum/count/mean per user via a RANGE window frame
    (value-based, so calendar gaps are handled without grid
    densification).  Events pre-aggregate to one row per (user, day)
    BEFORE the window — the frame scans days, not events; the rolling
    mean is the integer half-up micro ratio (no float lane)."""
    ev = _t(spark, sf_dir, "events")
    pd_ = (
        ev.select(
            "user_id",
            F.expr("unix_micros(ts) DIV 86400000000").alias("day_idx"),
            F.round(F.col("value") * 1_000_000).cast("bigint").alias("micro"),
        )
        .groupBy("user_id", "day_idx")
        .agg(
            F.sum("micro").alias("day_micro"),
            F.count(F.lit(1)).alias("day_n"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_idx")
        .rangeBetween(-6, 0)
    )
    rm = F.sum("day_micro").over(w)
    rn = F.sum("day_n").over(w)
    return pd_.select(
        "user_id",
        "day_idx",
        rm.cast("bigint").alias("roll_micro"),
        rn.cast("bigint").alias("roll_n"),
        F.expr(
            "(2 * sum(day_micro) OVER (PARTITION BY user_id ORDER BY day_idx"
            " RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)"
            " + sum(day_n) OVER (PARTITION BY user_id ORDER BY day_idx"
            " RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))"
            " div (2 * sum(day_n) OVER (PARTITION BY user_id ORDER BY day_idx"
            " RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))"
        )
        .cast("bigint")
        .alias("roll_mean_micro"),
    ).orderBy("user_id", "day_idx")


