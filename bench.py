"""Headline benchmark — runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect), mirroring how a cluster job would terminate in a
parquet write.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: The benchmark suite: one per major engine path — cheap blocking,
#: token blocking + purge, the relational headline method, tf-idf,
#: MinHash-LSH banding, the dedup family, similarity search, text
#: analysis, windowed events.
BENCH_QUERIES = [
    "standard_blocking",
    "token_blocking",
    "purge_blocks",
    "relational_token_blocking",
    "tfidf_token_blocking",
    "minhash_lsh_blocking",
    "exact_dedup",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "knn_topk",
    "knn_topk_sharded",
    "ann_topk_ivf_indexed",
    "langid",
    "quality_score",
    "tfidf_top_tokens",
    "windowed_event_counts",
    "events_dedup_earliest",
    "sessionize_events",
    "graph_statistics",
    "composite_unique_name_blocking",
    "composite_relational_blocking",
    "gcn_embedding_blocking",
    "deepblocker_knn_blocking",
    "corpus_clean_pipeline",
    "eval_metrics",
]

#: Training-data curation family — benched separately so the headline
#: value stays comparable to rounds 1-2 (same fixed suite).
CURATION_QUERIES = [
    "repetition_stats",
    "dedup_components",
    "contamination_check",
    "pii_scrub",
    "unigram_logprob",
    "dsir_importance",
    "pack_sequences",
    "stratified_sample",
    "vocab_coverage",
    "corpus_rollup",
    "embedding_quantize",
    "duplicated_span_stats",
    "token_budget_mix",
    "incremental_ingest",
    "gopher_rules",
    "line_dedup",
    "semdedup",
    "bloom_ingest_gate",
    "neardup_ingest_gate_fast",
    "cm_token_freq",
    "bigram_logprob",
    "value_histogram",
    "normalize_text",
    "edit_distance_dedup",
    "heavy_shingles",
]


def main() -> None:
    from klinker_spark.queries import QUERIES
    from klinker_spark.session import get_spark

    spark = get_spark("bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    # Warm the JVM (codegen JIT, parquet footer cache, noop committer)
    # before timing — otherwise the first query absorbs ~4 s of one-off
    # session cost that no steady-state deployment pays.
    spark.read.parquet(f"{SF_DIR}/nation.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    # bench hygiene (round-2 verdict): record machine load and a second
    # warm iteration per query so round-over-round comparisons can be
    # adjudicated — a contended sandbox shows up as load_avg >> n_cpus
    # and as cold/warm divergence on unchanged code.
    load_start = os.getloadavg()
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    # Between queries: clear caches AND force a JVM GC.  A 50-query
    # session accumulates broadcasts/codegen classes until GC pressure
    # inflates later queries (~2x measured on contamination_check:
    # 16 s after 10 prior queries, 8.9 s right after a System.gc() —
    # byte-identical plan); a steady-state deployment running one
    # pipeline never sees this, so timing WITH the hygiene reflects
    # real per-query cost.  The gc happens outside the timed window.
    def _reset():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        for out in (timings, warm):
            _reset()
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
        print(f"# {name}: cold {timings[name]}s warm {warm[name]}s", file=sys.stderr)

    # curation family: measured and reported separately — NOT part of
    # the headline value, which stays the fixed r01-comparable suite
    curation = {}
    for name in CURATION_QUERIES:
        _reset()
        t0 = time.time()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        curation[name] = round(time.time() - t0, 3)
        print(f"# {name}: {curation[name]}s (curation)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "warm_total": round(sum(warm.values()), 3),
                "queries_curation": curation,
                "curation_total": round(sum(curation.values()), 3),
                "load_avg": [round(x, 2) for x in load_start],
                "load_avg_end": [round(x, 2) for x in os.getloadavg()],
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
