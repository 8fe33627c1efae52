"""Regenerate PLANS.md — formatted physical plans of headline queries
with scale annotations.  Companion to tests/test_plans.py."""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")

NOTES = {
    "token_blocking": "Both scans pruned to (id, name); per-side partial+final ObjectHashAggregate (collect_set); supplier side broadcast — zero shuffle joins.",
    "relational_token_blocking": "The headline method: concat aggregates, one inner edge join carrying self-loops, re-concat, token explode, block join. Importance tables would enter as broadcasts.",
    "ngram_jaccard_dedup": "PPJoin prefix filter: frequency count -> per-doc window -> prefix self-join -> array_intersect verify; size filter rides the candidate join.",
    "knn_topk": "Index broadcast, deliberate BroadcastNestedLoopJoin cross product, single window for top-k; vec_id filter pushed to the scan.",
    "windowed_event_counts": "Scan pruned to 3 columns; map-side partial aggregate; one exchange on (window, type).",
    "eval_metrics": "Join-count evaluation: pairs left-join broadcast gold, one aggregate for comparisons+TPs.",
    "knn_topk_sharded": "Unbroadcastable-index exact kNN: index scanned IN PLACE through MapInPandas (zero index shuffle — queries arrive via a parquet side-channel read inside the task); WindowGroupLimit prunes partial top-k before the single exchange of the merge window.",
    "ann_topk_ivf_indexed": "Persisted IVF probe: scan shows PartitionFilters on centroid_id (unprobed list directories never open); per-list matmul via FlatMapCoGroupsInPandas; probe projection read from parquet scratch (no session-lifetime cache); tiny final window.",
    "csls_topk": "Hubness-reduced kNN: two MapInPandas exact searches, scalar avg aggregates, two scalar equi-joins, one merge window — the dim-d vectors never enter an exchange after the searches.",
    "mutual_rank_topk": "Rank-based hubness reduction: forward/reverse top-k lists meet in one scalar join; integer scoring; single window.",
    "dbscan_labels": "Density clustering: broadcast epsilon self-join, degree aggregate, min-label propagation rounds (localCheckpoint truncates lineage), border attach, noise union.",
    "multimodal_features": "Binary payloads move Arrow-batched through one MapInPandas; metadata columns stay prunable; no Python row-at-a-time.",
    "repetition_stats": "Gopher repetition filter: bigram explode -> (doc, bigram) partial+final aggregate -> doc aggregate -> join back to per-doc token stats (AQE broadcasts the small side here, SMJ at scale).",
    "stratified_sample": "Deterministic quota sample: WindowGroupLimit partial runs BELOW the strata exchange, so only <=n rows per stratum cross the shuffle.",
    "contamination_check": "Benchmark n-gram set broadcast into the eval explode; hits and sizes come out of one aggregate — the corpus-side shingles never shuffle.",
    "pii_scrub": "Pure codegen regex projection: scan -> project, zero exchanges.",
    "pack_sequences": "Concat-and-chunk packing: one hash exchange on pack_group, per-group window cumsum — no global sort.",
    "embedding_quantize": "Int8 SQ: higher-order-function projection only (scale/codes/error per row), zero exchanges.",
    "vocab_coverage": "Top-k vocabulary via TakeOrderedAndProject (distributed partial top-k, no single-partition window), broadcast membership join, one doc aggregate.",
    "gopher_rules": "Gopher word-level rules: scan -> two projections (token array materialized once, then metrics+flags), zero exchanges, zero joins.",
    "line_dedup": "Cross-corpus line removal: line explode, line-hash count aggregate, anti-join against the (heavy-hitter-only) banned set — AQE broadcasts it at runtime — then one doc_id aggregate restoring order via array_sort, no global sort.",
    "semdedup": "SemDeDup: zero-shuffle centroid assignment (broadcast probe kernel), one exchange into the per-cluster FlatMapGroupsInPandas BLAS tile kernel, left join of per-id maxima back to assignments.",
    "bloom_ingest_gate": "Bloom membership: the bitmap rides ONE one-row broadcast; probing is pure projection — no aggregate, no shuffle join, no per-batch history scan.",
    "neardup_ingest_gate": "Stateless streaming near-dup gate: expression MinHash signature -> band keys -> Bloom probes, all projections over a single one-row broadcast NLJ; no aggregation anywhere in the per-batch side.",
    "cm_token_freq": "Count-Min: token explode -> (row, col) cell count aggregate (<= depth*width groups after partials); estimates probe the dense counter array via a one-row broadcast.",
    "bigram_logprob": "Bigram LM: one posexplode carries (predecessor, token); unigram table broadcast; bigram-type and context joins shuffle on the (a, b) key; final doc aggregate of integer micro-nats.",
    "value_histogram": "Histogram: bucket-id projection -> one partial+final aggregate with <= bins groups.",
    "normalize_text": "Unicode normalization: single MapInPandas stage (vectorized NFC) + codegen lower/collapse projection, zero exchanges.",
    "edit_distance_dedup": "FastSS edit-distance join: deletion-variant explode, variant equi-join, distinct candidate pairs, levenshtein verify on survivors only.",
}


def main() -> None:
    from klinker_spark.queries import QUERIES
    from klinker_spark.session import get_spark

    spark = get_spark("plansdoc")
    sf = "/root/testdata/sf0.001"
    out = [
        "# PLANS — captured physical plans of headline queries (sf0.001)",
        "",
        "Regenerate: `python scripts/dump_plans.py`.  Guarded by",
        "`tests/test_plans.py` so the properties below survive refactors.",
        "",
    ]
    for name, note in NOTES.items():
        df = QUERIES[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        tree = buf.getvalue().split("\n\n")[0]
        out.append(f"## {name}\n\n{note}\n\n```\n{tree}\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))


if __name__ == "__main__":
    main()
