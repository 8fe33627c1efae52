"""Dump ``explain("formatted")`` for a set of queries to per-query files.

Companion to the optimization-round deliverable
``plans/r<NN>/<query>_{before,after}.txt``: run this at the pre-round
commit (in a worktree) with suffix ``before`` and at HEAD with suffix
``after``.

Usage: python scripts/dump_round_plans.py OUTDIR SUFFIX [SF_DIR] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, ".")

DEFAULT_QUERIES = [
    # r12 touched set
    "pagerank_importance",
    "personalized_pagerank",
    "token_community_labels",
    "bfs_reach",
    "hits_hubs_authorities",
    "gcn_propagation_md5",
    "lightea_propagation_md5",
    "dedup_components",
    "duplicated_span_stats",
    "remove_duplicated_spans",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "ngram_containment_dedup",
    "edit_distance_dedup",
    "knn_topk_sharded",
    "knn_topk",
]


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:] or DEFAULT_QUERIES
    os.makedirs(outdir, exist_ok=True)

    from klinker_spark.queries import QUERIES
    from klinker_spark.session import get_spark

    spark = get_spark("plansdump")
    for name in names:
        try:
            df = QUERIES[name](spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record, keep dumping
            text = f"ERROR dumping plan: {exc!r}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') @ {sf} [{suffix}]\n")
            f.write(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
