"""Append a per-iteration mechanism addendum to the iterative
operators' plans/r12 files.

The iterative operators (pagerank, label-prop, BFS, HITS, GCN/LightEA,
CC propagation) truncate lineage each round, so their final-frame
``explain`` cannot show the per-iteration join.  This script dumps the
actual mechanism the r12 partitioning sweep changed, with real explain
output on the bench session:

- BEFORE shape: loop-invariant table localCheckpoint-ed after an
  explicit hash repartition — Spark 4 erases outputPartitioning, so the
  per-round SortMergeJoin re-Exchanges the |E| side every iteration.
- AFTER shape: the same table persisted pre-partitioned on the
  per-round join key — the join consumes the InMemoryTableScan with no
  Exchange above it.

Usage: python scripts/dump_iteration_mechanism.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, ".")

ITERATIVE = {
    "pagerank_importance": "head",
    "personalized_pagerank": "head",
    "token_community_labels": "nbr",
    "bfs_reach": "u",
    "hits_hubs_authorities": "src/dst (two cached layouts, size-gated at 2M edges)",
    "gcn_propagation_md5": "tail",
    "lightea_propagation_md5": "dst / id / r",
    "dedup_components": "nid",
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().split("\n\n")[0]


def main() -> None:
    from klinker_spark.session import get_spark

    spark = get_spark("iter-mechanism")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    edges = spark.range(100000).selectExpr(
        "id % 997 as head", "id as tail"
    )
    scores = spark.range(997).selectExpr("id as head", "id * 10 as s")

    ckpt = edges.repartition(part, "head").localCheckpoint()
    before_plan = plan_of(ckpt.join(scores, "head", "left"))

    cached = edges.repartition(part, "head").persist()
    cached.count()
    after_plan = plan_of(cached.join(scores, "head", "left"))
    cached.unpersist()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    header = (
        "\n\n# --- Per-iteration mechanism addendum (r12 partitioning"
        " sweep) ---\n"
        "# The final-frame plan above is checkpoint-truncated; the loop"
        " body is\n"
        "# internal.  The r12 change swaps the loop-invariant table's"
        " lineage\n"
        "# treatment; the per-round join plans as follows (real explain"
        " on this\n"
        "# session, synthetic 100k-edge table, broadcast disabled to"
        " expose the\n"
        "# join exchange; mechanism pinned by"
        " tests/test_ops.py::"
        "test_pagerank_iteration_reuses_cached_edge_partitioning).\n"
    )
    before_note = (
        "# BEFORE (r11): localCheckpoint after hash repartition — Spark 4\n"
        "# erases outputPartitioning, the |E| side re-Exchanges EVERY"
        " round:\n"
    )
    after_note = (
        "# AFTER (r12): persisted pre-partitioned on the per-round join"
        " key —\n# no Exchange above the InMemoryTableScan:\n"
    )

    for name, key in ITERATIVE.items():
        for suffix, note, plan in (
            ("before", before_note, before_plan),
            ("after", after_note, after_plan),
        ):
            path = os.path.join("plans/r12", f"{name}_{suffix}.txt")
            if not os.path.exists(path):
                continue
            with open(path) as f:
                if "mechanism addendum" in f.read():
                    continue
            with open(path, "a") as f:
                f.write(header)
                f.write(f"# This operator's per-round join key: {key}\n")
                f.write(note)
                f.write(plan + "\n")
            print(f"appended {path}")


if __name__ == "__main__":
    main()
