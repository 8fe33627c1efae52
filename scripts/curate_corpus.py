"""End-to-end corpus curation CLI — raw documents in, training shards
out.  The composition every pretraining pipeline runs, as ONE Spark
job over the engine's curation operators:

  1. quality gate     — Gopher repetition filter (``repetition_stats``)
                        + unigram-LM score floor (``unigram_logprob``)
  2. PII scrub        — emails / digit runs redacted (``pii_scrub``)
  3. dedup            — exact-Jaccard near-dup pairs → connected
                        components → keep canonical docs only
  4. decontaminate    — drop docs overlapping the benchmark slice's
                        3-grams above a threshold (``contamination_check``)
  5. pack             — concat-and-chunk into token-budget bins
                        (``pack_sequences``)
  6. write            — parquet shards partitioned by ``pack_group``
                        (each group is an independently readable,
                        deterministic training stream)

Usage:
  python scripts/curate_corpus.py --sf-dir /root/testdata/sf0.001 \\
      --out /tmp/shards --budget 256 --bench-source src0

Prints one JSON line of per-stage survivor counts for auditing.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def curate(
    spark,
    sf_dir: str,
    out: str,
    budget: int = 256,
    bench_source: str = "src0",
    min_logprob: float = -9.0,
    max_contamination: float = 0.5,
    normalize: bool = False,
    gopher: bool = False,
    line_dedup_max_occ: int | None = None,
    span_dedup_k: int | None = None,
):
    from klinker_spark.ops.curation import (
        canonical_dedup,
        contamination_check,
        gopher_rules,
        line_dedup,
        pack_sequences,
        pii_scrub,
        remove_duplicated_spans,
        repetition_stats,
        unigram_logprob_quality,
    )
    from klinker_spark.ops.dedup import ngram_jaccard_dedup
    from klinker_spark.ops.textstats import normalize_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = {"input": docs.count()}

    # 0a. optional Unicode normalization (NFC + lower + ws collapse) —
    # BEFORE any hashing so codepoint variants collapse together
    if normalize:
        docs = (
            normalize_text(docs)
            .drop("text")
            .withColumnRenamed("text_norm", "text")
        )

    # 0b. optional cross-corpus duplicated-line removal (C4/RefinedWeb)
    # — runs before doc-level stats so boilerplate lines don't count
    if line_dedup_max_occ is not None:
        ld = line_dedup(docs, max_occurrences=line_dedup_max_occ)
        docs = (
            docs.drop("text")
            .join(ld.select("doc_id", F.col("text_clean").alias("text")), "doc_id")
            .where(F.length("text") > 0)
        )
        docs = docs.localCheckpoint(eager=True)
        stats["after_line_dedup"] = docs.count()

    # 1. quality gate: repetition keep-flag AND LM score floor
    #    (+ optionally the full Gopher word-level rule set)
    rep = repetition_stats(docs).where(F.col("keep") == 1).select("doc_id")
    lm = (
        unigram_logprob_quality(docs)
        .where(F.col("avg_logprob") >= min_logprob)
        .select("doc_id")
    )
    kept = docs.join(rep, "doc_id", "left_semi").join(lm, "doc_id", "left_semi")
    if gopher:
        gr = gopher_rules(docs, min_stop_hits=1).where(F.col("keep") == 1).select("doc_id")
        kept = kept.join(gr, "doc_id", "left_semi")
    kept = kept.localCheckpoint(eager=True)  # three downstream consumers
    stats["after_quality"] = kept.count()

    # 2. PII scrub (text rewritten in place)
    scrubbed = kept.drop("text").join(
        pii_scrub(kept).select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    )

    # 3. near-dup removal: pairs → components → canonical survivors
    pairs = ngram_jaccard_dedup(scrubbed, shingle_k=3, threshold=0.4).select(
        "doc_a", "doc_b"
    )
    canon = canonical_dedup(scrubbed, pairs).where(F.col("is_duplicate") == 0)
    deduped = scrubbed.join(canon.select("doc_id"), "doc_id", "left_semi")
    stats["after_dedup"] = deduped.count()

    # 3b. optional substring dedup (Lee et al.): strip tokens covered
    # by k-gram spans duplicated across the surviving corpus —
    # boilerplate inside otherwise-unique docs, which doc-level dedup
    # (stage 3) can't see; docs emptied by the removal drop out
    if span_dedup_k is not None:
        rs = remove_duplicated_spans(deduped, span_k=span_dedup_k)
        deduped = deduped.drop("text").join(
            rs.where(F.col("n_after") > 0).select(
                "doc_id", F.col("clean_text").alias("text")
            ),
            "doc_id",
        )
        deduped = deduped.localCheckpoint(eager=True)  # two consumers below
        stats["after_span_dedup"] = deduped.count()

    # 4. benchmark decontamination
    contaminated = (
        contamination_check(deduped, F.col("source") == bench_source)
        .where(F.col("contamination") > max_contamination)
        .select("doc_id")
    )
    clean = deduped.join(contaminated, "doc_id", "left_anti").where(
        F.col("source") != bench_source
    )
    stats["after_decontamination"] = clean.count()

    # 5-6. pack into token-budget bins and write shards
    packed = clean.join(pack_sequences(clean, budget=budget), ["doc_id"], "inner")
    (
        packed.select(
            "doc_id", "text", "lang", "source", "pack_group", "start_offset", "bin_id"
        )
        .repartition("pack_group")
        .write.mode("overwrite")
        .partitionBy("pack_group")
        .parquet(out)
    )
    stats["packed"] = packed.count()
    stats["bins"] = packed.select("pack_group", "bin_id").distinct().count()
    return stats


def streaming_curate(
    spark,
    input_dir: str,
    out: str,
    history_dir: str,
    bootstrap_dir: str | None = None,
    available_now: bool = True,
    checkpoint_dir: str | None = None,
):
    """Continuous-ingestion curation: the batch pipeline's gates wired
    into ONE ``foreachBatch`` stream over a document directory — the
    runbook for a corpus that grows while training data is curated.

    Per micro-batch (each batch is a plain DataFrame, so the exact
    batch operators run unchanged — Structured Streaming's unified
    model):

    1. quality gate  — Gopher word-level rules (stateless per-doc);
    2. PII scrub     — text rewritten in place (stateless);
    3. exact gate    — anti-join of content fingerprints against the
                       HISTORY table (`incremental_new_docs`), so
                       re-delivered/reprocessed content never
                       re-ingests: the gate makes the pipeline
                       idempotent under at-least-once delivery;
    4. near-dup gate — MinHash-band Bloom probe against the history
                       band index (`incremental_neardup_docs`):
                       per-row expressions only, state = the Bloom
                       bitmap (m_bits), independent of history size;
    5. write         — survivors to ``out/batch=N``; their
                       fingerprints AND band keys to
                       ``history_dir/{fp,bands}/batch=N`` — the
                       incremental history refresh: batch N+1's gates
                       see batch N's admissions.

    Restart safety: foreachBatch is at-least-once, so EVERY sink write
    is an overwrite of the batch's own ``batch=N`` directory and the
    gates read only ``batch < N`` — a replayed batch sees exactly the
    pre-batch history, recomputes identical survivors, and rewrites
    identical content (a plain append would duplicate on replay; a
    gate that saw the crashed attempt's own fingerprints would erase
    the batch).

    History is re-read per batch: the Bloom fold is one aggregate over
    the band table — at 100 TB corpus scale, keep the folded bitmap
    itself as the persisted artifact and refresh it with the batch's
    new keys instead of re-folding (the fold is associative;
    `bloom_build` merges), which makes per-batch cost independent of
    corpus size.  Here the re-fold keeps the demo honest with zero
    extra bookkeeping.

    ``bootstrap_dir``: existing-corpus parquet whose fingerprints/bands
    seed the history before the stream starts (idempotent: overwrites).
    ``available_now=True`` drains what's in ``input_dir`` and stops —
    the testable mode; pass False for a continuous 30 s-trigger run.

    Returns the streaming query handle (already awaited when
    ``available_now``).
    """
    import os

    from klinker_spark.ops.curation import gopher_rules, pii_scrub
    from klinker_spark.streaming.dedup import (
        incremental_neardup_docs,
        incremental_new_docs,
        neardup_band_keys,
    )

    fp_dir = os.path.join(history_dir, "fp")
    bands_dir = os.path.join(history_dir, "bands")
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"

    # History is BATCH-KEYED (batch=N partition dirs) and every batch
    # write is an OVERWRITE of its own directory: foreachBatch replays
    # under at-least-once delivery, and batch N's gates read only
    # batch < N — a replayed batch sees exactly the pre-batch history,
    # recomputes identical survivors, and rewrites identical content.
    # A plain append (or gating against a history that already holds
    # the crashed attempt's own fingerprints) would either duplicate or
    # silently erase the batch.
    def _write_history(docs_df, batch_id: int):
        docs_df.select(F.md5("text").alias("fingerprint")).write.mode(
            "overwrite"
        ).parquet(f"{fp_dir}/batch={batch_id}")
        neardup_band_keys(docs_df).select("band_key").write.mode("overwrite").parquet(
            f"{bands_dir}/batch={batch_id}"
        )

    def _read_history(dir_: str, batch_id: int):
        return spark.read.parquet(dir_).where(F.col("batch") < batch_id).drop("batch")

    if bootstrap_dir is not None:
        boot = spark.read.parquet(f"{bootstrap_dir}/documents.parquet")
        _write_history(boot, -1)
    elif not os.path.isdir(fp_dir):  # empty history bootstrap
        from klinker_spark.session import local_df

        local_df(spark, [], "fingerprint string").write.mode("overwrite").parquet(
            f"{fp_dir}/batch=-1"
        )
        local_df(spark, [], "band_key string").write.mode("overwrite").parquet(
            f"{bands_dir}/batch=-1"
        )

    def process_batch(batch_df, batch_id: int):
        # 1-2: stateless quality + scrub
        good = batch_df.join(
            gopher_rules(batch_df, min_stop_hits=0, min_words=5)
            .where(F.col("keep") == 1)
            .select("doc_id"),
            "doc_id",
            "left_semi",
        )
        scrubbed = good.drop("text").join(
            pii_scrub(good).select("doc_id", F.col("clean_text").alias("text")), "doc_id"
        )
        # 3: exact-content gate vs history (strictly earlier batches)
        hist_fp = _read_history(fp_dir, batch_id)
        fresh = incremental_new_docs(scrubbed, hist_fp)
        # 4: near-dup gate vs history band index (Bloom-folded)
        hist_bands = _read_history(bands_dir, batch_id)
        gated = incremental_neardup_docs(fresh, hist_bands).where(
            ~F.col("maybe_neardup")
        )
        # 4b: INTRA-batch gates (r4 advice): the history gates see only
        # batch < N, so exact/near duplicates arriving within the SAME
        # micro-batch would all be admitted (and behavior would depend
        # on file packing).  Exact: keep the lowest doc_id per content
        # hash.  Near-dup: greedy LSH — drop any doc one of whose band
        # buckets contains a smaller surviving doc_id (same band
        # construction as the history index, so the two gates agree).
        first_exact = (
            gated.groupBy(F.md5("text").alias("_fp"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        batch_unique = gated.join(first_exact, "doc_id", "left_semi")
        bk = neardup_band_keys(batch_unique)
        intra_dropped = (
            bk.join(
                bk.groupBy("band_key").agg(F.min("doc_id").alias("_keep")),
                "band_key",
            )
            .where(F.col("doc_id") > F.col("_keep"))
            .select("doc_id")
            .distinct()
        )
        admitted = batch_unique.join(intra_dropped, "doc_id", "left_anti")
        survivors = admitted.select(
            "doc_id", "text", "lang", "source", "n_chars"
        ).localCheckpoint(eager=True)  # one computation feeds 3 writes
        # 5: idempotent output + history refresh (both batch-keyed
        # overwrites — see the history comment above)
        survivors.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")
        _write_history(survivors, batch_id)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # micro-batch per arriving file
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(history_dir, "_checkpoint"),
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="30 seconds").start()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=256)
    ap.add_argument("--bench-source", default="src0")
    ap.add_argument("--min-logprob", type=float, default=-9.0)
    ap.add_argument("--max-contamination", type=float, default=0.5)
    ap.add_argument(
        "--normalize", action="store_true", help="NFC + lower + ws-collapse first"
    )
    ap.add_argument(
        "--gopher", action="store_true", help="also apply the Gopher word-level rules"
    )
    ap.add_argument(
        "--line-dedup-max-occ",
        type=int,
        default=None,
        help="enable cross-corpus line dedup; lines occurring more often are removed",
    )
    ap.add_argument(
        "--span-dedup-k",
        type=int,
        default=None,
        help="enable substring dedup: remove tokens covered by k-gram "
        "spans duplicated corpus-wide",
    )
    ap.add_argument(
        "--streaming",
        action="store_true",
        help="continuous-ingestion mode: foreachBatch gates over a "
        "document stream directory (--input-dir), history in --history-dir",
    )
    ap.add_argument("--input-dir", default=None, help="stream source dir (parquet files)")
    ap.add_argument("--history-dir", default=None, help="corpus history dir (fp/ + bands/)")
    ap.add_argument(
        "--bootstrap-dir", default=None,
        help="existing corpus sf-dir whose documents seed the history",
    )
    args = ap.parse_args()

    from klinker_spark.session import get_spark

    spark = get_spark("curate_corpus")
    if args.streaming:
        if not args.input_dir or not args.history_dir:
            ap.error("--streaming requires --input-dir and --history-dir")
        streaming_curate(
            spark,
            args.input_dir,
            args.out,
            args.history_dir,
            bootstrap_dir=args.bootstrap_dir,
        )
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"mode": "streaming", "ingested": n}))
        return
    stats = curate(
        spark,
        args.sf_dir,
        args.out,
        budget=args.budget,
        bench_source=args.bench_source,
        min_logprob=args.min_logprob,
        max_contamination=args.max_contamination,
        normalize=args.normalize,
        gopher=args.gopher,
        line_dedup_max_occ=args.line_dedup_max_occ,
        span_dedup_k=args.span_dedup_k,
    )
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
