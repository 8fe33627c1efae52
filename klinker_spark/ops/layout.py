"""Data-layout operators — Z-order (Morton) interleaving for
multi-dimensional scan pruning.

At 100 TB the dominant cost of every query is the scan; parquet
min/max (and partition) pruning only helps along the physical sort
order.  Z-ordering interleaves the bits of two normalised dimensions
so that a range predicate on EITHER dimension maps to a small number
of contiguous key ranges — the standard write-time clustering trick
(Delta/Iceberg ``OPTIMIZE ZORDER BY``) re-expressed as plain Catalyst
integer expressions.

Production path: ``df.repartitionByRange(N, zorder_key(...))`` then a
sorted parquet write — each output file then covers a narrow rectangle
in (x, y) space and the footer min/max statistics prune on both
columns.  ``zorder_bin_stats`` is the audit query for that layout: the
per-bin bounding boxes it reports are exactly the per-file statistics
the scan planner would prune with.

Everything is pure integer/IEEE-double Catalyst expressions (codegen'd,
shuffle-free except the final small aggregate) — no UDFs, no collect.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key_col", "zorder_bin_stats", "compact_small_files"]


def _scale(c: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min-max normalise ``c`` into ``[0, 2**bits - 1]``.

    The subtraction AND the ratio are computed in float64 (int64
    subtraction of a wider-than-half-range span would wrap, or throw
    under ANSI mode) and the level multiply comes last, so arbitrarily
    wide int64 ranges can't overflow; identical IEEE op order on any
    engine gives identical buckets.  A constant column (cmax == cmin)
    maps to level 0.
    """
    top = float((1 << bits) - 1)
    rng = cmax.cast("double") - cmin.cast("double")
    ratio = F.when(
        cmax > cmin, (c.cast("double") - cmin.cast("double")) / rng
    ).otherwise(F.lit(0.0))
    return F.floor(ratio * top).cast("bigint")


def _interleave(xs: Column, ys: Column, bits: int) -> Column:
    """Morton code: bit i of ``xs`` goes to position 2i+1, of ``ys`` to
    2i — an unrolled, codegen-friendly sum of shift/mask terms."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda a, b: a + b, terms).cast("bigint")


def zorder_key_col(
    x: Column, y: Column, xmin: Column, xmax: Column, ymin: Column, ymax: Column,
    bits: int = 16,
) -> Column:
    """Z-order key of ``(x, y)`` given the (broadcast) global bounds —
    a pure column expression usable directly in
    ``repartitionByRange`` / ``sortWithinPartitions``."""
    return _interleave(
        _scale(x, xmin, xmax, bits), _scale(y, ymin, ymax, bits), bits
    )


def zorder_bin_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    bin_bits: int = 10,
) -> DataFrame:
    """Z-order ``df`` on integer columns ``(x_col, y_col)`` and report
    per-bin statistics for the top ``bin_bits`` bits of the key — one
    row per would-be output file under a
    ``repartitionByRange(2**bin_bits, zkey)`` layout.

    Output: ``(zbin, n_rows, min_x, max_x, min_y, max_y)``.  The
    bounding boxes are the scan-pruning envelope: a predicate on either
    dimension eliminates every bin whose box misses it.

    Shuffle profile: one 1-row global min/max aggregate (broadcast
    back), then one aggregate on ``zbin`` (≤ ``2**bin_bits`` groups,
    map-side partials) — scan-bound at any scale.
    """
    # bounds over the SAME row set that gets binned: a row null in one
    # dimension must not stretch the other dimension's normalisation
    # range (it is excluded from the layout entirely)
    binnable = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    bounds = binnable.agg(
        F.min(x_col).alias("xmin"),
        F.max(x_col).alias("xmax"),
        F.min(y_col).alias("ymin"),
        F.max(y_col).alias("ymax"),
    )
    z = zorder_key_col(
        F.col(x_col), F.col(y_col),
        F.col("xmin"), F.col("xmax"), F.col("ymin"), F.col("ymax"),
        bits=bits,
    )
    return (
        binnable.crossJoin(F.broadcast(bounds))
        .select(
            F.shiftright(z, 2 * bits - bin_bits).alias("zbin"),
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
        )
        .groupBy("zbin")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


def _list_data_files(spark, path: str) -> list[tuple[str, int]]:
    """Recursive ``(path, bytes)`` listing via the Hadoop FileSystem
    API (works on any supported FS — local, HDFS, S3A), skipping
    hidden/metadata entries (``_SUCCESS``, ``.crc``, …)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    out = []
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        out.append((st.getPath().toString(), st.getLen()))
    return out


def compact_small_files(
    spark,
    input_dir: str,
    output_dir: str,
    target_bytes: int = 128 << 20,
    order_by: list[str] | None = None,
) -> dict:
    """Rewrite a directory of many small parquet files into
    ``ceil(total_bytes / target_bytes)`` right-sized files — the
    maintenance pass every incremental/streaming sink needs (each
    micro-batch emits per-trigger files; a month of 1-minute triggers
    is 43 k files whose open/footer overhead dominates the scan long
    before the data does).

    Without ``order_by``: a round-robin ``repartition(n)`` — balanced
    files, one shuffle.  With ``order_by``: ``repartitionByRange`` +
    ``sortWithinPartitions`` so each output file covers a narrow key
    range and its parquet footer min/max prunes reads (pair with
    :func:`zorder_key_col` for two-dimensional pruning).

    Returns ``{"n_files_in", "bytes_in", "n_files_out", "n_out_planned"}``.
    The listing is driver-side metadata (one row per FILE, not per
    record — bounded); the data itself moves through one distributed
    shuffle.  Write to a NEW directory and swap atomically (rename /
    metastore repoint) — never compact in place.
    """
    files = _list_data_files(spark, input_dir)
    bytes_in = sum(sz for _, sz in files)
    n_out = max(1, -(-bytes_in // target_bytes))
    df = spark.read.parquet(input_dir)
    if order_by:
        cols = [F.col(c) for c in order_by]
        df = df.repartitionByRange(n_out, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(output_dir)
    n_files_out = len(_list_data_files(spark, output_dir))
    return {
        "n_files_in": len(files),
        "bytes_in": bytes_in,
        "n_files_out": n_files_out,
        "n_out_planned": n_out,
    }
