"""Multi-dimensional data layout — Z-order (Morton) clustering for the
write path.

A lake partitioned/sorted on one column prunes range predicates on that
column only; queries filtering on a *second* column scan everything.
Z-ordering interleaves the bits of two key columns so that rows close in
EITHER dimension land close in the linear sort order — min/max statistics
per file (parquet row-group stats, the lake's bucket manifest) then prune
scans for predicates on either column. This is the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``, reproduced as plain column
arithmetic so it composes with :mod:`core_etl_spark.lake`'s
``sortWithinPartitions`` write discipline.

The encoding is pure integer shifts/masks (no UDF, whole-stage codegen
keeps it JVM-side), and is engine-portable: DuckDB computes the identical
Morton code with the same ``((x >> i) & 1) << 2i`` expression, so specs
over it are oracle-checkable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def zorder_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative integer
    columns: bit i of x lands at position 2i, bit i of y at 2i+1. Callers
    clamp/normalize their keys into [0, 2^bits) first (e.g.
    ``F.pmod(col, 1 << bits)`` — NOT ``%``, which keeps the dividend's
    sign — or a rank bucket)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"zorder_value: bits must be in [1, 31], got {bits}")
    xs = x.cast("long")
    ys = y.cast("long")
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("zvalue")


def cluster_by_zorder(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-layout ``df`` so files are clustered in Morton order on
    ``(col_x, col_y)``: range-partition on the z-value (each output file
    owns a contiguous z-range → tight min/max stats on BOTH columns), then
    sort within partitions. Drop-in before any ``write.parquet`` /
    ``lake.write`` call; downstream scans filtering on either column prune
    by file statistics.

    100 TB note: ``repartitionByRange`` samples the z distribution (AQE
    handles skew), one shuffle total — the same cost as any clustering
    rewrite; pruning pays it back on every subsequent scan.
    """
    if num_partitions is not None and num_partitions < 1:
        raise ValueError(
            f"cluster_by_zorder: num_partitions must be >= 1, got {num_partitions}"
        )
    # MONOTONIC min-max bucketing into [0, 2^bits), not pmod (r15 review):
    # pmod WRAPS any domain wider than 2^bits, scattering far-apart keys
    # into the same bucket — each output file's min/max then spans nearly
    # the whole real domain and range predicates prune NOTHING, defeating
    # the function's purpose. The scale is order-preserving, so every
    # file's stats stay tight on both columns; the one extra cost is a
    # 1-row min/max aggregate (broadcast back via crossJoin). Equal-width
    # buckets tolerate outlier skew because repartitionByRange samples the
    # Z DISTRIBUTION, not the bucket ids, when sizing files.
    top = F.lit((1 << bits) - 1)

    def _scaled(c: str, lo: F.Column, hi: F.Column) -> F.Column:
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
        return ((F.col(c).cast("double") - lo) * top.cast("double") / span.cast(
            "double"
        )).cast("long")

    bounds = df.agg(
        F.min(F.col(col_x).cast("long")).alias("_xlo"),
        F.max(F.col(col_x).cast("long")).alias("_xhi"),
        F.min(F.col(col_y).cast("long")).alias("_ylo"),
        F.max(F.col(col_y).cast("long")).alias("_yhi"),
    )
    out = df.crossJoin(F.broadcast(bounds))
    z = zorder_value(
        _scaled(col_x, F.col("_xlo"), F.col("_xhi")),
        _scaled(col_y, F.col("_ylo"), F.col("_yhi")),
        bits,
    )
    out = out.withColumn("_z", z).drop("_xlo", "_xhi", "_ylo", "_yhi")
    out = (
        out.repartitionByRange(num_partitions, "_z")
        if num_partitions is not None
        else out.repartitionByRange("_z")
    )
    return out.sortWithinPartitions("_z").drop("_z")
