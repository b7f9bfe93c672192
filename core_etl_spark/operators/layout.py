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
    # pmod, not %: Spark's % keeps the dividend's sign, so negative keys
    # would hit shiftright sign-extension and z-cluster as garbage
    # (ADVICE r06). pmod maps every key into [0, 2^bits).
    z = zorder_value(
        F.pmod(F.col(col_x), F.lit(1 << bits)),
        F.pmod(F.col(col_y), F.lit(1 << bits)),
        bits,
    )
    out = df.withColumn("_z", z)
    out = (
        out.repartitionByRange(num_partitions, "_z")
        if num_partitions
        else out.repartitionByRange("_z")
    )
    return out.sortWithinPartitions("_z").drop("_z")
