"""Multi-dimensional data layout: Z-order (Morton) clustering for min/max
file skipping.

Partition pruning (sources/… partitionBy + PartitionFilters) covers the ONE
dominant access dimension; queries that filter on a *second* dimension
(user AND time, price AND date) still read every file of the matching
partitions. Z-ordering fixes that layer: sort the data by the interleaved
bits of the filter columns before writing, so each output file covers a
small hyper-rectangle of the key space and parquet footer min/max stats
let the reader skip files that can't match a multi-dimensional predicate.

This is pure layout — no new query semantics: readers stay ordinary
``spark.read.parquet`` + filters; the win shows up as row-groups/files
skipped (verified in tests/test_partitioning.py by reading footer stats
directly). At 100 TB, Z-order within each date partition is the standard
recipe: partition prune on date, stat-skip on (user_id, value, …).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension in the Morton code (8 bits → 256 bins/dim, 65536
#: curve cells — plenty for file-level skipping, tiny boundary arrays).
ZORDER_BITS = 8


def _quantile_bin(df: DataFrame, c: str, bits: int) -> Column:
    """Map a column to [0, 2^bits) by approximate-quantile binning.

    Z-order needs uniform key coverage; quantile binning makes the curve
    robust to skewed distributions (raw-value scaling would put 99% of
    power-law rows in one cell). Boundaries come from approxQuantile —
    a sampled sketch, no global sort, no window: the exact-rank
    alternative (percent_rank over an unpartitioned window) funnels the
    whole table through ONE task and must never appear in a write path.
    The per-row bin is then a filter-count over the 2^bits-element literal
    boundary array, evaluated map-side.
    """
    n_bins = 1 << bits
    probs = [i / n_bins for i in range(1, n_bins)]
    bounds = df.stat.approxQuantile(c, probs, 0.001)
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.size(F.filter(arr, lambda b: b <= F.col(c).cast("double"))).cast(
        "long"
    )


def morton_code(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` bits of x and y (x even positions, y odd)
    as a pure Catalyst expression — a bit-shift fold, fully codegen'd."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return code


def zorder_write(
    df: DataFrame, path: str, col_x: str, col_y: str, n_files: int = 16
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Z-curve of
    (col_x, col_y).

    ``repartitionByRange`` on the Morton code gives each output file a
    contiguous curve segment (≈ a small rectangle in (x, y) space), so the
    per-file min/max of BOTH columns are tight. The global ranking pass is
    one extra shuffle at write time — amortized over every future read.
    """
    coded = df.withColumn(
        "_z",
        morton_code(
            _quantile_bin(df, col_x, ZORDER_BITS),
            _quantile_bin(df, col_y, ZORDER_BITS),
        ),
    )
    (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
