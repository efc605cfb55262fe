"""Z-order (Morton-curve) clustered writes: multi-dimensional data
skipping for parquet scans.

Sorting a table by one column makes file/row-group min-max stats
selective for THAT column only; interleaving the bits of two (or more)
normalized columns into a Morton code and range-partitioning + sorting
on it keeps EVERY interleaved column's per-file value span small, so a
predicate on any of them prunes most files from the scan (the
technique behind Delta/Iceberg OPTIMIZE ZORDER, from the public
Morton-curve literature). The reference engine has no storage at all
(its only sink is Kafka, SURVEY.md §2.1 #11); this is storage-level
machinery for the tables this repo materializes.

Everything is JVM expression work: min-max scaling from one broadcast
aggregate, bit interleaving as a shiftleft/bitwise-OR expression tree,
and a rangepartition+sort write — no UDF, no driver-side data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per interleaved column. 2 columns x 8 bits = 16-bit Morton
#: codes — 65k distinct cells, plenty for file-level clustering.
ZORDER_BITS = 8


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max scale ``col`` to an integer in [0, 2^bits - 1]; constant
    columns (hi == lo) collapse to 0."""
    span = hi - lo
    scaled = F.when(
        span > 0,
        F.floor(((col - lo) / span) * ((1 << bits) - 1) + 0.5),
    ).otherwise(F.lit(0))
    return scaled.cast("long")


def morton_interleave(a: Column, b: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Morton code (a's bit i at position 2i+1, b's at 2i).
    Pure shift/and/or expression tree — codegen'd, no UDF."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i) % 2, 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(b, i) % 2, 2 * i))
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as parquet clustered on the Morton code of
    ``(col_a, col_b)``: one broadcast min-max aggregate normalizes both
    columns, ``repartitionByRange`` on the code splits the curve into
    ``n_files`` contiguous segments (each file owns a compact curve
    region => a small bounding box in (a, b) space), and an in-file
    sort keeps row-group stats tight too. Predicates on EITHER column
    can then skip most files on min-max stats alone.

    Scale: the range partitioner samples the z-values (no global
    sort); everything else is a narrow projection."""
    stats = df.agg(
        F.min(col_a).alias("_alo"),
        F.max(col_a).alias("_ahi"),
        F.min(col_b).alias("_blo"),
        F.max(col_b).alias("_bhi"),
    )
    with_z = (
        df.join(F.broadcast(stats))
        .withColumn(
            "_z",
            morton_interleave(
                _scale_to_bits(F.col(col_a), F.col("_alo"), F.col("_ahi"), bits),
                _scale_to_bits(F.col(col_b), F.col("_blo"), F.col("_bhi"), bits),
                bits,
            ),
        )
        .drop("_alo", "_ahi", "_blo", "_bhi")
    )
    (
        with_z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
