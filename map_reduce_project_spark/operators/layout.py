"""Data-layout operators: Z-order (Morton) clustering for multi-column
scan pruning.

At 100 TB the dominant cost of a selective query is the files it must
open. Sorting by one column gives perfect pruning on that column and
none on the others; interleaving the BITS of several columns (the
Z-/Morton curve) gives every interleaved column locality, so each
parquet file's min/max footer spans a small hyper-rectangle and a
predicate on ANY of the columns prunes most files. This is the same
layout primitive Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``,
expressed here as plain DataFrame operations: a JVM-side bit-interleave
expression + ``repartitionByRange`` on the code + an in-partition sort.

Everything stays whole-stage-codegen (shift/and/or arithmetic on
longs — no UDF), and the interleave is exactly reproducible in ANSI
SQL, so the code computation itself sits under the driver's hash gate
(``layout_zorder`` query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_code(cols: list[Column | str], bits: int = 10) -> Column:
    """Morton code: interleave the low ``bits`` bits of each column.

    Column i's bit b lands at output position ``b * n_cols + i`` — the
    standard round-robin interleave. Inputs must already be bucket
    ordinals in [0, 2^bits) (rank/quantile-bucket wide-domain columns
    first); values are masked to ``bits`` bits, so out-of-range inputs
    wrap rather than corrupt neighbors' bit lanes. The expression tree
    is ``bits * n_cols`` shift/and/multiply terms summed — all JVM
    integer arithmetic inside one codegen stage.
    """
    n = len(cols)
    code: Column | None = None
    for i, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        col = col.cast("long")
        for b in range(bits):
            term = (
                F.shiftright(col, b).bitwiseAND(F.lit(1))
                * F.lit(1 << (b * n + i))
            )
            code = term if code is None else code + term
    assert code is not None
    return code


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    n_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` along the Z-curve of ``cols``: range-partition by
    the Morton code, then sort within partitions by it. Each output
    partition (→ parquet file) then covers a compact hyper-rectangle
    in the column space, so footer min/max stats prune on every
    clustered column. Write with ``sources.io.write_parquet`` to
    materialize the layout.
    """
    coded = df.withColumn("_zcode", zorder_code(cols, bits))
    parts = (
        coded.repartitionByRange(n_partitions, "_zcode")
        if n_partitions
        else coded.repartitionByRange("_zcode")
    )
    return parts.sortWithinPartitions("_zcode").drop("_zcode")
