"""Local-extremum selection over ordered sequences.

The reference picks spectrogram peaks with a ±neighborhood local-max
predicate before hashing them (``peak_local_max`` neighborhood loop,
``/root/reference/utils/_Shazam_.py:165-183``): a cell survives only
if it is strictly greater than every neighbor within the window. This
module is the engine twin generalized to any ordered, partitioned
sequence: one pass, two frame-bounded window aggregates, no shuffle
beyond the partitioning the window needs — at 100 TB the plan is a
single exchange on the partition keys followed by narrow sorted-frame
maxima (no self-join, no explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def local_peaks(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    value_col: str,
    w: int = 2,
) -> DataFrame:
    """Rows whose ``value_col`` is STRICTLY greater than every
    neighbor within ±``w`` rows of the (partitioned, ordered)
    sequence.

    Strictness resolves plateaus deterministically (a flat run has no
    peak — matching the reference's exclusive comparison); sequence
    boundaries compare only against the neighbors that exist. The two
    frames share one sort, so the physical plan is a single
    exchange+sort per partition key followed by two running maxima.
    """
    base = Window.partitionBy(*part_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    left = base.rowsBetween(-w, -1)
    right = base.rowsBetween(1, w)
    v = F.col(value_col)
    lm = F.max(value_col).over(left)
    rm = F.max(value_col).over(right)
    return (
        df.withColumn("_lm", lm)
        .withColumn("_rm", rm)
        .filter(
            (F.col("_lm").isNull() | (v > F.col("_lm")))
            & (F.col("_rm").isNull() | (v > F.col("_rm")))
        )
        .drop("_lm", "_rm")
    )
