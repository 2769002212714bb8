"""Shuffle-aware distributed utilities: global sequence numbers and
salted per-group top-k.

Both exist because the naive formulations collapse to a single task:

* ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the
  whole dataset through ONE partition — unusable at 10^10 rows.
  :func:`global_sequence` instead range-partitions on the order key,
  numbers rows *within* each partition (parallel windows), and shifts
  by per-partition offsets computed from a tiny count aggregate —
  the classic zipWithIndex two-phase pattern, kept in DataFrame land.

* ``row_number() OVER (PARTITION BY host ...)`` serializes a hot host
  (one host holding 60% of the frontier is a named fixture property).
  :func:`topk_per_group` first ranks within ``salt`` random sub-groups
  of each host (parallel), keeps k per sub-group, then ranks the
  surviving ≤ salt·k rows per host — the final skewed window sees a
  bounded row count regardless of host size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SEQ_PID = "__seq_pid"
_SEQ_RN = "__seq_rn"
_SEQ_OFF = "__seq_off"
_SALT = "__salt"
_SUB_RN = "__sub_rn"


def global_sequence(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = dense global sequence (start, start+1, ...)
    following the total order of ``order_cols`` (must be unique).

    ``num_partitions`` sizes the range exchange; callers that know the
    input is small (early crawl rounds) pass 1, which skips the range
    sampling + offset jobs entirely — a single-partition window is
    cheaper than the two-phase machinery below ~100k rows."""
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    if int(n) == 1:
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return (
            df.coalesce(1)
            .withColumn(out_col, F.row_number().over(w) - 1 + F.lit(start))
        )
    ranged = df.repartitionByRange(int(n), *order_cols).withColumn(
        _SEQ_PID, F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=False)  # reuse one shuffle for both jobs
    counts = ranged.groupBy(_SEQ_PID).count().collect()
    # partition ids follow the range order, so cumulative counts = offsets
    offsets: dict[int, int] = {}
    acc = start
    for row in sorted(counts, key=lambda r: r[_SEQ_PID]):
        offsets[row[_SEQ_PID]] = acc
        acc += row["count"]
    off_df = df.sparkSession.createDataFrame(
        [(p, o) for p, o in offsets.items()] or [(0, start)],
        f"{_SEQ_PID} int, {_SEQ_OFF} long",
    )
    w = Window.partitionBy(_SEQ_PID).orderBy(*[F.col(c) for c in order_cols])
    return (
        ranged.withColumn(_SEQ_RN, F.row_number().over(w))
        .join(F.broadcast(off_df), _SEQ_PID)
        .withColumn(out_col, F.col(_SEQ_OFF) + F.col(_SEQ_RN) - F.lit(1))
        .drop(_SEQ_PID, _SEQ_RN, _SEQ_OFF)
    )


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    k_col,
    salt: int = 32,
    unique_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (top-k, rest) per group, ordered by order_cols.

    ``k_col`` is a Column (may vary per row, e.g. per-host quota).
    Returns both halves so the caller can defer the rest.  Skew-safe:
    two-phase salted ranking as described in the module docstring.
    """
    order = [F.col(c) for c in order_cols]
    salt_src = F.col(unique_col) if unique_col else F.concat_ws("\0", *order_cols)
    salted = df.withColumn(_SALT, F.pmod(F.xxhash64(salt_src), F.lit(salt)))
    w_sub = Window.partitionBy(group_col, _SALT).orderBy(*order)
    pre = salted.withColumn(_SUB_RN, F.row_number().over(w_sub))
    # a row can only be in the true top-k if it's in its sub-group's top-k
    survivors = pre.filter(F.col(_SUB_RN) <= k_col)
    eliminated = pre.filter(F.col(_SUB_RN) > k_col)

    w_full = Window.partitionBy(group_col).orderBy(*order)
    ranked = survivors.withColumn(_SEQ_RN, F.row_number().over(w_full))
    top = ranked.filter(F.col(_SEQ_RN) <= k_col).drop(_SALT, _SUB_RN, _SEQ_RN)
    rest = ranked.filter(F.col(_SEQ_RN) > k_col).drop(_SALT, _SUB_RN, _SEQ_RN).unionByName(
        eliminated.drop(_SALT, _SUB_RN)
    )
    return top, rest
