"""Relational operators Spark lacks as built-ins, composed scale-first.

As-of join: for each left row, the latest right row with right_ts strictly
before left_ts within the same key group. The naive plan (inequality join +
per-left-row top-1) is a quadratic range join; the scalable shape is the
union trick — tag both sides, one shuffle on the key, and a running
last-non-null window over the merged timeline. O(n log n) per key group,
one shuffle total, no inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_prior(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: str,
    payload_out: str = "asof_value",
) -> DataFrame:
    """Strict as-of join: left rows gain `payload_out` = the `payload` of the
    right row with the greatest right_ts < left_ts in the same `on` group
    (null if none — LEFT semantics).

    Strictness is encoded in the merge order: at equal timestamps left rows
    sort BEFORE right rows (_is_left DESC), so a window ending at the
    previous row can never see a same-timestamp right row. Among right rows
    with identical (key, ts) the payload ordering breaks ties
    deterministically — it picks the MAX payload. A native ASOF JOIN (e.g.
    DuckDB's, the oracle for asof_join_events) picks an ARBITRARY row among
    such ties, so oracle parity requires the payload to be functionally
    determined by (key, ts); callers with duplicate right timestamps and an
    independent payload should pre-aggregate right to one row per (key, ts)
    (e.g. max_by) before joining.
    """
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(right.schema[payload].dataType).alias("_payload"),
        F.struct(*left.columns).alias("_row"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.col(payload).alias("_payload"),
        F.lit(None).cast(f"struct<{','.join(f'{c}:{left.schema[c].dataType.simpleString()}' for c in left.columns)}>").alias("_row"),
    )
    w = Window.partitionBy("_k").orderBy(
        F.col("_ts").asc(), F.col("_is_left").desc(), F.col("_payload").asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    merged = l.unionByName(r).withColumn(
        payload_out, F.last("_payload", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("_is_left") == 1).select("_row.*", payload_out)
