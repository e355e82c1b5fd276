"""Temporal join operators: as-of join and banded time-range join.

Spark has no built-in as-of join (the reference's event model pairs
observations with the latest prior state the same way Flink's temporal
join and kdb's aj do), so both operators here are compositions of
built-in DataFrame ops with exactly one shuffle on the join key:

- ``asof_join``: union-then-window.  Right rows and left rows are
  unioned with a stream tag, sorted per user by (time, tag, id), and a
  running ``last(..., ignorenulls=True)`` carries the most recent right
  row forward onto each left row.  One shuffle (the window partition),
  linear scan per partition, NO per-key array materialization - a
  celebrity user costs a long sorted run, not driver memory.  At 100 TB
  the refinement is range-partitioning each hot user by time block and
  carrying the last right row across block boundaries; the operator's
  semantics (and this oracle) are unchanged by that split.
- ``range_pair_join``: equi-join on (user, time-bucket) with the probe
  side replicated to the 3 adjacent buckets, then an exact |dt| filter.
  Bounded 3x fan-out instead of an O(n^2) time-cross-join; bucket width
  = the match window, so every qualifying pair meets in EXACTLY one
  bucket (the build row's own) and needs no dedup.

Timestamps are compared at microsecond precision (unix_micros /
epoch_us) so second-granularity ties cannot make the match ambiguous;
the remaining tie rule (equal microsecond) is pinned: a right row at
exactly the left row's timestamp IS visible (at-or-before, inclusive),
and among equal-time right rows the largest event_id wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    events: DataFrame, left_type: str = "error", right_type: str = "click"
) -> DataFrame:
    """For every ``left_type`` event: the most recent at-or-before
    ``right_type`` event of the same user (LEFT semantics - unmatched
    lefts keep NULL match columns).

    Output: (event_id, user_id, epoch_us, match_event_id, lag_us).
    """
    e = events.select(
        "event_id",
        "user_id",
        "event_type",
        # parquet carries TIMESTAMP_NTZ; the UTC-pinned session makes the
        # cast + unix_micros equal DuckDB's epoch_us on the same wall time
        F.unix_micros(F.col("ts").cast("timestamp")).alias("epoch_us"),
    )
    right = e.where(F.col("event_type") == right_type).select(
        "user_id",
        "epoch_us",
        F.lit(0).alias("is_left"),
        F.col("event_id").alias("src_id"),
        F.col("event_id").alias("r_id"),
        F.col("epoch_us").alias("r_epoch"),
    )
    left = e.where(F.col("event_type") == left_type).select(
        "user_id",
        "epoch_us",
        F.lit(1).alias("is_left"),
        F.col("event_id").alias("src_id"),
        F.lit(None).cast("long").alias("r_id"),
        F.lit(None).cast("long").alias("r_epoch"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_us", "is_left", "src_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        right.unionByName(left)
        .withColumn("match_event_id", F.last("r_id", ignorenulls=True).over(w))
        .withColumn("match_epoch", F.last("r_epoch", ignorenulls=True).over(w))
        .where(F.col("is_left") == 1)
        .select(
            F.col("src_id").alias("event_id"),
            "user_id",
            "epoch_us",
            "match_event_id",
            (F.col("epoch_us") - F.col("match_epoch")).alias("lag_us"),
        )
    )


def asof_join_sql(left_type: str = "error", right_type: str = "click") -> str:
    """DuckDB twin: the identical union + running-last window (DuckDB's
    native ASOF JOIN has its own tie rule; mirroring the window pins
    ours instead)."""
    return f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS epoch_us FROM events
),
u AS (
  SELECT user_id, epoch_us, 0 AS is_left, event_id AS src_id,
         event_id AS r_id, epoch_us AS r_epoch
  FROM e WHERE event_type = '{right_type}'
  UNION ALL
  SELECT user_id, epoch_us, 1, event_id, NULL, NULL
  FROM e WHERE event_type = '{left_type}'
),
m AS (
  SELECT *,
         LAST_VALUE(r_id IGNORE NULLS) OVER w AS match_event_id,
         LAST_VALUE(r_epoch IGNORE NULLS) OVER w AS match_epoch
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us, is_left, src_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT src_id AS event_id, user_id, epoch_us, match_event_id,
       epoch_us - match_epoch AS lag_us
FROM m WHERE is_left = 1
"""


def range_pair_join(
    events: DataFrame,
    left_type: str = "error",
    right_type: str = "click",
    window_s: int = 600,
) -> DataFrame:
    """All same-user (left, right) event pairs within ``window_s`` of
    each other, in either direction.

    Build side (right) keys on its own time bucket; probe side (left)
    replicates to buckets {b-1, b, b+1}.  Any pair with |dt| <= window
    has bucket distance <= 1, so it meets exactly once - at the build
    row's bucket - and the exact |dt| predicate finishes the job.
    Output: (event_id, match_event_id, user_id, delta_us).
    """
    win_us = int(window_s) * 1_000_000
    e = events.select(
        "event_id",
        "user_id",
        "event_type",
        # parquet carries TIMESTAMP_NTZ; the UTC-pinned session makes the
        # cast + unix_micros equal DuckDB's epoch_us on the same wall time
        F.unix_micros(F.col("ts").cast("timestamp")).alias("epoch_us"),
    )
    right = e.where(F.col("event_type") == right_type).select(
        "user_id",
        F.floor(F.col("epoch_us") / win_us).alias("bucket"),
        F.col("event_id").alias("match_event_id"),
        F.col("epoch_us").alias("r_epoch"),
    )
    b = F.floor(F.col("epoch_us") / win_us)
    left = (
        e.where(F.col("event_type") == left_type)
        .select(
            "user_id",
            "event_id",
            "epoch_us",
            F.explode(F.array(b - 1, b, b + 1)).alias("bucket"),
        )
    )
    return (
        left.join(right, ["user_id", "bucket"])
        .where(F.abs(F.col("epoch_us") - F.col("r_epoch")) <= win_us)
        .select(
            "event_id",
            "match_event_id",
            "user_id",
            (F.col("epoch_us") - F.col("r_epoch")).alias("delta_us"),
        )
    )


def range_pair_join_sql(
    left_type: str = "error", right_type: str = "click", window_s: int = 600
) -> str:
    """DuckDB twin: the plain inequality join the banded form equals."""
    win_us = int(window_s) * 1_000_000
    return f"""
SELECT a.event_id AS event_id, b.event_id AS match_event_id, a.user_id,
       epoch_us(a.ts) - epoch_us(b.ts) AS delta_us
FROM events a
JOIN events b
  ON a.user_id = b.user_id
WHERE a.event_type = '{left_type}' AND b.event_type = '{right_type}'
  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {win_us}
"""
