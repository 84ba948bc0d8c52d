"""Event-log operators: gap-based sessionization + session statistics.

Training-data pipelines over interaction logs need session boundaries
(conversation turns, browsing sessions, listening sessions). The classic
formulation is two window passes over (user, ts):

    is_new_session = ts - lag(ts) > gap   (or first event)
    session_idx    = running sum of is_new_session

Both windows are partitioned by the user key — at 10^12 events that is a
single shuffle on a well-distributed key, no global ordering anywhere.
Pure Catalyst; engine-portable (the oracle runs the identical window SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, *, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0) -> DataFrame:
    """Append a ``session_idx`` column (0-based per user): a new session
    starts when the gap to the previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col))
    prev = F.lag(F.col(ts_col)).over(w)
    # cast via TIMESTAMP first: parquet timestamps load as TIMESTAMP_NTZ,
    # which cannot cast directly to double
    def _sec(c):
        return c.cast("timestamp").cast("double")
    gap_s = _sec(F.col(ts_col)) - _sec(prev)
    new_session = F.when(
        prev.isNull() | (gap_s > gap_minutes * 60.0), 1).otherwise(0)
    # running sum of boundaries - 1 => 0-based session index
    return df.withColumn(
        "session_idx",
        (F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast("bigint"))


def session_stats(df: DataFrame, *, user_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: float = 30.0) -> DataFrame:
    """One row per (user, session): event count, start/end, duration sec."""
    s = sessionize(df, user_col=user_col, ts_col=ts_col,
                   gap_minutes=gap_minutes)
    return (s.groupBy(user_col, "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("start_ts"),
                 F.max(ts_col).alias("end_ts"))
            .withColumn("duration_sec",
                        F.col("end_ts").cast("timestamp").cast("double")
                        - F.col("start_ts").cast("timestamp").cast("double")))
