"""Gap-based sessionization of event streams (training-pipeline staple).

Pure window-function formulation (all Catalyst, shuffle on user key once):
session starts where the gap from the previous event exceeds the timeout;
session id = running count of session starts per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0,
               order_tiebreak: str | None = None) -> DataFrame:
    """Add ``session_id`` (per-user, 1-based) and ``is_session_start``."""
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # NTZ timestamps can't cast straight to double; go via TIMESTAMP (the
    # session tz is pinned to UTC, matching DuckDB's epoch() semantics)
    gap_s = (F.col(ts_col).cast("timestamp").cast("double")
             - prev_ts.cast("timestamp").cast("double"))
    start = (prev_ts.isNull() | (gap_s > gap_minutes * 60.0)).cast("int")
    return (events.withColumn("is_session_start", start)
                  .withColumn("session_id",
                              F.sum("is_session_start").over(
                                  w.rowsBetween(Window.unboundedPreceding, 0))))


def session_stats(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: float = 30.0,
                  order_tiebreak: str | None = None) -> DataFrame:
    """One row per (user, session): event count + span seconds."""
    s = sessionize(events, user_col, ts_col, gap_minutes, order_tiebreak)
    return (s.groupBy(user_col, "session_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  (F.max(F.col(ts_col).cast("timestamp").cast("double"))
                   - F.min(F.col(ts_col).cast("timestamp").cast("double"))
                   ).alias("span_sec")))
