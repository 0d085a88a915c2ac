"""Batch twins of the streaming operators (SURVEY.md §2.8).

Every streaming op ships with a batch-mode twin on the static `events`
table: `window()` / `session_window()` work identically on static
frames, so the DuckDB oracle can check the windowing math exactly, and
the true streaming wrappers (stream_ops.py) are then only re-plumbing
— same expressions, readStream source, watermark, memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FMT = "yyyy-MM-dd HH:mm:ss"
FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def tumbling(ev: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type."""
    return (
        ev.groupBy(F.window("ts", width), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("window.start", FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding(ev: DataFrame, width: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """Sliding-window counts per event_type (each event lands in
    width/slide windows)."""
    return (
        ev.groupBy(F.window("ts", width, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("window.start", FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session(ev: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user: a session ends when the next
    event is >= gap after the last one (interval [ts, ts+gap) merge —
    identical to the SQL gaps-and-islands formulation)."""
    return (
        ev.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format("session_window.start", FMT_US).alias("session_start"),
            F.date_format("session_window.end", FMT_US).alias("session_end"),
            "n_events",
            "total_value",
        )
    )
