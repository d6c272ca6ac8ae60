"""Stream-stream interval join: two live event streams joined on a key
plus a time-range condition, with watermarks bounding both sides' state.

This is the streaming primitive the other modules don't cover: stateful
aggregation keeps PER-KEY state (stream_agg), the ingest sinks keep
PERSISTED STORE state; a stream-stream join buffers ROWS from each side
until the other side's watermark proves no future match can arrive, then
drops them (Spark's StreamingSymmetricHashJoin).  Without the time-range
condition + watermarks the buffers grow forever — the condition is what
makes the join's state bounded, so at 100 TB/day the state size tracks
(join-window x arrival rate), not history.

The batch twin is ``operators.events.range_join`` (errors within N
seconds after a purchase); draining both file streams with
``availableNow`` yields exactly the batch answer, so the streaming query
shares the batch oracle — same discipline as every streaming twin here.

The reference is pure batch (SURVEY.md §2B "Streaming — none"); this is
a north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.streaming.stream_agg import (_drain_to_memory,
                                                 _stream_source)


def interval_join_stream(spark: SparkSession, sf_dir: str,
                         left_type: str = "purchase",
                         right_type: str = "error",
                         upper_s: int = 300,
                         watermark: str = "2 hours") -> DataFrame:
    """Join two filtered views of the live events stream: every
    ``right_type`` event within ``[0, upper_s]`` seconds AFTER a
    ``left_type`` event by the same user.

    Both sides carry their own watermark and the join condition bounds
    event-time distance, so Spark evicts a buffered row as soon as the
    opposite watermark passes its match window — bounded state by
    construction.  Inner join, append mode (the only mode a stream-stream
    inner join supports); ``availableNow`` drains the backlog so the
    result equals the batch range join and shares its exact oracle.
    """
    p = (_stream_source(spark, sf_dir, "events")
         .filter(F.col("event_type") == left_type)
         .select(F.col("user_id").alias("p_user"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("pts"))
         .withWatermark("pts", watermark))
    e = (_stream_source(spark, sf_dir, "events")
         .filter(F.col("event_type") == right_type)
         .select(F.col("user_id").alias("e_user"),
                 F.col("event_id").alias("error_id"),
                 F.col("ts").alias("ets"))
         .withWatermark("ets", watermark))
    j = p.join(e, F.expr(
        f"p_user = e_user AND ets >= pts "
        f"AND ets <= pts + INTERVAL {int(upper_s)} SECONDS"))
    out = _drain_to_memory(j, "events_interval_join_sink", "append")
    return out.select(F.col("p_user").alias("user_id"),
                      "purchase_id", "error_id",
                      F.unix_micros(F.col("pts").cast("timestamp"))
                      .alias("purchase_us"),
                      F.unix_micros(F.col("ets").cast("timestamp"))
                      .alias("error_us"))
