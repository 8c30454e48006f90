package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming ingestion over the events table shape.
  *
  * The reference is batch-only (SURVEY §2.9) — this module is the
  * engine's forward-looking streaming tier for training-data pipelines:
  * watermarked event-time windowed aggregation, the canonical Spark
  * streaming pattern. The batch `windowedCounts` is the exact same plan
  * run incrementally by `streamingWindowedCounts` — one definition, two
  * execution modes, which is the point of Structured Streaming.
  */
object EventsStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** ts arrives as ns-since-epoch (parquet TIMESTAMP(NANOS) read via
    * nanosAsLong) → event-time timestamp column */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros((col("ts") / 1000L).cast("long")))

  /** tumbling event-time window aggregation (shared batch/stream plan) */
  def windowedAgg(events: DataFrame, windowLen: String): DataFrame =
    withEventTime(events)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n_events"),
        round(col("sum_value"), 6).as("sum_value"))

  /** the same aggregation as an incremental streaming query over a file
    * source, with a watermark bounding state (scale knob: state store
    * size is windows × event_types, independent of input volume) */
  def streamingWindowedAgg(spark: SparkSession, dir: String,
      windowLen: String = "1 hour", watermark: String = "2 hours")
      : (DataFrame, StreamingQuery) = {
    val stream = spark.readStream
      .schema(eventSchema)
      .parquet(dir)
    val agg = withEventTime(stream)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n_events"),
        round(col("sum_value"), 6).as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("graft_events_windowed")
      .start()
    (agg, q)
  }

  /** sessionization via flatMapGroupsWithState-free session_window (the
    * built-in session window operator — gap-based sessions per user) */
  def sessionize(events: DataFrame, gap: String): DataFrame =
    withEventTime(events)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .select(
        col("session_window.start").cast("long").as("session_start"),
        col("session_window.end").cast("long").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
}
