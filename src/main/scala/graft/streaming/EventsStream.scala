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
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** ts → event-time timestamp column, adaptive to the physical type the
    * parquet carries: ns-since-epoch longs (TIMESTAMP(NANOS) read via
    * nanosAsLong — the pre-r6 testdata layout) or a real timestamp
    * (timestamp[us], the current layout). Sessions pin UTC, so the
    * NTZ→TZ cast is wall-clock-identity and matches DuckDB's naive
    * epoch_ns() on the same values. */
  def withEventTime(events: DataFrame): DataFrame = {
    val ev = events.schema("ts").dataType match {
      case LongType => timestamp_micros((col("ts") / 1000L).cast("long"))
      case _ => col("ts").cast(TimestampType)
    }
    events.withColumn("event_time", ev)
  }

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

  /** Streaming exact-dedup by content fingerprint — the custom-state
    * streaming tier (`flatMapGroupsWithState`): the FIRST document per
    * fingerprint is emitted, every later duplicate (within and across
    * micro-batches) is dropped via one boolean of keyed state.
    *
    * Scale design: state is one entry per DISTINCT fingerprint, sharded
    * by the group key across executors — the streaming analog of the
    * batch hash-groupBy dedup ([[graft.operators.Dedup.exactDedup]]).
    * At corpus scale bound the state with `ttl` (processing-time
    * timeout): an expired fingerprint re-admits later copies, trading
    * exactness-within-horizon for bounded state — the standard knob for
    * unbounded key domains.
    *
    * Works identically on a batch Dataset (Spark runs the same operator
    * with empty initial state), so batch/stream share one definition. */
  def dedupByFingerprint(docs: DataFrame, idCol: String, textCol: String,
      ttl: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs
      .select(col(idCol).cast("long").as("doc_id"),
        graft.operators.TextAnalysis.fingerprint(col(textCol)).as("fp"),
        col(textCol).as("text"))
      .as[(Long, Long, String)]
      .groupByKey(_._2)
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed.flatMapGroupsWithState[Boolean, (Long, Long, String)](
        OutputMode.Append, timeout) {
      (_: Long, rows: Iterator[(Long, Long, String)], state: GroupState[Boolean]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else if (state.exists) {
          // GroupState clears the timeout on every invocation: re-arm it
          // here or a key that ever sees a duplicate keeps state forever
          ttl.foreach(state.setTimeoutDuration)
          Iterator.empty
        } else {
          state.update(true)
          ttl.foreach(state.setTimeoutDuration)
          // first-seen within the batch: smallest doc_id wins, matching
          // the batch exactDedup's min_by(orderCol) determinism
          Iterator.single(rows.minBy(_._1))
        }
    }.toDF("doc_id", "fp", "text")
  }

  /** [[dedupByFingerprint]] as an incremental query over a file source,
    * memory-sink for inspection */
  def streamingDedup(spark: SparkSession, dir: String, schema: StructType,
      idCol: String, textCol: String, queryName: String = "graft_stream_dedup")
      : StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(dir)
    dedupByFingerprint(stream, idCol, textCol)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
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
