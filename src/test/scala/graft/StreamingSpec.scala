package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

/** Structured Streaming E2E: the incremental windowed aggregation over a
  * file source must converge to the batch plan's answer (memory sink +
  * processAllAvailable — the synchronous local smoke pattern). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("streaming windowed agg converges to the batch answer") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventsStream.windowedAgg(
      Tables.load(spark, dir, "events"), "1 hour")
      .orderBy("window_start", "event_type")
      .collect()

    val (_, q) = EventsStream.streamingWindowedAgg(spark, dir)
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT * FROM graft_events_windowed ORDER BY window_start, event_type")
        .collect()
      assert(streamed.length == batch.length)
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    } finally q.stop()
  }

  test("stateful streaming dedup drops duplicates across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF.toDF("doc_id", "text")
    val q = EventsStream.dedupByFingerprint(docs, "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_dedup_spec").start()
    try {
      // batch 1: in-batch duplicate (1,2 same text; min doc_id wins)
      mem.addData((2L, "the quick fox"), (1L, "The  quick fox"), (3L, "other"))
      q.processAllAvailable()
      val r1 = spark.sql("SELECT doc_id FROM graft_dedup_spec ORDER BY doc_id")
        .as[Long].collect().toSeq
      assert(r1 == Seq(1L, 3L), s"batch1: $r1")
      // batch 2: cross-batch duplicate (4 repeats batch-1 text) + fresh doc
      mem.addData((4L, "the quick fox"), (5L, "fresh"))
      q.processAllAvailable()
      val r2 = spark.sql("SELECT doc_id FROM graft_dedup_spec ORDER BY doc_id")
        .as[Long].collect().toSeq
      assert(r2 == Seq(1L, 3L, 5L), s"batch2: $r2")
    } finally q.stop()
  }

  test("streaming kNN answers each micro-batch like the batch join") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.QueryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val base = Tables.embBase(spark, dir).cache()
    val allQ = Tables.embQueries(spark, dir)
      .as[(Long, Array[Float])].collect().toSeq
    val (q1, q2) = allQ.splitAt(allQ.length / 2)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    val mem = MemoryStream[(Long, Array[Float])]
    val stream = QueryStream.knnStream(
      mem.toDF.toDF("qid", "vector"), base, k = 5, metric = "l2") {
      (res, _) =>
        collected.synchronized {
          collected ++= res.select("qid", "rank", "id")
            .as[(Long, Int, Long)].collect()
        }
    }
    try {
      mem.addData(q1)
      stream.processAllAvailable()
      val afterB1 = collected.synchronized(collected.size)
      assert(afterB1 == q1.size * 5, s"batch 1 emitted $afterB1 rows")
      mem.addData(q2)
      stream.processAllAvailable()
    } finally stream.stop()
    // two micro-batches together must equal the one-shot batch join
    val batch = graft.operators.KnnJoin.knnJoin(
        Tables.embQueries(spark, dir), base, k = 5, metric = "l2")
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect()
    assert(collected.synchronized(collected.toSet) == batch.toSet)
    base.unpersist()
  }

  test("streaming search over a pre-built IVF index matches one-shot search") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{IvfIndexer, IvfSearcher}
    import graft.streaming.QueryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val artifact = IvfIndexer(nlist = 8, seed = 42)
      .build(Tables.embBase(spark, dir))
    artifact.data.cache().count()
    val searcher = IvfSearcher(nprobe = 2, metric = "l2")
    val allQ = Tables.embQueries(spark, dir)
      .as[(Long, Array[Float])].collect().toSeq
    val (q1, q2) = allQ.splitAt(allQ.length / 2)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    val mem = MemoryStream[(Long, Array[Float])]
    val stream = QueryStream.searchStream(
      mem.toDF.toDF("qid", "vector"), artifact, searcher, k = 5) {
      (res, _) =>
        collected.synchronized {
          collected ++= res.select("qid", "rank", "id")
            .as[(Long, Int, Long)].collect()
        }
    }
    try {
      mem.addData(q1); stream.processAllAvailable()
      mem.addData(q2); stream.processAllAvailable()
    } finally stream.stop()
    val oneShot = searcher
      .search(artifact, Tables.embQueries(spark, dir), k = 5)
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect()
    assert(collected.synchronized(collected.toSet) == oneShot.toSet)
    artifact.data.unpersist()
  }

  test("withEventTime adapts to both ts physical types (long-nanos and timestamp)") {
    import spark.implicits._
    import java.time.LocalDateTime
    // the same instants, carried two ways: ns-since-epoch longs (the
    // pre-r6 testdata layout, read via nanosAsLong) and timestamp_ntz
    // (the current layout) — event_time must agree under the UTC session
    val instants = Seq(
      LocalDateTime.of(2026, 1, 1, 0, 0, 0),
      LocalDateTime.of(2026, 1, 1, 12, 30, 45),
      LocalDateTime.of(2026, 6, 15, 23, 59, 59))
    val asLongNs = instants.map(t =>
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1_000_000_000L +
        t.getNano)
    val longDf = asLongNs.zipWithIndex.map { case (ns, i) => (i.toLong, ns) }
      .toDF("event_id", "ts")
    val tsDf = instants.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("event_id", "ts")
    val a = EventsStream.withEventTime(longDf)
      .select(col("event_id"), col("event_time").cast("long"))
      .collect().map(_.toSeq).toSet
    val b = EventsStream.withEventTime(tsDf)
      .select(col("event_id"), col("event_time").cast("long"))
      .collect().map(_.toSeq).toSet
    assert(a == b, s"long-ns and timestamp paths disagree: $a vs $b")
    assert(a.nonEmpty)
  }

  test("dedupByFingerprint batch mode ≡ exactDedup first-seen semantics") {
    import spark.implicits._
    val docs = Seq((2L, "a  b"), (1L, "A b"), (3L, "c"), (4L, "c"))
      .toDF("doc_id", "text")
    val got = EventsStream.dedupByFingerprint(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L))
  }

  test("multimodal: features deterministic, frames cover payload") {
    val media = graft.operators.Multimodal.fromDocuments(
      Tables.load(spark, dir = "/root/testdata/sf0.001", name = "documents"),
      "doc_id", "text")
    val feats = graft.operators.Multimodal.extractFeatures(media)
    import spark.implicits._
    val f0 = feats.filter(col("media_id") === 0)
      .select("features").as[Seq[Float]].head()
    assert(f0.length == graft.operators.Multimodal.featureDim)
    assert(f0.sum > 0f)
    // determinism across runs
    val f0b = graft.operators.Multimodal.extractFeatures(media)
      .filter(col("media_id") === 0).select("features").as[Seq[Float]].head()
    assert(f0 == f0b)
    // frame sampling: stride-2 over 64-byte frames
    val frames = graft.operators.Multimodal.sampleFrames(media, 64, 2)
    val n0 = frames.filter(col("media_id") === 0).count()
    val bytes0 = media.filter(col("media_id") === 0)
      .select(col("meta.n_bytes")).as[Long].head()
    assert(n0 == (Math.ceil(bytes0 / 64.0).toLong + 1) / 2)
  }

  test("multimodal resize: schema-preserving, capped, composes downstream") {
    import spark.implicits._
    val media = graft.operators.Multimodal.fromDocuments(
      Tables.load(spark, dir = "/root/testdata/sf0.001", name = "documents"),
      "doc_id", "text")
    val target = 32
    val resized = graft.operators.Multimodal.resize(media, target)
    assert(resized.schema == graft.operators.Multimodal.mediaSchema)
    val sizes = resized
      .select(col("media_id"), length(col("payload")).cast("long").as("n"),
        col("meta.n_bytes").as("m"), col("meta.declared_format").as("fmt"))
      .as[(Long, Long, Long, String)].collect()
    assert(sizes.nonEmpty)
    sizes.foreach { case (id, n, m, fmt) =>
      assert(n <= target, s"media $id not capped: $n")
      assert(n == m, s"media $id meta.n_bytes $m != payload length $n")
      assert(fmt == "raw/utf8" || fmt == "raw/utf8/resized")
    }
    // over-target payloads shrink to exactly target and are re-tagged;
    // short ones pass through byte-identical
    val origSizes = media.select(col("media_id"), col("meta.n_bytes"))
      .as[(Long, Long)].collect().toMap
    sizes.foreach { case (id, n, _, fmt) =>
      if (origSizes(id) > target)
        assert(n == target && fmt.endsWith("/resized"))
      else assert(n == origSizes(id) && fmt == "raw/utf8")
    }
    // deterministic and composable: same features both runs, downstream
    // extract runs on the resized relation unchanged
    val fa = graft.operators.Multimodal.extractFeatures(resized)
      .filter(col("media_id") === 0).select("features").as[Seq[Float]].head()
    val fb = graft.operators.Multimodal.extractFeatures(
        graft.operators.Multimodal.resize(media, target))
      .filter(col("media_id") === 0).select("features").as[Seq[Float]].head()
    assert(fa == fb && fa.length == graft.operators.Multimodal.featureDim)
  }
}
