package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndexer, IvfModel, IvfSearcher, KnnJoin}

/** Incremental IVF ingestion (frozen coarse model) semantics. */
class IvfAppendSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val base =
    graft.sources.RandomDataset.vectors(spark, n = 400, dim = 8, seed = 51)

  test("append encodes with the frozen model and touches nothing else") {
    val old = base.filter($"id" % 2 === 0)
    val fresh = base.filter($"id" % 2 =!= 0)
    val art = IvfIndexer(nlist = 8, seed = 42).build(old)
    val appended = IvfModel.append(art, fresh)

    // original rows ride through unchanged
    val before = art.data.select("id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val after = appended.data.select("id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(before.forall { case (id, cid) => after(id) == cid })
    assert(after.size == 400)

    // appended rows carry the frozen model's argmin assignment
    val centers = IvfModel.centroidsOf(art).sortBy(_._1).map(_._2)
    val freshVecs = fresh.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    freshVecs.foreach { case (id, v) =>
      assert(after(id) == IvfModel.assign(centers, v), s"id=$id")
    }
    // and the model itself did not retrain
    assert(IvfModel.centroidsOf(appended).sortBy(_._1).map(_._2.toSeq).toSeq ==
      centers.map(_.toSeq).toSeq)
  }

  test("full probe over the appended index equals exact kNN on the union") {
    val art = IvfIndexer(nlist = 8, seed = 42).build(base.filter($"id" % 2 === 0))
    val appended = IvfModel.append(art, base.filter($"id" % 2 =!= 0))
    val q = base.filter($"id" % 100 === 0).select($"id".as("qid"), $"vector")
    val got = IvfSearcher(nprobe = 8, "l2").search(appended, q, 10)
      .select("qid", "rank", "id")
    val exact = KnnJoin.knnJoin(q, base, 10, "l2").select("qid", "rank", "id")
    assert(got.except(exact).isEmpty && exact.except(got).isEmpty)
  }

  test("ivf_sq8 append: frozen bounds + centroids, encoding replayed locally") {
    val old = base.filter($"id" % 2 === 0)
    val fresh = base.filter($"id" % 2 =!= 0)
    val art = graft.operators.IvfSq8Indexer(nlist = 8, seed = 42).build(old)
    val appended = graft.operators.IndexAppend.append(art, fresh)

    val rows = appended.data.collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    assert(rows.size == 400)
    // old rows byte-identical
    art.data.collect().foreach { r =>
      assert(rows(r.getLong(0)) == ((r.getInt(1), r.getAs[Array[Byte]](2).toSeq)))
    }
    // new rows equal a driver-side replay of the FROZEN models
    val centers = graft.operators.IvfModel.centroidsOf(art).sortBy(_._1).map(_._2)
    val model = graft.operators.Sq8Model(
      art.meta("lo").split(",").map(_.toFloat),
      art.meta("hi").split(",").map(_.toFloat))
    fresh.collect().foreach { r =>
      val (id, v) = (r.getLong(0), r.getSeq[Float](1).toArray)
      assert(rows(id) ==
        ((graft.operators.IvfModel.assign(centers, v), model.encode(v).toSeq)))
    }
    // the searcher serves the appended artifact; full probe reaches both halves
    val q = base.filter($"id" % 100 === 0).select($"id".as("qid"), $"vector")
    val ids = graft.operators.IvfSq8Searcher(nprobe = 8, "l2")
      .search(appended, q, 10).select("id").as[Long].collect().toSet
    assert(ids.exists(_ % 2 == 0) && ids.exists(_ % 2 == 1))
  }

  test("lsh append: frozen hyperplanes — appended vectors self-retrieve") {
    val old = base.filter($"id" % 2 === 0)
    val fresh = base.filter($"id" % 2 =!= 0)
    val art = graft.operators.LshIndexer(numTables = 8, hashSize = 6,
      bucketWidth = 8.0, metric = "l2", seed = 11).build(old)
    val appended = graft.operators.IndexAppend.append(art, fresh)
    // old bucket rows untouched
    assert(appended.data.filter($"id" % 2 === 0).except(art.data).isEmpty)
    // a freshly appended vector finds itself at distance 0 without fallback
    val q = fresh.limit(5).select($"id".as("qid"), $"vector")
    val top1 = graft.operators.LshSearcher(16, None,
        fallbackToBruteforce = false, "l2")
      .search(appended, q, 3)
      .filter($"rank" === 1).select("qid", "id", "dist")
      .as[(Long, Long, Double)].collect()
    assert(top1.length == 5)
    top1.foreach { case (qid, id, d) => assert(qid == id && math.abs(d) < 1e-6) }
  }

  test("appended artifact round-trips through the store") {
    val art = IvfIndexer(nlist = 8, seed = 42).build(base.filter($"id" % 2 === 0))
    val appended = IvfModel.append(art, base.filter($"id" % 2 =!= 0))
    val dir = java.nio.file.Files.createTempDirectory("ivf-append").toString + "/art"
    graft.sources.ArtifactStore.save(appended, dir, "l2", 8, 400, "fp", "cfg")
    val (loaded, _) = graft.sources.ArtifactStore.load(spark, dir)
    val q = base.filter($"id" % 100 === 0).select($"id".as("qid"), $"vector")
    val a = IvfSearcher(nprobe = 3, "l2").search(appended, q, 10)
      .select("qid", "rank", "id")
    val b = IvfSearcher(nprobe = 3, "l2").search(loaded, q, 10)
      .select("qid", "rank", "id")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("streaming ingestion: two micro-batches fold like one batch append") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val old = base.filter($"id" % 2 === 0)
    val fresh = base.filter($"id" % 2 =!= 0)
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = fresh.splitAt(fresh.length / 2)
    val art = IvfIndexer(nlist = 8, seed = 42).build(old)
    art.data.cache().count()

    var epochs = 0
    val mem = MemoryStream[(Long, Array[Float])]
    val ingest = graft.streaming.IngestStream.appendStream(
      mem.toDF.toDF("id", "vector"), art) { (_, _) => epochs += 1 }
    try {
      mem.addData(b1); ingest.query.processAllAvailable()
      // searches between triggers see the first batch already
      val mid = ingest.current.data.count()
      assert(mid == old.count() + b1.size)
      mem.addData(b2); ingest.query.processAllAvailable()
    } finally ingest.query.stop()
    assert(epochs == 2)

    // the folded artifact serves EXACTLY like the one-shot batch append
    val oneShot = IvfModel.append(art, base.filter($"id" % 2 =!= 0))
    val q = base.filter($"id" % 100 === 0).select($"id".as("qid"), $"vector")
    val a = IvfSearcher(nprobe = 8, "l2").search(ingest.current, q, 10)
      .select("qid", "rank", "id")
    val b = IvfSearcher(nprobe = 8, "l2").search(oneShot, q, 10)
      .select("qid", "rank", "id")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("delete: anti-joined rows vanish from search; append∘delete round-trips") {
    val art = IvfIndexer(nlist = 8, seed = 42).build(base)
    val odd = base.filter($"id" % 2 =!= 0)
    val deleted = graft.operators.IndexAppend.delete(art, odd.select("id"))
    // full probe over the remainder equals exact kNN on the evens
    val q = base.filter($"id" % 100 === 0).select($"id".as("qid"), $"vector")
    val got = IvfSearcher(nprobe = 8, "l2").search(deleted, q, 10)
      .select("qid", "rank", "id")
    val exact = KnnJoin.knnJoin(q, base.filter($"id" % 2 === 0), 10, "l2")
      .select("qid", "rank", "id")
    assert(got.except(exact).isEmpty && exact.except(got).isEmpty)
    // deleting what was appended restores the original relation exactly
    val evenArt = IvfIndexer(nlist = 8, seed = 42).build(base.filter($"id" % 2 === 0))
    val roundTrip = graft.operators.IndexAppend.delete(
      IvfModel.append(evenArt, odd), odd.select("id"))
    assert(roundTrip.data.except(evenArt.data).isEmpty &&
      evenArt.data.except(roundTrip.data).isEmpty)
    // lsh delete shrinks the rerank relation too
    val lshArt = graft.operators.LshIndexer(8, 6, 8.0, "l2", seed = 11).build(base)
    val lshDel = graft.operators.IndexAppend.delete(lshArt, odd.select("id"))
    assert(lshDel.aux("vectors").filter($"id" % 2 =!= 0).isEmpty)
    assert(lshDel.data.filter($"id" % 2 =!= 0).isEmpty)
  }

  test("hnsw append: touched-group rebuild, two-batch ≡ one-shot exactly") {
    val old = base.filter($"id" % 2 === 0)
    val fresh = base.filter($"id" % 2 =!= 0)
    val art = graft.operators.HnswIndexer(nPartitions = 4, m = 6,
      efConstruction = 24, metric = "l2", seed = 42).build(old)
    val appended = graft.operators.IndexAppend.append(art, fresh)
    // every row present exactly once (spill=1 → disjoint groups)
    assert(appended.data.select("id").distinct().count() == 400)
    assert(appended.data.count() == 400)
    // the coarse model did NOT retrain
    assert(IvfModel.centroidsOf(appended).sortBy(_._1).map(_._2.toSeq).toSeq ==
      IvfModel.centroidsOf(art).sortBy(_._1).map(_._2.toSeq).toSeq)
    // two-batch ≡ one-shot BYTE-IDENTICAL adjacency: groups build from
    // rows sorted by id, so a group's graph is a pure function of its
    // row set — the IvfAppendSpec identity, now for the graph family
    val b1 = fresh.filter($"id" % 4 === 1)
    val b2 = fresh.filter($"id" % 4 === 3)
    val twoStep = graft.operators.IndexAppend.append(
      graft.operators.IndexAppend.append(art, b1), b2)
    assert(twoStep.data.except(appended.data).isEmpty &&
      appended.data.except(twoStep.data).isEmpty)
    // the searcher serves the appended artifact: appended vectors
    // self-retrieve at distance 0
    val q = fresh.limit(5).select($"id".as("qid"), $"vector")
    val top1 = graft.operators.HnswSearcher(nprobe = 4, efSearch = 64, metric = "l2")
      .search(appended, q, 3)
      .filter($"rank" === 1).select("qid", "id", "dist")
      .as[(Long, Long, Double)].collect()
    assert(top1.length == 5)
    top1.foreach { case (qid, id, d) => assert(qid == id && math.abs(d) < 1e-6) }
  }

  test("hnsw delete: touched groups rebuilt without dangling edges; round-trips") {
    val art = graft.operators.HnswIndexer(nPartitions = 4, m = 6,
      efConstruction = 24, metric = "l2", seed = 42).build(base)
    val odd = base.filter($"id" % 2 =!= 0)
    val deleted = graft.operators.IndexAppend.delete(art, odd.select("id"))
    assert(deleted.data.filter($"id" % 2 =!= 0).isEmpty)
    assert(deleted.data.count() == 200)
    // no dangling adjacency: every neighbor idx addresses a row of its
    // own (rebuilt) group
    val bad = deleted.data
      .select($"centroid_id", $"idx", explode($"nbrs").as("nb"))
      .groupBy("centroid_id")
      .agg(max($"nb").as("maxnb"), count(lit(1)).as("_e"))
      .join(deleted.data.groupBy("centroid_id").agg(count(lit(1)).as("n")),
        "centroid_id")
      .filter($"maxnb" >= $"n")
    assert(bad.isEmpty)
    // delete(append(evenArt, odd), odd) ≡ evenArt exactly (sorted-by-id
    // rebuild makes the graph a pure function of the surviving row set)
    val evenArt = graft.operators.HnswIndexer(nPartitions = 4, m = 6,
      efConstruction = 24, metric = "l2", seed = 42)
      .build(base.filter($"id" % 2 === 0))
    val roundTrip = graft.operators.IndexAppend.delete(
      graft.operators.IndexAppend.append(evenArt, odd), odd.select("id"))
    assert(roundTrip.data.except(evenArt.data).isEmpty &&
      evenArt.data.except(roundTrip.data).isEmpty)
  }

  test("append rejects wrong-dimension arrivals with a clear error") {
    val art = IvfIndexer(nlist = 8, seed = 42).build(base)
    val badRows = Seq((9001L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "vector")
    val e = intercept[Exception] {
      graft.operators.IndexAppend.append(art, badRows).data.count()
    }
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("index dim is 8"))))
  }

  test("ivf_pq residual append: frozen codebooks encode v - centroid(v)") {
    val old = base.filter($"id" % 2 === 0)
    val fresh = base.filter($"id" % 2 =!= 0)
    val art = graft.operators.IvfPqIndexer(nlist = 8, numSubspaces = 4,
      numCentroids = 16, seed = 42, residual = true).build(old)
    val appended = graft.operators.IndexAppend.append(art, fresh)

    val rows = appended.data.collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    assert(rows.size == 400)
    art.data.collect().foreach { r =>
      assert(rows(r.getLong(0)) == ((r.getInt(1), r.getAs[Array[Byte]](2).toSeq)))
    }
    // new rows equal a driver-side replay of assign + residual-encode
    val centers = IvfModel.centroidsOf(art).sortBy(_._1).map(_._2)
    val model = graft.operators.PqModel.fromArtifact(art)
    fresh.collect().foreach { r =>
      val (id, v) = (r.getLong(0), r.getSeq[Float](1).toArray)
      val cid = IvfModel.assign(centers, v)
      val res = v.zip(centers(cid)).map { case (a, c) => a - c }
      assert(rows(id) == ((cid, model.encode(res).toSeq)))
    }
    // the ADC searcher serves the appended artifact across both halves
    val q = base.filter($"id" % 100 === 0).select($"id".as("qid"), $"vector")
    val ids = graft.operators.IvfPqSearcher(nprobe = 8, "l2")
      .search(appended, q, 10).select("id").as[Long].collect().toSet
    assert(ids.exists(_ % 2 == 0) && ids.exists(_ % 2 == 1))
  }
}
