package graft.dev

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.operators._

/** Scaled-pass extension for the hash-model gate family.
  *
  * The eight model-literal oracles (j8_ivf_probe, j8_ivf_append,
  * j8_ivf_filtered, j9_pq_adc, j9_opq_adc, j10_ivf_pq, j10_ivf_sq8,
  * dedup_semantic) pin seeded KMeans/PQ/OPQ models trained on the
  * driver's sf0.01 gate data (the append gate's on its even-id half;
  * the filtered gate shares the full-corpus build), so they cannot run
  * against other scale factors as-is — the models retrain per scale by
  * design. This tool closes that gap WITHOUT touching the gate contract:
  * in ONE session it (a) retrains each gate-config model on the target
  * dir (training is deterministic given data + seed + session layout, so
  * the literals match what the gate query builds internally), (b) splices
  * the fresh literals into the PINNED `SparkEntry.oracleSql` text — only
  * the VALUES rows change, every joined/filtered/aggregated clause is the
  * byte-identical gate SQL — and (c) runs the real `SparkEntry.queries`
  * entry, dumping parquet + a scaled oracle_sql.json in the Verify layout
  * so `dev/compare.py <dir> <out> <subset>` performs the same DuckDB
  * rows/schema/hash check as the driver's gate.
  *
  * Usage: runMain graft.dev.ScaledModelCheck [dir=/tmp/sfbig] [out=/tmp/verify_models]
  */
object ScaledModelCheck {

  /** Replace the literal rows of a `name(...) AS (VALUES ...)` block.
    * Every block in the pinned oracles ends with the unique marker
    * `]::REAL[]))` (last row close + VALUES close); rows is the new
    * comma-joined row list WITHOUT the final VALUES-closing paren. */
  def replaceValuesBlock(sql: String, header: String, rows: String): String = {
    val start = sql.indexOf(header)
    require(start >= 0, s"oracle SQL lost its '$header' block — re-pin the substitution markers")
    val bodyStart = start + header.length
    val endMarker = "]::REAL[]))"
    val end = sql.indexOf(endMarker, bodyStart)
    require(end >= 0, s"no ']::REAL[]))' terminator after '$header'")
    sql.substring(0, bodyStart) + "\n" + rows + ")" +
      sql.substring(end + endMarker.length)
  }

  private def vecLit(v: Array[Float]): String =
    v.map(_.toString).mkString("[", ",", "]") + "::REAL[]"

  private def centRows(cents: Array[(Int, Array[Float])]): String =
    cents.sortBy(_._1).map { case (i, v) => s"($i, ${vecLit(v)})" }.mkString(",\n")

  private def cbRows(art: IndexArtifact): String =
    art.aux("codebooks").select("subspace", "centroid", "vector").collect()
      .sortBy(r => (r.getInt(0), r.getInt(1)))
      .map(r => s"(${r.getInt(0)}, ${r.getInt(1)}, ${vecLit(r.getSeq[Float](2).toArray)})")
      .mkString(",\n")

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sfbig")
    val out = args.lift(1).getOrElse("/tmp/verify_models")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.Registry.init()
    new java.io.File(out).mkdirs()

    val base = graft.Tables.embBase(spark, dir).cache()
    base.count()

    def build(indexer: String, params: Map[String, String]): IndexArtifact =
      Registry.indexer(indexer, params + ("seed" -> "42"), "l2").build(base)

    // fresh literals per query — configs mirror the SparkEntry gate
    // entries exactly (annRecall adds seed=42 the same way)
    val ivfArt = build("ivf", Map("nlist" -> "16", "nprobe" -> "4"))
    // the append gate's frozen model trains on the EVEN ids only
    val ivfAppendArt = Registry
      .indexer("ivf", Map("nlist" -> "16", "nprobe" -> "4", "seed" -> "42"), "l2")
      .build(base.filter(col("id") % 2 === 0))
    val ivfSq8Art = build("ivf_sq8", Map("nlist" -> "16", "nprobe" -> "8"))
    val ivfPqArt = build("ivf_pq", Map("nlist" -> "16", "nprobe" -> "8",
      "num_subspaces" -> "16", "num_centroids" -> "64"))
    val pqArt = build("pq", Map("num_subspaces" -> "16", "num_centroids" -> "64"))
    val opqArt = build("opq_pq", Map("num_subspaces" -> "16", "num_centroids" -> "64"))
    val semCents = IvfModel.train(
      graft.Tables.load(spark, dir, "embeddings")
        .select(col("vec_id").cast("long").as("id"), col("embedding").as("vector")),
      nlist = 8, seed = 42).zipWithIndex.map(_.swap)
    val rotRows = OpqModel.rotationOf(opqArt).zipWithIndex
      .map { case (row, i) => s"($i, ${vecLit(row)})" }.mkString(",\n")

    val cents = "cents(cid, cv) AS (VALUES"
    val cbs = "cbs(sub, cent, cb) AS (VALUES"
    val rot = "rot(i, rr) AS (VALUES"
    val scaledSql: Map[String, String] = Map(
      "j8_ivf_probe" -> replaceValuesBlock(
        SparkEntry.oracleSql("j8_ivf_probe"), cents, centRows(IvfModel.centroidsOf(ivfArt))),
      "j8_ivf_append" -> replaceValuesBlock(
        SparkEntry.oracleSql("j8_ivf_append"), cents,
        centRows(IvfModel.centroidsOf(ivfAppendArt))),
      // filtered search probes the SAME full-corpus build as j8_ivf_probe
      "j8_ivf_filtered" -> replaceValuesBlock(
        SparkEntry.oracleSql("j8_ivf_filtered"), cents,
        centRows(IvfModel.centroidsOf(ivfArt))),
      "j10_ivf_sq8" -> replaceValuesBlock(
        SparkEntry.oracleSql("j10_ivf_sq8"), cents, centRows(IvfModel.centroidsOf(ivfSq8Art))),
      "j10_ivf_pq" -> replaceValuesBlock(replaceValuesBlock(
        SparkEntry.oracleSql("j10_ivf_pq"), cbs, cbRows(ivfPqArt)),
        cents, centRows(IvfModel.centroidsOf(ivfPqArt))),
      // r11 filtered variants probe the SAME full-corpus builds as their
      // unfiltered twins — same spliced literals
      "j10_ivf_sq8_filtered" -> replaceValuesBlock(
        SparkEntry.oracleSql("j10_ivf_sq8_filtered"), cents,
        centRows(IvfModel.centroidsOf(ivfSq8Art))),
      "j10_ivf_pq_filtered" -> replaceValuesBlock(replaceValuesBlock(
        SparkEntry.oracleSql("j10_ivf_pq_filtered"), cbs, cbRows(ivfPqArt)),
        cents, centRows(IvfModel.centroidsOf(ivfPqArt))),
      "j9_pq_adc" -> replaceValuesBlock(
        SparkEntry.oracleSql("j9_pq_adc"), cbs, cbRows(pqArt)),
      "j9_opq_adc" -> replaceValuesBlock(replaceValuesBlock(
        SparkEntry.oracleSql("j9_opq_adc"), rot, rotRows), cbs, cbRows(opqArt)),
      "dedup_semantic" -> replaceValuesBlock(
        SparkEntry.oracleSql("dedup_semantic"), cents, centRows(semCents)))

    // run the REAL gate queries (they rebuild the same artifacts
    // internally — deterministic in-session, see IvfModel.train's seeded
    // sample) and dump in the Verify layout for dev/compare.py
    scaledSql.keys.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).coalesce(1)
        .write.mode("overwrite").parquet(s"$out/$name")
      println(f"[scaledmodel] $name spark done in ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = scaledSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$out/oracle_sql.json"), json)
    println(s"[scaledmodel] wrote $out/oracle_sql.json (${json.length} chars); " +
      s"next: python3 dev/compare.py $dir $out ${scaledSql.keys.mkString(",")}")
    spark.stop()
  }
}
