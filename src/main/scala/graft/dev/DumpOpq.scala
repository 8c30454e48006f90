package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._

/** dev aid for the j9_opq_adc hash-model oracle: build the gate-config
  * OPQ artifact (16 subspaces × 64 centroids, seed 42, sf0.01
  * embeddings), print the learned rotation + codebooks as SQL VALUES
  * literals, assemble the full DuckDB oracle (rotate → encode → LUT →
  * ADC → recall vs raw-space GT), and print the Spark-side expected
  * (recall_10, mrr_10) so the SQL can be validated standalone before it
  * is pinned into SparkEntry.oracleSql. */
object DumpOpq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Registry.init()

    val b = graft.Tables.embBase(spark, dir).cache()
    val q = graft.Tables.embQueries(spark, dir)
    val art = OpqPqIndexer(numSubspaces = 16, numCentroids = 64, seed = 42)
      .build(b)
    art.data.cache().count()

    // Spark-side expected numbers (the annRecall aggregation)
    val searcher = OpqPqSearcher("l2")
    val gt = KnnJoin.knnJoinAgg(q, b, 10, "l2")
      .select(col("qid"), transform(col("nn"), x => x("id")).as("gt"))
    val pred = searcher.search(art, q, 10)
      .groupBy("qid")
      .agg(TopKByDist.topK(col("id"), col("dist"), 10).as("nn"))
      .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
    val agg = gt.join(pred, Seq("qid"), "left")
      .agg(round(avg(Metrics.recallAtK(col("pred"), col("gt"), 10)), 4),
        round(avg(Metrics.rrAtK(col("pred"), col("gt"), 10)), 4))
      .collect()(0)
    println(s"spark expected: recall_10=${agg.getDouble(0)} mrr_10=${agg.getDouble(1)}")

    val rot = OpqModel.rotationOf(art)
    val rotVals = rot.zipWithIndex.map { case (row, i) =>
      s"(${i}, ${row.map(_.toString).mkString("[", ",", "]")}::REAL[])"
    }.mkString(",\n")
    val cbs = art.aux("codebooks")
      .select("subspace", "centroid", "vector").collect()
      .sortBy(r => (r.getInt(0), r.getInt(1)))
      .map { r =>
        val lst = r.getSeq[Float](2).map(_.toString).mkString("[", ",", "]")
        s"(${r.getInt(0)}, ${r.getInt(1)}, $lst::REAL[])"
      }.mkString(",\n")

    val sql =
      s"""WITH rot(i, rr) AS (VALUES
$rotVals),
cbs(sub, cent, cb) AS (VALUES
$cbs),
rb AS (
  SELECT e.vec_id AS id,
    list(CAST(list_sum(list_transform(list_zip(r.rr, e.embedding),
      p -> p[1]::DOUBLE * p[2]::DOUBLE)) AS REAL) ORDER BY r.i) AS v
  FROM embeddings e, rot r GROUP BY e.vec_id),
qids AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id % 50 = 0),
codes AS (
  SELECT id, sub, cent AS code FROM (
    SELECT rb.id, c.sub, c.cent, row_number() OVER (PARTITION BY rb.id, c.sub ORDER BY
      list_sum(list_transform(list_zip(rb.v[c.sub*4+1:c.sub*4+4], c.cb),
        x -> (x[1]::DOUBLE - x[2]::DOUBLE) * (x[1]::DOUBLE - x[2]::DOUBLE))), c.cent) AS rn
    FROM rb, cbs c) t WHERE rn = 1),
lut AS (
  SELECT rb.id AS qid, c.sub, c.cent,
    list_sum(list_transform(list_zip(rb.v[c.sub*4+1:c.sub*4+4], c.cb),
      x -> (x[1]::DOUBLE - x[2]::DOUBLE) * (x[1]::DOUBLE - x[2]::DOUBLE))) AS sd
  FROM rb JOIN qids ON rb.id = qids.qid, cbs c),
cd AS (
  SELECT l.qid, co.id, sqrt(sum(l.sd)) AS dist
  FROM codes co JOIN lut l ON co.sub = l.sub AND co.code = l.cent
  GROUP BY l.qid, co.id),
pred AS (
  SELECT qid, list(id ORDER BY rn) AS pred FROM (
    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn
    FROM cd) t WHERE rn <= 10 GROUP BY qid),
bv AS (SELECT vec_id AS id, embedding::DOUBLE[] AS dv FROM embeddings),
gtd AS (
  SELECT q.id AS qid, r.id,
    sqrt(list_sum(list_transform(list_zip(q.dv, r.dv),
      p -> (p[1]-p[2])*(p[1]-p[2])))) AS dist
  FROM bv q JOIN qids ON q.id = qids.qid, bv r),
gt AS (
  SELECT qid, list(id ORDER BY rn) AS gt FROM (
    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn
    FROM gtd) t WHERE rn <= 10 GROUP BY qid),
per AS (
  SELECT g.qid,
    len(list_intersect(g.gt, p.pred))::DOUBLE / len(g.gt) AS recall,
    coalesce(1.0 / (SELECT min(pos) FROM (
      SELECT unnest(p.pred) AS pid, generate_subscripts(p.pred, 1) AS pos) u
      WHERE list_contains(g.gt, pid)), 0.0) AS rr
  FROM gt g LEFT JOIN pred p ON g.qid = p.qid)
SELECT 'opq_pq' AS algorithm, count(*) AS n_queries,
  round(avg(recall), 4) AS recall_10, round(avg(rr), 4) AS mrr_10
FROM per
HAVING round(avg(recall), 4) >= 0.50"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/opq_oracle.sql"), sql)
    println(s"wrote /tmp/opq_oracle.sql (${sql.length} chars)")
    spark.stop()
  }
}
