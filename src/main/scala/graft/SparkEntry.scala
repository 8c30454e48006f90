package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.KnnJoin

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry maps to an operator in SURVEY.md §2; `oracleSql`
  * holds the DuckDB-equivalent SQL the driver validates against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: exact k-NN join (J1) —
    * the reference's core capability. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    KnnJoin.knnJoin(
      Tables.embQueries(spark, dir), Tables.embBase(spark, dir),
      k = 10, metric = "l2")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- sanity: relational agg (S5 scan + pruning path) ---
    "q1_agg" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
    }),
    // --- J1: exact brute-force k-NN join, L2 ---
    "j1_knn_l2" -> ((s, dir) =>
      KnnJoin.knnJoin(Tables.embQueries(s, dir), Tables.embBase(s, dir),
          k = 10, metric = "l2")
        .select(col("qid"), col("rank"), col("id"))),
    // --- J1 variant: cosine metric ---
    "j1_knn_cosine" -> ((s, dir) =>
      KnnJoin.knnJoin(Tables.embQueries(s, dir), Tables.embBase(s, dir),
          k = 10, metric = "cosine")
        .select(col("qid"), col("rank"), col("id"))),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "j1_knn_l2" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS bv FROM embeddings),
        |d AS (SELECT qid, id,
        |        sqrt(list_sum(list_transform(list_zip(qv, bv),
        |             p -> (p[1]-p[2])*(p[1]-p[2])))) AS dist
        |      FROM q, b),
        |r AS (SELECT qid, id,
        |        row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
        |      FROM d)
        |SELECT qid, rank::INT AS rank, id FROM r WHERE rank <= 10""".stripMargin,
    "j1_knn_cosine" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS bv FROM embeddings),
        |d AS (SELECT qid, id,
        |        1 - list_sum(list_transform(list_zip(qv, bv), p -> p[1]*p[2]))
        |          / (sqrt(list_sum(list_transform(qv, x -> x*x)))
        |             * sqrt(list_sum(list_transform(bv, x -> x*x)))) AS dist
        |      FROM q, b),
        |r AS (SELECT qid, id,
        |        row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
        |      FROM d)
        |SELECT qid, rank::INT AS rank, id FROM r WHERE rank <= 10""".stripMargin,
  )
}
