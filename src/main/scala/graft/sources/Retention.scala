package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S8/T5/J13: the MS MARCO pre-embedded three-pass loader's retention and
  * alignment semantics (dataset.py:1110-1701), declaratively.
  *
  * The reference streams passages keeping the first `base_limit` rows
  * PLUS any passage needed by a query's ground truth, early-stopping when
  * both conditions are satisfied (T5, dataset.py:1543-1598). The
  * declarative equivalent — `limit ∪ semi-join` — reads-then-filters
  * instead of early-stopping a stream (SURVEY §4 limit-pushdown note):
  * at scale the scan is parallel and column-pruned, which beats a
  * sequential early-stop anyway.
  */
object Retention {

  /** first `baseLimit` rows by `orderCol` plus every row whose id appears
    * in `neededIds` (deduped) — the retained base set */
  def retainWithNeeded(base: DataFrame, idCol: String, orderCol: String,
      baseLimit: Int, neededIds: DataFrame): DataFrame = {
    val prefix = base.orderBy(col(orderCol)).limit(baseLimit)
    val needed = base.join(
      neededIds.select(col(neededIds.columns.head).as(idCol)).distinct(),
      Seq(idCol), "left_semi")
    prefix.unionByName(needed).dropDuplicates(idCol)
  }

  /** J13: align query relevance ids to retained row positions; queries
    * with no resolvable positive are dropped (dataset.py:1637-1696).
    * queries: (qid, rel_ids array<long>); retained: (idCol …) →
    * (qid, gt_ids array<long> of retained positions, ordered by the
    * original rel list order). */
  def alignGroundTruth(queries: DataFrame, retained: DataFrame,
      idCol: String): DataFrame = {
    // retained row position = dense rank in id order (stable "row
    // position" without monotonically_increasing_id, SURVEY S8)
    val positioned = retained.select(col(idCol).cast("long").as("__doc"))
      .withColumn("__pos",
        row_number().over(Window.orderBy(col("__doc"))).cast("long") - 1)
    queries
      .select(col("qid").cast("long").as("qid"),
        posexplode(col("rel_ids")).as(Seq("__ord", "__doc")))
      .join(positioned, Seq("__doc")) // inner: unresolvable ids drop out
      .groupBy("qid")
      .agg(array_sort(collect_list(struct(col("__ord"), col("__pos"))))
        .as("__pairs"))
      .select(col("qid"),
        transform(col("__pairs"), p => p("__pos")).as("gt_ids"))
      .filter(size(col("gt_ids")) > 0)
  }

  /** left-anti diagnostics: relevance ids that could not be resolved
    * (dataset.py:1623-1635) */
  def missingIds(queries: DataFrame, retained: DataFrame, idCol: String): DataFrame =
    queries.select(explode(col("rel_ids")).as("__doc")).distinct()
      .join(retained.select(col(idCol).cast("long").as("__doc")),
        Seq("__doc"), "left_anti")
      .select(col("__doc").as("missing_id"))
}
