package graft.dev
import org.apache.spark.sql.SparkSession
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val t0 = System.nanoTime()
    val out = graft.operators.Dedup.connectedComponents(chain).collect()
    println(s"chain: ${out.mkString(" ")} in ${(System.nanoTime()-t0)/1e9}s")
    val rnd = new scala.util.Random(11)
    val edges = (0 until 80).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2).distinct
    val t1 = System.nanoTime()
    val out2 = graft.operators.Dedup.connectedComponents(edges.toDF("a", "b")).collect()
    println(s"random: ${out2.length} rows in ${(System.nanoTime()-t1)/1e9}s")
    spark.stop()
  }
}
