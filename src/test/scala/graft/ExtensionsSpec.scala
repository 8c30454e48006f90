package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions install hook: a session built with
  * `spark.sql.extensions=graft.GraftSparkExtensions` must expose the
  * vector/array SQL function family without any register() call. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftSparkExtensions injects SQL functions at session build") {
    SparkFixture.spark // ensure the shared SparkContext exists first
    // Builder.create() (Spark 4) builds a NEW session over the existing
    // context without touching the active/default globals other suites
    // use. `spark.sql.extensions` is a STATIC conf (only honored when the
    // SparkContext itself is created), so on a shared context the
    // explicit withExtensions hook is the per-session equivalent — a
    // fresh spark-submit with --conf spark.sql.extensions=... takes the
    // config path with the same class.
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftSparkExtensions)
      .create()
    val dot = s.sql("SELECT vec_dot(array(1.0F,2.0F), array(3.0F,4.0F)) AS d")
      .head().getDouble(0)
    assert(math.abs(dot - 11.0) < 1e-9)
    val l2 = s.sql("SELECT vec_l2_dist(array(0.0F,3.0F), array(4.0F,0.0F)) AS d")
      .head().getDouble(0)
    assert(math.abs(l2 - 5.0) < 1e-9)
    val j = s.sql("SELECT sorted_array_jaccard(array(1L,2L,3L), array(2L,3L,4L)) AS j")
      .head().getDouble(0)
    assert(math.abs(j - 0.5) < 1e-9)
    val norm = s.sql("SELECT vec_normalize(array(3.0F,4.0F)) AS v")
      .head().getSeq[Float](0)
    assert(math.abs(norm(0) - 0.6f) < 1e-6 && math.abs(norm(1) - 0.8f) < 1e-6)
    // a fresh session built WITHOUT the config must not see the names —
    // proving the injection came from the extensions hook, not globals
    val plain = SparkSession.builder().master("local[4]").create()
    intercept[org.apache.spark.sql.AnalysisException] {
      plain.sql("SELECT vec_dot(array(1.0F), array(1.0F))").head()
    }
  }
}
