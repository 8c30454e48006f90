package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Library install hook: building a session with
  * `spark.sql.extensions=graft.GraftSparkExtensions` injects the
  * codegen'd vector-function family into the session's function registry
  * — SQL users get `vec_dot` / `vec_l2_dist` / … without any per-session
  * `VectorFunctions.register` call. This is the standard Spark extension
  * point for shipping Catalyst expressions in a library
  * (SparkSessionExtensions.injectFunction).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftSparkExtensions].getName, name),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("vec_dot", es => VecDot(es(0), es(1))))
    ext.injectFunction(fn("vec_l2_dist", es => VecL2Dist(es(0), es(1))))
    ext.injectFunction(fn("vec_l2_dist_sq", es => VecL2DistSq(es(0), es(1))))
    ext.injectFunction(fn("vec_cosine_dist", es => VecCosineDist(es(0), es(1))))
    ext.injectFunction(fn("vec_ip_dist", es => VecIpDist(es(0), es(1))))
    ext.injectFunction(fn("vec_norm", es => VecNorm(es.head)))
    ext.injectFunction(fn("vec_normalize", es => VecNormalize(es.head)))
    ext.injectFunction(fn("sorted_array_jaccard",
      es => SortedLongArrayJaccard(es(0), es(1))))
    ext.injectFunction(fn("sorted_array_intersect_size",
      es => SortedLongArrayIntersectSize(es(0), es(1))))
  }
}
