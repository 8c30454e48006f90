package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector distance/similarity over
  * `ArrayType(FloatType)` columns. These are the hot path of every k-NN
  * join (reference: the NumPy broadcast/BLAS kernels in
  * `src/algorithms/modular.py:336-387` and `src/utils/vector_utils.py:20-51`)
  * — implemented with `doGenCode` so they stay inside whole-stage codegen
  * with zero boxing, instead of a Scala UDF (which would serialize
  * `Array[Float]` per row).
  *
  * Accumulation contract: element-wise in index order, each float widened to
  * double, accumulated in double. This matches a DuckDB oracle that casts the
  * lists to DOUBLE[] first, so distances are bit-identical across engines and
  * (dist, id) orderings agree exactly.
  */
abstract class VectorBinaryExpression extends BinaryExpression
    with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** scalar kernel over the two float arrays */
  protected def compute(a: ArrayData, b: ArrayData): Double
  /** java source for the loop body; acc is a double var, a/b are ArrayData */
  protected def loopBody(a: String, b: String, i: String, acc: String): String
  /** java source run after the loop to finalize acc */
  protected def finish(acc: String): String = ""

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${loopBody(a, b, i, acc)}
         |}
         |${finish(acc)}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** dot(a, b) = Σ aᵢ·bᵢ  (reference: modular.py:341-346 IP/cosine path) */
case class VecDot(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"
  protected def compute(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
  protected def loopBody(a: String, b: String, i: String, acc: String): String =
    s"$acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** squared L2: Σ (aᵢ−bᵢ)²  (reference: vector_utils.py:20-51 before sqrt) */
case class VecL2DistSq(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_l2_dist_sq"
  protected def compute(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    acc
  }
  protected def loopBody(a: String, b: String, i: String, acc: String): String = {
    s"""double d = ((double) $a.getFloat($i)) - ((double) $b.getFloat($i));
       |  $acc += d * d;""".stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** L2 distance: sqrt(Σ (aᵢ−bᵢ)²) */
case class VecL2Dist(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_l2_dist"
  protected def compute(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    math.sqrt(acc)
  }
  protected def loopBody(a: String, b: String, i: String, acc: String): String = {
    s"""double d = ((double) $a.getFloat($i)) - ((double) $b.getFloat($i));
       |  $acc += d * d;""".stripMargin
  }
  override protected def finish(acc: String): String = s"$acc = java.lang.Math.sqrt($acc);"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cosine distance: 1 − dot/(‖a‖·‖b‖); zero-norm → distance 1.0
  * (reference zero-norm convention: zero-vector, modular.py:109-111) */
case class VecCosineDist(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine_dist"
  protected def compute(a: ArrayData, b: ArrayData): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 1.0 else 1.0 - dot / denom
  }
  // custom full-body codegen (three accumulators)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val den = ctx.freshName("den")
      s"""
         |int $n = $a.numElements();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.getFloat($i);
         |  double y = (double) $b.getFloat($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($den == 0.0) ? 1.0 : 1.0 - $dot / $den;
       """.stripMargin
    })
  protected def loopBody(a: String, b: String, i: String, acc: String): String = ""
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** inner-product "distance" = −dot (FAISS METRIC_INNER_PRODUCT negation) */
case class VecIpDist(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_ip_dist"
  protected def compute(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    -acc
  }
  protected def loopBody(a: String, b: String, i: String, acc: String): String =
    s"$acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));"
  override protected def finish(acc: String): String = s"$acc = -$acc;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** ‖a‖₂ in double */
case class VecNorm(child: Expression) extends UnaryExpression
    with Serializable {
  override def prettyName: String = "vec_norm"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; acc += x * x; i += 1 }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.getFloat($i);
         |  $acc += x * x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** v / ‖v‖ (float32 result, like the reference's normalize); zero-norm →
  * zero vector (majority convention: modular.py:109-111, lsh.py:13-24) */
case class VecNormalize(child: Expression) extends UnaryExpression
    with codegen.CodegenFallback with Serializable {
  override def prettyName: String = "vec_normalize"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; acc += x * x; i += 1 }
    val norm = math.sqrt(acc)
    val out = new Array[Float](n)
    if (norm != 0.0) {
      i = 0
      while (i < n) { out(i) = (a.getFloat(i).toDouble / norm).toFloat; i += 1 }
    }
    ArrayData.toArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column-level API + SQL registration for the vector function family. */
object VectorFunctions {
  private def col(e: Expression): Column = org.apache.spark.sql.graftshim.Shim.column(e)
  private def expr(c: Column): Expression = org.apache.spark.sql.graftshim.Shim.expression(c)

  def vec_dot(a: Column, b: Column): Column = col(VecDot(expr(a), expr(b)))
  def l2_dist(a: Column, b: Column): Column = col(VecL2Dist(expr(a), expr(b)))
  def l2_dist_sq(a: Column, b: Column): Column = col(VecL2DistSq(expr(a), expr(b)))
  def cosine_dist(a: Column, b: Column): Column = col(VecCosineDist(expr(a), expr(b)))
  def ip_dist(a: Column, b: Column): Column = col(VecIpDist(expr(a), expr(b)))
  def vec_norm(a: Column): Column = col(VecNorm(expr(a)))
  def vec_normalize(a: Column): Column = col(VecNormalize(expr(a)))

  /** distance column for a metric name used throughout the reference configs
    * ("l2" | "cosine" | "ip" / "angular" alias) */
  def distance(metric: String)(a: Column, b: Column): Column = metric match {
    case "l2"                 => l2_dist(a, b)
    case "l2sq"               => l2_dist_sq(a, b)
    case "cosine" | "angular" => cosine_dist(a, b)
    case "ip" | "dot"         => ip_dist(a, b)
    case m => throw new IllegalArgumentException(s"unknown metric: $m")
  }

  /** register for spark.sql use */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", es => VecDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_l2_dist", es => VecL2Dist(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_l2_dist_sq", es => VecL2DistSq(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine_dist", es => VecCosineDist(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_ip_dist", es => VecIpDist(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm", es => VecNorm(es.head), "built-in")
    reg.createOrReplaceTempFunction("vec_normalize", es => VecNormalize(es.head), "built-in")
  }
}
