package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native set-similarity kernels over SORTED long arrays (hashed token /
  * shingle sets). Used by the dedup family's verify stages where the
  * generic `array_intersect`/UDF formulations drown in per-row object
  * churn: these read `ArrayData` in place with zero boxing and stay
  * inside whole-stage codegen — the preferred custom-Expression
  * extension path (SURVEY §4).
  *
  * Contract: both inputs ascending-sorted distinct int64 (produce with
  * `array_sort(array_distinct(transform(..., xxhash64(...))))`).
  */
case class SortedLongArrayJaccard(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {
  override def prettyName: String = "sorted_array_jaccard"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long x = $a.getLong($i); long y = $b.getLong($j);
         |  if (x == y) { $inter++; $i++; $j++; }
         |  else if (x < y) $i++;
         |  else $j++;
         |}
         |int $union = $na + $nb - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** |A ∩ B| over sorted long arrays (same contract) */
case class SortedLongArrayIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {
  override def prettyName: String = "sorted_array_intersect_size"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long x = $a.getLong($i); long y = $b.getLong($j);
         |  if (x == y) { $inter++; $i++; $j++; }
         |  else if (x < y) $i++;
         |  else $j++;
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object ArrayFunctions {
  import org.apache.spark.sql.graftshim.Shim.{column, expression}
  def sorted_array_jaccard(a: Column, b: Column): Column =
    column(SortedLongArrayJaccard(expression(a), expression(b)))
  def sorted_array_intersect_size(a: Column, b: Column): Column =
    column(SortedLongArrayIntersectSize(expression(a), expression(b)))
}
