package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P6: dimension/shape validation predicates (reference raises on
  * mismatch at build/search time — modular.py:148-149, lsh.py:96-97,
  * covertree_v2_2.py:86-88). Schema checks are driver-side; the data
  * check is a single aggregate. */
object Validate {

  def requireVectorColumn(df: DataFrame, c: String): Unit =
    df.schema(c).dataType match {
      case ArrayType(FloatType, _) => ()
      case other => throw new IllegalArgumentException(
        s"column $c must be array<float>, got ${other.simpleString}")
    }

  /** every row's vector must have exactly `dim` elements */
  def requireFixedDim(df: DataFrame, c: String, dim: Int): Unit = {
    val bad = df.filter(size(col(c)) =!= dim).limit(1).count()
    if (bad > 0) throw new IllegalArgumentException(
      s"column $c has rows with dimension != $dim")
  }

  /** dimensions must agree between two vector tables (e.g. query vs base) */
  def requireSameDim(a: DataFrame, aCol: String, b: DataFrame, bCol: String): Int = {
    val da = a.select(size(col(aCol))).head().getInt(0)
    val db = b.select(size(col(bCol))).head().getInt(0)
    if (da != db) throw new IllegalArgumentException(
      s"dimension mismatch: $aCol=$da vs $bCol=$db")
    da
  }
}
