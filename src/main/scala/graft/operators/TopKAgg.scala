package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded max-heap of the k smallest (dist, id) pairs.
  *
  * The reference avoids a full sort per query via `np.argpartition(kth=k)`
  * followed by an in-partition argsort (`modular.py:349-356`). The Spark
  * analog of that tactic is this aggregation buffer: O(n log k) per group
  * with map-side partial aggregation, instead of a Window sort which
  * shuffles and sorts every candidate row. Total order is (dist, id) so
  * results are deterministic under equal distances (SURVEY §7.4-1).
  */
final class BoundedTopK(val k: Int) extends Serializable {
  // max-heap on (dist desc, id desc): root is the current worst kept pair
  val dists = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  @inline private def worse(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  def insert(id: Long, dist: Double): Unit = {
    if (size < k) {
      var i = size
      dists(i) = dist; ids(i) = id; size += 1
      // sift up
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(dists(i), ids(i), dists(p), ids(p))) {
          val td = dists(i); dists(i) = dists(p); dists(p) = td
          val ti = ids(i); ids(i) = ids(p); ids(p) = ti
          i = p
        } else i = 0
      }
    } else if (worse(dists(0), ids(0), dist, id)) {
      // replace root, sift down
      dists(0) = dist; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && worse(dists(l), ids(l), dists(m), ids(m))) m = l
        if (r < size && worse(dists(r), ids(r), dists(m), ids(m))) m = r
        if (m == i) done = true
        else {
          val td = dists(i); dists(i) = dists(m); dists(m) = td
          val ti = ids(i); ids(i) = ids(m); ids(m) = ti
          i = m
        }
      }
    }
  }

  def merge(o: BoundedTopK): Unit = {
    var i = 0
    while (i < o.size) { insert(o.ids(i), o.dists(i)); i += 1 }
  }

  /** empty for reuse (HnswWorkspace amortizes one instance per thread) */
  def reset(): Unit = size = 0

  /** remove the root (current worst); callers drain the heap into
    * descending order without the boxed-tuple path of [[sorted]] */
  def popRoot(): Unit = {
    size -= 1
    if (size > 0) {
      dists(0) = dists(size); ids(0) = ids(size)
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && worse(dists(l), ids(l), dists(m), ids(m))) m = l
        if (r < size && worse(dists(r), ids(r), dists(m), ids(m))) m = r
        if (m == i) done = true
        else {
          val td = dists(i); dists(i) = dists(m); dists(m) = td
          val ti = ids(i); ids(i) = ids(m); ids(m) = ti
          i = m
        }
      }
    }
  }

  /** ascending (dist, id) */
  def sorted: Array[(Long, Double)] = {
    val out = ids.take(size).zip(dists.take(size)).map { case (i, d) => (i, d) }
    out.sortBy { case (i, d) => (d, i) }
  }
}

/** agg expression: top-k (id, dist) per group, out = array<struct<id,dist>>
  * ascending by (dist, id). */
case class TopKByDist(
    idExpr: Expression,
    distExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopK] {

  override def children: Seq[Expression] = Seq(idExpr, distExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByDist.resultType

  override def createAggregationBuffer(): BoundedTopK = new BoundedTopK(k)

  override def update(buf: BoundedTopK, input: InternalRow): BoundedTopK = {
    val id = idExpr.eval(input)
    val dist = distExpr.eval(input)
    if (id != null && dist != null) {
      buf.insert(id.asInstanceOf[Long], dist.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: BoundedTopK, other: BoundedTopK): BoundedTopK = {
    buf.merge(other); buf
  }

  override def eval(buf: BoundedTopK): Any = {
    val s = buf.sorted
    new GenericArrayData(s.map { case (id, d) =>
      InternalRow(id, d)
    }.toArray[Any])
  }

  override def serialize(buf: BoundedTopK): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.ids(i)); bb.putDouble(buf.dists(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt; val n = bb.getInt
    val buf = new BoundedTopK(kk)
    var i = 0
    while (i < n) {
      val id = bb.getLong; val d = bb.getDouble
      buf.insert(id, d); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByDist =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByDist =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKByDist =
    copy(idExpr = cs(0), distExpr = cs(1))
  override def prettyName: String = "top_k_by_dist"
}

object TopKByDist {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false))),
    containsNull = false)

  /** Column API: `df.groupBy($"qid").agg(topK($"id", $"dist", 10) as "nn")` */
  def topK(id: Column, dist: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.Shim.{column, expression}
    column(TopKByDist(expression(id), expression(dist), k).toAggregateExpression())
  }
}
