package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** graft.scan.simd contract: OFF by default (the scalar kernels'
  * bit-exactness against the codegen expressions is what the hash-tier
  * oracles replay); ON, the reassociated float-lane kernels must agree
  * with the scalar ones to ~1e-5 relative and return the same top-k id
  * sets on continuous data (ties are measure-zero there). */
class SimdScanSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def searchExact(): Map[Long, Seq[Long]] = {
    val dir = "/root/testdata/sf0.001"
    val base = Tables.embBase(spark, dir)
    val queries = Tables.embQueries(spark, dir)
    Registry.init()
    val artifact = BruteForceIndexer().build(base)
    LinearSearcher("l2").search(artifact, queries, 10)
      .select("qid", "rank", "id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
  }

  test("flag off by default; SIMD exact scan returns identical top-k ids") {
    assert(!LocalScan.scanSimd, "graft.scan.simd must default OFF")
    val scalar = searchExact()
    System.setProperty("graft.scan.simd", "true")
    val simd =
      try searchExact()
      finally System.clearProperty("graft.scan.simd")
    assert(simd == scalar,
      "SIMD scan changed the exact top-k (beyond tie reordering on gate data)")
  }

  test("flat SIMD kernels agree with scalar to 1e-5 relative") {
    assume(SimdDist.vectorKernel.isDefined, "no jdk.incubator.vector in this JVM")
    val rnd = new java.util.Random(7)
    val dim = 131 // odd size exercises the lane tail
    val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    val flat = Array.fill(dim * 5)(rnd.nextFloat() * 2 - 1)
    for (row <- 0 until 5) {
      val off = row * dim
      val b = java.util.Arrays.copyOfRange(flat, off, off + dim)
      val k = SimdDist.vectorKernel.get
      val s = SimdDist.ScalarKernel
      assert(math.abs(k.l2Flat(q, flat, off) - s.l2(q, b)) <=
        1e-5 * math.max(1.0, s.l2(q, b)))
      assert(math.abs(k.dotFlat(q, flat, off) - s.dot(q, b)) <=
        1e-5 * math.max(1.0, math.abs(s.dot(q, b))))
      assert(math.abs(k.cosineFlat(q, flat, off) - s.cosineDist(q, b)) <= 1e-5)
    }
  }
}
