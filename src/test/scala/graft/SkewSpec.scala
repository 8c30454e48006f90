package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("salted join ≡ plain join, including hot keys and misses") {
    // 90% of big rows share one hot key — the straggler shape
    val big = (0L until 2000L)
      .map(i => (i, if (i % 10 == 0) s"k${i % 7}" else "HOT"))
      .toDF("row_id", "key")
    val small = Seq(("HOT", 1), ("k1", 2), ("k3", 3), ("absent", 9))
      .toDF("key", "payload")
    val plain = big.join(small, Seq("key"))
      .select("row_id", "key", "payload")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "key", "row_id", replication = 8)
      .select("row_id", "key", "payload")
      .collect().map(_.toSeq).toSet
    assert(salted == plain, s"sizes: salted=${salted.size} plain=${plain.size}")
    assert(plain.nonEmpty)
  }

  test("salting spreads a hot key across the keyspace") {
    val big = (0L until 1000L).map(i => (i, "HOT")).toDF("row_id", "key")
    val small = Seq(("HOT", 1)).toDF("key", "payload")
    // distinct (key, salt) pairs seen by the join — must be ~replication,
    // not 1, or the hot key still lands on one reducer
    val salts = Skew.saltedJoin(big, small, "key", "row_id", replication = 8)
      .select(pmod(xxhash64(col("row_id")), lit(8)))
      .distinct().count()
    assert(salts == 8L, s"hot key only reached $salts of 8 salt buckets")
  }
}
