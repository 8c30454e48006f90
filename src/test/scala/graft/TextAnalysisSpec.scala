package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, TextAnalysis}

/** Hand-computed oracles for the repetition signals and the invariance
  * contract of deterministic hash sampling. */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def reps(texts: String*): Seq[(Double, Double, Double)] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    df.select(col("id"), TextAnalysis.repetitionStats(col("text")).as("r"))
      .orderBy("id")
      .select(col("r.top_word_frac"), col("r.top_2gram_frac"),
        col("r.dup_3gram_frac"))
      .collect().toSeq
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
  }

  test("repetition stats match hand-computed fractions") {
    val Seq(abab, xyz, empty, one) =
      reps("a b a b a", "x y z", "   ", "one")
    // "a b a b a": norm_len 9; top word 'a'×3 → 3/9; 2-grams "a b"×2 /
    // "b a"×2 tie → lexicographic min "a b", 2·3/9; 3-grams "a b a"×2
    // duplicated → 2·5/9 > 1 capped at 1.0 (overlap overcount)
    assert(math.abs(abab._1 - 3.0 / 9) < 1e-12)
    assert(math.abs(abab._2 - 6.0 / 9) < 1e-12)
    assert(abab._3 == 1.0)
    // "x y z": top word 1/5; top 2-gram "x y" 3/5; no duplicated 3-gram
    assert(math.abs(xyz._1 - 1.0 / 5) < 1e-12)
    assert(math.abs(xyz._2 - 3.0 / 5) < 1e-12)
    assert(xyz._3 == 0.0)
    assert(empty == ((0.0, 0.0, 0.0)))
    assert(one == ((1.0, 0.0, 0.0)))
  }

  test("repetition stats rank boilerplate above varied text") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val r = docs.select(TextAnalysis.repetitionStats(col("text")).as("r"))
      .agg(avg("r.top_2gram_frac"), max("r.dup_3gram_frac")).head()
    assert(r.getDouble(0) > 0.0 && r.getDouble(0) < 1.0)
    assert(r.getDouble(1) <= 1.0)
  }

  test("hash sampling is invariant to partition layout and repeatable") {
    val df = spark.range(0, 5000).toDF("id")
    def ids(parts: Int): Set[Long] =
      Sampling.sampleByHash(df.repartition(parts), "id", 0.2)
        .as[Long].collect().toSet
    val a = ids(3)
    assert(a == ids(11), "sample must not depend on partitioning")
    assert(a == ids(3), "sample must be repeatable")
    // realized rate within ±2% absolute of the requested 20%
    assert(math.abs(a.size / 5000.0 - 0.2) < 0.02, s"rate ${a.size / 5000.0}")
    // salt changes the sample, rate stays
    val b = Sampling.sampleByHash(df, "id", 0.2, salt = "other")
      .as[Long].collect().toSet
    assert(a != b)
  }

  test("pii scrub redacts emails, phones, IPs; counts match tags emitted") {
    val rows = Seq(
      (1L, "mail bob.smith+x@sub.example.co.uk now"),
      (2L, "call 555-867-5309 or 555.123.4567 today"),
      (3L, "host 192.168.0.1 and 10.0.255.7 up"),
      (4L, "mixed a@b.io 555-000-1111 1.2.3.4"),
      (5L, "clean text no pii at all"),
      (6L, "")).toDF("id", "text")
    val out = rows.select(col("id"),
        TextAnalysis.piiScrub(col("text")).as("s"),
        TextAnalysis.piiCounts(col("text")).as("c"))
      .orderBy("id")
      .collect()
      .map(r => (r.getString(1), r.getStruct(2).getLong(0),
        r.getStruct(2).getLong(1), r.getStruct(2).getLong(2)))
    assert(out(0) == (("mail <EMAIL> now", 1L, 0L, 0L)))
    assert(out(1) == (("call <PHONE> or <PHONE> today", 0L, 2L, 0L)))
    assert(out(2) == (("host <IP> and <IP> up", 0L, 0L, 2L)))
    assert(out(3) == (("mixed <EMAIL> <PHONE> <IP>", 1L, 1L, 1L)))
    assert(out(4) == (("clean text no pii at all", 0L, 0L, 0L)))
    assert(out(5) == (("", 0L, 0L, 0L)))
  }

  test("pii scrub order: email domains that look like IPs are emails") {
    val df = Seq((1L, "ping admin@10.0.0.1 plus bare 10.0.0.2")).toDF("id", "text")
    val s = df.select(TextAnalysis.piiScrub(col("text"))).as[String].head()
    // the email regex requires an alpha TLD, so admin@10.0.0.1 is NOT an
    // email match — its IP tail is still scrubbed by the IP stage
    assert(s == "ping admin@<IP> plus bare <IP>")
  }

  test("stratified counts agree with the row-level predicate") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val audit = Sampling.stratifiedSampleCounts(docs, "doc_id", "lang", 0.1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = Sampling.sampleByHash(docs, "doc_id", 0.1)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, (n, s)) <- audit) {
      assert(s <= n)
      assert(direct.getOrElse(lang, 0L) == s, s"$lang: audit $s vs ${direct.get(lang)}")
    }
  }
}
