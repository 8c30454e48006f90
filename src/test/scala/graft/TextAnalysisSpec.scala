package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Sampling, TextAnalysis}

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

  test("topWordFrac is bit-identical to repetitionStats.top_word_frac") {
    val texts = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
      .union(Seq("a b a b a", "   ", "one", "x  y\tz  x").toDF("text"))
    val mism = texts.select(
        TextAnalysis.repetitionStats(col("text"))
          .getField("top_word_frac").as("full"),
        TextAnalysis.topWordFrac(col("text")).as("single"))
      .filter(col("full") =!= col("single")).count()
    assert(mism == 0L, "single-stat variant must be bit-identical")
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

  test("domainCap: bounded shuffle plan, heap variant keeps identical ids") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val capped = Corpus.domainCap(docs, "doc_id", "source", "n_chars", n = 7)
    assert(capped.columns.toSeq == docs.columns.toSeq,
      "cap must preserve the input schema")
    // the plan this operator is ABOUT: the rank filter must compile to a
    // map-side (Partial) WindowGroupLimit so at most n rows per domain
    // cross the exchange — if Catalyst's InferWindowGroupLimit rewrite
    // ever stops firing, fail here rather than at cluster wall-clock
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"rank filter must push a Partial WindowGroupLimit below the exchange:\n$plan")
    // the explicit bounded-heap formulation must keep the exact same id
    // set (same (key desc, id asc) total order, tie-breaks included)
    val viaHeap =
      Corpus.domainCapViaHeap(docs, "doc_id", "source", "n_chars", n = 7)
    assert(capped.select("doc_id").as[Long].collect().toSet ==
      viaHeap.select("doc_id").as[Long].collect().toSet)
    // and the cap must actually bite: no domain above n, some at n
    val sizes = capped.groupBy("source").count().as[(String, Long)].collect()
    assert(sizes.forall(_._2 <= 7) && sizes.exists(_._2 == 7))
  }

  test("chunkWindows: stride coverage, overlap, short tail, empty docs") {
    val docs = Seq(
      (1L, (1 to 80).map(i => s"w$i").mkString(" ")), // 80 tokens -> 3 chunks
      (2L, "only three tokens"),                      // 1 short chunk
      (3L, "   "),                                    // empty -> no chunks
      (4L, (1 to 32).map(i => s"x$i").mkString(" "))  // exactly one window
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkWindows(docs, "doc_id", "text", window = 32, stride = 24)
      .orderBy("id", "chunk_idx")
      .select("id", "chunk_idx", "n_chunk_tokens", "first_tok", "last_tok")
      .as[(Long, Long, Long, String, String)].collect().toSeq
    // doc 1: chunks at token offsets 0/24/48 -> 32,32,32 tokens (80-48=32)
    assert(out.filter(_._1 == 1L) == Seq(
      (1L, 0L, 32L, "w1", "w32"),
      (1L, 1L, 32L, "w25", "w56"),
      (1L, 2L, 32L, "w49", "w80")))
    assert(out.filter(_._1 == 2L) == Seq((2L, 0L, 3L, "only", "tokens")))
    assert(!out.exists(_._1 == 3L))
    assert(out.filter(_._1 == 4L) == Seq((4L, 0L, 32L, "x1", "x32")))
  }

  test("packSequences: exact budget fill, token conservation, straddling") {
    val docs = (1 to 40).map(i => (i.toLong, (1 to 100).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text") // 40 docs x 100 tokens = 4000 tokens
    val out = Corpus.packSequences(docs, "doc_id", "text", budget = 512)
      .orderBy("seq_id")
      .select("seq_id", "n_docs", "n_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    // 4000 tokens / 512 = 7 full sequences + a 416-token tail
    assert(out.map(_._1) == (0L to 7L))
    assert(out.init.forall(_._3 == 512L), s"non-budget bin: $out")
    assert(out.last._3 == 4000L - 7 * 512L)
    assert(out.map(_._3).sum == 4000L)
    // 100-token docs straddle every 512 boundary: bins see 6 or 7 docs
    assert(out.init.forall(r => r._2 == 6L || r._2 == 7L))
  }

  test("packSequences: two-phase cumsum invariant under tiny ranges") {
    val docs = (1 to 40).map(i => (i.toLong, (1 to 100).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val onePhase = Corpus.packSequences(docs, "doc_id", "text", 512, rangeSize = 1 << 20)
      .orderBy("seq_id").collect().toSeq
    val manyRanges = Corpus.packSequences(docs, "doc_id", "text", 512, rangeSize = 3)
      .orderBy("seq_id").collect().toSeq
    assert(onePhase == manyRanges)
  }
}
