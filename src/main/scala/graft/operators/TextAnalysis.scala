package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language heuristics, document fingerprinting. All are
  * pure column expressions (codegen'd, shuffle-free, embarrassingly
  * parallel over documents at 100 TB).
  */
object TextAnalysis {

  /** whitespace token count */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0L)
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** Overlapping token-window chunking (the RAG / long-context
    * preprocessing shape): each document's whitespace tokens split into
    * windows of `window` tokens advancing by `stride` (< window ⇒
    * overlap); the last window is short rather than padded, empty docs
    * produce no chunks. Pure row-local explode — shuffle-free,
    * embarrassingly parallel at corpus scale.
    * Output: (id, chunk_idx, n_chunk_tokens, first_tok, last_tok). */
  def chunkWindows(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, window: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = split(trim(col(textCol)), "\\s+")
    val nTok = tokenCount(col(textCol))
    // chunks = 1 + ceil((nTok − window) / stride), min 1, 0 for empty
    val nChunks = when(nTok === 0, 0L).otherwise(
      greatest(lit(0L),
        ceil((nTok - window).cast("double") / stride).cast("long")) + 1L)
    docs
      .select(col(idCol).cast("long").as("id"), toks.as("__toks"),
        nTok.as("__n"), nChunks.as("__chunks"))
      .filter(col("__chunks") > 0)
      .select(col("id"), col("__toks"), col("__n"),
        explode(sequence(lit(0L), col("__chunks") - 1)).as("chunk_idx"))
      .select(
        col("id"), col("chunk_idx"),
        least(lit(window.toLong), col("__n") - col("chunk_idx") * stride)
          .as("n_chunk_tokens"),
        element_at(col("__toks"), (col("chunk_idx") * stride + 1).cast("int"))
          .as("first_tok"),
        element_at(col("__toks"),
          least(col("chunk_idx") * stride + window, col("__n")).cast("int"))
          .as("last_tok"))
  }

  /** BPE-ish subword count approximation: word-boundary pieces plus
    * length/4 continuation pieces per long word (a standard fast proxy
    * for tokenizer budget accounting). */
  def approxBpeTokenCount(text: Column): Column =
    aggregate(
      split(trim(text), "\\s+"),
      lit(0L),
      (acc, w) => acc + lit(1L) + (length(w).cast("long") / 4))

  /** punctuation character count (fixed class, engine-portable) */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("long")

  /** ratio of stopword tokens (small fixed english list) */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "be", "this", "that", "are")

  def stopwordRatio(text: Column): Column = {
    val toks = Dedup.tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))
        .cast("double") / size(toks))
  }

  /** mean word length */
  def meanWordLen(text: Column): Column = {
    val toks = Dedup.tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double")
        / size(toks))
  }

  /** Composite quality score ∈ [0,1]: rewards reasonable length, word
    * shape and stopword presence; penalizes punctuation soup. The exact
    * formula is this engine's own (the reference has no quality scorer) —
    * what matters is determinism + monotone response to each signal. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val lenScore = least(nTok.cast("double") / 20.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctRatio = when(length(text) === 0, 0.0)
      .otherwise(punctCount(text).cast("double") / length(text))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio * 5.0)
    round((lenScore + stopScore + punctScore) / 3.0, 6)
  }

  /** Heuristic language id: non-ASCII ratio routes CJK/other scripts,
    * stopword density routes english vs unknown. Deterministic and
    * SQL-portable (the real corpus labels come from upstream — this is
    * the fast n-gram-free heuristic tier). One UDF pass per doc — the
    * regexp_replace formulation of the non-ASCII count rewrites the whole
    * string per row and was 8× slower for the same answer. */
  def langIdHeuristic(text: Column): Column = {
    val stop = stopwords.toSet
    val u = udf { (t: String) =>
      if (t == null || t.isEmpty) "unknown"
      else {
        var nonAscii = 0
        var i = 0
        while (i < t.length) { if (t.charAt(i) > 127) nonAscii += 1; i += 1 }
        if (nonAscii.toDouble / t.length > 0.3) "other"
        else {
          val toks = t.trim.toLowerCase.split("\\s+")
          val nStop = toks.count(stop.contains)
          val ratio = if (toks.length == 0) 0.0 else nStop.toDouble / toks.length
          if (ratio >= 0.05) "en" else "unknown"
        }
      }
    }
    u(text)
  }

  /** 64-bit content fingerprint of normalized text (collapse whitespace,
    * lowercase) — the cheap exact-dup / shard-routing key. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(trim(lower(text)), "\\s+", " "))

  // ------------------------------------------------------------ PII scrub
  /** PII patterns, deliberately restricted to syntax shared by Java regex
    * (Spark codegen) and RE2 (DuckDB oracle / Go- and Rust-based engines):
    * character classes, bounded repeats and `\b` only — no lookarounds or
    * backrefs, so the scrub is engine-portable and linear-time in RE2. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact emails, NANP-shaped phone numbers and IPv4 literals with
    * typed placeholder tags. Pure `regexp_replace` chain — shuffle-free,
    * codegen'd, embarrassingly parallel over documents at 100 TB. Order
    * matters and is part of the contract: emails first (their domain can
    * contain an IP), then phones (3-3-4 digit runs), then IPs — the same
    * chain a DuckDB/RE2 replica must apply. */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  /** Per-document PII hit counts (pre-scrub), for audit dashboards and
    * filter thresholds: struct(n_email, n_phone, n_ip). Counted on the
    * same redaction order as [[piiScrub]] so counts equal tags emitted. */
  def piiCounts(text: Column): Column = {
    val afterEmail = regexp_replace(text, emailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, phoneRe, "<PHONE>")
    struct(
      regexp_count(text, lit(emailRe)).cast("long").as("n_email"),
      regexp_count(afterEmail, lit(phoneRe)).cast("long").as("n_phone"),
      regexp_count(afterPhone, lit(ipv4Re)).cast("long").as("n_ip"))
  }

  /** Repetition signals (the Gopher/MassiveText repetition-filter family,
    * Rae et al. 2021 §A1.1): documents dominated by a few repeated
    * n-grams are boilerplate/spam and get filtered before training.
    * Returns struct(top_word_frac, top_2gram_frac, dup_3gram_frac) over
    * normalized (lowercased, whitespace-split) tokens, denominated in
    * characters of the normalized text (tokens joined by single spaces):
    *  - top_word_frac:   chars of the most frequent token × its count
    *  - top_2gram_frac:  chars of the most frequent word 2-gram × count
    *  - dup_3gram_frac:  chars of ALL word 3-grams occurring ≥ 2×,
    *                     capped at 1.0 (overlapping grams can overcount)
    * Ties broken to the lexicographically smallest gram. One tight UDF
    * pass per document — shuffle-free, embarrassingly parallel (the
    * expression formulation needs 3 explode→groupBy rounds, i.e. 3 full
    * shuffles of the gram stream, for a per-row computation). */
  def repetitionStats(text: Column): Column = {
    val u = udf { (t: String) =>
      if (t == null || t.trim.isEmpty) (0.0, 0.0, 0.0)
      else {
        val toks = t.trim.toLowerCase.split("\\s+")
        val normLen = toks.map(_.length).sum + (toks.length - 1)
        def topFrac(n: Int): Double = {
          if (toks.length < n) return 0.0
          val counts = new java.util.HashMap[String, Int]()
          var i = 0
          while (i + n <= toks.length) {
            val g = toks.slice(i, i + n).mkString(" ")
            counts.merge(g, 1, Integer.sum)
            i += 1
          }
          var bestG: String = null
          var bestC = 0
          counts.forEach { (g, c) =>
            if (c > bestC || (c == bestC && (bestG == null || g < bestG))) {
              bestG = g; bestC = c
            }
          }
          bestC.toLong * bestG.length.toDouble / normLen
        }
        def dupFrac(n: Int): Double = {
          if (toks.length < n) return 0.0
          val counts = new java.util.HashMap[String, Int]()
          var i = 0
          while (i + n <= toks.length) {
            val g = toks.slice(i, i + n).mkString(" ")
            counts.merge(g, 1, Integer.sum)
            i += 1
          }
          var dupChars = 0L
          counts.forEach { (g, c) => if (c >= 2) dupChars += c.toLong * g.length }
          math.min(1.0, dupChars.toDouble / normLen)
        }
        (topFrac(1), topFrac(2), dupFrac(3))
      }
    }
    u(text).cast("struct<top_word_frac:double,top_2gram_frac:double,dup_3gram_frac:double>")
  }

  /** Single-stat variant of [[repetitionStats]]: ONLY top_word_frac,
    * bit-identical to `repetitionStats(text).getField("top_word_frac")`
    * (same tokenization, same tie-break, same double arithmetic) but one
    * hashmap pass instead of three. A consumer that filters on the
    * top-word fraction alone (the corpus-clean pipeline) shouldn't pay the
    * 2-gram + 3-gram passes Catalyst can't prune out of a struct UDF —
    * at corpus scale that's ~2/3 of the repetition-scan CPU. */
  def topWordFrac(text: Column): Column = {
    val u = udf { (t: String) =>
      if (t == null || t.trim.isEmpty) 0.0
      else {
        val toks = t.trim.toLowerCase.split("\\s+")
        val normLen = toks.map(_.length).sum + (toks.length - 1)
        val counts = new java.util.HashMap[String, Int]()
        var i = 0
        while (i < toks.length) { counts.merge(toks(i), 1, Integer.sum); i += 1 }
        var bestG: String = null
        var bestC = 0
        counts.forEach { (g, c) =>
          if (c > bestC || (c == bestC && (bestG == null || g < bestG))) {
            bestG = g; bestC = c
          }
        }
        bestC.toLong * bestG.length.toDouble / normLen
      }
    }
    u(text)
  }
}
