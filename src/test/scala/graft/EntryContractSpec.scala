package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that round 3 proved can silently drift:
  * every gate query must carry an oracle, and the documented coverage
  * count must equal the real map sizes. (Compile breakage of the gate —
  * round 3's failure mode — is covered by this suite merely referencing
  * both maps.) */
class EntryContractSpec extends AnyFunSuite {

  test("every gate query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o,
      s"query/oracle drift: missing oracles=${q -- o}, orphan oracles=${o -- q}")
  }

  test("COVERAGE.md oracle-tier table matches the query map") {
    val md = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val documented = "`([a-z0-9_]+)` \\| (hash|hash-model|floor)".r
      .findAllMatchIn(md).map(_.group(1)).toSet
    val real = SparkEntry.queries.keySet
    assert(documented == real,
      s"COVERAGE tier table drift: undocumented=${real -- documented}, " +
        s"stale=${documented -- real}")
  }

  // --- ScaledModelCheck's literal splicer: the scaled-model pass edits
  //     ONLY the VALUES rows of the pinned oracles, so the substitution
  //     markers must keep existing in exactly the expected shape. A
  //     future oracle rewrite that renames a block or its terminator
  //     should fail here, not silently skip the at-scale model check. ---

  private val blockOf = Map(
    "j8_ivf_probe" -> Seq("cents(cid, cv) AS (VALUES"),
    "j8_ivf_append" -> Seq("cents(cid, cv) AS (VALUES"),
    "j8_ivf_filtered" -> Seq("cents(cid, cv) AS (VALUES"),
    "j10_ivf_sq8" -> Seq("cents(cid, cv) AS (VALUES"),
    "j10_ivf_pq" -> Seq("cents(cid, cv) AS (VALUES", "cbs(sub, cent, cb) AS (VALUES"),
    "j10_ivf_sq8_filtered" -> Seq("cents(cid, cv) AS (VALUES"),
    "j10_ivf_pq_filtered" -> Seq("cents(cid, cv) AS (VALUES", "cbs(sub, cent, cb) AS (VALUES"),
    "j9_pq_adc" -> Seq("cbs(sub, cent, cb) AS (VALUES"),
    "j9_opq_adc" -> Seq("rot(i, rr) AS (VALUES", "cbs(sub, cent, cb) AS (VALUES"),
    "dedup_semantic" -> Seq("cents(cid, cv) AS (VALUES"))

  test("model-literal oracles keep their splice markers") {
    blockOf.foreach { case (q, headers) =>
      val sql = SparkEntry.oracleSql(q)
      headers.foreach { h =>
        val at = sql.indexOf(h)
        assert(at >= 0, s"$q: lost block header '$h'")
        assert(sql.indexOf("]::REAL[]))", at + h.length) >= 0,
          s"$q: block '$h' lost its ]::REAL[])) terminator")
      }
    }
  }

  test("splicer replaces only the targeted block") {
    val q = "j8_ivf_probe"
    val sql = SparkEntry.oracleSql(q)
    val h = "cents(cid, cv) AS (VALUES"
    val out = graft.dev.ScaledModelCheck.replaceValuesBlock(
      sql, h, "(0, [1.0,2.0]::REAL[])")
    val at = sql.indexOf(h)
    // prefix (through the header) unchanged, suffix after the old block
    // unchanged, new rows present exactly once
    assert(out.startsWith(sql.substring(0, at + h.length)))
    val oldEnd = sql.indexOf("]::REAL[]))", at) + "]::REAL[]))".length
    assert(out.endsWith(sql.substring(oldEnd)))
    assert(out.contains("(0, [1.0,2.0]::REAL[]))"))
    intercept[IllegalArgumentException] {
      graft.dev.ScaledModelCheck.replaceValuesBlock(sql, "no_such(VALUES", "(0)")
    }
  }
}
