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
}
