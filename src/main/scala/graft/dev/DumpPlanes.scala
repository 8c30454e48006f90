package graft.dev

/** dev aid: print the seeded LSH hyperplanes of the gate config as SQL
  * list literals (they are deterministic data given the seed, so the
  * DuckDB oracle can embed them). */
object DumpPlanes {
  def main(args: Array[String]): Unit = {
    // gate config: num_tables=12 hash_size=4 dim=64 bucket_width=4.0 seed=42 cosine
    val rnd = new java.util.Random(42L)
    val planes = Array.fill(12, 4, 64)(rnd.nextGaussian().toFloat)
    // rows: (table, h, plane as SQL list)
    val sb = new StringBuilder
    for (t <- 0 until 12; h <- 0 until 4) {
      val lst = planes(t)(h).map(f => f.toString).mkString("[", ",", "]")
      sb.append(s"($t, $h, $lst::REAL[]),\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/planes.sql"), sb.toString)
    println("wrote /tmp/planes.sql " + sb.length + " chars")

    // j4 E2LSH gate config: 8 tables × 4 hashes × 64 dim, w=4.0, seed 42,
    // metric l2 — same RNG order as LshModel.planesAndOffsets (planes
    // first, then offsets)
    val rnd2 = new java.util.Random(42L)
    val planes2 = Array.fill(8, 4, 64)(rnd2.nextGaussian().toFloat)
    val offs = Array.fill(8, 4)(rnd2.nextDouble() * 4.0)
    val sb2 = new StringBuilder
    for (t <- 0 until 8; h <- 0 until 4) {
      val lst = planes2(t)(h).map(_.toString).mkString("[", ",", "]")
      sb2.append(s"($t, $h, $lst::REAL[]),\n")
    }
    val sb3 = new StringBuilder
    for (t <- 0 until 8; h <- 0 until 4)
      sb3.append(s"($t, $h, ${offs(t)(h)}::DOUBLE),\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/planes_l2.sql"), sb2.toString)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/offsets_l2.sql"), sb3.toString)
    println("wrote /tmp/planes_l2.sql + /tmp/offsets_l2.sql")
  }
}
