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
  }
}
