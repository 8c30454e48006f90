package graft.dev

/** Prints SparkEntry.queries' Map iteration order — the exact execution
  * order of Verify/Bench — so a scaled-pass straggler can be attributed
  * to its query by position. */
object QueryOrder {
  def main(args: Array[String]): Unit =
    println("ORDER:" + graft.SparkEntry.queries.keys.mkString(","))
}
