package graft.dev

import java.util.concurrent.Executors

import graft.operators.MediaCodec

/** r14 micro-probe: WAV encode+decode throughput, 1 thread vs N threads
  * — isolates whether the mm_audio stage's parallel slowdown lives in
  * the codec (shared-lock contention) or in Spark. No Spark session.
  *
  * Usage: runMain graft.dev.R14AudioMicro [nDocs=5000] [threads=32]
  */
object R14AudioMicro {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(5000)
    val nThreads = args.lift(1).map(_.toInt).getOrElse(32)

    def oneDoc(id: Long): Long = {
      val nFrames = (64 + id % 41).toInt
      val ch = (1 + id % 2).toInt
      val rate = (8000 * (1 + id % 3)).toInt
      val samples = new Array[Short](nFrames * ch)
      var i = 0
      while (i < nFrames) {
        var c = 0
        while (c < ch) {
          samples(i * ch + c) =
            (((31 * id + 7 * i + 13 * c) % 65536) - 32768).toShort
          c += 1
        }
        i += 1
      }
      val bytes = MediaCodec.encodeWav(samples, ch, rate)
      MediaCodec.decodeAudio(bytes).map(_.channelSums(0)).getOrElse(-1L)
    }

    def run(threads: Int): Double = {
      val t0 = System.nanoTime()
      if (threads == 1) { (0 until n).foreach(i => oneDoc(i.toLong)); () }
      else {
        val pool = Executors.newFixedThreadPool(threads)
        val futs = (0 until threads).map { t =>
          pool.submit(new Runnable {
            def run(): Unit =
              (t until n by threads).foreach(i => oneDoc(i.toLong))
          })
        }
        futs.foreach(_.get())
        pool.shutdown()
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm (classload + JIT)
    run(1)
    println(f"[audiomicro] n=$n 1-thread  ${run(1)}%6.3f s")
    println(f"[audiomicro] n=$n $nThreads%2d-thread ${run(nThreads)}%6.3f s")
  }
}
