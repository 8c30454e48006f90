package graft.operators

/** Runtime-optional SIMD distance kernels over the JDK incubator Vector
  * API (`jdk.incubator.vector`, public JDK since 16; 512-bit lanes where
  * the CPU has them). The module is resolved reflectively so the library
  * keeps working on JVMs launched without `--add-modules
  * jdk.incubator.vector` — they just get the scalar kernel.
  *
  * Scope discipline — WHERE these kernels are allowed: only operators
  * whose gate contract is tolerant of floating-point reassociation.
  * SIMD reduces in lanes (a different addition order than the sequential
  * scalar loop), so results differ in the last ulps from the codegen
  * expressions the DuckDB oracles replay element-order. The hash-tier
  * operators (exact kNN, IVF/PQ/SQ8 scoring, encode/assign) therefore
  * MUST keep the scalar kernels — their oracle SQL reproduces the exact
  * double sequence. The graph walks (HNSW family, floor-tier gate: a
  * fixed row emitted above a calibrated recall floor) are the intended
  * consumers: beam search tolerates last-ulp distance noise by
  * construction, and both their local and distributed paths share one
  * kernel instance so local-vs-distributed equality specs still hold.
  */
object SimdDist {

  trait Kernel {
    /** √Σ(aᵢ−bᵢ)² */
    def l2(a: Array[Float], b: Array[Float]): Double
    /** 1 − a·b / (‖a‖‖b‖); 1.0 on zero norms */
    def cosineDist(a: Array[Float], b: Array[Float]): Double
    /** a·b */
    def dot(a: Array[Float], b: Array[Float]): Double
    /** flat-row variants: `b`'s row starts at `bOff`, length = a.length
      * (LocalScan's collected tables are single flat float arrays) */
    def l2Flat(a: Array[Float], b: Array[Float], bOff: Int): Double
    def dotFlat(a: Array[Float], b: Array[Float], bOff: Int): Double
    def cosineFlat(a: Array[Float], b: Array[Float], bOff: Int): Double
  }

  /** the exact arithmetic of the pre-SIMD HNSW kernels (float → double
    * per element, index-order accumulation) */
  object ScalarKernel extends Kernel {
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      math.sqrt(acc)
    }
    def cosineDist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 1.0 else 1.0 - dot / den
    }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def l2Flat(a: Array[Float], b: Array[Float], bOff: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(bOff + i).toDouble; acc += d * d; i += 1
      }
      math.sqrt(acc)
    }
    def dotFlat(a: Array[Float], b: Array[Float], bOff: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(bOff + i).toDouble; i += 1 }
      acc
    }
    def cosineFlat(a: Array[Float], b: Array[Float], bOff: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(bOff + i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 1.0 else 1.0 - dot / den
    }
  }

  /** The Vector-API kernel when `jdk.incubator.vector` resolves in this
    * JVM, independent of the enable flag — specs and the dev shootouts
    * compare it against [[ScalarKernel]] directly. Loaded reflectively so
    * this class never links against the incubator module. */
  val vectorKernel: Option[Kernel] =
    try {
      Class.forName("jdk.incubator.vector.FloatVector")
      Some(Class.forName("graft.operators.VectorDistKernel")
        .getDeclaredConstructor().newInstance().asInstanceOf[Kernel])
    } catch { case _: Throwable => None }

  /** opt-in: -Dgraft.simd.enabled=true / GRAFT_SIMD=1 */
  private def enabled: Boolean =
    sys.props.get("graft.simd.enabled")
      .orElse(sys.env.get("GRAFT_SIMD"))
      .exists(v => v == "true" || v == "1")

  /** The process-wide kernel consumed by the HNSW family. OPT-IN, default
    * scalar: on this sandbox's virtualized Xeon the incubator API never
    * intrinsifies (dev/KernelMicro: ≤1.4× scalar at 384-d, 0.5× at 64-d)
    * and its object-per-call fallback path made HNSW builds 45-60%
    * SLOWER when it briefly became the round-7 default (HnswBuildProfile
    * msmarco shape: scalar 15.6 s vs vector 23-26 s — the r7 watchdog
    * skip). On hardware where the API engages, flip it on. */
  val kernel: Kernel =
    if (enabled) vectorKernel.getOrElse(ScalarKernel) else ScalarKernel

  def simdActive: Boolean = kernel ne ScalarKernel
}
