package graft.harness

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import javax.imageio.ImageIO

/** Report sinks (reference S15-S17): per-algorithm/combined JSON, the
  * markdown benchmark summary table, the one-page summary, and the
  * QPS-vs-recall / operations-vs-recall scatters, each emitted both as
  * raw SVG (the reference also emits raw SVG text — runner.py:402-521)
  * and as PNG rasters (the reference's matplotlib `savefig` outputs,
  * evaluation.py:194,272 — rendered here with JDK ImageIO, no plotting
  * dependency).
  */
object Reports {

  def writeJson(path: String, results: Seq[Experiment.Result]): Unit = {
    val items = results.map { r =>
      val metricFields = r.metrics.toSeq.sortBy(_._1).map {
        case (k, v) => s""""$k": ${fmt(v)}"""
      }
      val fields = Seq(
        s""""algorithm": "${r.algorithm}"""",
        s""""n_train": ${r.nTrain}""",
        s""""n_test": ${r.nTest}""",
        s""""dimensions": ${r.dimensions}""",
        s""""topk": ${r.topk}""",
        s""""build_time_s": ${fmt(r.buildTimeS)}""",
        s""""total_query_time_s": ${fmt(r.totalQueryTimeS)}""",
        s""""qps": ${fmt(r.qps)}""",
        s""""mean_query_time_ms": ${fmt(r.meanQueryTimeMs)}""",
        s""""status": "${r.status}"""",
        s""""index_memory_mb": ${fmt(r.indexSizeMb)}""",
        s""""index_source": "${r.indexSource}"""") ++ metricFields
      fields.mkString("  {\n    ", ",\n    ", "\n  }")
    }
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), items.mkString("[\n", ",\n", "\n]\n"))
  }

  private def fmt(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else f"$d%.6f"

  /** markdown summary table (reference runner.py:664-728 shape) */
  def markdownSummary(dataset: String, results: Seq[Experiment.Result]): String = {
    val sb = new StringBuilder
    sb.append(s"## Dataset: $dataset\n\n")
    sb.append("| Algorithm | Recall | QPS | ms/query | Build (s) | Status |\n")
    sb.append("|---|---|---|---|---|---|\n")
    // sort: recall desc, qps desc, name asc (runner.py:598-605)
    val sorted = results.sortBy(r =>
      (-r.metrics.getOrElse("recall", 0.0), -r.qps, r.algorithm))
    sorted.foreach { r =>
      if (r.status == "build_only")
        sb.append(f"| ${r.algorithm} | - | - | - | ${r.buildTimeS}%.2f | BUILD_ONLY |\n")
      else
        sb.append(f"| ${r.algorithm} | ${r.metrics.getOrElse("recall", 0.0)}%.4f " +
          f"| ${r.qps}%.1f | ${r.meanQueryTimeMs}%.3f | ${r.buildTimeS}%.2f | ok |\n")
    }
    sb.toString
  }

  /** Shared scatter geometry: both chart kinds lay out to pixel points
    * once; SVG and PNG are alternative rasterizations of the same layout. */
  private[harness] final case class ScatterPt(
      cx: Double, cy: Double, label: String, hue: Int, hollow: Boolean)
  private[harness] final case class ScatterLayout(
      title: String, xLabel: String, yLabel: String, w: Int, h: Int,
      pts: Seq[ScatterPt])

  private def qpsRecallLayout(results: Seq[Experiment.Result],
      w: Int, h: Int): ScatterLayout = {
    val pts = results.filter(r => r.qps > 0 && r.metrics.contains("recall"))
    val maxQ = math.max(1.0, if (pts.isEmpty) 1.0 else pts.map(_.qps).max)
    val minQ = math.max(0.1, if (pts.isEmpty) 0.1 else pts.map(_.qps).min)
    def x(q: Double) =
      60 + (math.log10(q / minQ) / math.max(1e-9, math.log10(maxQ / minQ))) * (w - 100)
    def y(r: Double) = (h - 50) - r * (h - 90)
    ScatterLayout("QPS vs Recall", "QPS (log)", "Recall", w, h,
      pts.zipWithIndex.map { case (r, i) =>
        ScatterPt(x(r.qps), y(r.metrics("recall")), r.algorithm,
          i * 47 % 360, hollow = false)
      })
  }

  private def scatterSvg(l: ScatterLayout): String = {
    if (l.pts.isEmpty)
      return s"""<svg xmlns="http://www.w3.org/2000/svg" width="${l.w}" height="${l.h}"/>"""
    val circles = l.pts.map { p =>
      val fill = if (p.hollow) "none" else s"hsl(${p.hue},60%,50%)"
      val cx = "%.1f".format(p.cx); val cy = "%.1f".format(p.cy)
      s"""<circle cx="$cx" cy="$cy" r="5" fill="$fill" stroke="hsl(${p.hue},60%,40%)"/>
         |<text x="${"%.1f".format(p.cx + 8)}" y="${"%.1f".format(p.cy + 4)}" font-size="11">${p.label}</text>"""
        .stripMargin
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="${l.w}" height="${l.h}">
       |<rect width="${l.w}" height="${l.h}" fill="white"/>
       |<text x="${l.w / 2}" y="20" text-anchor="middle" font-size="14">${l.title}</text>
       |<line x1="60" y1="${l.h - 50}" x2="${l.w - 40}" y2="${l.h - 50}" stroke="black"/>
       |<line x1="60" y1="40" x2="60" y2="${l.h - 50}" stroke="black"/>
       |<text x="${l.w / 2}" y="${l.h - 15}" text-anchor="middle" font-size="12">${l.xLabel}</text>
       |<text x="20" y="${l.h / 2}" font-size="12" transform="rotate(-90 20 ${l.h / 2})">${l.yLabel}</text>
       |$circles
       |</svg>""".stripMargin
  }

  /** PNG rasterization of the same layout (matplotlib-savefig parity,
    * evaluation.py:194,272) via JDK BufferedImage — headless-safe, no
    * plotting dependency. */
  private def scatterPng(l: ScatterLayout): Array[Byte] = {
    val img = new BufferedImage(l.w, l.h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, l.w, l.h)
      g.setColor(Color.BLACK)
      g.setStroke(new BasicStroke(1f))
      g.drawLine(60, l.h - 50, l.w - 40, l.h - 50)
      g.drawLine(60, 40, 60, l.h - 50)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 14))
      drawCentered(g, l.title, l.w / 2, 20)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
      drawCentered(g, l.xLabel, l.w / 2, l.h - 15)
      val old = g.getTransform
      g.rotate(-math.Pi / 2, 20, l.h / 2.0)
      drawCentered(g, l.yLabel, 20, l.h / 2)
      g.setTransform(old)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
      l.pts.foreach { p =>
        val fill = Color.getHSBColor(p.hue / 360f, 0.6f, 0.75f)
        val edge = Color.getHSBColor(p.hue / 360f, 0.6f, 0.6f)
        val (x, y) = (math.round(p.cx).toInt, math.round(p.cy).toInt)
        if (!p.hollow) { g.setColor(fill); g.fillOval(x - 5, y - 5, 10, 10) }
        g.setColor(edge)
        g.drawOval(x - 5, y - 5, 10, 10)
        g.setColor(Color.BLACK)
        g.drawString(p.label, x + 8f, y + 4f)
      }
    } finally g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def drawCentered(g: java.awt.Graphics2D, s: String, x: Int, y: Int): Unit =
    g.drawString(s, x - g.getFontMetrics.stringWidth(s) / 2f, y.toFloat)

  /** QPS-vs-recall scatter as raw SVG (log-x QPS), reference
    * runner.py:402-521 style */
  def qpsRecallSvg(results: Seq[Experiment.Result], w: Int = 640, h: Int = 420): String =
    scatterSvg(qpsRecallLayout(results, w, h))

  /** QPS-vs-recall scatter as PNG bytes (the reference's matplotlib
    * `plot_recall_vs_qps` savefig output, evaluation.py:147-198). */
  def qpsRecallPng(results: Seq[Experiment.Result], w: Int = 640, h: Int = 420): Array[Byte] =
    scatterPng(qpsRecallLayout(results, w, h))

  /** S18 ops-metric resolution (reference evaluation.py:78-120): explicit
    * operations_per_query, else distance counters normalized per query,
    * else a time-derived proxy (ms/query) — returns (value, derived?). */
  def operationsPerQuery(r: Experiment.Result): (Double, Boolean) =
    r.metrics.get("operations_per_query") match {
      case Some(v) if v > 0 => (v, false)
      case _ => r.metrics.get("distance_computations") match {
        case Some(v) if v > 0 && r.nTest > 0 => (v / r.nTest, false)
        case _ => (math.max(1e-3, r.meanQueryTimeMs), true)
      }
    }

  private def operationsRecallLayout(results: Seq[Experiment.Result],
      w: Int, h: Int): ScatterLayout = {
    val pts = results.filter(_.metrics.contains("recall"))
      .map(r => (r, operationsPerQuery(r)))
    val vals = pts.map(_._2._1)
    val maxO = math.max(1.0, if (vals.isEmpty) 1.0 else vals.max)
    val minO = math.max(1e-3, if (vals.isEmpty) 1e-3 else vals.min)
    def x(rec: Double) = 60 + rec * (w - 100)
    def y(o: Double) =
      (h - 50) - (math.log10(o / minO) / math.max(1e-9, math.log10(maxO / minO))) * (h - 90)
    ScatterLayout("Operations per query vs Recall", "Recall",
      "ops/query (log)", w, h,
      pts.zipWithIndex.map { case ((r, (o, derived)), i) =>
        ScatterPt(x(r.metrics("recall")), y(o), r.algorithm,
          i * 47 % 360, hollow = derived)
      })
  }

  /** S18: operations-vs-recall scatter as raw SVG (log-y operations),
    * matplotlib-parity of evaluation.py:200-276. Points whose ops count
    * is a time-derived proxy are hollow, mirroring the reference's
    * fallback annotation. */
  def operationsRecallSvg(results: Seq[Experiment.Result],
      w: Int = 640, h: Int = 420): String =
    scatterSvg(operationsRecallLayout(results, w, h))

  /** S18 as PNG bytes (`plot_operations_vs_recall` savefig output,
    * evaluation.py:200-276); derived-proxy points render hollow. */
  def operationsRecallPng(results: Seq[Experiment.Result],
      w: Int = 640, h: Int = 420): Array[Byte] =
    scatterPng(operationsRecallLayout(results, w, h))

  /** S18 trigger rule: the operations plot is emitted only for datasets
    * whose name contains "glove" (experiment_runner.py:774-780). */
  def emitOperationsPlot(datasetName: String): Boolean =
    datasetName.toLowerCase.contains("glove")

  /** one-page summary (runner.py:523-662): ranked table + takeaways */
  def onePageSummary(dataset: String, results: Seq[Experiment.Result]): String = {
    val evaluated = results.filter(_.status != "build_only")
    val bestRecall = evaluated.sortBy(r =>
      (-r.metrics.getOrElse("recall", 0.0), -r.qps)).headOption
    val bestQps = evaluated.sortBy(-_.qps).headOption
    val sb = new StringBuilder
    sb.append(s"# One-page summary — $dataset\n\n")
    sb.append(markdownSummary(dataset, results))
    sb.append("\n## Takeaways\n\n")
    bestRecall.foreach(r => sb.append(
      f"- Best recall: **${r.algorithm}** (${r.metrics.getOrElse("recall", 0.0)}%.4f)\n"))
    bestQps.foreach(r => sb.append(f"- Best QPS: **${r.algorithm}** (${r.qps}%.1f)\n"))
    sb.toString
  }

  def write(path: String, content: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  def writeBytes(path: String, content: Array[Byte]): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, content)
  }
}
