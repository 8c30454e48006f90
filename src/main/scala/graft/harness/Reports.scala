package graft.harness

import java.nio.file.{Files, Paths}

/** Report sinks (reference S15-S17): per-algorithm/combined JSON, the
  * markdown benchmark summary table, the one-page summary, and the
  * hand-rolled QPS-vs-recall SVG scatter (the reference also emits raw
  * SVG text — runner.py:402-521 — so no plotting dependency is needed
  * for parity).
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

  /** QPS-vs-recall scatter as raw SVG (log-x QPS), reference
    * runner.py:402-521 style */
  def qpsRecallSvg(results: Seq[Experiment.Result], w: Int = 640, h: Int = 420): String = {
    val pts = results.filter(r => r.qps > 0 && r.metrics.contains("recall"))
    if (pts.isEmpty) return s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h"/>"""
    val maxQ = math.max(1.0, pts.map(_.qps).max)
    val minQ = math.max(0.1, pts.map(_.qps).min)
    def x(q: Double) =
      60 + (math.log10(q / minQ) / math.max(1e-9, math.log10(maxQ / minQ))) * (w - 100)
    def y(r: Double) = (h - 50) - r * (h - 90)
    val circles = pts.zipWithIndex.map { case (r, i) =>
      val rec = r.metrics("recall")
      val cx = "%.1f".format(x(r.qps)); val cy = "%.1f".format(y(rec))
      s"""<circle cx="$cx" cy="$cy" r="5" fill="hsl(${i * 47 % 360},60%,50%)"/>
         |<text x="${"%.1f".format(x(r.qps) + 8)}" y="${"%.1f".format(y(rec) + 4)}" font-size="11">${r.algorithm}</text>"""
        .stripMargin
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h">
       |<rect width="$w" height="$h" fill="white"/>
       |<text x="${w / 2}" y="20" text-anchor="middle" font-size="14">QPS vs Recall</text>
       |<line x1="60" y1="${h - 50}" x2="${w - 40}" y2="${h - 50}" stroke="black"/>
       |<line x1="60" y1="40" x2="60" y2="${h - 50}" stroke="black"/>
       |<text x="${w / 2}" y="${h - 15}" text-anchor="middle" font-size="12">QPS (log)</text>
       |<text x="20" y="${h / 2}" font-size="12" transform="rotate(-90 20 ${h / 2})">Recall</text>
       |$circles
       |</svg>""".stripMargin
  }

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

  /** S18: operations-vs-recall scatter as raw SVG (log-y operations),
    * matplotlib-parity of evaluation.py:200-276. Points whose ops count
    * is a time-derived proxy are hollow, mirroring the reference's
    * fallback annotation. */
  def operationsRecallSvg(results: Seq[Experiment.Result],
      w: Int = 640, h: Int = 420): String = {
    val pts = results.filter(_.metrics.contains("recall"))
      .map(r => (r, operationsPerQuery(r)))
    if (pts.isEmpty) return s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h"/>"""
    val vals = pts.map(_._2._1)
    val maxO = math.max(1.0, vals.max)
    val minO = math.max(1e-3, vals.min)
    def x(rec: Double) = 60 + rec * (w - 100)
    def y(o: Double) =
      (h - 50) - (math.log10(o / minO) / math.max(1e-9, math.log10(maxO / minO))) * (h - 90)
    val circles = pts.zipWithIndex.map { case ((r, (o, derived)), i) =>
      val rec = r.metrics("recall")
      val cx = "%.1f".format(x(rec)); val cy = "%.1f".format(y(o))
      val fill = if (derived) "none" else s"hsl(${i * 47 % 360},60%,50%)"
      val stroke = s"hsl(${i * 47 % 360},60%,40%)"
      s"""<circle cx="$cx" cy="$cy" r="5" fill="$fill" stroke="$stroke"/>
         |<text x="${"%.1f".format(x(rec) + 8)}" y="${"%.1f".format(y(o) + 4)}" font-size="11">${r.algorithm}</text>"""
        .stripMargin
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h">
       |<rect width="$w" height="$h" fill="white"/>
       |<text x="${w / 2}" y="20" text-anchor="middle" font-size="14">Operations per query vs Recall</text>
       |<line x1="60" y1="${h - 50}" x2="${w - 40}" y2="${h - 50}" stroke="black"/>
       |<line x1="60" y1="40" x2="60" y2="${h - 50}" stroke="black"/>
       |<text x="${w / 2}" y="${h - 15}" text-anchor="middle" font-size="12">Recall</text>
       |<text x="20" y="${h / 2}" font-size="12" transform="rotate(-90 20 ${h / 2})">ops/query (log)</text>
       |$circles
       |</svg>""".stripMargin
  }

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
}
