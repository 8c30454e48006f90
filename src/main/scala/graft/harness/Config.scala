package graft.harness

import java.nio.file.{Files, Paths}

/** Config model + loaders for the benchmark harness.
  *
  * Mirrors the reference's `ExperimentConfig` (src/experiments/config.py:
  * 10-62) and the benchmark runner's dataset normalization + deep-merge
  * override rules (runner.py:108-155, 217-230, 232-299). Configs are
  * modeled as untyped trees (`Any` = String | Map | List) exactly like
  * the reference's dict configs, with typed accessors at the edges —
  * the deep-merge and ref-resolution semantics then port 1:1.
  *
  * Supports JSON and a YAML subset (nested maps, `- ` lists, scalars,
  * comments) sufficient for the reference's config files.
  */
object Config {
  type Tree = Any // String | Double | Boolean | Map[String, Any] | List[Any]

  // ------------------------------------------------------------ deep merge
  /** reference runner.py:217-230: nested dicts merge recursively, scalars
    * and lists overwrite */
  def deepMerge(base: Tree, over: Tree): Tree = (base, over) match {
    case (b: Map[String @unchecked, Any @unchecked],
          o: Map[String @unchecked, Any @unchecked]) =>
      (b.keySet ++ o.keySet).map { k =>
        k -> ((b.get(k), o.get(k)) match {
          case (Some(bv), Some(ov)) => deepMerge(bv, ov)
          case (Some(bv), None) => bv
          case (None, Some(ov)) => ov
          case _ => throw new IllegalStateException
        })
      }.toMap
    case (_, o) => o
  }

  // ------------------------------------------------------------- accessors
  implicit final class TreeOps(private val t: Tree) extends AnyVal {
    def asMap: Map[String, Any] = t match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => throw new IllegalArgumentException(s"expected map, got $other")
    }
    def asList: List[Any] = t match {
      case l: List[Any @unchecked] => l
      case other => throw new IllegalArgumentException(s"expected list, got $other")
    }
  }

  def str(m: Map[String, Any], k: String, default: => String): String =
    m.get(k).map(scalarToString).getOrElse(default)
  def int(m: Map[String, Any], k: String, default: => Int): Int =
    m.get(k).map(scalarToString(_).toDouble.toInt).getOrElse(default)
  def bool(m: Map[String, Any], k: String, default: => Boolean): Boolean =
    m.get(k).map(scalarToString(_).toBoolean).getOrElse(default)
  def scalarToString(v: Any): String = v match {
    case d: Double if d == math.floor(d) && !d.isInfinite => d.toLong.toString
    case other => other.toString
  }
  /** flatten a params subtree to Map[String,String] for Registry factories */
  def params(m: Map[String, Any]): Map[String, String] =
    m.map { case (k, v) => k -> scalarToString(v) }

  // ------------------------------------------------------------ ref resolution
  /** `indexer_ref`/`searcher_ref` resolution with deep-merge overrides
    * (runner.py:232-299): a ref names an entry in the global registries
    * section; inline overrides merge on top. */
  def resolveRef(algCfg: Map[String, Any], refKey: String, inlineKey: String,
      globalDefs: Map[String, Any]): Option[Map[String, Any]] = {
    val fromRef = algCfg.get(refKey).map { r =>
      globalDefs.getOrElse(scalarToString(r),
        throw new IllegalArgumentException(s"unresolved $refKey: $r")).asMap
    }
    val inline = algCfg.get(inlineKey).map(_.asMap)
    (fromRef, inline) match {
      case (Some(a), Some(b)) => Some(deepMerge(a, b).asMap)
      case (Some(a), None) => Some(a)
      case (None, b) => b
    }
  }

  // ---------------------------------------------------------------- loaders
  def load(path: String): Map[String, Any] = {
    val text = Files.readString(Paths.get(path))
    if (path.endsWith(".json")) parseJson(text).asMap else parseYaml(text).asMap
  }

  // minimal JSON parser (objects/arrays/strings/numbers/bools/null)
  def parseJson(s: String): Tree = new JsonParser(s).parse()

  private final class JsonParser(s: String) {
    private var i = 0
    def parse(): Tree = { val v = value(); ws(); v }
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def value(): Tree = {
      ws()
      s(i) match {
        case '{' =>
          i += 1; ws()
          val mb = Map.newBuilder[String, Any]
          while ({ ws(); s(i) != '}' }) {
            val k = string(); ws(); require(s(i) == ':'); i += 1
            mb += k -> value(); ws()
            if (s(i) == ',') i += 1
          }
          i += 1; mb.result()
        case '[' =>
          i += 1
          val lb = List.newBuilder[Any]
          while ({ ws(); s(i) != ']' }) {
            lb += value(); ws()
            if (s(i) == ',') i += 1
          }
          i += 1; lb.result()
        case '"' => string()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _ =>
          val st = i
          while (i < s.length && "+-.eE0123456789".contains(s(i))) i += 1
          s.substring(st, i).toDouble
      }
    }
    private def string(): String = {
      require(s(i) == '"'); i += 1
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.toString
    }
  }

  // --------------------------------------------------------- YAML (subset)
  /** indentation-scoped maps, `- ` list items, inline scalars; `#` comments */
  def parseYaml(text: String): Tree = {
    val lines = text.split("\n").toIndexedSeq
      .map(l => l.takeWhile(_ != '#'))
      .filter(_.trim.nonEmpty)
    val (tree, rest) = parseBlock(lines, 0, indentOf(lines.headOption.getOrElse("")))
    require(rest >= lines.size, s"unparsed yaml from line $rest")
    tree
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  private def parseScalar(v: String): Tree = {
    val t = v.trim
    if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2) t.substring(1, t.length - 1)
    else if (t.startsWith("'") && t.endsWith("'") && t.length >= 2) t.substring(1, t.length - 1)
    else if (t == "true" || t == "false") t.toBoolean
    else if (t == "null" || t == "~") null
    else if (t.startsWith("[") && t.endsWith("]")) {
      if (t == "[]") List.empty[Any]
      else t.substring(1, t.length - 1).split(",").map(x => parseScalar(x)).toList
    }
    else scala.util.Try(t.toDouble).toOption.getOrElse(t): Any
  }

  /** parse a block starting at line `from` with indentation `indent`;
    * returns (tree, next line index) */
  private def parseBlock(lines: IndexedSeq[String], from: Int, indent: Int): (Tree, Int) = {
    if (from >= lines.size) return (Map.empty[String, Any], from)
    val first = lines(from)
    if (first.trim.startsWith("- ") || first.trim == "-") {
      // list block
      val items = List.newBuilder[Any]
      var i = from
      while (i < lines.size && indentOf(lines(i)) == indent && lines(i).trim.startsWith("-")) {
        val content = lines(i).trim.drop(1).trim
        if (content.isEmpty) {
          val (v, next) = parseBlock(lines, i + 1, indentOf(lines(i + 1)))
          items += v; i = next
        } else if (content.contains(":") && !content.startsWith("\"")) {
          // inline map item "- key: value" possibly followed by deeper keys
          val virtualIndent = indentOf(lines(i)) + 2
          val kv = splitKv(content)
          var m: Map[String, Any] = Map(kv._1 -> (if (kv._2.isEmpty) null else parseScalar(kv._2)))
          var j = i + 1
          while (j < lines.size && indentOf(lines(j)) >= virtualIndent &&
              !lines(j).trim.startsWith("-")) {
            val (sub, next) = parseMapEntries(lines, j, indentOf(lines(j)))
            m = deepMerge(m, sub).asMap
            j = next
          }
          items += m; i = j
        } else { items += parseScalar(content); i += 1 }
      }
      (items.result(), i)
    } else {
      parseMapEntries(lines, from, indent)
    }
  }

  private def splitKv(l: String): (String, String) = {
    val idx = l.indexOf(':')
    (l.substring(0, idx).trim, l.substring(idx + 1).trim)
  }

  private def parseMapEntries(lines: IndexedSeq[String], from: Int, indent: Int)
      : (Map[String, Any], Int) = {
    val mb = Map.newBuilder[String, Any]
    var i = from
    while (i < lines.size && indentOf(lines(i)) == indent && !lines(i).trim.startsWith("-")) {
      val (k, v) = splitKv(lines(i))
      if (v.nonEmpty) { mb += k -> parseScalar(v); i += 1 }
      else {
        // nested block (map or list) or empty value
        if (i + 1 < lines.size && (indentOf(lines(i + 1)) > indent ||
            (indentOf(lines(i + 1)) == indent && lines(i + 1).trim.startsWith("-")))) {
          val childIndent = indentOf(lines(i + 1))
          if (childIndent > indent || lines(i + 1).trim.startsWith("-")) {
            val useIndent = if (lines(i + 1).trim.startsWith("-") && childIndent == indent)
              indent else childIndent
            val (sub, next) = parseBlock(lines, i + 1, useIndent)
            mb += k -> sub; i = next
          } else { mb += k -> null; i += 1 }
        } else { mb += k -> null; i += 1 }
      }
    }
    (mb.result(), i)
  }
}
