package graft.engine

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Plugin directory discovery — the reference's `PluginManager`
  * (plugin_system.py:13-46): scan a directory for `*.json` /
  * `*.plugin` files, parse each as a plugin descriptor, silently skip
  * unreadable ones, list menu entries, look up by name-or-id.
  *
  * A plugin body is either `{"operations": [op, …]}` or a single op
  * object (main.py:803 `plugin.get("operations", [plugin])`); ops are
  * the `filter` / `derived` shapes, compiled to [[Recipes.Op]] so a
  * discovered plugin replays through the same one-job
  * [[Recipes.compile]] path as any recipe.
  */
object Plugins {

  /** One discovered plugin: display name (from `name` or `id`, when
    * present), compiled ops, and the file it came from.
    */
  final case class Plugin(name: Option[String], ops: Seq[Recipes.Op], source: Path)

  private val mapper = new ObjectMapper()

  /** Scan `dir` for plugin files (`.json` / `.plugin`, case-
    * insensitive), parsing each; unreadable or unparsable files are
    * skipped like the reference's bare `except: continue`. Returns
    * plugins sorted by file name for determinism.
    */
  def loadDirectory(dir: String): Seq[Plugin] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    Files.list(d).iterator().asScala.toSeq
      .filter { p =>
        val n = p.getFileName.toString.toLowerCase
        n.endsWith(".json") || n.endsWith(".plugin")
      }
      .sortBy(_.getFileName.toString)
      .flatMap { p =>
        try Some(parse(mapper.readTree(Files.readString(p)), p))
        catch { case _: Exception => None }
      }
  }

  /** Menu entries: the names of every named plugin, in scan order
    * (plugin_system.py:34-40).
    */
  def menuEntries(plugins: Seq[Plugin]): Seq[String] = plugins.flatMap(_.name)

  /** Lookup by name (plugin_system.py:42-46: `name` or `id` match —
    * both normalize into [[Plugin.name]] here).
    */
  def get(plugins: Seq[Plugin], name: String): Option[Plugin] =
    plugins.find(_.name.contains(name))

  /** Translate the reference's `pd.eval` expression dialect
    * (main.py:815; README.md:244-251 — the reference's ONLY
    * user-facing query language) to Spark SQL before `expr()`:
    *
    *   - `a ** b` → `pow(a, b)` (right-associative like Python, and
    *     `**` binds tighter than unary minus: `-2 ** x` → `-pow(2, x)`);
    *   - `True`/`False`/`None` → `true`/`false`/`null`.
    *
    * `and`/`or`/`not` need no translation — Spark SQL accepts them
    * as (case-insensitive) keywords — and `~` is deliberately LEFT
    * ALONE: on integral types Spark's `~` is bitwise-not exactly like
    * pd.eval's, and on a boolean column (where pandas negates) Spark
    * fails analysis loudly, which beats a blind rewrite that would
    * corrupt the integer case. The operand grammar covered is exactly
    * pd.eval's arithmetic surface: identifiers, numeric literals
    * (incl. signed-exponent scientific notation), function calls, and
    * parenthesized groups. Anything already valid Spark SQL passes
    * through unchanged.
    */
  def translateExpr(e: String): String = {
    // mask SQL string literals — single-quoted (with '' escape) AND
    // double-quoted (Spark's default second literal syntax) — behind
    // identifier-like placeholders: the dialect translation must
    // never rewrite DATA, and an identifier-shaped token still scans
    // correctly as a `**` operand (e.g. length('ab') ** 2)
    val literals = scala.collection.mutable.ArrayBuffer.empty[String]
    val masked = new StringBuilder
    var i = 0
    while (i < e.length) {
      if (e(i) == '\'' || e(i) == '"') {
        val q = e(i)
        val start = i
        i += 1
        var closed = false
        while (i < e.length && !closed) {
          // backslash escape ('it\'s', "a\"b" — Spark's default
          // literal syntax): the escaped char can't close the literal
          if (e(i) == '\\' && i + 1 < e.length) i += 2
          else if (e(i) == q) {
            if (i + 1 < e.length && e(i + 1) == q) i += 2
            else { closed = true; i += 1 }
          } else i += 1
        }
        masked ++= s"__strlit_${literals.length}__"
        literals += e.substring(start, i)
      } else { masked += e(i); i += 1 }
    }
    var s = masked.toString
      .replaceAll("\\bTrue\\b", "true")
      .replaceAll("\\bFalse\\b", "false")
      .replaceAll("\\bNone\\b", "null")
    s = translatePow(s)
    // restore masked literals in ONE regex pass — replacements are
    // never rescanned, so a literal whose CONTENT contains a
    // placeholder-shaped token cannot trigger a second substitution;
    // a placeholder-SHAPED token the USER wrote (no matching mask)
    // passes through as itself
    "__strlit_(\\d+)__".r.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(
        m.group(1).toIntOption.filter(_ < literals.length)
          .map(literals(_)).getOrElse(m.matched)))
  }

  /** Rewrite every `**` into `pow(l, r)`, rightmost-first so chains
    * associate right like Python (`a**b**c` = `pow(a, pow(b, c))`).
    */
  private def translatePow(input: String): String = {
    var s = input
    var idx = s.lastIndexOf("**")
    var guard = 0
    while (idx >= 0 && guard < 64) {
      guard += 1
      val (lStart, lEnd) = operandLeft(s, idx)
      val (rStart, rEnd) = operandRight(s, idx + 2)
      if (lStart < 0 || rStart < 0)
        throw new IllegalArgumentException(s"cannot translate '**' in expression: $input")
      val l = s.substring(lStart, lEnd).trim
      val r = s.substring(rStart, rEnd).trim
      s = s.substring(0, lStart) + s"pow($l, $r)" + s.substring(rEnd)
      idx = s.lastIndexOf("**")
    }
    s
  }

  /** Left operand of the `**` at `opIdx`: [start, end) or (-1, -1). */
  private def operandLeft(s: String, opIdx: Int): (Int, Int) = {
    var i = opIdx - 1
    while (i >= 0 && s(i).isWhitespace) i -= 1
    if (i < 0) return (-1, -1)
    val end = i + 1
    if (s(i) == ')') {
      var depth = 0
      while (i >= 0) {
        if (s(i) == ')') depth += 1
        else if (s(i) == '(') { depth -= 1; if (depth == 0) { i -= 1;
          // include a function name directly before the parens
          while (i >= 0 && (s(i).isLetterOrDigit || s(i) == '_')) i -= 1
          return (i + 1, end) } }
        i -= 1
      }
      (-1, -1)
    } else if (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '.') {
      while (i >= 0 && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '.')) i -= 1
      // numeric literal with a signed exponent: `1e-3 ** x` scans
      // back over "3", then must absorb "-", "e", and the mantissa —
      // but `foo2e-3` is an identifier minus 3, so the absorb is
      // reverted when the mantissa turns out to extend an identifier
      if (i >= 0 && (s(i) == '-' || s(i) == '+') && i >= 1 &&
          (s(i - 1) == 'e' || s(i - 1) == 'E') && i >= 2 &&
          (s(i - 2).isDigit || s(i - 2) == '.') && i + 1 < s.length && s(i + 1).isDigit) {
        val save = i
        i -= 2
        while (i >= 0 && (s(i).isDigit || s(i) == '.')) i -= 1
        if (i >= 0 && (s(i).isLetter || s(i) == '_')) i = save
      }
      (i + 1, end)
    } else (-1, -1)
  }

  /** Right operand starting at/after `from`: [start, end) or (-1, -1). */
  private def operandRight(s: String, from: Int): (Int, Int) = {
    var i = from
    while (i < s.length && s(i).isWhitespace) i += 1
    if (i >= s.length) return (-1, -1)
    val start = i
    if (s(i) == '-' || s(i) == '+') i += 1
    while (i < s.length && s(i).isWhitespace) i += 1
    if (i < s.length && s(i) == '(') {
      var depth = 0
      while (i < s.length) {
        if (s(i) == '(') depth += 1
        else if (s(i) == ')') { depth -= 1; if (depth == 0) return (start, i + 1) }
        i += 1
      }
      (-1, -1)
    } else if (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) {
      val tokStart = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '.')) i += 1
      // numeric literal with a signed exponent: `x ** 1e-3` stops at
      // the sign; absorb it plus the exponent digits — but ONLY when
      // the token so far is purely numeric-with-e (`y2e-3` is the
      // identifier y2e minus 3, not a literal)
      if (i < s.length && (s(i) == '-' || s(i) == '+') &&
          s.substring(tokStart, i).matches("[0-9.]+[eE]") &&
          i + 1 < s.length && s(i + 1).isDigit) {
        i += 1
        while (i < s.length && s(i).isDigit) i += 1
      }
      // a call like f(x): swallow the balanced argument list
      if (i < s.length && s(i) == '(') {
        var depth = 0
        while (i < s.length) {
          if (s(i) == '(') depth += 1
          else if (s(i) == ')') { depth -= 1; if (depth == 0) return (start, i + 1) }
          i += 1
        }
        return (-1, -1)
      }
      (start, i)
    } else (-1, -1)
  }

  private def parse(root: JsonNode, source: Path): Plugin = {
    val name = Option(root.get("name")).orElse(Option(root.get("id")))
      .filter(_.isTextual).map(_.asText())
    val opNodes =
      if (root.has("operations")) root.get("operations").elements().asScala.toSeq
      else Seq(root)
    Plugin(name, opNodes.flatMap(parseOp), source)
  }

  /** One plugin op (main.py:804-820): `filter` applies a named filter
    * over channels (default `moving_average`); `derived` adds an
    * expression column (default name `derived`, dropped without an
    * expr — the reference's `if expr:` guard). Unknown types are
    * ignored like the reference's `op_type` dispatch.
    */
  private def parseOp(op: JsonNode): Option[Recipes.Op] =
    Option(op.get("type")).map(_.asText("")).getOrElse("") match {
      case "filter" =>
        val channels = Option(op.get("channels"))
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
        val filter = Option(op.get("filter")).map(_.asText()).getOrElse("moving_average")
        val params = Option(op.get("params")).map { p =>
          p.properties().asScala.iterator
            .filter(_.getValue.isNumber)
            .map(e => e.getKey -> e.getValue.asDouble())
            .toMap
        }.getOrElse(Map.empty[String, Double])
        val strParams = Option(op.get("params")).map { p =>
          p.properties().asScala.iterator
            .filter(_.getValue.isTextual)
            .map(e => e.getKey -> e.getValue.asText())
            .toMap
        }.getOrElse(Map.empty[String, String])
        Some(Recipes.Op.Filter(filter, params, channels, None, strParams))
      case "derived" =>
        Option(op.get("expr")).filter(_.isTextual).map { e =>
          val out = Option(op.get("name")).map(_.asText()).getOrElse("derived")
          Recipes.Op.Derived(out, e.asText())
        }
      case _ => None
    }
}
