package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-pipeline hot loops.
  *
  * Spark evaluates higher-order-function lambdas interpreted (never
  * codegen), at roughly a microsecond per element with boxing; these
  * expressions replace the per-element lambda frames with one
  * primitive loop per row, following the [[MinHashSignature]] pattern
  * (~50× measured on the signature stage). Each is value-identical to
  * the HOF composition it replaces, so the DuckDB oracles are
  * unchanged.
  */
object TextExprs

/** Word-shingle MD5 base hashes: for a word array `ws`, returns
  * `[md5_prefix32(ws[i] ⧺ ' ' ⧺ … ⧺ ws[i+k−1]) for i ≤ n−k]` — the
  * native fusion of `transform(shinglesFromWords(ws), base32)`
  * (empty array when the doc has fewer than k words, matching the
  * `sequence`-guard in [[TextHash.shinglesFromWords]]).
  */
case class ShingleHash32(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash32"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) { words(i) = ws.getUTF8String(i); i += 1 }
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      var s = words(i)
      var j = 1
      while (j < k) { s = UTF8String.concat(s, space, words(i + j)); j += 1 }
      out(i) = Md5Prefix32.hash(s)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash32 =
    copy(child = newChild)
}

/** 32-bit frequency-weighted SimHash over a long-array of shingle
  * hashes: bit j of the output is set when strictly more than half
  * the hashes have bit j set — value-identical to the nested
  * `aggregate(sequence(0,31), …, filter(hs, …))` composition
  * (which evaluated 32 interpreted filter passes per row).
  */
case class SimHash32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 32) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (2 * counts(j) > n) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Language ID by marker-word voting: counts marker hits per language
  * over the word array, returns the FIRST language (in `markers`
  * declaration order) achieving the maximum count, or `und` when all
  * counts are zero — value-identical to the `greatest`/CASE chain of
  * `size(filter(ws, array_contains(…)))` scores (5 interpreted
  * per-word passes), but one hash-map probe per word.
  */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  @transient private lazy val langs: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray

  /** word → indexes of every language listing it (words can appear in
    * several marker lists, e.g. "de").
    */
  @transient private lazy val table: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    for ((lm, li) <- markers.zipWithIndex; w <- lm._2) {
      val key = UTF8String.fromString(w)
      val prev = m.get(key)
      m.put(key, if (prev == null) Array(li) else prev :+ li)
    }
    m
  }

  @transient private lazy val und = UTF8String.fromString("und")

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < n) {
      val hit = table.get(ws.getUTF8String(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < counts.length) {
      if (counts(j) > counts(best)) best = j
      j += 1
    }
    if (counts(best) == 0) und else langs(best)
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** Winnowing fingerprint summary over a shingle-hash array: the
  * distinct minima of every `w`-window, reduced to
  * `(n_fp, fp_min, fp_max, fp_xor)` — value-identical to
  * `array_distinct(transform(sequence…, array_min(slice…)))` plus the
  * four aggregates (fp_min/fp_max NULL and fp_xor 0 on docs with
  * fewer than `w` hashes, matching the HOF guard).
  */
case class WinnowFingerprint(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_fp", LongType, nullable = false),
    StructField("fp_min", LongType, nullable = true),
    StructField("fp_max", LongType, nullable = true),
    StructField("fp_xor", LongType, nullable = false)))
  override def prettyName: String = "winnow_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n < w)
      return new GenericInternalRow(Array[Any](0L, null, null, 0L))
    val mins = new Array[Long](n - w + 1)
    var i = 0
    while (i <= n - w) {
      var m = hs.getLong(i)
      var j = 1
      while (j < w) {
        val v = hs.getLong(i + j)
        if (v < m) m = v
        j += 1
      }
      mins(i) = m
      i += 1
    }
    java.util.Arrays.sort(mins)
    var count = 0L
    var xor = 0L
    var prev = 0L
    i = 0
    while (i < mins.length) {
      val v = mins(i)
      if (i == 0 || v != prev) { count += 1; xor ^= v; prev = v }
      i += 1
    }
    new GenericInternalRow(Array[Any](count, mins(0), mins(mins.length - 1), xor))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** Rabin–Karp rolling-hash fingerprint summary: the `k`-gram
  * polynomial hash `Σ_j cp(i+j)·base^j mod m` at every codepoint
  * position, reduced to `(fp_min, fp_max, n_distinct)` —
  * value-identical to the unrolled `transform(sequence…)` projection
  * over a codepoint array plus its three aggregates. NULL when the
  * text has fewer than `k` codepoints (callers filter those rows).
  */
case class RollingHashSummary(child: Expression, base: Long, mod: Long, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("fp_min", LongType, nullable = false),
    StructField("fp_max", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def prettyName: String = "rolling_hash_summary"
  override def nullable: Boolean = true

  @transient private lazy val pows: Array[Long] =
    Array.iterate(1L, k)(_ * base)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // codepoints, matching ascii()/ord() semantics in both engines
    val cps = text.codePoints().toArray
    val n = cps.length
    if (n < k) return null
    val hs = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var acc = 0L
      var j = 0
      while (j < k) { acc += cps(i + j) * pows(j); j += 1 }
      hs(i) = acc % mod
      i += 1
    }
    var mn = hs(0)
    var mx = hs(0)
    i = 1
    while (i < hs.length) {
      val v = hs(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    java.util.Arrays.sort(hs)
    var distinct = 1L
    i = 1
    while (i < hs.length) {
      if (hs(i) != hs(i - 1)) distinct += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](mn, mx, distinct))
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashSummary =
    copy(child = newChild)
}
