package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared deterministic text-hashing primitives used by the dedup /
  * similarity / fingerprinting operators, defined ONCE here so the
  * Spark expression and the DuckDB oracle SQL are generated from the
  * same constants and cannot drift.
  *
  * Base hash: first 32 bits of MD5, read as an unsigned big-endian
  * integer. Both engines compute it exactly:
  *   Spark : `cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)`
  *   DuckDB: `('0x' || substr(md5(s), 1, 8))::BIGINT`
  * MinHash permutations are affine maps `(a·h + b) mod P` with P the
  * largest 32-bit prime; `a < 2^30` keeps `a·h < 2^62` (no i64
  * overflow on either engine).
  */
object TextHash {

  /** Largest 32-bit prime — the MinHash modulus. */
  val Prime = 4294967291L

  /** Word-shingle size for document fingerprints. */
  val ShingleK = 3

  /** MinHash permutation count and LSH banding (4 bands × 4 rows). */
  val NumPerms = 16
  val BandRows = 4
  val NumBands: Int = NumPerms / BandRows

  /** (permId, a, b) affine coefficients — derived from an LCG so both
    * engines share literal values.
    */
  val perms: Seq[(Int, Long, Long)] = (0 until NumPerms).map { i =>
    val a = (1103515245L * (i + 1) + 12345L) % 1073741789L
    val b = (69069L * (i + 1) + 1234567L) % Prime
    (i, if (a == 0) 1L else a, b)
  }

  // ---------------- Spark side ----------------

  /** 32-bit MD5 base hash of a string column (Spark) — the native
    * [[Md5Prefix32]] expression; [[base32Builtin]] is the equivalent
    * built-in chain kept for the parity spec.
    */
  def base32(c: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      Md5Prefix32(org.apache.spark.sql.GraftExpressionBridge.expression(c)))

  /** Built-in-functions form of [[base32]] (slower; parity oracle). */
  def base32Builtin(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** SQL-text form of [[base32]] for use inside `expr(...)` lambdas. */
  def base32Sql(inner: String): String =
    s"cast(conv(substring(md5($inner), 1, 8), 16, 10) as bigint)"

  /** `k`-word shingles over an ALREADY-SPLIT word-array column.
    * Guarded: fewer than k words → empty array (Spark's `sequence`
    * would otherwise produce a DESCENDING range).
    *
    * Callers should materialize the word array as its own column
    * first (`split(text, " ").as("ws")`): this expression references
    * `ws` three times, which stops `CollapseProject` from inlining
    * the split into the per-element lambda (inlined, the tokenizer
    * would re-run per shingle — an O(words²) blowup measured at ~10×
    * on the benchmark corpus).
    */
  def shinglesFromWords(ws: Column, k: Int = ShingleK): Column =
    when(size(ws) >= k,
      transform(sequence(lit(0), size(ws) - k),
        i => concat_ws(" ", slice(ws, i + lit(1), lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Shingles of a raw text column — convenience for small inputs;
    * hot paths use [[shinglesFromWords]] over a word-array column.
    */
  def shingles(text: Column, k: Int = ShingleK): Column =
    shinglesFromWords(split(text, " "), k)

  /** Shingle base-hash array of a text column. */
  def shingleHashes(text: Column, k: Int = ShingleK): Column =
    shingleHashesFromWords(split(text, " "), k)

  /** Shingle base-hash array over a word-array column (hot path) —
    * the native [[ShingleHash32]] fusion: one primitive loop per row
    * instead of an interpreted `transform` frame + `concat_ws` +
    * `slice` per shingle. Value-identical to
    * [[shingleHashesFromWordsHof]] (parity spec).
    */
  def shingleHashesFromWords(ws: Column, k: Int = ShingleK): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      ShingleHash32(org.apache.spark.sql.GraftExpressionBridge.expression(ws), k))

  /** Built-in HOF form of [[shingleHashesFromWords]] (parity spec). */
  def shingleHashesFromWordsHof(ws: Column, k: Int = ShingleK): Column =
    transform(shinglesFromWords(ws, k), s => base32(s))

  /** Native 32-bit SimHash column over a shingle-hash array. */
  def simhash32(hs: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      SimHash32(org.apache.spark.sql.GraftExpressionBridge.expression(hs)))

  /** Spark array-of-structs literal of the MinHash permutations, for
    * shuffle-free per-row signatures.
    */
  def permsArraySql: String =
    perms.map { case (p, a, b) => s"struct($p as p, ${a}L as a, ${b}L as b)" }
      .mkString("array(", ", ", ")")

  /** Native MinHash signature column over a shingle-hash array
    * column — [[MinHashSignature]] with this object's permutation
    * constants (element j = permutation j's minhash).
    */
  def minhashSignature(hs: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      MinHashSignature(
        org.apache.spark.sql.GraftExpressionBridge.expression(hs),
        perms.map(_._2), perms.map(_._3), Prime))

  /** Deterministic md5 bucket in [0, n) over a stable id column — THE
    * sampling/split primitive (q75, q87, q88, q96). Defined here,
    * beside its DuckDB twin, for the same no-drift reason as the base
    * hash.
    */
  def md5Bucket(c: Column, n: Long): Column =
    base32Builtin(c.cast("string")) % n

  // ---------------- DuckDB side ----------------

  /** DuckDB equivalent of [[base32Sql]]. */
  def duckBase32(inner: String): String =
    s"('0x' || substr(md5($inner), 1, 8))::BIGINT"

  /** DuckDB equivalent of [[md5Bucket]]. */
  def duckMd5Bucket(inner: String, n: Long): String =
    s"${duckBase32(s"$inner::VARCHAR")} % $n"

  /** DuckDB CTE body: one row per (doc_id, shingle base hash).
    * `generate_series(1, len-k+1)` is empty when the doc is shorter
    * than k words, so short docs drop out — same as the Spark guard.
    */
  def duckShingleCte(k: Int = ShingleK): String =
    s"""sh AS (SELECT doc_id, unnest(list_transform(
       |    generate_series(1, len(ws) - ${k - 1}),
       |    i -> ${duckBase32(s"array_to_string(ws[i:i+${k - 1}], ' ')")})) AS h
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))""".stripMargin

  /** DuckDB VALUES table of the MinHash permutations. */
  def duckPermsValues: String =
    perms.map { case (p, a, b) => s"($p, ${a}::BIGINT, ${b}::BIGINT)" }
      .mkString("perms(p, a, b) AS (VALUES ", ", ", ")")
}
