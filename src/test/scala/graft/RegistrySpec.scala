package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract integrity: the query registry stays consistent. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size,
      names.groupBy(identity).collect { case (n, g) if g.size > 1 => n })
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("most queries carry a full SQL oracle (rows-only is the exception)") {
    val total = SparkEntry.allQueries.size
    val withOracle = SparkEntry.oracleSql.size
    assert(withOracle >= total - 5, s"$withOracle oracles of $total queries")
  }

  test("flagship entry query returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("every native expression is SQL-callable and agrees with the DataFrame path") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq("a b c d e f g", "x y z").toDF("text").createOrReplaceTempView("reg_docs")
    val sql = spark.sql(
      """SELECT md5_prefix32(text) AS h,
        |  shingle_hash32(split(text, ' ')) AS hs,
        |  simhash32(shingle_hash32(split(text, ' '))) AS sh,
        |  minhash_signature(shingle_hash32(split(text, ' '))) AS sig,
        |  lang_id(split(text, ' ')) AS lang,
        |  winnow_fingerprint(shingle_hash32(split(text, ' '))) AS fp,
        |  rolling_hash_summary(text) AS rh
        |FROM reg_docs""".stripMargin).collect()
    import graft.functions.TextHash
    import org.apache.spark.sql.GraftExpressionBridge.{column => gc, expression => ge}
    import org.apache.spark.sql.functions._
    val df = spark.table("reg_docs")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("hs", TextHash.shingleHashes(col("text")))
      .select(TextHash.base32(col("text")).as("h"), col("hs"),
        gc(graft.functions.SimHash32(ge(col("hs")))).as("sh"),
        TextHash.minhashSignature(col("hs")).as("sig"),
        gc(graft.functions.LangIdExpr(ge(col("ws")),
          graft.operators.TextOps.langMarkers)).as("lang"),
        gc(graft.functions.WinnowFingerprint(ge(col("hs")), 4)).as("fp"),
        gc(graft.functions.RollingHashSummary(ge(col("text")), 257L, 1000003L, 5)).as("rh"))
      .collect()
    assert(sql.map(_.toString).toSeq == df.map(_.toString).toSeq)
    // the vector-side function runs too
    val b = spark.sql(
      s"SELECT hyperplane_bucket(array(${Seq.fill(64)("0.5f").mkString(",")})) AS b")
      .head().getLong(0)
    assert(b >= 0L && b < 256L)
  }
}
