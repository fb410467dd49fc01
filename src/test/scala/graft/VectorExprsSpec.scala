package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.scalatest.funsuite.AnyFunSuite

/** Value-identity pins for the round-9 native vector expressions:
  * each one must be indistinguishable from the HOF composition it
  * replaced ([[graft.functions.VectorExprs]] scaladoc), including the
  * HOF null/length semantics (unequal zip lengths and null elements
  * null the fold) and the packed-argmin tie rule of the Lloyd
  * assignments. The oracle gate proves end-to-end parity; this spec
  * pins the per-expression contract so a future edit can't drift one
  * kernel while the others keep the suite green.
  */
class VectorExprsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import org.apache.spark.sql.GraftExpressionBridge.{column => bridge, expression => ex}

  private def nat(c: Column): Column = c

  test("LongL2Sq / LongDot / LongSub match their HOF folds, incl. null semantics") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L, 3L),  array(4L, 6L, 9L)),
        |  (array(-5L, 0L, 7L), array(7L, -2L, -7L)),
        |  (array(1L, 2L),      array(1L, 2L, 3L)),
        |  (array(1L, CAST(NULL AS BIGINT), 3L), array(1L, 2L, 3L)),
        |  (array(), array())
        |AS t(a, b)""".stripMargin)
    val out = df.select(
      bridge(graft.functions.LongL2Sq(ex(col("a")), ex(col("b")))).as("n_l2"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (s, x) -> s + x)").as("h_l2"),
      bridge(graft.functions.LongDot(ex(col("a")), ex(col("b")))).as("n_dot"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x)").as("h_dot"),
      bridge(graft.functions.LongSub(ex(col("a")), ex(col("b")))).as("n_sub"),
      expr("zip_with(a, b, (x, y) -> x - y)").as("h_sub")).collect()
    for (r <- out) {
      assert(r.get(0) == r.get(1), s"LongL2Sq diverged: $r")
      assert(r.get(2) == r.get(3), s"LongDot diverged: $r")
      val n = Option(r.get(4)).map(_.asInstanceOf[scala.collection.Seq[Long]].toSeq)
      val h = Option(r.get(5)).map(_.asInstanceOf[scala.collection.Seq[Any]].toSeq)
      // zip_with yields null ELEMENTS where the native form nulls the
      // whole array; both poison every downstream integer fold the
      // same way, and the engine only ever subtracts equal-length
      // non-null vectors — pin equality there, null-poisoning above
      if (h.exists(s => s.forall(_ != null) && n.isDefined))
        assert(n.get == h.get.map(_.asInstanceOf[Long]), s"LongSub diverged: $r")
    }
  }

  test("FloatDot / FloatNormSq are bit-identical to the fold-left double HOFs") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(CAST(0.1 AS FLOAT), CAST(-2.5 AS FLOAT), CAST(3.375 AS FLOAT)),
        |   array(CAST(7.25 AS FLOAT), CAST(0.3 AS FLOAT), CAST(-0.125 AS FLOAT))),
        |  (array(CAST(1e-8 AS FLOAT), CAST(1e8 AS FLOAT), CAST(-1e8 AS FLOAT)),
        |   array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)))
        |AS t(a, b)""".stripMargin)
    val out = df.select(
      bridge(graft.functions.FloatDot(ex(col("a")), ex(col("b")))).as("n_dot"),
      expr("""aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)),
             |  cast(0 as double), (s, x) -> s + x)""".stripMargin).as("h_dot"),
      bridge(graft.functions.FloatNormSq(ex(col("a")))).as("n_norm"),
      expr("""aggregate(a, cast(0 as double),
             |  (s, x) -> s + cast(x as double) * cast(x as double))""".stripMargin).as("h_norm"))
      .collect()
    for (r <- out) {
      // bit-identical, not approximately equal — the fold order is
      // part of the oracle contract
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"FloatDot drifted: $r")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)), s"FloatNormSq drifted: $r")
    }
  }

  test("NearestCodeLong reproduces the packed-argmin (min_by) assignment, ties to lower cid") {
    // two equidistant centroids: the packed key d2 * K + cid must pick
    // the LOWER cid — the q105 tie rule
    val cents = Seq(Seq(0L, 0L), Seq(2L, 0L), Seq(1L, 5L))
    val ids = Seq(0L, 1L, 2L)
    val df = spark.sql(
      """SELECT * FROM VALUES (array(1L, 0L)), (array(2L, 1L)), (array(1L, 4L))
        |AS t(qe)""".stripMargin)
    val native = df.select(
      bridge(graft.functions.NearestCodeLong(ex(col("qe")), ids, cents)).as("cid"))
      .collect().map(_.getLong(0)).toSeq
    // (1,0): d0=1, d1=1 → tie → cid 0. (2,1): d0=5, d1=1 → cid 1.
    // (1,4): d2=1 → cid 2.
    assert(native == Seq(0L, 1L, 2L))
  }

  test("PqEncode equals the per-sub NearestSubCode argmin over sliced subvectors") {
    val dsub = 2
    val subIds = Seq(Seq(0L, 1L), Seq(0L, 1L))
    val subCents = Seq(
      Seq(Seq(0L, 0L), Seq(10L, 10L)),
      Seq(Seq(5L, 5L), Seq(-5L, -5L)))
    val df = spark.sql(
      """SELECT * FROM VALUES (array(1L, 2L, 6L, 6L)), (array(9L, 9L, -4L, -6L))
        |AS t(qe)""".stripMargin)
    val enc = df.select(
      bridge(graft.functions.PqEncode(ex(col("qe")), subIds, subCents, dsub)).as("codes"),
      bridge(graft.functions.NearestSubCode(ex(lit(0)),
        ex(slice(col("qe"), 1, dsub)), subIds, subCents)).as("c0"),
      bridge(graft.functions.NearestSubCode(ex(lit(1)),
        ex(slice(col("qe"), dsub + 1, dsub)), subIds, subCents)).as("c1"))
      .collect()
    for (r <- enc) {
      val codes = r.getSeq[Long](0)
      assert(codes == Seq(r.getLong(1), r.getLong(2)), s"PqEncode diverged: $r")
    }
  }

  test("the collect-trained kmeans codebook matches the bit-exact integer contract on a fixture") {
    // end-to-end pin at sf0.001: training through the driver-collected
    // codebook path must keep q105's exact integer outputs — compare
    // the final update relation against an independent in-test replay
    // of the historical crossJoin + min_by chain
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.001"
    val q = Similarity.kmeansQuantized(spark, dir)
    val u2 = Similarity.kmeansTrainU2(q)
      .select(col("cid"), col("dim").cast("long").as("dim"), col("cqv"), col("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // historical form: seed from a window, assignment via crossJoin +
    // packed min_by, update via join — all plain Spark ops
    val K = Similarity.KmeansK
    val seed = q.orderBy("vec_id").limit(K)
      .select((row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
        .cast("long").as("cid"), col("qe").as("cq"))
    def assign(cents: org.apache.spark.sql.DataFrame) = {
      val dist = expr("aggregate(zip_with(qe, cq, (a, b) -> (a - b) * (a - b)), 0L, (s, x) -> s + x)")
      q.crossJoin(broadcast(cents))
        .withColumn("key", dist * K + col("cid"))
        .groupBy("vec_id").agg(min_by(col("cid"), col("key")).as("cid"))
    }
    def update(asg: org.apache.spark.sql.DataFrame) =
      q.join(asg, "vec_id")
        .select(col("cid"), posexplode(col("qe")).as(Seq("dim", "v")))
        .groupBy("cid", "dim")
        .agg(expr("sum(v) div count(1)").as("cqv"), count(lit(1)).as("n"))
    def recollect(upd: org.apache.spark.sql.DataFrame) =
      upd.groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("cqv")))),
          s => s.getField("cqv")).as("cq"))
    val u2Ref = update(assign(recollect(update(assign(seed)))))
      .select(col("cid"), col("dim").cast("long").as("dim"), col("cqv"), col("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(u2.toSeq == u2Ref.toSeq)
    spark.catalog.clearCache()
  }
}
