package graft

import graft.functions.KmvSketchAgg
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-operator invariants: the KMV state must be a pure function
  * of the input SET (any fold order, any partitioning), since that is
  * what makes q84 oracle-checkable; the histogram quantile must obey
  * its ⌈q·n⌉ crossing convention.
  */
class SketchesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(7L + i)).foreach(body)
    }

  private val hashesGen: Gen[List[Long]] =
    Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 1L << 32)))

  test("KMV state = k smallest distinct values, any fold/merge order") {
    val agg = new KmvSketchAgg(16)
    forSamples(hashesGen, 20) { hs =>
      val expected = hs.distinct.sorted.take(16).toArray
      // sequential fold
      val folded = hs.foldLeft(agg.zero)(agg.reduce)
      assert(folded.toSeq == expected.toSeq)
      // reversed fold + two-way split merge
      val rev = hs.reverse.foldLeft(agg.zero)(agg.reduce)
      assert(rev.toSeq == expected.toSeq)
      val (a, b) = hs.splitAt(hs.length / 2)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged.toSeq == expected.toSeq)
    }
  }

  test("KMV estimate is exact below k and within 30% at 20x k") {
    // exact below k: 10 distinct hashes, k=64 -> estimate == 10
    val small = (1 to 10).map(i => ("s", i * 1000L)).toDF("g", "h")
    val kmv = udaf(new KmvSketchAgg(64))
    val ks = small.groupBy("g").agg(kmv($"h").as("ks"))
      .select(size($"ks")).as[Int].head()
    assert(ks == 10)
    // 20x k: md5-distributed hashes, estimator within 30%
    val n = 1280
    val big = (1 to n).map(i => ("b", graft.functions.Md5Prefix32.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"tok$i")))).toDF("g", "h")
    val arr = big.groupBy("g").agg(kmv($"h").as("ks"))
      .select($"ks").as[Seq[Long]].head()
    val est = 63.0 * 4294967296.0 / arr.last
    assert(math.abs(est - n) / n < 0.3, s"est=$est n=$n")
  }

  test("histogram quantile: first bin crossing ceil(q*n)") {
    // values 1..100 in milli-units -> p50 = 50, p95 = 95 exactly
    val df = (1 to 100).map(i => (1L, 0L, i.toDouble, i.toDouble, "x"))
      .toDF("user_id", "event_id", "t", "value", "event_type")
    val c = df.filter($"value".isNotNull)
      .select($"user_id", round($"value" * 1e3).cast("bigint").as("vm"))
      .groupBy("user_id", "vm").agg(count(lit(1)).as("cnt"))
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("vm")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val whole = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val out = c.withColumn("cum", sum("cnt").over(cum))
      .withColumn("n", sum("cnt").over(whole))
      .groupBy("user_id")
      .agg((min(when($"cum" >= ceil($"n" * 0.5), $"vm")) / 1e3).as("p50"),
        (min(when($"cum" >= ceil($"n" * 0.95), $"vm")) / 1e3).as("p95"))
      .head()
    assert(out.getDouble(1) == 50.0 && out.getDouble(2) == 95.0)
  }

  test("count-min estimates never undercount (sf0.001)") {
    val out = graft.operators.Sketches.q90CmFreq
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.length > 0)
    out.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("cm_est")
      assert(est >= exact, s"CM undercounted ${r.getAs[String]("token")}: $est < $exact")
    }
  }

  test("stream-stream join equals the batch self-join (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamRows = graft.streaming.StreamingSessions
      .runStreamJoin(spark, dir, "sketches_spec_join").count()
    val e = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"event_id", expr("ts div 1000").as("us"), $"event_type")
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"event_id".as("pe"), $"us".as("pus"))
    val c = e.filter($"event_type" =!= "purchase")
      .select($"user_id".as("cu"), $"event_id".as("ce"), $"us".as("cus"))
    val batchRows = p.join(c, $"pu" === $"cu" &&
      $"cus" >= $"pus" - 21600000000L && $"cus" <= $"pus").count()
    assert(streamRows == batchRows && streamRows > 0)
  }

  test("q137 KMV algebra: below k the union and intersection estimates are EXACT") {
    import graft.operators.Sketches
    val dir = "/root/testdata/sf0.001"
    // sf0.001 vocabularies are < k = 64 per source, so every sketch IS
    // its value set and both estimators must hit the exact answers
    val got = Sketches.q137KmvSetAlgebra.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getDouble(5))).toMap
    val vocab = graft.sources.Tables.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("token"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(got.nonEmpty)
    got.foreach { case ((a, b), (estU, estI)) =>
      val (va, vb) = (vocab(a), vocab(b))
      assert(estU == (va ++ vb).size.toDouble, s"union $a-$b")
      assert(estI == (va & vb).size.toDouble, s"intersect $a-$b")
    }
  }

  test("q135 HLL: linear-counting-corrected estimate within 5% of exact per source") {
    import graft.operators.Sketches
    val dir = "/root/testdata/sf0.001"
    val est = Sketches.q135HllDistinct.fn(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val exact = graft.sources.Tables.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("token"))
      .groupBy("source").agg(countDistinct("token").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (src, (nZero, raw)) =>
      val corrected = Sketches.hllCorrected(nZero, raw)
      val n = exact(src).toDouble
      assert(math.abs(corrected - n) / n <= 0.05,
        s"$src: corrected $corrected vs exact $n")
    }
  }
}
