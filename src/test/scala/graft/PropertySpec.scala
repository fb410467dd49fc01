package graft

import graft.functions.{Dsp, Rotations}
import graft.operators.SeriesOps
import graft.operators.SeriesOps.Series
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.2): axis contiguity after
  * delete-collapse, normalization moments, wrap ranges, rotation
  * orthonormality, interpolation totality. Generators are sampled
  * with fixed seeds so runs are deterministic.
  */
class PropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic sampling loop over a ScalaCheck generator. */
  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val s = Series(Seq("k"), "t", Seq("i"))

  private val valuesGen: Gen[List[Double]] =
    Gen.chooseNum(4, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3).map(v => math.rint(v * 100) / 100)))

  test("delete-collapse: surviving axis starts at 0, contiguous ms grid") {
    forSamples(valuesGen.flatMap(vs =>
      Gen.chooseNum(0.0, 1.0).flatMap(a => Gen.chooseNum(0.0, 0.5).map((vs, a, _)))), 8) {
      case (vs, a, w) =>
        val df = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, i * 0.01, v) }
          .toDF("k", "i", "t", "v")
        val lo = a * vs.size * 0.01
        val ts = SeriesOps.deleteCollapse(df, s, lo, lo + w)
          .orderBy("t").select("t").collect().map(_.getDouble(0))
        if (ts.length > 1) {
          val dts = ts.sliding(2).map(p => math.rint((p(1) - p(0)) * 1000)).toSet
          assert(dts.size == 1, s"non-uniform collapsed axis: $dts")
        }
        assert(ts.headOption.forall(_ == 0.0))
    }
  }

  test("zscore output: mean 0, population std 1 (or all-zero)") {
    forSamples(valuesGen, 8) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, i * 1.0, v) }
        .toDF("k", "i", "t", "v")
      val zs = SeriesOps.zscore(df, s, "v", "z")
        .select("z").collect().map(_.getDouble(0))
      val mean = zs.sum / zs.length
      val std = math.sqrt(zs.map(z => (z - mean) * (z - mean)).sum / zs.length)
      assert(math.abs(mean) < 1e-6)
      assert(math.abs(std - 1.0) < 1e-6 || std < 1e-12)
    }
  }

  test("percent normalize stays within [-100, 100]") {
    forSamples(valuesGen, 8) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, i * 1.0, v) }
        .toDF("k", "i", "t", "v")
      SeriesOps.percentNormalize(df, s, "v", "p")
        .select("p").collect().map(_.getDouble(0))
        .foreach(p => assert(p >= -100.0 - 1e-9 && p <= 100.0 + 1e-9))
    }
  }

  test("frame transform always lands in [-180, 180)") {
    val gen = for {
      src <- Gen.chooseNum(-720.0, 720.0)
      dst <- Gen.chooseNum(-720.0, 720.0)
      off <- Gen.chooseNum(-360.0, 360.0)
    } yield (src, dst, off)
    forSamples(gen, 8) { case (src, dst, off) =>
      val w = Seq((src, dst)).toDF("s", "d")
        .select(SeriesOps.frameTransform(col("s"), col("d"), off).as("w"))
        .head().getDouble(0)
      assert(w >= -180.0 && w < 180.0)
    }
  }

  test("interpolate is total whenever any value is non-null") {
    forSamples(Gen.listOfN(12, Gen.option(Gen.chooseNum(-50.0, 50.0))), 8) { vs =>
      if (vs.exists(_.isDefined)) {
        val df = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, i * 1.0, v) }
          .toDF("k", "i", "t", "v")
        val n = SeriesOps.interpolateLinear(df, s, "v", "li")
          .filter(col("li").isNull).count()
        assert(n == 0)
      }
    }
  }

  test("rotation matrices are orthonormal (det +1)") {
    val gen = for {
      w <- Gen.chooseNum(-1.0, 1.0); x <- Gen.chooseNum(-1.0, 1.0)
      y <- Gen.chooseNum(-1.0, 1.0); z <- Gen.chooseNum(-1.0, 1.0)
    } yield (w, x, y, z)
    forSamples(gen, 30) { case (w, x, y, z) =>
      if (math.sqrt(w * w + x * x + y * y + z * z) > 1e-3) {
        val m = Rotations.quatToMatrix(w, x, y, z)
        val det =
          m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
            m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
            m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
        assert(math.abs(det - 1.0) < 1e-9)
      }
    }
  }

  test("yaw from pure-yaw quaternion recovers the angle") {
    forSamples(Gen.chooseNum(-179.0, 179.0), 20) { deg =>
      val half = math.toRadians(deg) / 2
      val yaw = Rotations.yawFromQuat(math.cos(half), 0, 0, math.sin(half))
      assert(math.abs(yaw - deg) < 1e-9)
    }
  }

  test("euler and quaternion agree on pure yaw rotation") {
    forSamples(Gen.chooseNum(-179.0, 179.0), 10) { deg =>
      val half = math.toRadians(deg) / 2
      val mq = Rotations.quatToMatrix(math.cos(half), 0, 0, math.sin(half))
      val me = Rotations.eulerToMatrix(deg, 0, 0)
      for (i <- 0 until 3; j <- 0 until 3)
        assert(math.abs(mq(i)(j) - me(i)(j)) < 1e-9)
    }
  }

  test("savgol center weights reproduce degree-2 polynomials") {
    forSamples(Gen.oneOf(5, 7, 9, 11).flatMap(w => Gen.oneOf(2, 3, 4).map((w, _))), 12) {
      case (w, p) =>
        if (p < w) {
          val coefs = Dsp.savgolCoefficients(w, p)
          val h = w / 2
          val value = coefs.zipWithIndex.map { case (c, i) =>
            val d = (i - h).toDouble
            c * (1.0 + 2 * d + (if (p >= 2) 3 * d * d else 0.0))
          }.sum
          assert(math.abs(value - 1.0) < 1e-7)
        }
    }
  }
}
