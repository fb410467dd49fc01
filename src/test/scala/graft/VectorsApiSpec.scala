package graft

import graft.api.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The embedding facade must agree with the oracle-checked declared
  * queries it mirrors, and behave correctly on seeded geometry.
  */
class VectorsApiSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = graft.sources.Tables.embeddings(spark, sfDir)

  test("cosineTopK facade matches the declared q45 result") {
    val viaFacade = Vectors.cosineTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val viaQuery = graft.operators.Similarity.q45CosineTopK.fn(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(viaFacade == viaQuery)
  }

  test("ivfAssign facade matches the declared q67 result") {
    val centroids = emb.filter(col("vec_id") < 16)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    val viaFacade = Vectors.ivfAssign(emb, centroids)
      .select("vec_id", "list_id").orderBy("vec_id")
      .collect().map(_.toSeq).toSeq
    val viaQuery = graft.operators.Similarity.q67IvfAssign.fn(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(viaFacade == viaQuery)
  }

  test("nearDupPairs finds an exact duplicate pair on seeded vectors") {
    val v = Seq(0.5f, -1.25f, 2.0f, 0.125f, -0.75f, 1.5f, -0.25f, 1.0f)
    val w = Seq(2.0f, 0.5f, -0.5f, 1.75f, 0.25f, -1.0f, 0.75f, -1.5f)
    val df = Seq((1L, v), (2L, v), (3L, w)).toDF("vec_id", "embedding")
    val pairs = Vectors.nearDupPairs(df, minCos = 0.999)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }
}
