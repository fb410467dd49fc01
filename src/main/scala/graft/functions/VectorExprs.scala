package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the similarity-search hot loops.
  * Same rationale as [[TextExprs]]: HOF lambdas are interpreted, so
  * per-row centroid scans / hyperplane projections pay a lambda frame
  * per element; these run one primitive loop per row. All folds run
  * left-to-right in doubles, value-identical to the
  * `aggregate`/`zip_with` compositions and the DuckDB
  * `list_reduce`/`list_transform` oracles.
  */
object VectorExprs

/** IDs of the `nprobe` nearest centroids by (L2 distance, id) — the
  * IVF coarse-quantizer assignment as one per-row loop over the
  * codebook, replacing the exploded crossJoin + WindowExec argmin
  * (16× row blow-up + a window over millions of single-vector
  * partitions). The codebook is a driver-side constant (IVF codebooks
  * are small by construction); distances fold left per dimension like
  * the oracle's `list_reduce`.
  */
case class NearestCentroids(child: Expression, ids: Seq[Long],
    cents: Seq[Seq[Float]], nprobe: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val centArr: Array[Array[Float]] = cents.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // NEVER read past the input array: getFloat beyond numElements on
    // an UnsafeArrayData is a silent out-of-bounds read of heap
    // garbage (observed as heap-size-dependent results). Vectors
    // shorter than the codebook dim are treated as zero-padded.
    val n = v.numElements()
    val k = centArr.length
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ce = centArr(c)
      var s = 0.0
      var j = 0
      while (j < ce.length) {
        val vj = if (j < n) v.getFloat(j).toDouble else 0.0
        val d = vj - ce(j).toDouble
        s = s + d * d
        j += 1
      }
      dists(c) = s
      c += 1
    }
    // selection of the nprobe smallest by (dist, id): k is tiny, so a
    // simple repeated scan keeps ties deterministic (earlier id wins)
    val out = new Array[Long](math.min(nprobe, k))
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < out.length) {
      var best = -1
      c = 0
      while (c < k) {
        if (!taken(c) && (best < 0 || dists(c) < dists(best))) best = c
        c += 1
      }
      taken(best) = true
      out(r) = idArr(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket: bit p of the result is set when
  * `plane_p · v > 0` — value-identical to the nested
  * `aggregate(sequence(0,P-1), …, aggregate(zip_with(…)))`
  * composition (P interpreted dot products per row), one primitive
  * double loop here.
  */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  @transient private lazy val planeArr: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // bound by the input length too: reading past numElements on an
    // UnsafeArrayData silently returns heap garbage (short vectors are
    // zero-padded — the extra terms contribute nothing to the sign)
    val n = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < planeArr.length) {
      val w = planeArr(p)
      val m = math.min(w.length, n)
      var s = 0.0
      var j = 0
      while (j < m) {
        s = s + v.getFloat(j).toDouble * w(j)
        j += 1
      }
      if (s > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}
