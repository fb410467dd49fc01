package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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

/** Element-wise difference of two `array<long>` columns — native form
  * of `zip_with(a, b, (x, y) -> x - y)` (same null/length semantics as
  * [[LongL2Sq]]; exact integers, so order is immaterial). The residual
  * (vector − assigned centroid) construction of the IVFADC chains.
  */
case class LongSub(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "long_sub"

  // can yield null even for non-null inputs (length mismatch / null
  // element — the HOF forms' semantics), so the expression must not
  // inherit non-nullability from its children
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      out(i) = x.getLong(i) - y.getLong(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongSub = copy(left = newLeft, right = newRight)
}

/** Integer-exact nearest-centroid id over a DRIVER-COLLECTED integer
  * codebook: argmin of (L2², cid) — the packed-key tie rule of the
  * q105 Lloyd trainer (`min_by(cid, d2 * K + cid)`), evaluated as one
  * per-row loop over the K-row literal codebook. This is
  * [[NearestCentroids]]' pattern applied to TRAINED micro-quantized
  * codebooks: collecting K×dims longs to the driver is the same
  * bounded fold the coarse quantizer already does, and it turns the
  * assignment stage from a K-way explode + hash re-aggregation of the
  * corpus into a narrow zero-shuffle projection.
  */
case class NearestCodeLong(child: Expression, ids: Seq[Long],
    cents: Seq[Seq[Long]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_code_long"

  // can yield null even for non-null inputs (length mismatch / null
  // element — the HOF forms' semantics), so the expression must not
  // inherit non-nullability from its children
  override def nullable: Boolean = true

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val centArr: Array[Array[Long]] = cents.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    // a null element nulls every candidate distance (the HOF form's
    // semantics), so the argmin has no non-null key — return null
    var j0 = 0
    while (j0 < n) { if (v.isNullAt(j0)) return null; j0 += 1 }
    var bestId = 0L
    var bestD = Long.MaxValue
    var first = true
    var c = 0
    while (c < centArr.length) {
      val ce = centArr(c)
      if (ce.length == n) {
        var s = 0L
        var j = 0
        while (j < n) {
          val d = v.getLong(j) - ce(j)
          s += d * d
          j += 1
        }
        // ties: lower cid wins (ids ascend, strict < keeps the first)
        if (first || s < bestD) { first = false; bestD = s; bestId = idArr(c) }
      }
      c += 1
    }
    if (first) null else bestId
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCodeLong =
    copy(child = newChild)
}

/** Per-subspace nearest sub-centroid id over driver-collected PQ
  * sub-codebooks: `left` is the subspace index (0..M−1), `right` the
  * Dsub-dim integer subvector; the argmin/tie rule is
  * [[NearestCodeLong]]'s within that subspace's codebook. Used by the
  * Lloyd update pass, where the (sub, sq) explode is already
  * materialized.
  */
case class NearestSubCode(left: Expression, right: Expression,
    subIds: Seq[Seq[Long]], subCents: Seq[Seq[Seq[Long]]])
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_sub_code"

  // can yield null even for non-null inputs (length mismatch / null
  // element — the HOF forms' semantics), so the expression must not
  // inherit non-nullability from its children
  override def nullable: Boolean = true

  @transient private lazy val idArr: Array[Array[Long]] =
    subIds.map(_.toArray).toArray
  @transient private lazy val centArr: Array[Array[Array[Long]]] =
    subCents.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(a: Any, b: Any): Any = {
    // the subspace index arrives as int (posexplode position) or long
    val sub = a match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long => l.intValue()
      case n: Number => n.intValue()
    }
    if (sub < 0 || sub >= centArr.length) return null
    val v = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    var j0 = 0
    while (j0 < n) { if (v.isNullAt(j0)) return null; j0 += 1 }
    val cents = centArr(sub)
    val cids = idArr(sub)
    var bestId = 0L
    var bestD = Long.MaxValue
    var first = true
    var c = 0
    while (c < cents.length) {
      val ce = cents(c)
      if (ce.length == n) {
        var s = 0L
        var j = 0
        while (j < n) {
          val d = v.getLong(j) - ce(j)
          s += d * d
          j += 1
        }
        if (first || s < bestD) { first = false; bestD = s; bestId = cids(c) }
      }
      c += 1
    }
    if (first) null else bestId
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NearestSubCode = copy(left = newLeft, right = newRight)
}

/** Full PQ encoding of an integer vector against driver-collected
  * sub-codebooks: element `sub` of the result is the
  * [[NearestSubCode]] cid of the vector's `sub`-th Dsub-dim slice —
  * one narrow per-row loop producing all M codes, so the search-side
  * code relation needs no explode-join at all.
  */
case class PqEncode(child: Expression, subIds: Seq[Seq[Long]],
    subCents: Seq[Seq[Seq[Long]]], dsub: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  // can yield null even for non-null inputs (length mismatch / null
  // element — the HOF forms' semantics), so the expression must not
  // inherit non-nullability from its children
  override def nullable: Boolean = true

  @transient private lazy val idArr: Array[Array[Long]] =
    subIds.map(_.toArray).toArray
  @transient private lazy val centArr: Array[Array[Array[Long]]] =
    subCents.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var j0 = 0
    while (j0 < n) { if (v.isNullAt(j0)) return null; j0 += 1 }
    val m = centArr.length
    val out = new Array[Long](m)
    var sub = 0
    while (sub < m) {
      val off = sub * dsub
      // slice(qe, sub*dsub+1, dsub) semantics: a short final slice
      // keeps whatever elements exist — mirror by bounding the dim
      // loop at the input length
      val cents = centArr(sub)
      val cids = idArr(sub)
      val len = math.max(0, math.min(dsub, n - off))
      var bestId = 0L
      var bestD = Long.MaxValue
      var first = true
      var c = 0
      while (c < cents.length) {
        val ce = cents(c)
        if (ce.length == len) {
          var s = 0L
          var j = 0
          while (j < len) {
            val d = v.getLong(off + j) - ce(j)
            s += d * d
            j += 1
          }
          if (first || s < bestD) { first = false; bestD = s; bestId = cids(c) }
        }
        c += 1
      }
      if (first) return null
      out(sub) = bestId
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Exact integer L2² between two `array<long>` columns — one primitive
  * loop per row, value-identical to
  * `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (s, x) -> s + x)`
  * (integer adds are associative, so the fold order is immaterial; the
  * null semantics below reproduce the HOF composition's exactly:
  * unequal lengths null-pad the zip and any null element nulls the
  * running sum). This is the Lloyd/ADC hot loop — the HOF form pays an
  * interpreted lambda frame per element per candidate row.
  */
case class LongL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_l2sq"

  // can yield null even for non-null inputs (length mismatch / null
  // element — the HOF forms' semantics), so the expression must not
  // inherit non-nullability from its children
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongL2Sq = copy(left = newLeft, right = newRight)
}

/** Exact integer dot product of two `array<long>` columns —
  * value-identical to
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x)`
  * with the same null/length semantics as [[LongL2Sq]].
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  // can yield null even for non-null inputs (length mismatch / null
  // element — the HOF forms' semantics), so the expression must not
  // inherit non-nullability from its children
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongDot = copy(left = newLeft, right = newRight)
}

/** Left-fold double dot product of two `array<float>` columns —
  * BIT-identical to
  * `aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)),
  *   cast(0 as double), (s, x) -> s + x)`:
  * the loop adds the per-dimension products in the same left-to-right
  * order (double addition is order-sensitive, so the order is part of
  * the value contract with the DuckDB oracle's `list_reduce`).
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  // can yield null even for non-null inputs (length mismatch / null
  // element — the HOF forms' semantics), so the expression must not
  // inherit non-nullability from its children
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s = s + x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatDot = copy(left = newLeft, right = newRight)
}

/** Left-fold double squared norm of an `array<float>` column —
  * BIT-identical to
  * `aggregate(a, cast(0 as double), (s, x) -> s + cast(x as double) * cast(x as double))`
  * (same left-to-right order; any null element nulls the sum).
  */
case class FloatNormSq(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_normsq"

  // can yield null even for non-null inputs (length mismatch / null
  // element — the HOF forms' semantics), so the expression must not
  // inherit non-nullability from its children
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val d = v.getFloat(i).toDouble
      s = s + d * d
      i += 1
    }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): FloatNormSq =
    copy(child = newChild)
}
