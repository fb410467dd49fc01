package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: for a long-array of shingle hashes,
  * returns `[min_j((a_j·h + b_j) mod prime) for j < k]` — value-
  * identical to the `transform(perms, q -> array_min(transform(hs,
  * …)))` composition, but one tight primitive loop instead of k·n
  * interpreted lambda frames with boxed longs (~50× on the dedup
  * benchmark's signature stage). Evaluated right above the cached
  * shingle-hash relation, so CodegenFallback costs nothing.
  */
case class MinHashSignature(child: Expression, as: Seq[Long], bs: Seq[Long],
    prime: Long) extends UnaryExpression with CodegenFallback {

  require(as.length == bs.length, "coefficient arrays must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val k = aArr.length
    val out = new Array[Long](k)
    var j = 0
    while (j < k) { out(j) = Long.MaxValue; j += 1 }
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      j = 0
      while (j < k) {
        val v = (aArr(j) * h + bArr(j)) % prime
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
