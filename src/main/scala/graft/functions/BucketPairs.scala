package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._

/** Native pair generation + verification for the LSH bucket paths — the
  * struct-list siblings of [[ListPairs]].
  *
  * Both LSH dedups ([[graft.operators.DedupOps]] MinHash, SimHash) group
  * band collisions into buckets of `(doc_id, signature)` structs and
  * generate verified pairs INSIDE each bucket. The declarative rendering
  * (flatten/transform/slice, kept in KernelSpec as the parity reference)
  * pays the same costs [[ListPairs]] removed — per-element suffix copies,
  * two interpreted lambda dispatches per pair — plus the verification
  * itself runs interpreted per pair (64 `zip_with` lambda calls for a
  * MinHash agreement count). These kernels emit the verified pair structs
  * in one primitive two-index loop; the est/hamming FILTER stays outside,
  * so output is element-for-element equal to the unfiltered rendering.
  *
  * Null-input note: a NULL bucket list yields NULL (unary propagation),
  * matching the rendering; bucket elements are never null (collect_list).
  */
private[functions] abstract class BucketPairsExpr extends UnaryExpression {

  protected def sigOk(dt: DataType): Boolean
  protected def sigTypeName: String
  protected def verifyField: StructField
  protected def kernelCall: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType && sigOk(b.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint, $sigTypeName>>, got " +
        other.catalogString)
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("da", LongType, nullable = false),
      StructField("db", LongType, nullable = false),
      verifyField)),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernelCall($c)")
}

/** `MinhashBucketPairs(ms) = [ (min(id_i, id_j), max(id_i, id_j),
  * |{p : sig_i(p) = sig_j(p)}| / numPerms) : i < j ]` — the MinHash
  * candidate pairs with their signature-agreement Jaccard estimate. */
case class MinhashBucketPairs(child: Expression) extends BucketPairsExpr {
  override protected def sigOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override protected def sigTypeName: String = "array<bigint>"
  override protected def verifyField: StructField =
    StructField("est", DoubleType, nullable = false)
  override protected def kernelCall: String =
    "graft.functions.BucketPairs.minhashPairs"
  override def prettyName: String = "minhash_bucket_pairs"
  override def nullSafeEval(v: Any): Any =
    BucketPairs.minhashPairs(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): MinhashBucketPairs =
    copy(child = c)
}

/** `SimhashBucketPairs(ms) = [ (min(id_i, id_j), max(id_i, id_j),
  * popcount(fp_i XOR fp_j)) : i < j ]` — SimHash candidate pairs with
  * their Hamming distance. */
case class SimhashBucketPairs(child: Expression) extends BucketPairsExpr {
  override protected def sigOk(dt: DataType): Boolean = dt == LongType
  override protected def sigTypeName: String = "bigint"
  override protected def verifyField: StructField =
    StructField("hamming", IntegerType, nullable = false)
  override protected def kernelCall: String =
    "graft.functions.BucketPairs.simhashPairs"
  override def prettyName: String = "simhash_bucket_pairs"
  override def nullSafeEval(v: Any): Any =
    BucketPairs.simhashPairs(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): SimhashBucketPairs =
    copy(child = c)
}

object BucketPairs {

  /** Kernel body (MinHash): one primitive loop, signatures extracted once
    * per bucket element, agreement counted over primitive longs. The
    * estimate divides by the signature LENGTH (= NumPerms), exactly like
    * the rendering's `/ lit(NumPerms)`. Signature lengths must be uniform
    * within a bucket — with ragged lengths the estimate would depend on
    * bucket element order, so the kernel fails loudly instead (the
    * in-pipeline path always emits uniform NumPerms-length signatures;
    * this guards the SQL-registered surface). */
  def minhashPairs(v: ArrayData): ArrayData = {
    val n = v.numElements()
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val ids = new Array[Long](n)
    val sigs = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val r = v.getStruct(i, 2)
      ids(i) = r.getLong(0)
      sigs(i) = r.getArray(1).toLongArray()
      if (sigs(i).length != sigs(0).length) throw new IllegalArgumentException(
        s"minhash_bucket_pairs requires uniform signature lengths within a " +
          s"bucket, got ${sigs(0).length} and ${sigs(i).length}")
      i += 1
    }
    val out = new Array[Any](
      ListPairs.pairCount(n, "minhash_bucket_pairs"))
    var k = 0
    i = 0
    while (i < n) {
      val si = sigs(i)
      var j = i + 1
      while (j < n) {
        val sj = sigs(j)
        var agree = 0
        var p = 0
        val len = if (si.length < sj.length) si.length else sj.length
        while (p < len) {
          if (si(p) == sj(p)) agree += 1
          p += 1
        }
        val da = if (ids(i) <= ids(j)) ids(i) else ids(j)
        val db = if (ids(i) <= ids(j)) ids(j) else ids(i)
        out(k) = new GenericInternalRow(
          Array[Any](da, db, agree / si.length.toDouble))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Kernel body (SimHash): fingerprints are single longs; Hamming is one
    * XOR + popcount per pair. */
  def simhashPairs(v: ArrayData): ArrayData = {
    val n = v.numElements()
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val ids = new Array[Long](n)
    val fps = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = v.getStruct(i, 2)
      ids(i) = r.getLong(0)
      fps(i) = r.getLong(1)
      i += 1
    }
    val out = new Array[Any](
      ListPairs.pairCount(n, "simhash_bucket_pairs"))
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val da = if (ids(i) <= ids(j)) ids(i) else ids(j)
        val db = if (ids(i) <= ids(j)) ids(j) else ids(i)
        out(k) = new GenericInternalRow(
          Array[Any](da, db, java.lang.Long.bitCount(fps(i) ^ fps(j))))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry points. */
  def minhashBucketPairs(ms: Column): Column =
    graftshim.toColumn(MinhashBucketPairs(graftshim.toExpression(ms)))
  def simhashBucketPairs(ms: Column): Column =
    graftshim.toColumn(SimhashBucketPairs(graftshim.toExpression(ms)))
}
