package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._

/** Native (whole-stage-codegen) unordered-pair generation from a bucket's
  * doc-id list — the candidate-pair step of every bucketed dedup index
  * ([[graft.operators.DedupOps]]: n-gram Jaccard, exact substring).
  *
  * `ListPairs(ds) = [ (min(ds(i), ds(j)), max(ds(i), ds(j))) : i < j ]`
  * in (i, j) iteration order — exactly the declarative rendering
  * `flatten(transform(ds, (x, i) => transform(slice(ds, i + 2, size(ds)),
  * y => struct(least(x, y) da, greatest(x, y) db))))`, asserted
  * element-for-element in graft.KernelSpec / KernelPropertySpec.
  *
  * Why an Expression: the rendering's inner `slice` copies the list's
  * suffix ONCE PER ELEMENT (O(df²) array copies per bucket) and every
  * pair passes through two interpreted lambda dispatches — the dominant
  * allocation of the shared pair-index build. The kernel emits each pair
  * struct in one primitive two-index loop with zero intermediate copies.
  * Cost stays O(Σ df²) by design (df is capped corpus-relatively — see
  * shingleBuckets' cap policy); this removes the constant, not the bound.
  *
  * Null-input note: a NULL list yields NULL (unary null propagation); the
  * rendering yields NULL too (flatten/transform propagate). Lists never
  * carry null ELEMENTS here (collect_list drops nulls); a null element
  * would null the whole result (toLongArray contract) where the rendering
  * nulls only the affected struct fields — documented, not matched, same
  * caveat style as NGramSet64.
  */
case class ListPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"list_pairs requires an array<bigint> argument, got " +
        other.catalogString)
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("da", LongType, nullable = false),
      StructField("db", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "list_pairs"

  override def nullSafeEval(v: Any): Any =
    ListPairs.pairs(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ListPairs.pairs($c)")

  override protected def withNewChildInternal(c: Expression): ListPairs =
    copy(child = c)
}

object ListPairs {

  /** Guard shared by the pair kernels: n(n-1)/2 must fit an array. The
    * operators' buckets are df-capped (≤1000 → ≤499,500 pairs), but the
    * SQL-registered kernels accept arbitrary lists — an uncapped 66k+
    * list would overflow Int and crash with a negative array size. */
  private[functions] def pairCount(n: Int, name: String): Int = {
    val c = n.toLong * (n - 1) / 2
    require(c <= Int.MaxValue,
      s"$name: $n elements -> $c pairs exceeds the array limit; " +
        "cap the bucket (see shingleBuckets' df cap) before pairing")
    c.toInt
  }

  /** Kernel body, shared by interpreted eval and codegen. */
  def pairs(v: ArrayData): ArrayData = {
    val n = v.numElements()
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val xs = v.toLongArray()
    val out = new Array[Any](pairCount(n, "list_pairs"))
    var k = 0
    var i = 0
    while (i < n) {
      val a = xs(i)
      var j = i + 1
      while (j < n) {
        val b = xs(j)
        val r: InternalRow =
          if (a <= b) new GenericInternalRow(Array[Any](a, b))
          else new GenericInternalRow(Array[Any](b, a))
        out(k) = r
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def listPairs(ds: Column): Column =
    graftshim.toColumn(ListPairs(graftshim.toExpression(ds)))
}
