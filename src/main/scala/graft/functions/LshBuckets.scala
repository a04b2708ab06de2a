package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._

/** Native (whole-stage-codegen) random-hyperplane LSH bucketing, with the
  * plane matrix shipped as a Spark BROADCAST variable — the ANN sibling of
  * [[ArgTopDot]].
  *
  * `LshBuckets(v, P, tables, planesPer)` returns one bucket id per table:
  * `bucket(t) = Σ_j (dot(v, P(t·planesPer + j)) > 0 ? 1 << j : 0)` — the
  * exact semantics of the declarative rendering
  * `when(dotf(v, lit(p)) > 0, 1 << j).otherwise(0)` summed per table
  * ([[graft.operators.SimilarityOps.bucketCols]], kept as the parity
  * reference), with each dot accumulated left-to-right in IEEE double
  * exactly like [[DotF]]. A null dot (dimension mismatch or a null
  * element) contributes bit 0 through the rendering's otherwise-branch;
  * the kernel mirrors that (an invalid vector yields all-zero buckets,
  * not NULL). Null-input note: a NULL vector yields NULL here (standard
  * unary null propagation) where the rendering yields all-zero buckets —
  * same caveat as [[TextKernels]]' NGramSet64, documented over matched.
  * Parity is asserted in graft.KernelSpec / KernelPropertySpec.
  *
  * Why not the literal rendering: it builds tables × planesPer dotf nodes
  * — the production configs the ANN docstring targets (8-16 planes per
  * table, tens of tables) grow the generated Java linearly into JIT
  * limits and re-ship every plane inside every serialized task, the same
  * failure mode the IVF centroid literals had. Here the tree is ONE
  * constant-size node and the planes ride the torrent broadcast.
  */
case class LshBuckets(child: Expression,
    planes: Broadcast[Array[Array[Double]]], tables: Int, planesPer: Int)
    extends UnaryExpression {

  require(tables >= 1 && planesPer >= 1 && planesPer <= 30,
    s"bad LSH config: tables=$tables planesPer=$planesPer")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires an array<float>/array<double> argument, got " +
        other.catalogString)
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lsh_buckets"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    LshBuckets.buckets(v.asInstanceOf[ArrayData], planes.value,
      tables, planesPer, isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("lshBucketsBc", planes,
      classOf[Broadcast[Array[Array[Double]]]].getName)
    val mat = ctx.addMutableState("double[][]", "lshBucketsMat",
      v => s"$v = (double[][]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshBuckets.buckets(" +
        s"$c, $mat, $tables, $planesPer, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): LshBuckets =
    copy(child = c)
}

object LshBuckets {

  /** Kernel body, shared by interpreted eval and codegen. An invalid
    * vector (dimension ≠ plane length, or any null element — both of
    * which null every plane dot) yields ALL-ZERO buckets, mirroring the
    * declarative rendering's otherwise-branch. */
  def buckets(v: ArrayData, ps: Array[Array[Double]], tables: Int,
      planesPer: Int, isFloat: Boolean): ArrayData = {
    val out = new Array[Int](tables)
    val dim = if (ps.length > 0) ps(0).length else 0
    if (v.numElements() != dim) return new GenericArrayData(out)
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return new GenericArrayData(out)
      x(j) = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
      j += 1
    }
    var t = 0
    while (t < tables) {
      var b = 0
      var p = 0
      while (p < planesPer) {
        val plane = ps(t * planesPer + p)
        var s = 0.0
        j = 0
        while (j < dim) { s += x(j) * plane(j); j += 1 }
        if (s > 0) b |= 1 << p
        p += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: per-table LSH bucket ids for each vector.
    * `planes` must hold `tables * planesPer` rows. */
  def lshBuckets(v: Column, planes: Broadcast[Array[Array[Double]]],
      tables: Int, planesPer: Int): Column =
    graftshim.toColumn(LshBuckets(graftshim.toExpression(v), planes,
      tables, planesPer))
}
