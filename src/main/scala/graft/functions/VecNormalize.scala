package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._

/** Native (whole-stage-codegen) L2 normalization of a numeric vector.
  *
  * `VecNormalize(v) = v / sqrt(Σ v(i)²)` in IEEE double, with the norm
  * accumulated left-to-right exactly like [[DotF]](v, v) and each element
  * divided in order — bit-identical to the declarative rendering
  * `transform(v, x -> double(x) / sqrt(dotf(v, v)))` on every non-zero
  * vector (asserted in graft.KernelSpec / KernelPropertySpec). A ZERO (or
  * empty) vector returns NULL — it has no direction — which folds the
  * `filter(nrm > 0)` guard consumers previously carried into one
  * `isNotNull` filter. Null-input note: a null ELEMENT nulls the whole
  * result here, where the rendering nulls only that element's slot; lists
  * with null elements never reach this path (documented, same caveat
  * style as NGramSet64).
  *
  * Why an Expression: the rendering evaluates one interpreted lambda call
  * per element — on a full-corpus normalization pass (the IVF paths'
  * first stage over every embedding) that is dim interpreted dispatches
  * per row where this kernel is one primitive loop inside whole-stage
  * codegen. */
case class VecNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_normalize requires an array<float>/array<double> argument, " +
        s"got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_normalize"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    VecNormalize.normalize(v.asInstanceOf[ArrayData], isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        |${ev.value} = graft.functions.VecNormalize.normalize($c, $isFloat);
        |${ev.isNull} = ${ev.value} == null;
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecNormalize =
    copy(child = c)
}

object VecNormalize {

  /** Kernel body, shared by interpreted eval and codegen. Returns null
    * for an empty/zero/null-element vector. */
  def normalize(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    if (n == 0) return null
    val x = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val xi = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      x(i) = xi
      s += xi * xi
      i += 1
    }
    val nrm = math.sqrt(s)
    if (!(nrm > 0)) return null
    i = 0
    while (i < n) {
      x(i) = x(i) / nrm
      i += 1
    }
    new GenericArrayData(x)
  }

  /** Column-API entry point. */
  def vecNormalize(v: Column): Column =
    graftshim.toColumn(VecNormalize(graftshim.toExpression(v)))
}
