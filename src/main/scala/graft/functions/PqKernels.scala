package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._

/** Product-quantization kernels (whole-stage-codegen, broadcast codebooks).
  *
  * A PQ codebook is `cb(sub)(code)(j)`: `m` subspaces, `ksub` centroids
  * per subspace, `dsub` dimensions per centroid — `m · dsub` = vector dim.
  * [[PqEncode]] maps a vector to its `m` nearest-centroid codes (argmin
  * squared L2 per subspace); [[PqAdcDot]] scores a CODE array against a
  * raw query vector by asymmetric distance computation (the inner product
  * of the query with the code's reconstruction). Both ship the codebook
  * as a torrent BROADCAST dereferenced once per codegen instance — the
  * same constant-plan-size discipline as [[ArgTopDot]]: one tree node
  * regardless of `m × ksub`, no literal matrices in serialized tasks.
  *
  * Why PQ at all: at 100 TB of fp32 embeddings the database side of a
  * k-NN join cannot afford to ship vectors through a shuffle (64 floats =
  * 256+ bytes/row before framing). PQ codes are `m` small ints (8 bytes
  * at m=8) — a ~30× reduction of the shuffled bytes on the indexed side —
  * while the query side keeps full vectors (the standard asymmetric
  * setup, Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011). The reference has no similarity surface
  * (payloads are opaque bytes, /root/reference/src/streams.ts:12-13);
  * this extends the ANN family (LSH, IVF) with its memory-bound member.
  */
object PqKernels {

  /** Shared argmin-L2 encode body (interpreted eval ≡ codegen). Returns
    * null on dim mismatch (`v.length != m·dsub`) or any null element;
    * otherwise the `m` selected codes. Ties on exact-equal squared
    * distance break toward the SMALLER code index, compared in Spark's
    * double total order (== first so -0.0 ties 0.0, then Double.compare
    * so NaN ranks largest — a NaN distance is never preferred over a
    * finite one). O(ksub·dim) per row, no allocation beyond the result
    * and one scratch vector. */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val m = cb.length
    if (m == 0) return null
    val ksub = cb(0).length
    val dsub = if (ksub > 0) cb(0)(0).length else 0
    if (v.numElements() != m * dsub) return null
    val x = new Array[Double](m * dsub)
    var j = 0
    while (j < m * dsub) {
      if (v.isNullAt(j)) return null
      x(j) = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
      j += 1
    }
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * dsub
      var best = 0
      var bestD = Double.NaN
      var c = 0
      while (c < ksub) {
        val cent = cb(s)(c)
        var d = 0.0
        j = 0
        while (j < dsub) {
          val t = x(base + j) - cent(j)
          d += t * t
          j += 1
        }
        if (c == 0) bestD = d
        else {
          val cmp = if (d == bestD) 0 else java.lang.Double.compare(d, bestD)
          if (cmp < 0) { best = c; bestD = d }
        }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Shared ADC body (interpreted eval ≡ codegen): `Σ_s Σ_j q(s·dsub+j) ·
    * cb(s)(codes(s))(j)`, accumulated left-to-right in IEEE double exactly
    * like [[DotF]] — so the score equals `dotf(q, reconstruction)` bit for
    * bit (pinned in graft.KernelSpec). Null (not an error) on any shape
    * violation: wrong codes length, wrong query dim, out-of-range code,
    * null element — mirroring [[DotF]]'s contract for library surfaces. */
  def adcDot(codes: ArrayData, q: ArrayData,
      cb: Array[Array[Array[Double]]], qIsFloat: Boolean): Any = {
    val m = cb.length
    if (m == 0 || codes.numElements() != m) return null
    val ksub = cb(0).length
    val dsub = if (ksub > 0) cb(0)(0).length else 0
    if (q.numElements() != m * dsub) return null
    var s = 0.0
    var sub = 0
    while (sub < m) {
      if (codes.isNullAt(sub)) return null
      val code = codes.getInt(sub)
      if (code < 0 || code >= ksub) return null
      val cent = cb(sub)(code)
      val base = sub * dsub
      var j = 0
      while (j < dsub) {
        if (q.isNullAt(base + j)) return null
        val qv = if (qIsFloat) q.getFloat(base + j).toDouble
                 else q.getDouble(base + j)
        s += qv * cent(j)
        j += 1
      }
      sub += 1
    }
    s
  }

  /** Column-API entry: PQ codes (`array<int>` of length m) per vector. */
  def pqEncode(v: Column, cb: Broadcast[Array[Array[Array[Double]]]]): Column =
    graftshim.toColumn(PqEncode(graftshim.toExpression(v), cb))

  /** Column-API entry: ADC inner product of a code array and a query. */
  def pqAdcDot(codes: Column, q: Column,
      cb: Broadcast[Array[Array[Array[Double]]]]): Column =
    graftshim.toColumn(
      PqAdcDot(graftshim.toExpression(codes), graftshim.toExpression(q), cb))
}

/** `PqEncode(v, cb)` — the `m` nearest-centroid codes of `v`, one argmin
  * squared-L2 selection per subspace. See [[PqKernels]]. */
case class PqEncode(child: Expression,
    codebooks: Broadcast[Array[Array[Array[Double]]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires an array<float>/array<double> argument, got " +
        other.catalogString)
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], codebooks.value, isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pqEncodeBc", codebooks,
      classOf[Broadcast[Array[Array[Array[Double]]]]].getName)
    val cb = ctx.addMutableState("double[][][]", "pqEncodeCb",
      v => s"$v = (double[][][]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        |${ev.value} = graft.functions.PqKernels.encode($c, $cb, $isFloat);
        |${ev.isNull} = ${ev.value} == null;
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** `PqAdcDot(codes, q, cb)` — asymmetric-distance inner product: the dot
  * of raw query `q` with the reconstruction of `codes`. See [[PqKernels]]. */
case class PqAdcDot(left: Expression, right: Expression,
    codebooks: Broadcast[Array[Array[Array[Double]]]])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(IntegerType, _),
          ArrayType(FloatType, _) | ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_dot requires (array<int> codes, array<float|double> query), " +
        s"got ${l.catalogString} and ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_dot"

  private def qIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(codes: Any, q: Any): Any =
    PqKernels.adcDot(codes.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
      codebooks.value, qIsFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pqAdcBc", codebooks,
      classOf[Broadcast[Array[Array[Array[Double]]]]].getName)
    val cb = ctx.addMutableState("double[][][]", "pqAdcCb",
      v => s"$v = (double[][][]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("adc")
      s"""
        |Object $res = graft.functions.PqKernels.adcDot($a, $b, $cb, $qIsFloat);
        |if ($res == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = ((Double) $res).doubleValue(); }
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}
