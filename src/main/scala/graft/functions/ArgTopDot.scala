package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._

/** Native (whole-stage-codegen) top-k centroid selection by dot product,
  * with the centroid matrix shipped as a Spark BROADCAST variable — once
  * per executor — instead of rendered into the expression tree.
  *
  * `ArgTopDot(v, C, k)` returns the indices of the `k` rows of `C`
  * maximizing `Σ_j v(j)·C(i)(j)`, ordered by (dot DESC, index DESC) — the
  * exact order of the declarative rendering
  * `reverse(array_sort(array(struct(dotf(v, c_0), 0), ..., struct(dotf(v,
  * c_{n-1}), n-1))))` (lexicographic struct comparison: ties on the dot
  * break toward the LARGER index), and each dot accumulates left-to-right
  * in IEEE double exactly like [[DotF]] — so `k = 1` is bit-identical to
  * `array_max(array(struct(dotf(v, c_i), i)...)).i` and `k = nprobe` to the
  * reverse-sorted slice. Parity is asserted in graft.KernelSpec.
  *
  * Why not the literal rendering: `array(struct(dotf(v, lit(c_i)), i))`
  * grows the expression tree — and the generated Java — LINEARLY in nlist.
  * At the production IVF regime (nlist in the thousands, the scale the
  * `bucketBy(nlist)` story in [[graft.operators.SimilarityOps.ivfKnnJoin]]
  * targets) that explodes codegen size past JIT limits and re-ships the
  * matrix inside every serialized task. Here the tree is ONE node of
  * constant size, the matrix rides the torrent broadcast, and the per-row
  * work is a primitive nlist×dim loop inside whole-stage codegen.
  *
  * Null result when the vector's length differs from the centroid dim or
  * any element is null (mirrors [[DotF]]'s contract). The reference has no
  * similarity surface (payloads are opaque bytes,
  * /root/reference/src/streams.ts:12-13); this supports the ANN additions.
  */
case class ArgTopDot(child: Expression,
    centroids: Broadcast[Array[Array[Double]]], k: Int)
    extends UnaryExpression {

  require(k >= 1, s"need k >= 1, got k=$k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"arg_top_dot requires an array<float>/array<double> argument, got " +
        other.catalogString)
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "arg_top_dot"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    ArgTopDot.topDot(v.asInstanceOf[ArrayData], centroids.value, k, isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // dereference the broadcast ONCE per codegen instance (executor-side
    // init), not per row: the generated loop reads a plain double[][]
    val bcRef = ctx.addReferenceObj("argTopDotBc", centroids,
      classOf[Broadcast[Array[Array[Double]]]].getName)
    val mat = ctx.addMutableState("double[][]", "argTopDotMat",
      v => s"$v = (double[][]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        |${ev.value} = graft.functions.ArgTopDot.topDot($c, $mat, $k, $isFloat);
        |${ev.isNull} = ${ev.value} == null;
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): ArgTopDot =
    copy(child = c)
}

object ArgTopDot {

  /** Kernel body, shared verbatim by interpreted eval and codegen (same
    * discipline as [[TextKernels]]). Returns null on dim mismatch or a
    * null element; otherwise the top-`k` (dot DESC, index DESC) centroid
    * indices. O(nlist·dim) for the dots + O(nlist·k) selection — no
    * allocation beyond the two primitive scratch arrays and the result. */
  def topDot(v: ArrayData, cs: Array[Array[Double]], k: Int,
      isFloat: Boolean): ArrayData = {
    val n = cs.length
    val dim = if (n > 0) cs(0).length else 0
    if (v.numElements() != dim) return null
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      x(j) = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
      j += 1
    }
    val dots = new Array[Double](n)
    var i = 0
    while (i < n) {
      val c = cs(i)
      var s = 0.0
      j = 0
      while (j < dim) { s += x(j) * c(j); j += 1 }
      dots(i) = s
      i += 1
    }
    val kk = if (k < n) k else n
    val out = new Array[Int](kk)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < kk) {
      var best = -1
      i = 0
      while (i < n) {
        // Spark's double ordering (SQLOrderingUtil.compareDoubles): == first
        // so -0.0 ties 0.0, then Double.compare so NaN ranks LARGEST — keeps
        // bit-parity with the struct-sort rendering even for NaN-bearing
        // inputs (unreachable via normalizedVecs, but this is a library
        // entry point).
        if (!taken(i)) {
          if (best < 0) best = i
          else {
            val cmp = if (dots(i) == dots(best)) 0
              else java.lang.Double.compare(dots(i), dots(best))
            if (cmp > 0 || (cmp == 0 && i > best)) best = i
          }
        }
        i += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: top-`k` centroid indices for each vector. */
  def argTopDot(v: Column, centroids: Broadcast[Array[Array[Double]]],
      k: Int): Column =
    graftshim.toColumn(ArgTopDot(graftshim.toExpression(v), centroids, k))

  /** Convenience: the single best centroid index (`k = 1`). */
  def argMaxDot(v: Column, centroids: Broadcast[Array[Array[Double]]]): Column =
    org.apache.spark.sql.functions.element_at(argTopDot(v, centroids, 1), 1)
}
