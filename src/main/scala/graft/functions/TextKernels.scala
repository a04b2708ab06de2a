package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the hot per-document text paths (shingling, MinHash,
  * SimHash). Each is a single tight JVM pass over the document invoked via
  * one generated static call inside whole-stage codegen.
  *
  * Why: the declarative formulations evaluate interpreted higher-order
  * lambdas per element — tokens × permutations ≈ 3–7k boxed evaluations
  * per document (tens of millions per million documents). Semantics are
  * kept EXACTLY equal to the declarative rendering (asserted in
  * graft.KernelSpec):
  *  - tokenization = `filter(split(lower(text), "\s+"), length > 0)`:
  *    UTF8String.toLowerCase + java regex split, Spark's own machinery;
  *  - shingle hash = `xxhash64(concat_ws(" ", t_i, t_i+1, t_i+2))` (XXH64,
  *    seed 42, over the UTF-8 bytes — via [[XxHash64Function]]);
  *  - MinHash permutation = `pmod(pmod(h, p) * a + b, p)` with the same
  *    fixed LCG-derived (a, b) table, p = 2^31 - 1;
  *  - SimHash = sign of per-bit ±1 sums over token occurrences.
  */
object TextKernels {

  val MersenneP: Long = 2147483647L
  val NumPerms: Int = 64

  /** Fixed LCG-derived universal-hash parameters (seed 42) — the minhash
    * permutation table, reproducible across runs and cluster sizes. */
  val perms: Array[(Long, Long)] = {
    var x = 42L
    def next(): Long = {
      x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; x
    }
    Array.fill(NumPerms)(((next() % (MersenneP - 1)) + 1, next() % MersenneP))
  }

  private val WS = Pattern.compile("\\s+")

  private def tokens(s: UTF8String): Array[String] =
    WS.split(s.toLowerCase.toString, -1).filter(_.nonEmpty)

  private def hashString(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)

  private def shingleLongs(s: UTF8String): Array[Long] = {
    val t = tokens(s)
    if (t.length < 3) Array.emptyLongArray
    else {
      val out = new Array[Long](t.length - 2)
      var i = 0
      while (i < out.length) {
        out(i) = hashString(t(i) + " " + t(i + 1) + " " + t(i + 2))
        i += 1
      }
      out
    }
  }

  /** Codegen entry: word-3-shingle xxhash64 array. */
  def shingleArray(s: UTF8String): GenericArrayData =
    new GenericArrayData(shingleLongs(s))

  /** Codegen entry: DISTINCT word-3-shingle hashes, sorted — the per-doc
    * shingle SET. Exploding this equals `explode(shingleArray).distinct()`
    * per (doc, shingle) without the global distinct's shuffle. */
  def shingleSet(s: UTF8String): GenericArrayData = {
    val hs = shingleLongs(s)
    java.util.Arrays.sort(hs)
    var n = 0
    var i = 0
    while (i < hs.length) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(n) = hs(i); n += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, n))
  }

  /** Codegen entry: 64-permutation MinHash signature over the shingle set
    * (seed = [p,...,p] for <3-token docs, like the declarative fold). */
  def minhashSig(s: UTF8String): GenericArrayData = {
    val hs = shingleLongs(s)
    val sig = Array.fill(NumPerms)(MersenneP)
    var i = 0
    while (i < hs.length) {
      val h31 = java.lang.Math.floorMod(hs(i), MersenneP)
      var k = 0
      while (k < NumPerms) {
        val (a, b) = perms(k)
        val v = java.lang.Math.floorMod(h31 * a + b, MersenneP)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Codegen entry: 64-bit SimHash (sign of per-bit ±1 sums over token
    * occurrences; bit k of xxhash64(token) votes on bit k). */
  def simhash(s: UTF8String): Long = {
    val t = tokens(s)
    val acc = new Array[Int](64)
    var i = 0
    while (i < t.length) {
      val h = hashString(t(i))
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) acc(k) += 1 else acc(k) -= 1
        k += 1
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      if (acc(k) > 0) fp |= (1L << k)
      k += 1
    }
    fp
  }

  /** Codegen entry: sorted DISTINCT xxhash64 hashes of word n-grams (n
    * tokens joined by a single space) — the per-doc n-gram SET for the
    * exact-substring dedup and decontamination paths. Hash-identical to
    * the declarative `array_distinct(transform(sequence(1, size-n+1),
    * i => xxhash64(concat_ws(" ", slice(l, i, n)))))` (asserted in
    * KernelSpec — same tokens, same join, same XXH64 seed 42); the order
    * differs (sorted vs first-occurrence) but every consumer explodes the
    * array into a bag, where order is immaterial. Empty for docs shorter
    * than n tokens — the declarative form needs a when-guard because
    * `sequence(1, size-n+1)` runs DESCENDING when size < n; here it's a
    * plain bounds check. */
  def ngramSet(s: UTF8String, n: Int): GenericArrayData = {
    val t = tokens(s)
    if (t.length < n) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](t.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < hs.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(t(i + j))
        j += 1
      }
      hs(i) = hashString(sb.toString)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var m = 0
    i = 0
    while (i < hs.length) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(m) = hs(i); m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, m))
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  private def toHex(bs: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bs.length * 2)
    var i = 0
    while (i < bs.length) {
      out(2 * i) = HexDigits((bs(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(bs(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Codegen entry: document fingerprint — the lexicographic-min md5 (hex
    * string, like Spark's `md5`) over word 3-shingles; md5 of the RAW
    * text's UTF-8 bytes for sub-3-token docs. Exactly equals the
    * declarative `coalesce(when(size >= 3, array_min(transform(...,
    * md5(concat_ws(" ", ...))))), md5(text))` (asserted in KernelSpec):
    * min over lowercase-hex strings orders identically to unsigned byte
    * comparison of the digests, so the digests are compared raw and
    * hex-encoded once at the end. */
  def minShingleMd5(s: UTF8String): UTF8String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val t = tokens(s)
    if (t.length < 3) return toHex(md.digest(s.getBytes))
    var best: Array[Byte] = null
    var i = 0
    while (i + 2 < t.length) {
      md.reset()
      md.update((t(i) + " " + t(i + 1) + " " + t(i + 2))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      if (best == null || java.util.Arrays.compareUnsigned(d, best) < 0)
        best = d
      i += 1
    }
    toHex(best)
  }

  def shingleHashes64(text: Column): Column =
    graftshim.toColumn(ShingleHashes64(graftshim.toExpression(text)))
  def shingleSet64(text: Column): Column =
    graftshim.toColumn(ShingleSet64(graftshim.toExpression(text)))
  def minhashSig64(text: Column): Column =
    graftshim.toColumn(MinHashSig64(graftshim.toExpression(text)))
  def simHash64(text: Column): Column =
    graftshim.toColumn(SimHash64(graftshim.toExpression(text)))
  def minShingleMd5Col(text: Column): Column =
    graftshim.toColumn(MinShingleMd5(graftshim.toExpression(text)))
  def ngramSet64(text: Column, n: Int): Column =
    graftshim.toColumn(NGramSet64(graftshim.toExpression(text), n))
}

/** Base for string → kernel expressions: one generated static call. */
sealed trait TextKernelExpr extends UnaryExpression {
  protected def kernelMethod: String

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.$kernelMethod($c)")
}

case class ShingleHashes64(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes64"
  override protected def kernelMethod: String = "shingleArray"
  override def nullSafeEval(v: Any): Any =
    TextKernels.shingleArray(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): ShingleHashes64 =
    copy(child = c)
}

case class ShingleSet64(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_set64"
  override protected def kernelMethod: String = "shingleSet"
  override def nullSafeEval(v: Any): Any =
    TextKernels.shingleSet(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): ShingleSet64 =
    copy(child = c)
}

case class MinHashSig64(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig64"
  override protected def kernelMethod: String = "minhashSig"
  override def nullSafeEval(v: Any): Any =
    TextKernels.minhashSig(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): MinHashSig64 =
    copy(child = c)
}

case class SimHash64(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def kernelMethod: String = "simhash"
  override def nullSafeEval(v: Any): Any =
    TextKernels.simhash(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Parameterized-n variant of [[ShingleSet64]]: `n` is a plan-time
  * constant (it sizes the kernel's inner loop), not a child expression.
  *
  * Null-input note: NULL text yields NULL (standard unary null
  * propagation), whereas the declarative rendering this kernel is
  * hash-parity with (`array_distinct(transform(...))` under a
  * `when(size >= n)...otherwise(array())`) yields an EMPTY ARRAY for
  * NULL text through its otherwise-branch. All in-repo consumers explode
  * the result (both forms contribute zero rows), but a caller using
  * `size(...)` or array ops directly sees NULL here vs 0/[] there. */
case class NGramSet64(child: Expression, n: Int) extends TextKernelExpr {
  require(n >= 2, s"need n >= 2, got n=$n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_set64"
  override protected def kernelMethod: String = "ngramSet"
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.ngramSet($c, $n)")
  override def nullSafeEval(v: Any): Any =
    TextKernels.ngramSet(v.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(c: Expression): NGramSet64 =
    copy(child = c)
}

case class MinShingleMd5(child: Expression) extends TextKernelExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "min_shingle_md5"
  override protected def kernelMethod: String = "minShingleMd5"
  override def nullSafeEval(v: Any): Any =
    TextKernels.minShingleMd5(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): MinShingleMd5 =
    copy(child = c)
}
