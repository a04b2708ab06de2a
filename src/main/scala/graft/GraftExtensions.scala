package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotF, MinHashSig64, MinShingleMd5, NGramSet64, ShingleHashes64, ShingleSet64, SimHash64}

/** Session extensions for the engine's native expressions.
  *
  * Registers `dotf(array, array) -> double` plus the text kernels
  * (`shingle_hashes64`, `minhash_sig64`, `simhash64`) so SQL users (and
  * `call_function`) get the codegen'd paths. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`; the
  * Column-level APIs (graft.functions._) work without it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    type Expr = org.apache.spark.sql.catalyst.expressions.Expression
    ext.injectFunction((
      FunctionIdentifier("dotf"),
      new ExpressionInfo(classOf[DotF].getName, "dotf"),
      (children: Seq[Expr]) => DotF(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes64"),
      new ExpressionInfo(classOf[ShingleHashes64].getName, "shingle_hashes64"),
      (children: Seq[Expr]) => ShingleHashes64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("shingle_set64"),
      new ExpressionInfo(classOf[ShingleSet64].getName, "shingle_set64"),
      (children: Seq[Expr]) => ShingleSet64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig64"),
      new ExpressionInfo(classOf[MinHashSig64].getName, "minhash_sig64"),
      (children: Seq[Expr]) => MinHashSig64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expr]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("min_shingle_md5"),
      new ExpressionInfo(classOf[MinShingleMd5].getName, "min_shingle_md5"),
      (children: Seq[Expr]) => MinShingleMd5(children.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_normalize"),
      new ExpressionInfo(classOf[graft.functions.VecNormalize].getName,
        "vec_normalize"),
      (children: Seq[Expr]) => graft.functions.VecNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("list_pairs"),
      new ExpressionInfo(classOf[graft.functions.ListPairs].getName,
        "list_pairs"),
      (children: Seq[Expr]) => graft.functions.ListPairs(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_bucket_pairs"),
      new ExpressionInfo(classOf[graft.functions.MinhashBucketPairs].getName,
        "minhash_bucket_pairs"),
      (children: Seq[Expr]) =>
        graft.functions.MinhashBucketPairs(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash_bucket_pairs"),
      new ExpressionInfo(classOf[graft.functions.SimhashBucketPairs].getName,
        "simhash_bucket_pairs"),
      (children: Seq[Expr]) =>
        graft.functions.SimhashBucketPairs(children.head)))
    ext.injectFunction((
      FunctionIdentifier("ngram_set64"),
      new ExpressionInfo(classOf[NGramSet64].getName, "ngram_set64"),
      (children: Seq[Expr]) => {
        require(children.length == 2,
          s"ngram_set64(text, n) takes 2 arguments, got ${children.length}")
        require(children(1).foldable,
          "ngram_set64(text, n): n must be a literal")
        val n = children(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => throw new IllegalArgumentException(
            s"ngram_set64(text, n): n must be a non-null INT literal, got " +
              (if (other == null) "NULL" else other.getClass.getSimpleName))
        }
        NGramSet64(children(0), n)
      }))
  }
}
