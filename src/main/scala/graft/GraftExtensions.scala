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

  private type Expr = org.apache.spark.sql.catalyst.expressions.Expression

  /** Every registration goes through an arity gate so a wrong-arg-count SQL
    * call fails with the function's signature, not a bare
    * NoSuchElementException out of `children.head`. */
  private def arity(children: Seq[Expr], n: Int, sig: String): Seq[Expr] = {
    require(children.length == n,
      s"$sig takes $n argument${if (n == 1) "" else "s"}, " +
        s"got ${children.length}")
    children
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def one(name: String, sig: String, cls: Class[_], mk: Expr => Expr): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        (children: Seq[Expr]) => mk(arity(children, 1, sig).head)))

    ext.injectFunction((
      FunctionIdentifier("dotf"),
      new ExpressionInfo(classOf[DotF].getName, "dotf"),
      (children: Seq[Expr]) => {
        val c = arity(children, 2, "dotf(a, b)")
        DotF(c(0), c(1))
      }))
    one("shingle_hashes64", "shingle_hashes64(text)",
      classOf[ShingleHashes64], ShingleHashes64(_))
    one("shingle_set64", "shingle_set64(text)",
      classOf[ShingleSet64], ShingleSet64(_))
    one("minhash_sig64", "minhash_sig64(shingles)",
      classOf[MinHashSig64], MinHashSig64(_))
    one("simhash64", "simhash64(shingles)",
      classOf[SimHash64], SimHash64(_))
    one("min_shingle_md5", "min_shingle_md5(text)",
      classOf[MinShingleMd5], MinShingleMd5(_))
    one("vec_normalize", "vec_normalize(vec)",
      classOf[graft.functions.VecNormalize], graft.functions.VecNormalize(_))
    one("list_pairs", "list_pairs(ids)",
      classOf[graft.functions.ListPairs], graft.functions.ListPairs(_))
    one("minhash_bucket_pairs", "minhash_bucket_pairs(bucket)",
      classOf[graft.functions.MinhashBucketPairs],
      graft.functions.MinhashBucketPairs(_))
    one("simhash_bucket_pairs", "simhash_bucket_pairs(bucket)",
      classOf[graft.functions.SimhashBucketPairs],
      graft.functions.SimhashBucketPairs(_))
    ext.injectFunction((
      FunctionIdentifier("ngram_set64"),
      new ExpressionInfo(classOf[NGramSet64].getName, "ngram_set64"),
      (children: Seq[Expr]) => {
        arity(children, 2, "ngram_set64(text, n)")
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
