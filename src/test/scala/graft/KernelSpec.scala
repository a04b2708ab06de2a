package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextKernels
import graft.functions.bindOnce

/** The native text kernels must be EXACTLY equal to the declarative
  * higher-order-function formulations they replaced — same tokenizer
  * (`filter(split(lower(text), "\s+"), length > 0)`), same xxhash64 (seed
  * 42), same permutation table, same sign rule — asserted row by row over
  * the corpus. */
class KernelSpec extends SparkSpec {

  private def toks(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  /** Declarative reference: shingle hashes via HOFs. */
  private def shingleHashesHof(c: Column): Column =
    bindOnce(toks(c), l =>
      when(size(l) >= 3,
        transform(sequence(lit(1), size(l) - 2),
          i => xxhash64(concat_ws(" ", element_at(l, i), element_at(l, i + 1),
            element_at(l, i + 2)))))
        .otherwise(array().cast("array<bigint>")))

  /** Declarative reference: 64-perm minhash fold. */
  private def minhashSigHof(c: Column): Column = {
    val p = TextKernels.MersenneP
    val permsLit = array(TextKernels.perms.map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b")) }.toSeq: _*)
    aggregate(
      transform(shingleHashesHof(c), h =>
        transform(permsLit, pr =>
          pmod(pmod(h, lit(p)) * pr.getField("a") + pr.getField("b"), lit(p)))),
      array_repeat(lit(p), TextKernels.NumPerms),
      (acc, hs) => zip_with(acc, hs, (x, y) => least(x, y)))
  }

  /** Declarative reference: simhash sign-of-sums fold. */
  private def simhashHof(c: Column): Column = {
    val masks = typedLit((0 until 64).map(k => 1L << k))
    val counts = aggregate(
      transform(toks(c), t => xxhash64(t)),
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        transform(masks, m => when(h.bitwiseAND(m) =!= 0, 1L).otherwise(-1L)),
        (a, b) => a + b))
    aggregate(zip_with(counts, masks, (v, m) => when(v > 0, m).otherwise(0L)),
      lit(0L), (fp, b) => fp.bitwiseOR(b))
  }

  private def docs = graft.sources.Tables(spark, sf, "documents")

  test("ShingleHashes64 equals the declarative shingle pipeline on every doc") {
    val bad = docs.select(
      TextKernels.shingleHashes64(col("text")).as("native"),
      shingleHashesHof(col("text")).as("hof"))
      .filter(not(col("native") === col("hof")))
      .count()
    assert(bad == 0)
  }

  test("ShingleSet64 equals sorted array_distinct of the shingle pipeline") {
    val bad = docs.select(
      TextKernels.shingleSet64(col("text")).as("native"),
      array_sort(array_distinct(shingleHashesHof(col("text")))).as("hof"))
      .filter(not(col("native") === col("hof")))
      .count()
    assert(bad == 0)
  }

  test("MinHashSig64 equals the declarative 64-perm fold on every doc") {
    val bad = docs.select(
      TextKernels.minhashSig64(col("text")).as("native"),
      minhashSigHof(col("text")).as("hof"))
      .filter(not(col("native") === col("hof")))
      .count()
    assert(bad == 0)
  }

  test("SimHash64 equals the declarative sign-of-sums fold on every doc") {
    val bad = docs.select(
      TextKernels.simHash64(col("text")).as("native"),
      simhashHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(bad == 0)
  }

  /** Declarative reference: distinct n-gram hashes (first-occurrence
    * order) — sorted for comparison against the kernel's sorted set. */
  private def ngramSetHof(c: Column, n: Int): Column =
    array_sort(bindOnce(toks(c), l =>
      when(size(l) >= n,
        array_distinct(transform(sequence(lit(1), size(l) - (n - 1)),
          i => xxhash64(concat_ws(" ", slice(l, i, lit(n)))))))
        .otherwise(array().cast("array<bigint>"))))

  test("NGramSet64 equals sorted declarative distinct n-gram hashes (n=2,8)") {
    Seq(2, 8).foreach { n =>
      val bad = docs.select(
        TextKernels.ngramSet64(col("text"), n).as("native"),
        ngramSetHof(col("text"), n).as("hof"))
        .filter(not(col("native") === col("hof")))
        .count()
      assert(bad == 0, s"n=$n")
    }
  }

  test("NGramSet64 matches declarative on edge cases") {
    val s = spark
    import s.implicits._
    val edge = Seq("", "one", "one two", "a b a b a b", "x\t y \n z w",
      "Ünïcode HÉRE tökens wrap", "exactly eight tokens one two three four five")
      .toDF("text")
    Seq(2, 3, 8).foreach { n =>
      val bad = edge.select(
        TextKernels.ngramSet64(col("text"), n).as("native"),
        ngramSetHof(col("text"), n).as("hof"))
        .filter(not(col("native") === col("hof")))
        .count()
      assert(bad == 0, s"n=$n")
    }
  }

  test("MinShingleMd5 equals the declarative min-md5 fingerprint on every doc") {
    val bad = docs.select(
      TextKernels.minShingleMd5Col(col("text")).as("native"),
      graft.operators.TextOps.fingerprintDeclarative(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(bad == 0)
  }

  test("MinShingleMd5 matches declarative on edge cases (short, unicode, whitespace)") {
    val s = spark
    import s.implicits._
    val edge = Seq("", "one", "one two", "one two three", "a  b\tc\nd",
      "Ünïcode Tökens HÉRE again", "same same same same",
      "  leading and trailing  ", "MiXeD CaSe ToKeNs")
      .toDF("text")
    val bad = edge.select(
      TextKernels.minShingleMd5Col(col("text")).as("native"),
      graft.operators.TextOps.fingerprintDeclarative(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(bad == 0)
  }

  test("ArgTopDot equals the literal struct-max / reverse-sort rendering on every embedding") {
    import graft.functions.ArgTopDot.{argMaxDot, argTopDot}
    import graft.functions.DotF.dotf
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    // deterministic centroids: 8 corpus embeddings, normalized — plus one
    // DUPLICATE so exact dot ties exercise the (dot DESC, index DESC)
    // tie order the kernel must share with the struct-max rendering
    val base = emb.orderBy("vec_id").limit(8)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      .map { a =>
        val n = math.sqrt(a.map(x => x * x).sum)
        a.map(_ / n)
      }
    val cents = base :+ base(0).clone()
    val bc = spark.sparkContext.broadcast(cents)
    val structs = array(cents.zipWithIndex.toSeq.map { case (c, i) =>
      struct(dotf(col("embedding"), typedLit(c.toSeq)).as("d"),
        lit(i).as("i"))
    }: _*)
    val literalMax = array_max(structs).getField("i")
    val literalTop3 = transform(
      slice(reverse(array_sort(structs)), 1, 3), s => s.getField("i"))
    val bad = emb.select(
      argMaxDot(col("embedding"), bc).as("km"), literalMax.as("lm"),
      argTopDot(col("embedding"), bc, 3).as("kt"), literalTop3.as("lt"))
      .filter(col("km") =!= col("lm") || not(col("kt") === col("lt")))
      .count()
    assert(bad == 0)
  }

  test("ArgTopDot keeps struct-sort parity on NaN dots (Spark total order: NaN largest)") {
    // unreachable via normalizedVecs, but argTopDot is a library entry
    // point: a NaN dot must rank LARGEST, exactly like Spark's double
    // ordering in the struct-sort rendering (SQLOrderingUtil semantics)
    import graft.functions.ArgTopDot.{argMaxDot, argTopDot}
    import graft.functions.DotF.dotf
    val s = spark
    import s.implicits._
    val cents: Array[Array[Double]] = Array(
      Array(Double.NaN, 0.0), Array(0.5, 0.0), Array(0.9, 0.0))
    val bc = spark.sparkContext.broadcast(cents)
    val df = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(-1.0, 2.0)))
      .toDF("id", "v")
    val structs = array(cents.zipWithIndex.toSeq.map { case (c, i) =>
      struct(dotf(col("v"), typedLit(c.toSeq)).as("d"), lit(i).as("i"))
    }: _*)
    val literalTop = transform(
      reverse(array_sort(structs)), x => x.getField("i"))
    val rows = df.select(
      argMaxDot(col("v"), bc).as("km"),
      argTopDot(col("v"), bc, 3).as("kt"), literalTop.as("lt"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"NaN order diverged: $r")
      assert(r.getInt(0) == r.getSeq[Int](1).head)
    }
    // the NaN-dot centroid (index 0) outranks every finite dot
    assert(rows.forall(_.getInt(0) == 0))
  }

  test("minhash_bucket_pairs rejects ragged signature lengths loudly") {
    // with ragged signatures the agreement estimate would depend on
    // bucket element ORDER — the kernel fails instead of guessing
    val e = intercept[Exception](
      spark.sql(
        """SELECT minhash_bucket_pairs(array(
          |  struct(1L AS doc_id, array(1L, 2L) AS sig),
          |  struct(2L AS doc_id, array(1L) AS sig)))""".stripMargin)
        .collect())
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("uniform signature lengths"))
  }

  test("SQL-registered kernels reject wrong arity with the signature, not NoSuchElement") {
    def msgOf(sql: String): String = {
      val ex = intercept[Exception](spark.sql(sql).collect())
      ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    }
    assert(msgOf("SELECT vec_normalize()").contains("vec_normalize(vec) takes 1 argument"))
    assert(msgOf("SELECT list_pairs(array(1L), 2)").contains("list_pairs(ids) takes 1 argument"))
    assert(msgOf("SELECT minhash_bucket_pairs()").contains("takes 1 argument"))
    assert(msgOf("SELECT simhash_bucket_pairs()").contains("takes 1 argument"))
    assert(msgOf("SELECT dotf(array(1.0D))").contains("dotf(a, b) takes 2 arguments"))
    assert(msgOf("SELECT simhash64()").contains("takes 1 argument"))
  }

  test("TextStats kernels equal the declarative entropy/repetition folds on every doc") {
    val e = docs.select(
      graft.functions.TextStats.tokenEntropyStats(col("text")).as("n"),
      graft.operators.TextOps.tokenEntropyStatsDeclarative(col("text")).as("h"))
      .filter(not(col("n") <=> col("h")))
      .count()
    assert(e == 0)
    val r = docs.select(
      graft.functions.TextStats.tokenRepetitionStats(col("text")).as("n"),
      graft.operators.PipelineOps.repetitionStatsDeclarative(col("text")).as("h"))
      .filter(col("n.n_tok") =!= col("h.n_tok") ||
        col("n.n_uniq") =!= col("h.n_uniq") ||
        col("n.n_bi") =!= col("h.b.n_bi") ||
        col("n.n_uniq_bi") =!= col("h.b.n_uniq_bi"))
      .count()
    assert(r == 0)
  }

  test("VecNormalize equals the transform-divide rendering on every embedding") {
    import graft.functions.DotF.dotf
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val nrm = sqrt(dotf(col("embedding"), col("embedding")))
    val hof = transform(col("embedding"), x => x.cast("double") / nrm)
    val bad = emb.select(
      graft.functions.VecNormalize.vecNormalize(col("embedding")).as("n"),
      hof.as("h"))
      .filter(not(col("n") === col("h")))
      .count()
    assert(bad == 0)
  }

  test("ListPairs equals the flatten/transform/slice rendering on the corpus's buckets") {
    // real bucket lists: the shingle index's capped doc lists
    val ds = docs
      .select(col("doc_id"),
        explode(TextKernels.shingleSet64(col("text"))).as("sh64"))
      .groupBy("sh64").agg(collect_list("doc_id").as("ds"))
    val hof = flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + 2, size(col("ds"))), y =>
        struct(least(x, y).as("da"), greatest(x, y).as("db")))))
    val bad = ds.select(
      graft.functions.ListPairs.listPairs(col("ds")).as("native"),
      hof.as("hof"))
      .filter(not(col("native") === col("hof")))
      .count()
    assert(bad == 0)
  }

  test("Minhash/SimhashBucketPairs equal the declarative renderings on corpus buckets") {
    // synthetic LSH-shaped buckets straight off the corpus kernels: group
    // docs by a coarse key so buckets hold >1 element, carry real
    // (doc_id, signature) structs through both paths
    val sigs = docs.select(
      monotonically_increasing_id().as("doc_id"),
      TextKernels.minhashSig64(col("text")).as("sig"),
      TextKernels.simHash64(col("text")).as("simhash"),
      (length(col("text")) % 7).as("bkey"))
    val mh = sigs.groupBy("bkey")
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("ms"))
    val mhHof = flatten(transform(col("ms"), (x, i) =>
      transform(slice(col("ms"), i + 2, size(col("ms"))), y =>
        struct(
          least(x.getField("doc_id"), y.getField("doc_id")).as("da"),
          greatest(x.getField("doc_id"), y.getField("doc_id")).as("db"),
          (size(filter(
            zip_with(x.getField("sig"), y.getField("sig"), (p, q) => p === q),
            m => m)) / lit(TextKernels.NumPerms.toDouble)).as("est")))))
    assert(mh.select(
      graft.functions.BucketPairs.minhashBucketPairs(col("ms")).as("n"),
      mhHof.as("h"))
      .filter(not(col("n") === col("h"))).count() == 0)
    val sh = sigs.groupBy("bkey")
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("ms"))
    val shHof = flatten(transform(col("ms"), (x, i) =>
      transform(slice(col("ms"), i + 2, size(col("ms"))), y =>
        struct(
          least(x.getField("doc_id"), y.getField("doc_id")).as("da"),
          greatest(x.getField("doc_id"), y.getField("doc_id")).as("db"),
          bit_count(x.getField("simhash").bitwiseXOR(y.getField("simhash")))
            .as("hamming")))))
    assert(sh.select(
      graft.functions.BucketPairs.simhashBucketPairs(col("ms")).as("n"),
      shHof.as("h"))
      .filter(not(col("n") === col("h"))).count() == 0)
  }

  test("LshBuckets equals the literal bucketCols rendering on every embedding") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    for ((tables, planesPer) <- Seq((8, 2), (4, 5))) {
      val ps = graft.operators.SimilarityOps.planesFor(tables * planesPer)
      val bc = spark.sparkContext.broadcast(ps)
      val literal = array(graft.operators.SimilarityOps
        .bucketCols(col("embedding"), tables, planesPer): _*)
      val bad = emb.select(
        graft.functions.LshBuckets
          .lshBuckets(col("embedding"), bc, tables, planesPer).as("n"),
        literal.as("h"))
        .filter(not(col("n") === col("h")))
        .count()
      assert(bad == 0, s"LshBuckets mismatch at ($tables, $planesPer)")
    }
  }

  test("kernels are SQL-callable via GraftExtensions") {
    val r = spark.sql(
      """SELECT simhash64('a b c') AS s, size(minhash_sig64('a b c d e')) AS n,
        |size(shingle_hashes64('a b c d')) AS h, size(shingle_set64('a b a b a b')) AS u
        |""".stripMargin)
      .collect().head
    assert(r.getLong(0) != 0L && r.getInt(1) == 64)
    assert(r.getInt(2) == 2) // 4 tokens → 2 shingles
    assert(r.getInt(3) == 2) // 'a b a' / 'b a b' repeated → 2 distinct
    val r2 = spark.sql(
      """SELECT size(ngram_set64('a b a b a b', 2)) AS n,
        |length(min_shingle_md5('a b c')) AS m""".stripMargin)
      .collect().head
    assert(r2.getInt(0) == 2) // 'a b' / 'b a' repeated → 2 distinct 2-grams
    assert(r2.getInt(1) == 32) // md5 hex
    // a foldable n (even non-literal) is fine; a NON-foldable n is
    // rejected loudly at plan time, not silently misplanned
    assert(spark.sql("SELECT size(ngram_set64('a b c', size(split('a b', ' ')))) AS n")
      .collect().head.getInt(0) == 2)
    val e = intercept[Exception](
      spark.sql("SELECT ngram_set64('a b c', CAST(rand() * 2 + 2 AS INT))")
        .collect())
    assert(e.getMessage.contains("literal") ||
      Option(e.getCause).exists(_.getMessage.contains("literal")))
    // n as a foldable of another integral type is accepted (widened)...
    assert(spark.sql("SELECT size(ngram_set64('a b c', CAST(2 AS BIGINT))) AS n")
      .collect().head.getInt(0) == 2)
    // ...while wrong arity and a NULL n are rejected with clear messages,
    // not ClassCastException/IndexOutOfBounds or a misleading "n=0"
    def msgOf(sql: String): String = {
      val ex = intercept[Exception](spark.sql(sql).collect())
      ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    }
    assert(msgOf("SELECT ngram_set64('a b c')").contains("2 arguments"))
    assert(msgOf("SELECT ngram_set64('a b c', NULL)").contains("INT literal"))
    assert(msgOf("SELECT ngram_set64('a b c', 2.5)").contains("INT literal"))
    // pair kernels: 3 ids -> 3 unordered pairs; simhash distance 0/1/1...
    val r3 = spark.sql(
      """SELECT size(list_pairs(array(3L, 1L, 2L))) AS np,
        |  list_pairs(array(3L, 1L))[0] AS p0,
        |  simhash_bucket_pairs(array(
        |    struct(1L AS doc_id, 5L AS simhash),
        |    struct(2L AS doc_id, 7L AS simhash)))[0].hamming AS hd,
        |  minhash_bucket_pairs(array(
        |    struct(1L AS doc_id, array(1L, 2L) AS sig),
        |    struct(2L AS doc_id, array(1L, 9L) AS sig)))[0].est AS est
        |""".stripMargin).collect().head
    assert(r3.getInt(0) == 3)
    assert(r3.getStruct(1).getLong(0) == 1L && r3.getStruct(1).getLong(1) == 3L)
    assert(r3.getInt(2) == 1) // 5 xor 7 = 2 -> one bit
    assert(r3.getDouble(3) == 0.5)
    val r4 = spark.sql(
      """SELECT vec_normalize(array(3.0F, 4.0F)) AS u,
        |  vec_normalize(array(0.0F)) AS z""".stripMargin).collect().head
    assert(r4.getSeq[Double](0) == Seq(0.6, 0.8) && r4.isNullAt(1))
  }

  test("FreqItemsAgg: no false negatives above the error band, bounds contain exact counts, merge sums streams") {
    val s = spark
    import s.implicits._
    import graft.functions.FreqItems
    // planted stream: hot_i appears (i+1)*40 times; 200 background
    // singletons force the maxMapSize=64 sketch past its exact regime
    val items = (0 until 5).flatMap(i =>
      Seq.fill((i + 1) * 40)(s"hot_$i")) ++
      (0 until 200).map(i => s"bg_$i")
    val df = items.zipWithIndex
      .map { case (it, ix) => (ix.toLong, it) }.toDF("i", "item")
      .repartition(8)
    val bytes = df
      .agg(FreqItems.freqItemsAgg(col("item"), 64)).head()
      .getAs[Array[Byte]](0)
    val (n, maxErr, cands) = FreqItems.decode(bytes, threshold = 1L)
    assert(n == items.size.toLong, s"stream length $n")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val candMap = cands.map(c => c.item -> c).toMap
    // Misra-Gries guarantee: every item with true count > maxError is
    // retained with exact ∈ [lb, ub]
    exact.filter(_._2 > maxErr).foreach { case (it, cnt) =>
      val c = candMap.getOrElse(it,
        fail(s"$it (count $cnt > maxErr $maxErr) missing from sketch"))
      assert(c.lb <= cnt && cnt <= c.ub,
        s"$it: exact $cnt outside [${c.lb}, ${c.ub}]")
    }
    // bytes-level merge: two half-stream sketches union to the same
    // guarantees over the full stream
    val halves = (0 to 1).map { h =>
      df.filter(col("i") % 2 === h)
        .agg(FreqItems.freqItemsAgg(col("item"), 64)).head()
        .getAs[Array[Byte]](0)
    }
    val merged = FreqItems.mergeBytes(halves(0), halves(1))
    val (n2, maxErr2, cands2) = FreqItems.decode(merged, threshold = 1L)
    assert(n2 == n, s"merged stream length $n2 != $n")
    val cand2Map = cands2.map(c => c.item -> c).toMap
    exact.filter(_._2 > maxErr2).foreach { case (it, cnt) =>
      val c = cand2Map.getOrElse(it,
        fail(s"$it missing from the MERGED sketch"))
      assert(c.lb <= cnt && cnt <= c.ub,
        s"merged $it: exact $cnt outside [${c.lb}, ${c.ub}]")
    }
  }
}
