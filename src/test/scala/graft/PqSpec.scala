package graft

import org.apache.spark.sql.functions._

import graft.functions.{DotF, PqKernels}
import graft.operators.{PqOps, SimilarityOps}

/** Product-quantization checks: kernel parity with plain-Scala references,
  * ADC ≡ dot-with-reconstruction bit-identity, Lloyd distortion descent,
  * train-once/reuse bit-identity, and IVFPQ recall vs the exact join. */
class PqSpec extends SparkSpec {

  private def embeddings = graft.sources.Tables(spark, sf, "embeddings")

  /** Normalized corpus collected once: (vec_id, ne). */
  private lazy val normalized: Array[(Long, Array[Double])] =
    embeddings
      .select(col("vec_id"),
        graft.functions.VecNormalize.vecNormalize(col("embedding")).as("ne"))
      .filter(col("ne").isNotNull)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  private lazy val exactKnnPairs: Set[(Long, Long)] =
    SparkEntry.queries("q_similarity_knn")(spark, sf)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Collect a `(sub, code, centroid)` table into the kernel shape. */
  private def collectCb(df: org.apache.spark.sql.DataFrame, m: Int,
      ksub: Int): Array[Array[Array[Double]]] = {
    val rows = df.orderBy("sub", "code").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    assert(rows.length == m * ksub)
    Array.tabulate(m, ksub)((s, c) => rows(s * ksub + c)._3)
  }

  /** Plain-Scala argmin-L2 encode (ties -> smaller code). */
  private def refEncode(x: Array[Double],
      cb: Array[Array[Array[Double]]]): Array[Int] = {
    val m = cb.length
    val dsub = cb(0)(0).length
    Array.tabulate(m) { s =>
      var best = 0
      var bestD = Double.MaxValue
      for (c <- cb(s).indices) {
        var d = 0.0
        for (j <- 0 until dsub) {
          val t = x(s * dsub + j) - cb(s)(c)(j)
          d += t * t
        }
        if (d < bestD) { best = c; bestD = d }
      }
      best
    }
  }

  /** Left-to-right IEEE reconstruction dot — [[PqKernels.adcDot]]'s order. */
  private def refAdc(q: Array[Double], codes: Array[Int],
      cb: Array[Array[Array[Double]]]): Double = {
    val dsub = cb(0)(0).length
    var s = 0.0
    for (sub <- cb.indices; j <- 0 until dsub)
      s += q(sub * dsub + j) * cb(sub)(codes(sub))(j)
    s
  }

  test("PqEncode kernel matches the plain-Scala argmin on every embedding") {
    val cbDf = PqOps.pqTrain(embeddings, "vec_id", "embedding", m = 8,
      ksub = 16, iters = 2)
    val cb = collectCb(cbDf, 8, 16)
    val bc = spark.sparkContext.broadcast(cb)
    val got = embeddings
      .select(col("vec_id"),
        graft.functions.VecNormalize.vecNormalize(col("embedding")).as("ne"))
      .select(col("vec_id"), PqKernels.pqEncode(col("ne"), bc).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    assert(got.size == normalized.length)
    normalized.foreach { case (id, x) =>
      assert(got(id).sameElements(refEncode(x, cb)),
        s"encode mismatch on vec $id")
    }
  }

  test("PqAdcDot is bit-identical to dotf(query, reconstruction)") {
    val cb = collectCb(PqOps.pqTrain(embeddings, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 2), 8, 16)
    val bc = spark.sparkContext.broadcast(cb)
    // every (query=vec, codes=its own codes) pair through the kernel
    val got = embeddings
      .select(col("vec_id"),
        graft.functions.VecNormalize.vecNormalize(col("embedding")).as("ne"))
      .select(col("vec_id"),
        PqKernels.pqAdcDot(PqKernels.pqEncode(col("ne"), bc), col("ne"), bc)
          .as("adc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    normalized.foreach { case (id, x) =>
      val expect = refAdc(x, refEncode(x, cb), cb)
      assert(java.lang.Double.doubleToLongBits(got(id)) ==
        java.lang.Double.doubleToLongBits(expect),
        s"adc mismatch on vec $id: ${got(id)} != $expect")
    }
  }

  test("PQ kernels return null (not garbage) on shape violations") {
    val sess = spark
    import sess.implicits._
    val cb = Array.fill(8, 16)(Array.fill(8)(0.1))
    val bc = spark.sparkContext.broadcast(cb)
    // wrong vector dim -> encode null; wrong codes length / out-of-range
    // code -> adc null
    val shortVec = Seq((1L, Seq.fill(63)(0.5))).toDF("id", "v")
    assert(shortVec.select(PqKernels.pqEncode(col("v"), bc))
      .collect().head.isNullAt(0))
    val badCodes = Seq(
      (Seq.fill(7)(0), Seq.fill(64)(0.5)),   // 7 codes for m=8
      (Seq.fill(8)(16), Seq.fill(64)(0.5)),  // code 16 out of range
      (Seq.fill(8)(0), Seq.fill(63)(0.5)))   // query dim mismatch
      .toDF("codes", "q")
    assert(badCodes.select(PqKernels.pqAdcDot(col("codes"), col("q"), bc))
      .collect().forall(_.isNullAt(0)))
  }

  test("Lloyd training: corpus distortion is non-increasing in iters") {
    def distortion(iters: Int): Double = {
      val cb = collectCb(PqOps.pqTrain(embeddings, "vec_id", "embedding",
        m = 8, ksub = 16, iters = iters), 8, 16)
      val dsub = cb(0)(0).length
      normalized.map { case (_, x) =>
        val codes = refEncode(x, cb)
        var d = 0.0
        for (sub <- cb.indices; j <- 0 until dsub) {
          val t = x(sub * dsub + j) - cb(sub)(codes(sub))(j)
          d += t * t
        }
        d
      }.sum / normalized.length
    }
    val d1 = distortion(1)
    val d3 = distortion(3)
    info(f"mean squared reconstruction error: iters=1 $d1%.5f, iters=3 $d3%.5f")
    // Lloyd monotonicity (exact decimal means, full-corpus training);
    // tiny epsilon absorbs the decimal-quantization of the means
    assert(d3 <= d1 + 1e-9, f"distortion rose: $d1%.6f -> $d3%.6f")
    // and the codes must actually compress: more than one code in use
    val cb = collectCb(PqOps.pqTrain(embeddings, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 3), 8, 16)
    val used = normalized.map(n => refEncode(n._2, cb).toSeq).distinct.size
    assert(used > 1, "all vectors encoded identically")
  }

  test("ivfPqKnnJoin with precomputed artifacts is bit-identical to self-training") {
    val ct = SimilarityOps.ivfTrain(embeddings, "vec_id", "embedding",
      nlist = 16)
    val cbDf = PqOps.pqTrain(embeddings, "vec_id", "embedding", m = 8,
      ksub = 16)
    def rows(pc: Option[org.apache.spark.sql.DataFrame],
        pcb: Option[org.apache.spark.sql.DataFrame]) =
      PqOps.ivfPqKnnJoin(embeddings, "vec_id", "embedding", 5, nlist = 16,
        nprobe = 8, precomputedCentroids = pc, precomputedCodebooks = pcb)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(Some(ct), Some(cbDf)) == rows(None, None))
    // malformed codebooks are rejected loudly, not silently dropped
    intercept[Exception](PqOps.ivfPqKnnJoin(embeddings, "vec_id",
      "embedding", 5, precomputedCodebooks =
        Some(cbDf.filter(col("sub") < 4))).collect())
    intercept[Exception](PqOps.ivfPqKnnJoin(embeddings, "vec_id",
      "embedding", 5, m = 4, ksub = 16, precomputedCodebooks =
        Some(cbDf.filter(col("sub") < 4))).collect())
  }

  test("IVFPQ knn join recalls the exact neighbor lists and re-ranks with exact cosines") {
    val ivfpq = PqOps.ivfPqKnnJoin(embeddings, "vec_id", "embedding", 5,
      ksub = 64, nlist = 16, nprobe = 8, refineFactor = 10).cache()
    try {
      val approx = ivfpq.select("va", "vb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exactKnnPairs & approx).size.toDouble / exactKnnPairs.size
      info(f"ivfpq recall@5 = $recall%.3f")
      assert(exactKnnPairs.nonEmpty)
      // bounded above by IVF's recall at the same probes (~0.82 on this
      // noise-level-cosine corpus — see the LSH header note). Measured
      // 0.780 at (ksub=64, refineFactor=10): the ADC shortlist + exact
      // re-rank keeps ~95% of the IVF ceiling. Deterministic; threshold
      // leaves margin only against code changes.
      assert(recall >= 0.7, f"ivfpq recall@5 = $recall%.3f < 0.7")
      // rank structure: contiguous ranks from 1, at most k per query
      val bad = ivfpq.groupBy("va")
        .agg(count(lit(1)).as("n"), min("rk").as("lo"), max("rk").as("hi"))
        .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("n") > 5)
      assert(bad.isEmpty, "ivfpq rank structure broken")
      // survivors carry EXACT cosines: every (va, vb) the exact join also
      // ranked must agree on cos to the last bit (same dotf, same r4)
      val exact = SparkEntry.queries("q_similarity_knn")(spark, sf)
        .select(col("va"), col("vb"), col("cos").as("cos_exact"))
      val mismatch = ivfpq.join(exact, Seq("va", "vb"))
        .filter(col("cos") =!= col("cos_exact")).count()
      assert(mismatch == 0, s"$mismatch refined cosines differ from exact")
    } finally ivfpq.unpersist()
  }

  test("ivfPqSearch holds the IVF ceiling ratio vs the exact two-frame knnSearch (VERDICT r12 #3)") {
    // the retrieval family's memory-bound member: same query/corpus
    // split as knnSearch/ivfSearch, recall graded against BOTH the
    // exact ground truth and the IVF-Flat ceiling at identical probes
    val q = embeddings.filter(col("vec_id") % 10 === 0)
    val c = embeddings.filter(col("vec_id") % 10 =!= 0)
    val exact = SimilarityOps.knnSearch(q, c, "vec_id", "embedding", 5)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps
      .ivfSearch(q, c, "vec_id", "embedding", 5, nlist = 16, nprobe = 8)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = PqOps.ivfPqSearch(q, c, "vec_id", "embedding", 5,
      ksub = 64, nlist = 16, nprobe = 8, refineFactor = 10)
    val pqPairs = pq.select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val rIvf = (exact & ivf).size.toDouble / exact.size
    val rPq = (exact & pqPairs).size.toDouble / exact.size
    info(f"ivfPqSearch recall@5 = $rPq%.3f (IVF ceiling $rIvf%.3f)")
    assert(rPq >= 0.85 * rIvf,
      f"ivfPqSearch recall $rPq%.3f fell below 85%% of the IVF ceiling $rIvf%.3f")
    // rank structure + exact cosines on survivors (same pins as the
    // self-join form)
    val bad = pq.groupBy("va")
      .agg(count(lit(1)).as("n"), min("rk").as("lo"), max("rk").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("n") > 5)
    assert(bad.isEmpty, "ivfPqSearch rank structure broken")
    val exactCos = SimilarityOps.knnSearch(q, c, "vec_id", "embedding", 5)
      .select(col("va"), col("vb"), col("cos").as("cos_exact"))
    val mismatch = pq.join(exactCos, Seq("va", "vb"))
      .filter(col("cos") =!= col("cos_exact")).count()
    assert(mismatch == 0, s"$mismatch refined cosines differ from exact")
  }

  test("ivfPqIndex reuse is bit-identical — the encode-once/search-many session shape") {
    val q = embeddings.filter(col("vec_id") % 10 === 0)
    val c = embeddings.filter(col("vec_id") % 10 =!= 0)
    val ct = SimilarityOps.ivfTrain(c, "vec_id", "embedding", nlist = 16)
    val cbDf = PqOps.pqTrain(c, "vec_id", "embedding", m = 8, ksub = 16)
    val ix = PqOps.ivfPqIndex(c, "vec_id", "embedding", ct, cbDf)
    assert(ix.columns.toSeq == Seq("vec_id", "list", "codes"))
    def rows(pix: Option[org.apache.spark.sql.DataFrame]) =
      PqOps.ivfPqSearch(q, c, "vec_id", "embedding", 5, nlist = 16,
        nprobe = 8, precomputedCentroids = Some(ct),
        precomputedCodebooks = Some(cbDf), precomputedIndex = pix)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(Some(ix)) == rows(None),
      "persisted-index search diverged from in-call derivation")
    // the index alone is not enough: probes need the quantizer, ADC the
    // codebook — fail loudly instead of self-training a MISMATCHED pair
    val bad = intercept[IllegalArgumentException](
      PqOps.ivfPqSearch(q, c, "vec_id", "embedding", 5,
        precomputedIndex = Some(ix)))
    assert(bad.getMessage.contains("precomputedIndex requires"))
  }

  test("index appends compose with search: prior ∪ increment index feeds ivfPqSearch bit-identically (r14 ingest parity)") {
    // the ANN ingest story end-to-end: the standing (vec_id, list,
    // codes) index advances by ivfPqIndex over each increment against
    // the FROZEN prior-trained quantizer + codebook (never retrained at
    // append time — the ivfAppend rule), and a search session consuming
    // the unioned artifact must equal one consuming a from-scratch
    // whole-corpus index
    val q = embeddings.filter(col("vec_id") % 10 === 0)
    val c = embeddings.filter(col("vec_id") % 10 =!= 0)
    val prior = c.filter(col("vec_id") % 4 =!= 1)
    val inc = c.filter(col("vec_id") % 4 === 1)
    val ct = SimilarityOps.ivfTrain(prior, "vec_id", "embedding",
      nlist = 16)
    val cbDf = PqOps.pqTrain(prior, "vec_id", "embedding", m = 8,
      ksub = 16)
    val standing = PqOps.ivfPqIndex(prior, "vec_id", "embedding", ct, cbDf)
      .unionByName(PqOps.ivfPqIndex(inc, "vec_id", "embedding", ct, cbDf))
    val direct = PqOps.ivfPqIndex(c, "vec_id", "embedding", ct, cbDf)
    def rows(ix: org.apache.spark.sql.DataFrame) =
      PqOps.ivfPqSearch(q, c, "vec_id", "embedding", 5, nlist = 16,
        nprobe = 8, precomputedCentroids = Some(ct),
        precomputedCodebooks = Some(cbDf), precomputedIndex = Some(ix))
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(standing) == rows(direct),
      "appended-index search diverged from the whole-corpus index")
    // the flat-index append composes the same way
    val flat = SimilarityOps.ivfAppend(prior, "vec_id", "embedding", ct)
      .unionByName(SimilarityOps.ivfAppend(inc, "vec_id", "embedding", ct))
      .collect().map(_.toString).sorted.toSeq
    val flatDirect = SimilarityOps
      .ivfAppend(c, "vec_id", "embedding", ct)
      .collect().map(_.toString).sorted.toSeq
    assert(flat == flatDirect,
      "flat-index appends diverged from the whole-corpus assignment")
  }

  test("ivfPqSearch with precomputed artifacts is bit-identical to self-training") {
    val q = embeddings.filter(col("vec_id") % 10 === 0)
    val c = embeddings.filter(col("vec_id") % 10 =!= 0)
    val ct = SimilarityOps.ivfTrain(c, "vec_id", "embedding", nlist = 16)
    val cbDf = PqOps.pqTrain(c, "vec_id", "embedding", m = 8, ksub = 16)
    def rows(pc: Option[org.apache.spark.sql.DataFrame],
        pcb: Option[org.apache.spark.sql.DataFrame]) =
      PqOps.ivfPqSearch(q, c, "vec_id", "embedding", 5, nlist = 16,
        nprobe = 8, precomputedCentroids = pc, precomputedCodebooks = pcb)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(Some(ct), Some(cbDf)) == rows(None, None))
    // sharding the probe join must not move a single row either
    def shardRows(shards: Int) =
      PqOps.ivfPqSearch(q, c, "vec_id", "embedding", 5, nlist = 16,
        nprobe = 8, precomputedCentroids = Some(ct),
        precomputedCodebooks = Some(cbDf), listShards = shards)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(shardRows(4) == shardRows(1),
      "listShards changed ivfPqSearch rows")
  }
}
