package graft

import org.apache.spark.sql.functions._

import graft.functions.DotF.dotf

/** Semantic checks for the similarity family: ANN recall against the
  * oracle-verified brute force, block-grid equivalence, and bit-identity
  * of the codegen'd dot product with its declarative rendering. */
class SimilaritySpec extends SparkSpec {

  // the exact n² knn join is the suite's most expensive computation —
  // compute its pair set once, share it across the structure and recall
  // tests
  private lazy val exactKnnPairs: Set[(Long, Long)] =
    SparkEntry.queries("q_similarity_knn")(spark, sf)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ANN top-20 recall >= 0.9 vs brute-force cosine top-20") {
    val bf = SparkEntry.queries("q_similarity_cosine")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = SparkEntry.queries("q_similarity_ann")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(bf.size == 20)
    val recall = (bf & ann).size / 20.0
    assert(recall >= 0.9, f"ANN recall@20 = $recall%.2f < 0.9")
  }

  test("block-grid near-dup equals the naive all-pairs join exactly") {
    val e = graft.sources.Tables(spark, sf, "embeddings")
    def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      dotf(a, b) / (sqrt(dotf(a, a)) * sqrt(dotf(b, b)))
    val naive = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
      .join(e.select(col("vec_id").as("vb"), col("embedding").as("eb")),
        col("va") < col("vb"))
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .filter(col("cos") >= 0.4)
      .select(col("va"), col("vb"), Det.r4(col("cos")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val grid = SparkEntry.queries("q_embed_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(naive.nonEmpty)
    assert(grid == naive)
  }

  test("knn join: per-vector top-5 agrees with the brute-force one-query scan") {
    val knn = SparkEntry.queries("q_similarity_knn")(spark, sf).cache()
    try {
      // every vector gets exactly 5 contiguous ranks with non-increasing cos
      val n = graft.sources.Tables(spark, sf, "embeddings").count()
      assert(knn.count() == n * 5)
      val bad = knn.groupBy("va")
        .agg(count(lit(1)).as("k"), min("rk").as("lo"), max("rk").as("hi"))
        .filter(col("k") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5)
      assert(bad.isEmpty, "rank structure broken")
      // vec 0's neighbor list = the first 5 rows of the oracle-verified
      // one-query brute force (same rounding, same tie order)
      val bf = SparkEntry.queries("q_similarity_cosine")(spark, sf)
        .limit(5).select("vec_id").collect().map(_.getLong(0)).toSeq
      val k0 = knn.filter(col("va") === 0).orderBy("rk")
        .select("vb").collect().map(_.getLong(0)).toSeq
      assert(k0 == bf, s"vec 0 neighbors $k0 != brute force $bf")
    } finally knn.unpersist()
  }

  test("knn shuffle-grid regime is bit-identical to the broadcast regime (VERDICT r13 #4)") {
    val s = spark
    val baseJ = SparkEntry.queries("q_similarity_knn")(spark, sf)
      .collect().map(_.toString).toSeq
    val baseS = SparkEntry.queries("q_similarity_search")(spark, sf)
      .collect().map(_.toString).toSeq
    // a 1 KB threshold makes the guard's replicated-size estimate exceed
    // it NATURALLY (the estimate-vs-threshold comparison itself, not the
    // disabled -1 special case): the fallback shuffled-hash grid must
    // reproduce the broadcast regime bit for bit
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try {
      assert(SparkEntry.queries("q_similarity_knn")(spark, sf)
        .collect().map(_.toString).toSeq == baseJ,
        "knnJoin diverged in the shuffle-grid regime")
      assert(SparkEntry.queries("q_similarity_search")(spark, sf)
        .collect().map(_.toString).toSeq == baseS,
        "knnSearch diverged in the shuffle-grid regime")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("approximate knn join recalls >= 0.8 of the exact neighbor lists") {
    val e = graft.sources.Tables(spark, sf, "embeddings")
    val approx = graft.operators.SimilarityOps
      .annKnnJoin(e, "vec_id", "embedding", 5)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactKnnPairs & approx).size.toDouble / exactKnnPairs.size
    assert(exactKnnPairs.nonEmpty)
    assert(recall >= 0.8, f"ann knn-join recall@5 = $recall%.3f < 0.8")
  }

  test("IVF knn join recalls >= 0.75 of the exact neighbor lists at nprobe/nlist = 1/2") {
    // this corpus's neighbors sit at noise-level cosine (see the LSH
    // header note), so a wide probe is needed for recall — measured
    // 0.818 at (16, 8); deterministic (decimal means, struct-max ties),
    // threshold leaves margin only against code changes
    val e = graft.sources.Tables(spark, sf, "embeddings")
    val approx = graft.operators.SimilarityOps
      .ivfKnnJoin(e, "vec_id", "embedding", 5, nlist = 16, nprobe = 8)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactKnnPairs & approx).size.toDouble / exactKnnPairs.size
    assert(exactKnnPairs.nonEmpty)
    assert(recall >= 0.75, f"ivf knn-join recall@5 = $recall%.3f < 0.75")
    // rank structure: every query gets at most k contiguous ranks from 1
    val ivf = graft.operators.SimilarityOps
      .ivfKnnJoin(e, "vec_id", "embedding", 5, nlist = 16, nprobe = 8)
    val bad = ivf.groupBy("va")
      .agg(count(lit(1)).as("n"), min("rk").as("lo"), max("rk").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("n") > 5)
    assert(bad.isEmpty, "ivf rank structure broken")
  }

  test("IVF survives production-shaped nlist (256 lists on a 500-vector corpus)") {
    // the r5 literal-centroid rendering grew the generated Java linearly
    // in nlist and died at this scale; the ArgTopDot kernel keeps the
    // plan constant-size. 256 lists of ~2 vectors probed at nprobe/nlist
    // = 1/2 is a locality-guided half-scan — it must beat the ~0.5 recall
    // a RANDOM half-scan gets in expectation
    val e = graft.sources.Tables(spark, sf, "embeddings")
    val approx = graft.operators.SimilarityOps
      .ivfKnnJoin(e, "vec_id", "embedding", 5, nlist = 256, nprobe = 128)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactKnnPairs & approx).size.toDouble / exactKnnPairs.size
    info(f"nlist=256 recall@5 = $recall%.3f")
    assert(recall >= 0.6, f"ivf nlist=256 recall@5 = $recall%.3f < 0.6")
  }

  test("ivfSearch recalls >= 0.6 of the exact two-frame knnSearch at a wide probe") {
    // the retrieval shape: every 10th vector queries the rest; exact
    // ground truth from knnSearch (itself oracle-checked via
    // q_similarity_search); same wide-probe regime as the self-join
    // recall test (noise-level neighbors on this corpus)
    val e = graft.sources.Tables(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") % 10 === 0)
    val c = e.filter(col("vec_id") % 10 =!= 0)
    val exact = graft.operators.SimilarityOps
      .knnSearch(q, c, "vec_id", "embedding", 5)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.operators.SimilarityOps
      .ivfSearch(q, c, "vec_id", "embedding", 5, nlist = 16, nprobe = 8)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"ivfSearch recall@5 = $recall%.3f")
    assert(recall >= 0.6, f"ivfSearch recall@5 = $recall%.3f < 0.6")
    // rank structure: contiguous ranks from 1, at most k per query
    val ivf = graft.operators.SimilarityOps
      .ivfSearch(q, c, "vec_id", "embedding", 5, nlist = 16, nprobe = 8)
    val bad = ivf.groupBy("va")
      .agg(count(lit(1)).as("n"), min("rk").as("lo"), max("rk").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("n") > 5)
    assert(bad.isEmpty, "ivfSearch rank structure broken")
  }

  test("ivfKnnJoin with a precomputed quantizer is bit-identical to the self-trained path") {
    // the production reuse path: ivfTrain once, persist the nlist-row
    // centroid table, feed it back — training determinism makes the two
    // paths exactly equal, not just recall-equivalent
    val e = graft.sources.Tables(spark, sf, "embeddings")
    val ct = graft.operators.SimilarityOps
      .ivfTrain(e, "vec_id", "embedding", nlist = 16)
    def rows(pc: Option[org.apache.spark.sql.DataFrame]) =
      graft.operators.SimilarityOps
        .ivfKnnJoin(e, "vec_id", "embedding", 5, nlist = 16, nprobe = 8,
          precomputedCentroids = pc)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(Some(ct)) == rows(None))
    // a malformed centroid table is rejected loudly
    val bad = intercept[Exception](
      graft.operators.SimilarityOps.ivfKnnJoin(e, "vec_id", "embedding", 5,
        nlist = 16, nprobe = 8,
        precomputedCentroids = Some(ct.filter(col("list") < 8))).collect())
    assert(bad.getMessage.contains("lists 0..15"))
    // ...and so is a wrong-dimension one, which would otherwise null out
    // every ArgTopDot assignment and silently return ZERO rows
    val badDim = intercept[Exception](
      graft.operators.SimilarityOps.ivfKnnJoin(e, "vec_id", "embedding", 5,
        nlist = 16, nprobe = 8,
        precomputedCentroids = Some(ct.select(col("list"),
          slice(col("centroid"), 1, 3).as("centroid")))).collect())
    assert(badDim.getMessage.contains("does not match vector dim"))
  }

  test("listShards sharding leaves the IVF result sets bit-identical (VERDICT r12 #4)") {
    // the probe join's corpus-side parallelism is capped at nlist (×
    // listShards); sharding must only change the join's key space, never
    // the result — shards partition the corpus ids, so every (probe-list,
    // corpus-member) candidate meets in exactly one (l, sh) key
    val e = graft.sources.Tables(spark, sf, "embeddings")
    val ct = graft.operators.SimilarityOps
      .ivfTrain(e, "vec_id", "embedding", nlist = 16)
    def joinRows(shards: Int) = graft.operators.SimilarityOps
      .ivfKnnJoin(e, "vec_id", "embedding", 5, nlist = 16, nprobe = 8,
        precomputedCentroids = Some(ct), listShards = shards)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(joinRows(4) == joinRows(1), "listShards changed ivfKnnJoin rows")
    val q = e.filter(col("vec_id") % 10 === 0)
    val c = e.filter(col("vec_id") % 10 =!= 0)
    def searchRows(shards: Int) = graft.operators.SimilarityOps
      .ivfSearch(q, c, "vec_id", "embedding", 5, nlist = 16, nprobe = 8,
        precomputedCentroids = Some(ct), listShards = shards)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(searchRows(4) == searchRows(1), "listShards changed ivfSearch rows")
    // and the sharded plan genuinely widens the join key space
    val sharded = graft.operators.SimilarityOps
      .ivfSearch(q, c, "vec_id", "embedding", 5, nlist = 16, nprobe = 8,
        precomputedCentroids = Some(ct), listShards = 4)
      .queryExecution.executedPlan.toString
    assert(sharded.contains("pmod(xxhash64"),
      s"sharded corpus-side join key missing:\n$sharded")
  }

  test("IVF quantizer trained on a 30% hash-sample still beats the random-scan baseline") {
    // the 100 TB path: training cost is corpus-size-independent; with
    // nprobe/nlist = 1/2 a random half-scan recalls ~0.50 in expectation,
    // so beating ~0.6 shows the sampled quantizer still captures locality
    val e = graft.sources.Tables(spark, sf, "embeddings")
    val approx = graft.operators.SimilarityOps
      .ivfKnnJoin(e, "vec_id", "embedding", 5, nlist = 16, nprobe = 8,
        trainFraction = 0.3)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactKnnPairs & approx).size.toDouble / exactKnnPairs.size
    assert(recall >= 0.6, f"sampled-train ivf recall@5 = $recall%.3f < 0.6")
  }

  test("semanticDedupPairs prunes candidates, never corrupts similarities") {
    // SemDeDup only restricts WHICH pairs are compared (same k-means
    // list); the cosines themselves are exact. So against the
    // oracle-verified exact all-pairs join: (1) every semantic pair is an
    // exact pair, (2) its cosine agrees to rounding (normalize-then-dot
    // vs dot-then-divide differ in the last ulp), (3) the cluster-boundary
    // recall loss stays bounded on the corpus — everything is
    // deterministic (fixed data, deterministic training), so the observed
    // capture is stable, not a flaky sample.
    val e = graft.sources.Tables(spark, sf, "embeddings")
    val exact = SparkEntry.queries("q_embed_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sem = graft.operators.SimilarityOps
      .semanticDedupPairs(e, "vec_id", "embedding", minCos = 0.4, nlist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sem.nonEmpty, "semantic dedup found no within-cluster pairs")
    assert(sem.keySet.subsetOf(exact.keySet),
      s"phantom pairs not in the exact join: ${sem.keySet -- exact.keySet}")
    sem.foreach { case (p, c) =>
      assert(math.abs(c - exact(p)) <= 1e-4, s"cosine drifted at $p: $c vs ${exact(p)}")
    }
    val capture = sem.size.toDouble / exact.size
    assert(capture >= 0.5,
      f"cluster-boundary loss too high: captured $capture%.2f of ${exact.size} exact pairs")
  }

  test("DotF is bit-identical to the declarative aggregate/zip_with fold") {
    val e = graft.sources.Tables(spark, sf, "embeddings").limit(200)
    val hof = aggregate(
      zip_with(col("embedding"), col("q"), (x, y) =>
        x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val both = e.crossJoin(broadcast(q))
      .select(dotf(col("embedding"), col("q")).as("native"), hof.as("declarative"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"bit mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("DotF handles length mismatch and SQL registration") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0, 5.0))).toDF("a", "b")
    assert(df.select(dotf(col("a"), col("b"))).collect().head.isNullAt(0))
    // registered via GraftExtensions (spark.sql.extensions)
    val viaSql = spark.sql("SELECT dotf(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(viaSql == 11.0)
  }
}
