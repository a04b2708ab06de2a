package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Executable proofs of two 100 TB operational patterns that don't fit the
  * query inventory: salted two-phase aggregation for skewed keys, and
  * zero-cost inline data-quality metrics via `observe()`. */
class ScaleSpec extends SparkSpec {

  test("salted two-phase aggregation equals direct aggregation on skewed keys") {
    // events are skewed by construction toward low user_ids; salting
    // splits each hot key across 8 partial groups, then merges — the
    // standard rewrite when one reducer key dominates a shuffle. Decimal
    // partials keep the double result bit-identical to the direct path.
    val e = Tables(spark, sf, "events")
    val direct = e.groupBy("event_type")
      .agg(Det.dsum(col("value")).as("sum_value"), count(lit(1)).as("n"))
    val salted = e
      .withColumn("salt", pmod(col("user_id"), lit(8)))
      .groupBy("event_type", "salt")
      .agg(Det.decSum(col("value")).as("partial_dec"), count(lit(1)).as("pn"))
      .groupBy("event_type")
      .agg(sum("partial_dec").cast("double").as("sum_value"),
        sum("pn").as("n"))
    val d = direct.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val s2 = salted.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(d == s2)
  }

  test("broadcast-matrix kernels hold at production parameters (nlist=4096, 32x16 planes)") {
    // the r5 literal renderings grew the expression tree linearly in
    // nlist / tables*planes and could not plan at these sizes; the
    // kernels must stay ONE constant-size node with the matrix riding a
    // broadcast. Deterministic matrices from the LSH plane generator.
    val emb = Tables(spark, sf, "embeddings")
    val cents = graft.operators.SimilarityOps.planesFor(4096)
    val probes = emb.select(graft.functions.ArgTopDot
      .argTopDot(col("embedding"), spark.sparkContext.broadcast(cents), 16)
      .as("p"))
    val pr = probes
      .agg(min(size(col("p"))).as("lo"), max(size(col("p"))).as("hi"),
        min(array_min(col("p"))).as("mn"), max(array_max(col("p"))).as("mx"))
      .collect().head
    assert(pr.getInt(0) == 16 && pr.getInt(1) == 16,
      "every vector gets exactly nprobe lists")
    assert(pr.getInt(2) >= 0 && pr.getInt(3) < 4096, "list ids in range")
    assert(probes.queryExecution.executedPlan.toString.length < 20000,
      "plan must stay constant-size in nlist")

    val planes = graft.operators.SimilarityOps.planesFor(32 * 16)
    val buckets = emb.select(graft.functions.LshBuckets
      .lshBuckets(col("embedding"),
        spark.sparkContext.broadcast(planes), 32, 16).as("b"))
    val br = buckets
      .agg(min(size(col("b"))).as("lo"), max(size(col("b"))).as("hi"),
        min(array_min(col("b"))).as("mn"), max(array_max(col("b"))).as("mx"))
      .collect().head
    assert(br.getInt(0) == 32 && br.getInt(1) == 32,
      "one bucket id per table")
    assert(br.getInt(2) >= 0 && br.getInt(3) < (1 << 16), "bucket ids in range")
    assert(buckets.queryExecution.executedPlan.toString.length < 20000,
      "plan must stay constant-size in tables*planes")
  }

  test("PQ kernels hold at production parameters (m=16, ksub=256)") {
    // the standard PQ configuration is 256 centroids per subspace (one
    // byte per code); the codebook is 16×256×4 doubles riding a
    // broadcast, and the plan must stay one constant-size node — a
    // literal rendering would explode at m·ksub = 4096 struct branches.
    // Deterministic codebook from the LSH plane generator.
    val emb = Tables(spark, sf, "embeddings")
    val flat = graft.operators.SimilarityOps.planesFor(16 * 256, dim = 4)
    val cb = Array.tabulate(16, 256)((s, c) => flat(s * 256 + c))
    val bc = spark.sparkContext.broadcast(cb)
    val coded = emb.select(
      graft.functions.PqKernels.pqEncode(col("embedding"), bc).as("codes"),
      graft.functions.PqKernels.pqAdcDot(
        graft.functions.PqKernels.pqEncode(col("embedding"), bc),
        col("embedding"), bc).as("adc"))
    val r = coded
      .agg(min(size(col("codes"))).as("lo"), max(size(col("codes"))).as("hi"),
        min(array_min(col("codes"))).as("mn"),
        max(array_max(col("codes"))).as("mx"),
        count(when(col("adc").isNull, 1)).as("null_adc"))
      .collect().head
    assert(r.getInt(0) == 16 && r.getInt(1) == 16,
      "every vector gets exactly m codes")
    assert(r.getInt(2) >= 0 && r.getInt(3) < 256, "codes in byte range")
    assert(r.getLong(4) == 0, "ADC must score every coded vector")
    assert(coded.queryExecution.executedPlan.toString.length < 20000,
      "plan must stay constant-size in m*ksub")
  }

  test("lineDedup holds with a large blocklist (20k docs, 300 heavy segments, 5.4M occurrences)") {
    // the operator's scale contract: the blocklist is the HEAVY-HITTER
    // set, bounded by construction, riding ONE broadcast array; the
    // removal pass stays a join-free projection whatever the blocklist
    // size. Corpus: a 300-segment boilerplate pool where doc i carries
    // segment j iff (i+j) % 10 != 0 — every pool segment lands in
    // exactly 90% of docs (>> the 60% cap), 270 segments per doc, plus
    // one unique tail segment each. 20k docs → 5.4M boilerplate
    // occurrences through the frequency pass.
    val nDocs = 20000L
    val docs = spark.range(nDocs)
      .repartition(32) // spread the synthetic corpus like a real scan
      .select(col("id"), concat_ws("\n",
        // concat_ws skips the nulls the `when` leaves on dropped slots
        concat_ws("\n", transform(sequence(lit(0L), lit(299L)),
          j => when((col("id") + j) % 10 =!= 0,
            concat(lit("boiler "), j.cast("string"))))),
        concat(lit("unique segment "), col("id").cast("string")))
        .as("body"))
    val out = graft.operators.DedupOps.lineDedup(docs, "id", "body",
      sep = "\n", dfFrac = 0.6)
    val agg = out.agg(
      sum("n_removed").as("removed"),
      count(when(col("clean_text") =!= concat(lit("unique segment "),
        col("id").cast("string")), 1)).as("wrong"))
      .collect().head
    assert(agg.getLong(0) == 270L * nDocs,
      s"expected all 270×$nDocs boilerplate occurrences removed, got ${agg.getLong(0)}")
    assert(agg.getLong(1) == 0L, "every doc must keep exactly its unique tail")
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "blocklist must broadcast at any size")
    assert("Generate".r.findAllIn(p).length == 1,
      "removal pass must not explode the corpus")
  }

  test("spanCorruptApply holds at the long-document regime (64 docs x 100k tokens)") {
    // the stress axis of the formatter is per-row array surgery on the
    // token array (slice/flatten/concat_ws over ~100k elements) plus the
    // positions explode (6.4M rows here); the corpus docs are short, so
    // this regime is otherwise never exercised. Invariant checked
    // entirely executor-side (never collecting a 700KB string): every
    // original token lands exactly once across input∪target, so
    // input_tokens + target_tokens = n + 2·n_runs + 1 (one sentinel per
    // run on each side, plus the terminal end-of-target sentinel).
    val nDocs = 64L
    val nTok = 100000L
    val docs = spark.range(nDocs)
      .repartition(32)
      .select(col("id"), concat_ws(" ",
        transform(sequence(lit(0L), lit(nTok - 1)),
          j => concat(lit("w"), j.cast("string")))).as("body"))
    val t0 = System.nanoTime()
    val out = graft.operators.PipelineOps
      .spanCorruptApply(docs, "id", "body")
      .select(col("doc_id"), col("n_runs").cast("long").as("n_runs"),
        size(split(col("input_text"), " ")).cast("long").as("in_tok"),
        when(col("target_text") === "", 0L)
          .otherwise(size(split(col("target_text"), " ")).cast("long"))
          .as("tg_tok"))
    val agg = out.agg(
      count(lit(1)).as("rows"),
      sum(when(col("n_runs") > 0 && col("in_tok") + col("tg_tok")
          =!= lit(nTok) + col("n_runs") * 2 + 1, 1L)
        .when(col("n_runs") === 0 && col("in_tok") =!= nTok, 1L)
        .otherwise(0L)).as("violations"),
      // realized mask fraction = (n - (in_tok - n_runs)) / n, corpus-wide
      sum(lit(nTok) - (col("in_tok") - col("n_runs"))).as("masked"))
      .collect().head
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"64x100k-token spanCorruptApply: $sec%.1f s")
    assert(agg.getLong(0) == nDocs, s"expected $nDocs rows, got ${agg.getLong(0)}")
    assert(agg.getLong(1) == 0L,
      "token accounting violated at the 100k-token regime")
    val maskFrac = agg.getLong(2).toDouble / (nDocs * nTok)
    assert(maskFrac > 0.08 && maskFrac < 0.22,
      s"realized mask fraction $maskFrac outside the density envelope")
  }

  test("BPE distributed merge loop holds at production merge counts (1k merges, 30k vocab)") {
    // VERDICT r12 #3/#5: the distributed regime costs 2 driver-scheduled
    // jobs per merge round — correct and vocab-bounded, but unmeasured
    // beyond nMerges=10 before this regime. Pins three things at 1,000
    // merges on a 30k-word vocab (driverVocabRows = 0 forces the
    // distributed path): (a) the merge sequence prefix-matches the
    // driver regime (greedy BPE is prefix-stable, so a 200-merge driver
    // run validates the first 200 distributed rounds byte-for-byte);
    // (b) structure holds end to end (dense ranks, positive counts);
    // (c) the re-checkpoint cadence keeps per-round cost BOUNDED — the
    // 1,000-merge run must stay within linear scaling of the 100-merge
    // run (generous 15× bound; a plan-depth blowup between checkpoints
    // would go quadratic). Measured per-round constants are logged and
    // recorded in BASELINE.md.
    val s = spark
    import s.implicits._
    // deterministic 30k-word vocab, 8-16 chars over 16 letters, freq 1-7
    def word(i: Int): String = {
      var x = i.toLong * 2654435761L + 11L
      val len = 8 + (i % 9)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        sb += ('a' + ((x >>> 33) % 16).toInt).toChar
      }
      sb.result()
    }
    val corpus = (0 until 30000).map { i =>
      (i.toLong, List.fill(1 + i % 7)(word(i)).mkString(" "))
    }.toDF("id", "text")
      .repartition(8).localCheckpoint(true)
    try {
      def timeIt[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime
        val r = f
        (r, (System.nanoTime - t0) / 1e9)
      }
      val (m100, t100) = timeIt(graft.operators.TokenizerOps
        .bpeMerges(corpus, "text", 100, driverVocabRows = 0)
        .collect().map(r =>
          (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq)
      val (m1000, t1000) = timeIt(graft.operators.TokenizerOps
        .bpeMerges(corpus, "text", 1000, driverVocabRows = 0)
        .collect().map(r =>
          (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq)
      info(f"distributed: 100 merges ${t100}%.1fs (${t100 * 10}%.0f ms/round), " +
        f"1000 merges ${t1000}%.1fs (${t1000}%.0f ms/round)")
      assert(m1000.size == 1000, s"merge loop exhausted at ${m1000.size}")
      assert(m1000.map(_._1) == (1 to 1000), "ranks not dense")
      assert(m1000.forall(_._4 > 0), "non-positive pair count")
      // prefix stability vs the driver regime — the cross-regime
      // correctness pin at scale (full-table parity at small scale is
      // BpeSpec's)
      val driver200 = graft.operators.TokenizerOps
        .bpeMerges(corpus, "text", 200, driverVocabRows = Long.MaxValue)
        .collect().map(r =>
          (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(m1000.take(200) == driver200,
        "distributed merge sequence diverged from the driver regime")
      assert(m1000.take(100) == m100,
        "distributed regime is not prefix-stable")
      // bounded per-round cost: linear scaling within generous slack
      assert(t1000 <= 15.0 * math.max(t100, 1.0),
        f"1000-merge run ${t1000}%.1fs blew past linear scaling of the " +
          f"100-merge run ${t100}%.1fs — checkpoint cadence regressed")
    } finally corpus.unpersist()
  }

  test("observe() surfaces inline QA metrics without an extra pass") {
    val observed = Tables(spark, sf, "documents")
      .observe("qa",
        count(lit(1)).as("rows"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("empty_texts"),
        min(length(col("text"))).as("min_len"))
      .select("doc_id")
    // the action must run the SAME QueryExecution the metrics hang off —
    // a write/count builds its own plan and leaves this one unexecuted
    observed.collect()
    val metrics = observed.queryExecution.observedMetrics("qa")
    assert(metrics.getAs[Long]("rows") == 500L)
    assert(metrics.getAs[Long]("empty_texts") == 0L)
    assert(metrics.getAs[Int]("min_len") > 0)
  }
}
