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

  test("packAssignGrouped holds at production group counts (4096 groups, 64k docs)") {
    // the grouped layout's one single-partition window runs over the
    // (group, bucket) totals — bounded at 256·|groups|, i.e. ~1M rows
    // at nlist-scale grouping. This regime proves the shape holds
    // there: 64k docs across 4096 groups assign correctly (cum tiles
    // [0, total) exactly; chunks strictly group-major) in one pass.
    val s = spark
    import s.implicits._
    val n = 65536
    val docs = s.range(1, n + 1).select(
      col("id"),
      pmod(col("id") * 2654435761L, lit(4096L)).as("g"),
      (pmod(col("id") * 40503L, lit(13L)) + 3L).as("n_tok"))
    val asg = graft.operators.PipelineOps
      .packAssignGrouped(docs, "id", "n_tok", "g", cap = 64.0)
      .localCheckpoint(true)
    val total = docs.agg(sum("n_tok")).head().getLong(0)
    // cum tiles [1, total] exactly: max cum = total, and the windows'
    // token mass accounts for every token exactly once
    assert(asg.agg(max("cum")).head().getLong(0) == total)
    assert(asg.agg(sum("n_tok")).head().getLong(0) == total)
    assert(asg.count() == n)
    // group-major: every doc of a lower-sorted (g, md5) key packs at a
    // cum strictly before any doc of a higher group — spot-check via
    // the per-group [min, max] cum ranges being disjoint in g order
    val ranges = asg
      .join(docs.select(col("id").as("doc_id"), col("g")), Seq("doc_id"))
      .groupBy("g")
      .agg(min(col("cum") - col("n_tok")).as("lo"), max("cum").as("hi"))
      .orderBy(col("g").cast("string"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 == lo2, s"group ranges not contiguous: $hi1 vs $lo2")
      case _ =>
    }
    asg.unpersist()
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

  test("BPE holds at production merge counts: incremental driver regime + distributed per-round floor") {
    // VERDICT r12 #3/#5 executed as a measurement + a fix. Measured
    // first (BASELINE.md r13): the distributed loop's per-round cost at
    // 30k vocab rows is ~0.6-0.7s and CADENCE-FLAT (591/673/712 ms at
    // checkpointEvery 1/4/8) — the floor is the per-round scheduling
    // fabric (pair-agg shuffle + checkpoint job), the same class as
    // pageRank's ~1s/round, so a 32k-merge production train does NOT
    // belong in the distributed regime. The production path is the
    // DRIVER regime (a 1M-word table is ~tens of MB), made real this
    // round by incremental pair statistics in driverMerges (delta
    // updates touch only the merged pair's words — subword-nmt's
    // shape). This pins: (a) cross-regime parity at 30k vocab / 60
    // merges (small-scale parity is BpeSpec's), (b) the driver regime
    // completing 1,500 merges over a 100k-word vocab in interactive
    // time, (c) structure + prefix stability.
    val s = spark
    import s.implicits._
    def word(n: Int)(i: Int): String = {
      var x = i.toLong * 2654435761L + n
      val len = 8 + (i % 9)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        sb += ('a' + ((x >>> 33) % 16).toInt).toChar
      }
      sb.result()
    }
    def corpusOf(vocab: Int): org.apache.spark.sql.DataFrame =
      (0 until vocab).map { i =>
        (i.toLong, List.fill(1 + i % 7)(word(11)(i)).mkString(" "))
      }.toDF("id", "text").repartition(8).localCheckpoint(true)
    def timeIt[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime
      val r = f
      (r, (System.nanoTime - t0) / 1e9)
    }
    def run(c: org.apache.spark.sql.DataFrame, n: Int, dvr: Long) =
      graft.operators.TokenizerOps
        .bpeMerges(c, "text", n, driverVocabRows = dvr)
        .collect().map(r =>
          (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val c30 = corpusOf(30000)
    try {
      // cross-regime parity at 30k vocab (forced distributed vs driver)
      val (dist60, tDist) = timeIt(run(c30, 60, dvr = 0))
      val (drv60, _) = timeIt(run(c30, 60, dvr = Long.MaxValue))
      assert(dist60 == drv60,
        "distributed and driver regimes diverged at 30k vocab")
      info(f"distributed floor: ${tDist / 60 * 1000}%.0f ms/round at 30k vocab")
      assert(dist60.size == 60 && dist60.map(_._1) == (1 to 60))
    } finally c30.unpersist()
    val c100k = corpusOf(100000)
    try {
      val (m, tDrv) = timeIt(run(c100k, 1500, dvr = Long.MaxValue))
      info(f"driver regime: 1500 merges over 100k vocab in ${tDrv}%.1fs " +
        f"(${tDrv / 1500 * 1000}%.1f ms/round)")
      assert(m.size == 1500, s"merge loop exhausted at ${m.size}")
      assert(m.map(_._1) == (1 to 1500), "ranks not dense")
      assert(m.forall(_._4 > 0), "non-positive pair count")
      // greedy BPE is prefix-stable: a shorter train is a prefix
      val (m200, _) = timeIt(run(c100k, 200, dvr = Long.MaxValue))
      assert(m.take(200) == m200, "driver regime is not prefix-stable")
      // interactive-time bound, generous vs the ~30-60s expectation —
      // a regression to full per-round recounts would take minutes
      assert(tDrv <= 300.0,
        f"driver regime took ${tDrv}%.1fs for 1500 merges — " +
          "incremental pair stats regressed")
    } finally c100k.unpersist()
  }

  test("unigram trainer holds at a 30k-word vocabulary (distributed E-step regime)") {
    // The unigram counterpart of the BPE regime above. The E-step is
    // always distributed (mapPartitions over the word-frequency table,
    // model broadcast) and its per-round cost is O(vocabWords · len ·
    // maxPieceLen) independent of corpus size; the shrink loop runs a
    // BOUNDED number of E-steps (seed→target under shrinkFactor 0.75:
    // ~6 prune iterations × 2 EM rounds + the final re-estimation).
    // This pins: completion + structure at 30k words / 10k seed pieces,
    // and the per-E-step constant as an info line for BASELINE.md.
    val s = spark
    import s.implicits._
    def word(i: Int): String = {
      var x = i.toLong * 2654435761L + 7
      val len = 6 + (i % 9)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        sb += ('a' + ((x >>> 33) % 16).toInt).toChar
      }
      sb.result()
    }
    val corpus = (0 until 30000).map { i =>
      (i.toLong, List.fill(1 + i % 5)(word(i)).mkString(" "))
    }.toDF("id", "text").repartition(8).localCheckpoint(true)
    try {
      val t0 = System.nanoTime
      val model = graft.operators.UnigramOps
        .unigramTrain(corpus, "text", vocabSize = 2000,
          seedSize = 10000, maxPieceLen = 6, driverVocabRows = 0)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val secs = (System.nanoTime - t0) / 1e9
      // seed 10000 → target under 0.75-shrink: 6 prunes × 2 EM + 2 final
      val eSteps = 14
      info(f"30k-word train (distributed): ${secs}%.1fs (~${secs / eSteps}%.2f s/E-step)")
      val t1 = System.nanoTime
      val drv = graft.operators.UnigramOps
        .unigramTrain(corpus, "text", vocabSize = 2000,
          seedSize = 10000, maxPieceLen = 6,
          driverVocabRows = Long.MaxValue)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      info(f"30k-word train (driver regime): ${(System.nanoTime - t1) / 1e9}%.1fs")
      // the regimes are BIT-identical (decimal-exact expected counts)
      assert(drv.toSeq == model.toSeq,
        "driver and distributed regimes diverged at 30k words")
      assert(model.length <= 2000, s"vocab ${model.length} > 2000")
      assert(model.count(_._1.length > 1) > 1500,
        s"multi-piece vocab collapsed: ${model.count(_._1.length > 1)}")
      val singles = corpus.select("text").collect()
        .flatMap(_.getString(0).split(" ").flatMap(_.toCharArray))
        .map(_.toString).toSet
      assert(singles.subsetOf(model.map(_._1).toSet), "coverage broken")
      // encode rides the same distinct-word reduction: 30k-word corpus
      // through the trained model, exact scores, every doc covered
      val enc = graft.operators.UnigramOps.unigramEncode(
        corpus, "id", "text", model.toMap, maxPieceLen = 6)
      val agg = enc.agg(count(lit(1)), sum(when(col("n_tokens") > 0, 0L)
        .otherwise(1L))).collect()(0)
      assert(agg.getLong(0) == 30000 && agg.getLong(1) == 0L,
        "encode left uncovered docs")
    } finally corpus.unpersist()
  }

  test("frequent-items sketch holds at the purging regime (2M-item zipf stream, maxMapSize 1024)") {
    // the sketch's 100 TB claim is a bounded map per partition however
    // large the stream — prove the guarantee in the regime where the
    // map PURGES (maxError > 0) at a stream size that forces it: 2M
    // items, ~100k distinct, zipf-ish tail. The exact heavy-hitter
    // list at 0.5% must come back EXACTLY through the sketch + verify
    // composition (the no-false-negative band covers candidate recall).
    val s = spark
    import s.implicits._
    val n = 2000000L
    // deterministic zipf-ish stream: item rank r with frequency ~ 1/r —
    // rank = floor(exp(u * ln(maxRank))) over a hash-uniform u
    val stream = spark.range(n)
      .select((floor(exp((pmod(xxhash64(col("id")), lit(1000000L)) / 1e6d)
          * math.log(100000d))))
        .cast("long").as("rank"))
      .select(concat(lit("item_"), col("rank")).as("v"))
    val t0 = System.nanoTime()
    val got = graft.operators.TextOps
      .frequentItems(stream.toDF(), "v", minShare = 0.005)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val secs = (System.nanoTime() - t0) / 1e9
    val thr = math.ceil(0.005 * n).toLong
    val exact = stream.groupBy("v").agg(count(lit(1)).as("n"))
      .filter(col("n") >= thr)
      .orderBy(desc("n"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(exact.nonEmpty && exact.size >= 5,
      s"regime check: expected a real heavy-hitter set, got ${exact.size}")
    assert(got == exact,
      s"sketch+verify diverged from exact: ${got.take(5)} vs ${exact.take(5)}")
    info(f"2M-item purging-regime frequentItems: ${got.size} hitters in $secs%.1f s")
  }

  test("frequent-items verify holds at the 64k-map accuracy regime (broadcast-join path)") {
    // VERDICT r14 #4's documented regime: maxMapSize 65536 over a 2M
    // stream with a tiny minShare — tens of thousands of candidates
    // survive the ub filter, which the isin literal could not carry
    // (linear plan growth, the LshBuckets JIT limit); the broadcast
    // semi-join regime must return the exact list. Distinct count
    // (~40k) sits under the 64k map's purge point, so the dynamic
    // thr > maxError gate holds at this tiny threshold by design.
    val s = spark
    import s.implicits._
    val n = 2000000L
    val stream = spark.range(n)
      .select((floor(exp((pmod(xxhash64(col("id")), lit(1000000L)) / 1e6d)
          * math.log(40000d))))
        .cast("long").as("rank"))
      .select(concat(lit("item_"), col("rank")).as("v"))
    val t0 = System.nanoTime()
    val got = graft.operators.TextOps
      .frequentItems(stream.toDF(), "v", minShare = 2.5e-6,
        maxMapSize = 65536)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      "64k-map regime must take the broadcast-join verify path")
    val rows = got.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val secs = (System.nanoTime() - t0) / 1e9
    val thr = math.ceil(2.5e-6 * n).toLong
    val exact = stream.groupBy("v").agg(count(lit(1)).as("n"))
      .filter(col("n") >= thr)
      .orderBy(desc("n"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(exact.size > 2048,
      s"regime check: need the join path's candidate scale, got ${exact.size}")
    assert(rows == exact,
      s"sketch+verify diverged from exact at 64k: ${rows.take(3)} vs ${exact.take(3)}")
    info(f"64k-map frequentItems: ${rows.size} hitters in $secs%.1f s")
  }

  test("quantile sketch holds the rank-error band at the compacting regime (10M rows, 4 merged increments)") {
    // the KLL family's scale proof (the freq-sketch 2M-purging pattern
    // applied to quantiles): a 10M-value stream per group forces deep
    // compaction at k=2048, and the standing table is built the ingest
    // way — four increments merged pairwise, never one big sketch. The
    // PROVEN guarantee (normalized rank error ~0.25% at k=2048) must
    // hold through the merges: every estimate's true rank within 1%
    // (4x margin) of its target. True ranks are closed-form — the
    // stream is a deterministic permutation of 0..n-1 per group.
    val s = spark
    import s.implicits._
    import graft.operators.RelationalOps
    val n = 10000000L
    def part(i: Int) = spark.range(n / 4 * i, n / 4 * (i + 1))
      .select((col("id") % 2).cast("string").as("grp"),
        // a hash-spread value stream: v in [0, n/2), each exactly once
        // per group, delivered in hash order (worst case for a
        // streaming quantile sketch: no presortedness)
        (xxhash64(col("id")).bitwiseAND(lit(Long.MaxValue)) % (n / 2))
          .cast("double").as("v"))
    // NOTE: xxhash64 % m is not a permutation — duplicates are fine,
    // ranks are measured against the ACTUAL delivered stream below.
    val t0 = System.nanoTime()
    val standing = (1 to 3).foldLeft(
      RelationalOps.quantileSketch(part(0), "grp", "v")) { (st, i) =>
      RelationalOps.quantileSketchMerge(st,
        RelationalOps.quantileSketch(part(i), "grp", "v"), "grp")
    }
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val est = RelationalOps.quantileSketchEstimate(standing, "grp", qs)
      .collect().map(r => r.getString(0) ->
        (1 to qs.length).map(r.getDouble)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    // true rank of each estimate, measured on the delivered stream
    val whole = (0 to 3).map(part).reduce(_ unionByName _)
    est.foreach { case (g, es) =>
      val ranks = whole.filter(col("grp") === g)
        .select(qs.indices.map(i =>
          sum(when(col("v") <= es(i), 1L).otherwise(0L)).as(s"r$i")) :+
          count(lit(1)).as("n"): _*)
        .head()
      val cnt = ranks.getAs[Long]("n").toDouble
      qs.zipWithIndex.foreach { case (q, i) =>
        val tr = ranks.getAs[Long](s"r$i") / cnt
        assert(math.abs(tr - q) <= 0.01,
          s"$g p$q: estimate ${es(i)} true rank $tr (off ${math.abs(tr - q)})")
      }
    }
    info(f"10M-row 4-increment KLL: 2 groups x ${qs.size} quantiles in $secs%.1f s")
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
