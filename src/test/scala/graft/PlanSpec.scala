package graft

/** Physical-plan guards: the 100 TB properties VERDICT/SURVEY call for are
  * asserted here so a plan regression fails the suite, not just the bench.
  * Each test renders the executed plan and checks the operator shape —
  * filters/projections reaching the parquet scan, dimension joins
  * broadcast, top-k as TakeOrderedAndProject, and NO nested-loop joins
  * anywhere in the inventory. */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q_agg_hash pushes the shipdate filter into the parquet scan") {
    val p = plan("q_agg_hash")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("PushedFilters: [") && p.contains("l_shipdate"),
      s"expected pushed filter on l_shipdate:\n$p")
  }

  test("q_agg_hash prunes lineitem to the referenced columns only") {
    val p = plan("q_agg_hash")
    val schema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!schema.contains("l_comment") && !schema.contains("l_orderkey"),
      s"scan should not read unused columns:\n$schema")
  }

  test("q_join_broadcast broadcasts the dimension tables") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
  }

  test("q_topk plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("no query in the inventory uses a nested-loop join") {
    // BroadcastNestedLoopJoin is the quadratic plan the r1 near-dup family
    // degenerated into; the whole inventory must stay free of it (the two
    // intentional crossJoins broadcast single-row scalars and plan as
    // BroadcastNestedLoopJoin over 1 row — allow those by checking the
    // build side is a 1-row aggregate/filter on a scalar subquery).
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { q =>
      val p = plan(q)
      p.contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("q_embed_neardup joins on the block grid, not all pairs") {
    val p = plan("q_embed_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"near-dup must not be a nested-loop join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected an equi-join on (ba, bb):\n$p")
  }

  test("q_dedup_semantic joins within clusters — an equi-join on the list id, never all pairs") {
    val p = plan("q_dedup_semantic")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"semantic dedup must not compare across clusters:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected an equi-join on (l, ba, bb):\n$p")
  }

  test("q_join_range plans as an equi-join on (user, bin) — not a nested loop") {
    val p = plan("q_join_range")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"binned range join must not degrade to a nested loop:\n$p")
  }

  test("q_join_asof plans with no join operator at all (single window pass)") {
    val p = plan("q_join_asof")
    assert(!p.contains("Join"), s"as-of is a union + window, not a join:\n$p")
    assert(p.contains("Window"), s"expected a window operator:\n$p")
  }

  test("q_join_semi / q_join_anti plan as semi/anti joins (no fan-out + distinct)") {
    val ps = plan("q_join_semi")
    assert(ps.contains("LeftSemi"), s"expected a LeftSemi join:\n$ps")
    val pa = plan("q_join_anti")
    assert(pa.contains("LeftAnti"), s"expected a LeftAnti join:\n$pa")
  }

  test("cube/rollup cascades never plan an Expand (no input-row replication)") {
    for (q <- Seq("q_cube_revenue", "q_rollup_revenue")) {
      val p = plan(q)
      assert(!p.contains("Expand"),
        s"$q must cascade from the detail grain, not Expand every row:\n$p")
    }
  }

  test("knn grid joins: broadcast under the threshold, shuffled hash past it (VERDICT r13 #4)") {
    val s = spark
    // small regime: the gate table's replicated estimate fits → the
    // guard hints an explicit broadcast (deterministic, not stats-luck)
    val p1 = plan("q_similarity_knn")
    assert(p1.contains("BroadcastHashJoin"),
      s"small regime must broadcast the grid build side:\n$p1")
    // large regime: threshold disabled stands in for a corpus whose
    // replicated size exceeds it — the guard must fall back to a
    // shuffled hash join (no driver materialization, no sort of the
    // vector payload), never a broadcast
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p2 = plan("q_similarity_knn")
      assert(p2.contains("ShuffledHashJoin"),
        s"large regime must shuffle-hash the grid join:\n$p2")
      assert(!p2.contains("BroadcastHashJoin"),
        s"large regime must not broadcast a grid side:\n$p2")
      val p3 = plan("q_similarity_search")
      assert(p3.contains("ShuffledHashJoin") &&
        !p3.contains("BroadcastHashJoin"),
        s"two-frame search must respect the guard:\n$p3")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_heavy_hitters: candidate verify is join-free with one data shuffle") {
    // the sketch pass runs at construction (bytes-only shuffle); the
    // returned verify plan must be explode → isin literal filter →
    // count — no join against a candidate table, exactly one hash
    // exchange (the candidate-row count), no range exchange but the
    // presentation sort's
    val p = plan("q_heavy_hitters")
    assert(!p.contains("Join"), s"verify pass must not join:\n$p")
    assert(p.linesIterator.count(
      _.trim.startsWith("Exchange hashpartitioning")) <= 1,
      s"verify pass should shuffle once (candidate rows only):\n$p")
  }

  test("q_distinct_incr: sketch merge is join-free (bytes-only exchanges)") {
    val p = plan("q_distinct_incr")
    assert(!p.contains("Join"), s"sketch merge must not join:\n$p")
  }

  test("q_quantiles_incr: KLL merge is join-free (bytes-only exchanges)") {
    val p = plan("q_quantiles_incr")
    assert(!p.contains("Join"), s"sketch merge must not join:\n$p")
  }

  test("q_distinct_verify / q_quantiles_verify: the oracled read paths stay join-free") {
    // the exact-regime verify siblings must keep the incr lines' shape —
    // sketch, merge, estimate; a join or extra corpus pass would mean
    // the verify line measures something other than the read path
    for (q <- Seq("q_distinct_verify", "q_quantiles_verify")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must not join:\n$p")
    }
  }

  test("frequentItems verify: isin literal while small, broadcast semi-join past the cap") {
    // VERDICT r14 #4 — both verify regimes pinned: a handful of
    // candidates verifies through the join-free literal plan, a
    // many-thousand-candidate sketch (big maxMapSize, tiny minShare)
    // through a constant-size broadcast semi-join instead of a plan
    // growing linearly in candidates (the LshBuckets JIT lesson).
    val s = spark
    import s.implicits._
    val small = graft.operators.TextOps.frequentItems(
      (1 to 400).map(i => s"it_${i % 4}").toDF("v"), "v", minShare = 0.1)
    val pSmall = small.queryExecution.executedPlan.toString
    assert(!pSmall.contains("Join"),
      s"small-candidate verify must stay the isin literal:\n$pSmall")
    val big = graft.operators.TextOps.frequentItems(
      (1 to 4096).map(i => s"it_$i").toDF("v"), "v",
      minShare = 1e-5, maxMapSize = 8192)
    val pBig = big.queryExecution.executedPlan.toString
    assert(pBig.contains("BroadcastHashJoin") && pBig.contains("LeftSemi"),
      s"4096-candidate verify must broadcast-semi-join:\n$pBig")
    // both regimes stay exact
    assert(small.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("it_0", 100L), ("it_1", 100L), ("it_2", 100L), ("it_3", 100L)))
    assert(big.count() == 4096)
  }

  test("q_ivf_append: shuffle-free assignment (no join, no hash exchange)") {
    // the incremental index append must stay a broadcast-kernel
    // projection over the increment — its only exchange is the
    // presentation sort's range partitioning
    val p = plan("q_ivf_append")
    assert(!p.contains("Join"), s"append must not join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"append must not shuffle:\n$p")
  }

  test("q_similarity_knn: grid equi-join, every window partitioned") {
    val p = plan("q_similarity_knn")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"knn join must meet pairs via the block grid, not a nested loop:\n$p")
    // the single-partition trap: a window whose FIRST argument is already a
    // sort order (ASC/DESC) has an empty partition spec and runs the whole
    // n² ranking on one task
    val specs = "windowspecdefinition\\(([^,)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"expected window operators in:\n$p")
    specs.foreach { first =>
      assert(!first.contains(" ASC") && !first.contains(" DESC"),
        s"unpartitioned window (first spec arg '$first'):\n$p")
    }
  }

  test("scan-shaped queries read parquet exactly once") {
    // single-pass guarantees from the r2 rewrites: the LSH dedup queries
    // must not re-execute their signature/fingerprint subtrees
    for (q <- Seq("q_dedup_minhash", "q_dedup_simhash")) {
      val p = plan(q)
      val scans = "Scan parquet".r.findAllIn(p).length
      assert(scans == 1, s"$q reads documents $scans times:\n$p")
    }
  }

  test("q_sample_weighted plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("q_sample_weighted")
    assert(p.contains("TakeOrderedAndProject"),
      s"weighted bottom-k must keep local top-k per partition:\n$p")
  }

  test("q_join_salted joins hash-partitioned on (key, salt)") {
    val p = plan("q_join_salted")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"salted join must stay an equi-join:\n$p")
    // the point of the salt: the join's shuffle keys include __salt, so a
    // hot key spreads over `salts` reducers
    assert(p.contains("__salt"), s"expected __salt in the join keys:\n$p")
  }

  test("q_decontaminate probes the bloom sketch BELOW the verify join's shuffle") {
    val p = plan("q_decontaminate")
    assert(p.contains("might_contain"),
      s"expected a bloom probe in the train-side scan pipeline:\n$p")
    // The scale property: the probe must gate the shuffle — between the
    // Filter(might_contain) and the scan feeding it there is no Exchange,
    // so only sketch survivors ever leave the scan pipeline. (Plans print
    // top-down: probe line, then deeper lines down to the scan.)
    val lines = p.linesIterator.toSeq
    val probeAt = lines.indexWhere(_.contains("might_contain"))
    val scanAt = lines.indexWhere(_.contains("Scan parquet"), probeAt)
    assert(probeAt >= 0 && scanAt > probeAt, s"probe/scan not found:\n$p")
    val between = lines.slice(probeAt + 1, scanAt)
    assert(!between.exists(_.contains("Exchange")),
      s"bloom probe must sit below every exchange (scan-side filter):\n$p")
  }

  test("kernel paths stay native: fingerprint and substring plans carry no HOF lambdas") {
    // the r4 perf cost was interpreted higher-order lambdas in these two
    // paths; the kernels must stay in the plan (a silent revert to
    // transform(...)/lambda shows up here, not just in the bench)
    val fp = plan("q_fingerprint")
    assert(fp.contains("min_shingle_md5"), s"expected MinShingleMd5 kernel:\n$fp")
    assert(!fp.contains("lambdafunction"), s"interpreted lambda crept in:\n$fp")
    val ss = plan("q_dedup_substring")
    assert(ss.contains("ngram_set64"), s"expected NGramSet64 kernel:\n$ss")
  }

  test("IVF assigns lists through the broadcast ArgTopDot kernel, not centroid literals") {
    // the r5 literal-centroid rendering grew the plan linearly in nlist;
    // a silent revert would show up here as dotf-per-centroid chains
    val df = graft.operators.SimilarityOps.ivfKnnJoin(
      spark.read.parquet(s"$sf/embeddings.parquet"),
      "vec_id", "embedding", 5, nlist = 16, nprobe = 8)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("arg_top_dot"), s"expected ArgTopDot kernel:\n$p")
    assert(!p.contains("dotf(ne"), s"centroid-literal dotf chain crept back:\n$p")
  }

  test("IVFPQ scores candidates through the PQ kernels with no vectors on the indexed side") {
    // the whole point of the PQ index is that the join's indexed side
    // carries codes, not embeddings — a regression that rejoins `ne`
    // before the ADC shortlist re-inflates the shuffle ~30×
    val df = graft.operators.PqOps.ivfPqKnnJoin(
      spark.read.parquet(s"$sf/embeddings.parquet"),
      "vec_id", "embedding", 5, nlist = 16, nprobe = 8)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("pq_encode"), s"expected PqEncode kernel:\n$p")
    assert(p.contains("pq_adc_dot"), s"expected PqAdcDot kernel:\n$p")
    // the candidate join (on the list id `l`) must see `codes` but not a
    // normalized-vector column on the indexed input; `eb` only appears in
    // the post-shortlist refine join
    val joinInputs = p.linesIterator.filter(_.contains("pq_adc_dot")).toSeq
    assert(joinInputs.nonEmpty &&
      joinInputs.forall(l => !l.contains("eb")),
      s"indexed-side vector reached the ADC stage:\n$p")
  }

  test("q_sample_quota plans a WindowGroupLimit below the shuffle (no full per-stratum sort)") {
    // the rank <= n predicate must reach the map side: each task forwards
    // at most n rows per stratum, so one giant stratum never funnels the
    // corpus through a single window sort
    val p = plan("q_sample_quota")
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$p")
    assert(p.linesIterator.count(_.trim.startsWith("WindowGroupLimit")) >= 2 ||
      p.contains("Partial"), s"expected a map-side (partial) group limit:\n$p")
  }

  test("q_sample_cluster / q_sample_ppl inherit the map-side group limit (r14)") {
    // both compose quotaSample, so the rank <= n predicate must still
    // reach the map side through the derived stratum (cluster id /
    // score bucket). (q_sample_ppl's upstream lmScore carries its
    // documented 1-row-totals broadcast cross join — the global
    // nested-loop policy test owns that whitelist; here we pin only the
    // sampling shape.)
    for (q <- Seq("q_sample_cluster", "q_sample_ppl")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q: expected WindowGroupLimit:\n$p")
      assert(p.contains("Partial"),
        s"$q: expected a map-side (partial) group limit:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$q: cartesian product leaked into the sampling plan:\n$p")
    }
  }

  test("ngramJaccardPairs never forces a broadcast of the candidate pair list") {
    // r5 verdict: the pre-filter pair aggregate (every pair sharing ≥1
    // surviving shingle) must not carry an explicit broadcast hint — on a
    // dup-heavy corpus it dwarfs the post-Jaccard list and OOMs the driver.
    // AQE may still broadcast at runtime when small; what's pinned here is
    // the absence of a FORCED hint in the logical plan. (The shingle index
    // is checkpointed eagerly, so its intentional 1-row cap broadcast does
    // not appear in this frame's plan.)
    val df = graft.operators.DedupOps.ngramJaccardPairs(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", 0.1)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"candidate pair list must not be hint-broadcast:\n$analyzed")
  }

  test("q_dedup_clusters_incr: the applied-label plan never re-reads corpus text or the posting index") {
    val p = plan("q_dedup_clusters_incr")
    // the label-advance algebra runs over the standing label table and
    // the increment's (eagerly materialized) pair derivation — the final
    // plan re-scanning documents.parquet or the postings artifact would
    // mean the incremental path still pays a corpus-sized read at apply
    // time, which is exactly what it exists to avoid
    assert(!p.contains("documents.parquet"),
      s"incremental cluster apply must not re-scan corpus text:\n$p")
    assert(!p.contains("ngram_postings"),
      s"incremental cluster apply must not re-scan the posting index:\n$p")
  }

  test("q_text_entropy is a pure projection (no shuffle before the output sort)") {
    val p = plan("q_text_entropy")
    val exchanges = "Exchange".r.findAllIn(p).length
    // one Exchange for the final orderBy (range partitioning), nothing else:
    // no explode/groupBy shape anywhere in the entropy computation
    assert(exchanges <= 1, s"entropy should not shuffle token rows:\n$p")
    assert(!p.contains("Generate"), s"entropy must not explode tokens:\n$p")
  }

  test("q_dedup_lines: removal pass is join-free — blocklist broadcast, no reassembly shuffle") {
    val p = plan("q_dedup_lines")
    // the heavy-segment list must reach the corpus as a broadcast scalar
    // (1-row array), never as a shuffle join; and the removal pass must
    // not explode + regroup (split/filter/re-join stay inside the row)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"blocklist must be broadcast, not shuffle-joined:\n$p")
    // exactly one Generate (the explode feeding the frequency aggregate);
    // a second one would mean the removal pass exploded the corpus too
    val generates = "Generate".r.findAllIn(p).length
    assert(generates == 1,
      s"expected one explode (frequency agg), got $generates:\n$p")
  }

  test("q_cohort_retention plans join-free (window anchor, no self-join)") {
    val p = plan("q_cohort_retention")
    assert(!p.contains("Join"), s"cohort anchor must be a window, not a join:\n$p")
  }

  test("pageRank's iteration round: shuffled-hash rank build, stationary edges, no driver collect") {
    // the loop's checkpoints truncate lineage, so the round plan is pinned
    // on iterationRound directly, with infl in the state pageRank leaves
    // it: hash-partitioned on the join key and checkpointed. r19: the
    // V-row rank frame is the BUILD side of a shuffled-hash join — a
    // per-round broadcast collected the rank frame to the driver ten
    // times per run (and past the threshold degraded to per-round
    // sort-merge); the hash build of a co-partitioned V-row slice is
    // executor-side and sort-free at every scale.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val infl = Seq(("a", "b", 0.5), ("a", "c", 0.5), ("b", "a", 1.0),
      ("a", "a", 0.0), ("b", "b", 0.0), ("c", "c", 0.0))
      .toDF("__s", "__d", "__w")
      .repartition(col("__s")).localCheckpoint(eager = true)
    val ranks = Seq(("a", 0.4), ("b", 0.3), ("c", 0.3)).toDF("__v", "__r")
    val p = operators.GraphOps.iterationRound(infl, ranks, 0.85, 3.0)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"rank frame must hash-build against the stationary edges:\n$p")
    assert(p.contains("BuildRight"),
      s"the V-row rank frame (right side) must be the build side:\n$p")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"no per-round driver collect and no per-round sort:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no all-pairs plan:\n$p")
    // decimal accumulation is pushed map-side (partial agg below the shuffle)
    assert(p.contains("partial_sum") || p.contains("partial sum") ||
      p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"expected map-side partial aggregation:\n$p")
    infl.unpersist()
  }

  test("personalized round: same shape as the uniform round — one join, one agg") {
    // the teleport term rides the influence relation as a per-edge __td
    // column recovered by max inside the round's aggregation, so the
    // personalized loop must plan EXACTLY like the uniform one: no
    // teleport join, no per-round V-row driver collect
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val infl = Seq(("a", "b", 0.5, 0.0), ("a", "c", 0.5, 0.0),
      ("b", "a", 1.0, 0.15))
      .toDF("__s", "__d", "__w", "__td")
      .repartition(col("__s")).localCheckpoint(eager = true)
    val ranks = Seq(("a", 0.4), ("b", 0.3), ("c", 0.3)).toDF("__v", "__r")
    val p = operators.GraphOps
      .iterationRoundPersonalized(infl, ranks, 0.85)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no all-pairs plan:\n$p")
    val lines = p.linesIterator.toVector
    assert(lines.count(_.contains("ShuffledHashJoin")) == 1,
      s"exactly ONE join per personalized round (rank frame only):\n$p")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"no per-round driver collect and no per-round sort:\n$p")
    assert(p.contains("max(__td"),
      s"the teleport term must be recovered by max in the same agg:\n$p")
    infl.unpersist()
  }

  test("q_pq_adc_verify: probes and codebook broadcast; one shuffle (the pair aggregate)") {
    // the verify query's scan sides are a 16-row probe set and a 512-row
    // codebook — both must broadcast; the only exchange is the (va, vb)
    // group-by of the per-subspace decimal partials
    val sf = SparkSpec.sf
    val plan = graft.SparkEntry.queries("q_pq_adc_verify")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("CartesianProduct"),
      s"probe×codes candidate generation should be a broadcast product:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the codebook lookup must broadcast:\n$plan")
    val exchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    // pair aggregate + the final window's partition exchange
    assert(exchanges <= 2,
      s"expected at most 2 shuffles (pair agg, shortlist window), got $exchanges:\n$plan")
  }

  test("q_train_ready: one presentation sort, bounded prefix exchanges, no cartesian") {
    // the r11 composition contract: joining the UNSORTED fate/rank cores
    // must not inherit the public entry points' presentation sorts — the
    // only global (range) sort in the composed plan is the final
    // orderBy(doc_id); the only single-partition exchanges are the two
    // 256-row bucket-prefix windows (packAssign + epochRank)
    val p = plan("q_train_ready")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"composed build must stay equi-join only:\n$p")
    val rangeSorts = distinctExchanges(p, "Exchange rangepartitioning")
    assert(rangeSorts <= 1,
      s"expected at most 1 global sort (final orderBy), got $rangeSorts:\n$p")
    val singleParts = distinctExchanges(p, "Exchange SinglePartition")
    assert(singleParts <= 2,
      s"expected at most 2 bounded 256-row prefix exchanges, got $singleParts:\n$p")
  }

  test("q_train_ready_epochs: no cartesian, one presentation sort, bounded allocation exchanges") {
    // the data-constrained composition: the only global sort is the
    // final orderBy(chunk); single-partition exchanges are bounded —
    // the water-filling windows run over ONE ROW PER SOURCE and the
    // pack prefix over 256 bucket rows, never over the token stream.
    // (The 1-row allocation scalars join via broadcast; the plan may
    // render those as BroadcastNestedLoopJoin over one row, which the
    // inventory-wide guard already allows.)
    val p = plan("q_train_ready_epochs")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    val rangeSorts = distinctExchanges(p, "Exchange rangepartitioning")
    assert(rangeSorts <= 1,
      s"expected at most 1 global sort (final orderBy), got $rangeSorts:\n$p")
    val singleParts = distinctExchanges(p, "Exchange SinglePartition")
    assert(singleParts <= 4,
      s"expected at most 4 bounded source/bucket-table exchanges, " +
        s"got $singleParts:\n$p")
  }

  // AQE plan text renders a reused exchange subtree once per reference —
  // count DISTINCT plan ids. A line WITHOUT a plan_id cannot prove reuse,
  // so it counts individually (dedup by text would let two genuinely
  // distinct but identically-rendered exchanges collapse and mask the
  // exact regression this counter guards).
  private def distinctExchanges(p: String, marker: String): Int =
    p.linesIterator.filter(_.contains(marker)).zipWithIndex
      .map { case (l, i) => "plan_id=(\\d+)".r.findFirstMatchIn(l)
        .map(_.group(1)).getOrElse(s"noid-$i") }
      .toSet.size

  test("q_pack_incremental: 1-row totals broadcast (no shuffled cartesian), one presentation sort") {
    // the totals/boundary frame is ONE row by construction; joining it
    // as a BroadcastNestedLoopJoin is the scalar-subquery execution
    // shape — what must never appear is a shuffled CartesianProduct
    // (both sides data-sized) or extra global sorts below the final
    // orderBy(chunk)
    val p = plan("q_pack_incremental")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row totals must broadcast, never a shuffled product:\n$p")
    val rangeSorts = distinctExchanges(p, "Exchange rangepartitioning")
    assert(rangeSorts <= 1,
      s"expected at most 1 global sort (final orderBy), got $rangeSorts:\n$p")
  }

  test("q_pack_examples: bounded prefix exchange only, no cartesian, one presentation sort") {
    // the window materializer inherits packAssign's 256-row two-phase
    // prefix shape: the ONLY single-partition exchange is the bounded
    // bucket-prefix window; token movement is the chunk-keyed hash
    // shuffle; the only global (range) sort is the final orderBy(chunk)
    val p = plan("q_pack_examples")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"window materialization must stay equi-join only:\n$p")
    val singleParts = distinctExchanges(p, "Exchange SinglePartition")
    assert(singleParts <= 1,
      s"expected at most 1 bounded 256-row prefix exchange, got $singleParts:\n$p")
    val rangeSorts = distinctExchanges(p, "Exchange rangepartitioning")
    assert(rangeSorts <= 1,
      s"expected at most 1 global sort (final orderBy), got $rangeSorts:\n$p")
  }

  test("unsorted artifact paths plan ZERO range exchanges (VERDICT r12 #2)") {
    // the trainer-facing shapes: packExamples(sorted = false) and
    // trainReadyIncremental(sorted = false) must never range-exchange
    // the full payload — the global sort is presentation-only and lives
    // in the query bindings
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pw = operators.PipelineOps
      .packExamples(docs, "doc_id", "text", 64L, sorted = false)
      .queryExecution.executedPlan.toString
    assert(distinctExchanges(pw, "Exchange rangepartitioning") == 0,
      s"unsorted packExamples still range-exchanges:\n$pw")
    val bench = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val prior = Seq.tabulate(4)(i =>
      (i.toLong, "kept", 10L, 0L, i.toLong))
      .toDF("doc_id", "fate", "n_tok", "chunk", "rank")
    val inc = Seq((100L, Seq.tabulate(12)(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val priorCorpus = Seq((0L, "prior words here")).toDF("doc_id", "text")
    // priorDocCount attests the (plan-shape-only) fixture's manifest —
    // and keeps this test free of the default path's eager count actions
    val tri = operators.PipelineOps
      .trainReadyIncremental(prior, priorCorpus, inc, bench,
        "doc_id", "text", cap = 16.0, sorted = false,
        priorDocCount = Some(4L))
      .queryExecution.executedPlan.toString
    assert(distinctExchanges(tri, "Exchange rangepartitioning") == 0,
      s"unsorted trainReadyIncremental still range-exchanges:\n$tri")
  }

  test("ivfPqSearch: no vector column on the indexed side of the ADC stage") {
    // the two-frame retrieval must keep the ivfPqKnnJoin property: the
    // corpus embedding is dropped before the probe join; only the
    // refineFactor*k shortlist survivors rejoin real vectors
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    import org.apache.spark.sql.functions.col
    val df = graft.operators.PqOps.ivfPqSearch(
      e.filter(col("vec_id") % 10 === 0),
      e.filter(col("vec_id") % 10 =!= 0),
      "vec_id", "embedding", 5, nlist = 16, nprobe = 8)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("pq_encode"), s"expected PqEncode kernel:\n$p")
    assert(p.contains("pq_adc_dot"), s"expected PqAdcDot kernel:\n$p")
    val joinInputs = p.linesIterator.filter(_.contains("pq_adc_dot")).toSeq
    assert(joinInputs.nonEmpty &&
      joinInputs.forall(l => !l.contains("eb")),
      s"indexed-side vector reached the ADC stage:\n$p")
  }

  test("unigramEncode: vocab side broadcasts, occurrence stream never sort-merges") {
    val s = spark
    import s.implicits._
    val corpus = Seq.tabulate(50)(i => (i.toLong, "ab ra cad abra"))
      .toDF("doc_id", "text")
    val model = Map("ab" -> -1000000000L, "ra" -> -1200000000L,
      "a" -> -3000000000L, "b" -> -3000000000L, "c" -> -3100000000L,
      "d" -> -3200000000L, "r" -> -3300000000L)
    val df = graft.operators.UnigramOps
      .unigramEncode(corpus, "doc_id", "text", model)
    val p = df.queryExecution.executedPlan.toString
    // the per-word Viterbi table joins back to occurrences as a
    // BROADCAST — the corpus-scale occurrence stream must not shuffle
    // onto the word key (skewed at real scale)
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"occurrence stream shuffled onto the word key:\n$p")
  }

  test("unigramSegment is a pure projection: zero exchanges") {
    val s = spark
    import s.implicits._
    val corpus = Seq.tabulate(50)(i => (i.toLong, "ab ra cad abra"))
      .toDF("doc_id", "text")
    val model = Map("ab" -> -1000000000L, "a" -> -3000000000L,
      "b" -> -3000000000L, "c" -> -3100000000L, "d" -> -3200000000L,
      "r" -> -3300000000L)
    val df = graft.operators.UnigramOps
      .unigramSegment(corpus, "doc_id", "text", model)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"segmentation materialization must not shuffle:\n$p")
  }
}
