package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, QDef}
import graft.sources.Tables

/** Relational layer (SURVEY.md §2.5 G5-G9, G15).
  *
  * The reference implements no relational operators (SURVEY.md §2 preamble;
  * exhaustive read of `/root/reference/src/`), but the north star requires
  * full query capability. Everything here is declarative DataFrame API so
  * Catalyst owns pushdown/pruning/join-selection, and AQE re-plans at
  * runtime — the properties that carry to a 1000-executor, 100 TB run.
  *
  * Join strategy at scale:
  *  - dimension tables (nation 25 rows, region 5 rows — fixed size at every
  *    SF) are broadcast explicitly: zero shuffle of the fact side;
  *  - customer⋈orders and lineitem⋈orders are key-partitioned shuffles
  *    (sort-merge / shuffled-hash chosen by AQE from runtime sizes); both
  *    sides shuffle once on the join key and aggregation reuses that
  *    partitioning where possible;
  *  - top-k never sorts globally: TakeOrderedAndProject keeps k rows per
  *    partition then merges k·p rows on the driver.
  */
object RelationalOps {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  // G5: hash aggregate, TPC-H Q1 shape on lineitem. Partial (map-side)
  // aggregation reduces each scan partition to ~6 groups before the shuffle.
  // r19: input-layout-conditionally spread on the near-unique price column
  // (already read — the column-prune pin holds) so the three decimal sums
  // don't run serially on a one-row-group scan; see Tables.spreadIfNarrow.
  private def aggHash(s: SparkSession, d: String): DataFrame =
    Tables.spreadIfNarrow(s,
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02"))),
      col("l_extendedprice"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        (sum(col("l_quantity").cast(DecimalType(28, 6))).cast("double") /
          count(lit(1))).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  // G6: broadcast equi-join — dim enrich through nation/region (both tiny
  // and SF-invariant → explicit broadcast), then shuffle-join to orders.
  private def joinBroadcast(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        countDistinct("c_custkey").as("n_cust"),
        Det.dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")

  // G7: fact⋈fact shuffle join (sort-merge / shuffled-hash via AQE):
  // lineitem ⋈ orders on the order key.
  private def joinSortMerge(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("l_extendedprice")).as("total_price"),
        countDistinct("o_orderkey").as("n_orders"))
      .orderBy("o_orderpriority")

  /** Skew-safe salted equi-join: left rows take a deterministic salt in
    * [0, salts) derived from a NON-key attribute, the right side is
    * replicated once per salt value, and the join keys on (key, salt) —
    * a hot key's rows spread across `salts` reducers instead of
    * hot-spotting one. This is the classic mitigation when the build side
    * is too big to broadcast and AQE's skew-join split can't help (e.g.
    * a downstream aggregation pins the partitioning). Cost model: right
    * side shuffles `salts`× its size — use for (big skewed fact) ⋈
    * (mid-size dim); `saltBy` MUST vary within a key (a line number, a
    * row id — NOT the key itself, which would put every row of the hot
    * key back in one bucket).
    *
    * LIBRARY ENTRY POINT — generic over any two frames; the q_join_salted
    * query proves result parity with the plain join on the DuckDB gate,
    * graft.ApiSpec asserts parity and the salt spread on a synthetic
    * hot-key frame. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int, saltBy: Column): DataFrame = {
    require(salts > 0, s"need salts > 0, got $salts")
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l("__salt") === r("__salt") &&
        left(leftKey) === right(rightKey))
      .drop("__salt")
  }

  // The sort-merge join shape under a synthetic hot key: revenue by order
  // priority through the salted join — identical output to the plain
  // join (the salt is invisible to the aggregation), so the DuckDB
  // oracle is the PLAIN join SQL: the gate proves salting changes the
  // distribution, never the result.
  private def joinSalted(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    val ord = t(s, d, "orders").select("o_orderkey", "o_orderpriority")
    saltedJoin(li, ord, "l_orderkey", "o_orderkey", salts = 8,
      saltBy = col("l_linenumber"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy("o_orderpriority")
  }

  // G8: top-k — planned as TakeOrderedAndProject (no global sort).
  private def topK(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)

  // G9: set ops on key sets (customers with vs without orders).
  private def setOps(s: SparkSession, d: String): DataFrame = {
    val ck = t(s, d, "customer").select(col("c_custkey").as("k"))
    val ok = t(s, d, "orders").select(col("o_custkey").as("k"))
    ck.intersect(ok).withColumn("tag", lit("both"))
      .unionByName(ck.except(ok).withColumn("tag", lit("no_orders")))
      .select("tag", "k")
      .orderBy("tag", "k")
  }

  // G15: distinct users — exact for the oracle; the at-scale variant is
  // q_distinct_users_approx below (HLL++, one pass, constant memory).
  private def distinctUsers(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("event_type")

  // G15 at scale: approx_count_distinct (HLL++) — deterministic for a given
  // dataset but not DuckDB-comparable → rows-only check + ScalaTest.
  // rsd 0.05, not the 0.01 shipped through r4: the sketch width grows
  // ~1/rsd², and at 0.01 the approx variant measured 5.8× the cost of the
  // exact query it exists to undercut (VERDICT r4). At 0.05 it benches
  // cheaper than exact (median-of-5: 0.30s vs 0.36s at sf0.1) — and the
  // test corpus's per-group cardinalities (≤1500) keep HLL++ in its
  // sparse/exact regime, so RelationalSpec's ≤2% assertion holds with
  // margin. At 100 TB the win is structural regardless of rsd: one pass,
  // constant memory, no user_id-keyed shuffle.
  private def distinctUsersApprox(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id", 0.05).as("n_users_approx"))
      .orderBy("event_type")

  /** Mergeable per-group distinct-count SKETCH — the INCREMENTAL member
    * of the G15 family next to the exact `countDistinct` and the
    * `approx_count_distinct` estimate: the per-group Apache DataSketches
    * HLL sketch (Spark's `hll_sketch_agg`) lands as persistable BYTES,
    * so each ingest sketches ONLY its increment and the standing table
    * advances by a register-level union ([[distinctSketchMerge]]) —
    * distinct-count maintenance at cost ∝ increment, with history never
    * re-scanned (the exactDedupIncremental artifact rule applied to
    * cardinality). HLL registers are max-merged, so the union of
    * increment sketches carries the IDENTICAL estimate to a
    * from-scratch sketch of the union (graft.RelationalSpec pins the
    * equality and the ≤2% accuracy vs exact; graft.ApiSpec the generic
    * frame).
    *
    * `lgConfigK` is the accuracy/size lever (DataSketches HLL default
    * 12): the sketch holds coupons EXACTLY until the set-mode capacity
    * (~2^(lgConfigK-3) keys) and only then promotes to the estimating
    * HLL array — below that bound every estimate (and every merge of
    * exact-mode sketches whose union stays below it) is the exact
    * distinct count, the regime [[graft.QDef q_distinct_verify]] pins
    * against the DuckDB oracle.
    *
    * LIBRARY ENTRY POINT — generic over any (group, key) frame. */
  def distinctSketch(rows: DataFrame, group: String, key: String,
      lgConfigK: Int = 12): DataFrame = {
    require(lgConfigK >= 4 && lgConfigK <= 21,
      s"lgConfigK must be in [4, 21], got $lgConfigK")
    rows.groupBy(col(group))
      .agg(hll_sketch_agg(col(key), lit(lgConfigK)).as("sketch"))
  }

  /** Union two [[distinctSketch]] tables (standing ∪ increment) into the
    * advanced standing table — groups present in either side survive,
    * shared groups union at the HLL register level (`hll_union_agg`).
    *
    * LIBRARY ENTRY POINT — generic over any two same-group sketch tables. */
  def distinctSketchMerge(standing: DataFrame, increment: DataFrame,
      group: String): DataFrame =
    standing.unionByName(increment)
      .groupBy(col(group))
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Read the distinct-count estimates off a sketch table — a pure
    * projection of the persisted bytes (`hll_sketch_estimate`); no data
    * pass, usable on any [[distinctSketch]]/[[distinctSketchMerge]]
    * output or a parquet scan of one.
    *
    * LIBRARY ENTRY POINT. */
  def distinctSketchEstimate(sketches: DataFrame, group: String): DataFrame =
    sketches.select(col(group),
      hll_sketch_estimate(col("sketch")).as("n_distinct_est"))

  // q_distinct_incr: the ingest regime — the standing per-type user
  // sketch advances by the increment's sketch (75/25 id-mod split),
  // estimates read off the merged bytes. Not DuckDB-expressible
  // (DataSketches HLL) → rows-only; RelationalSpec pins merged ≡
  // from-scratch estimate equality and ≤2% of exact.
  private def distinctIncr(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val standing = distinctSketch(ev.filter(col("event_id") % 4 =!= 0),
      "event_type", "user_id")
    val inc = distinctSketch(ev.filter(col("event_id") % 4 === 0),
      "event_type", "user_id")
    distinctSketchEstimate(
      distinctSketchMerge(standing, inc, "event_type"), "event_type")
      .orderBy("event_type")
  }

  /** Mergeable per-group QUANTILE sketch — the order-statistics member
    * of the mergeable-sketch family (frequent items + distinct landed
    * r14; this completes VERDICT r14 #2): the per-group Apache
    * DataSketches KLL doubles sketch (Spark's `kll_sketch_agg_double`)
    * lands as persistable BYTES, so each ingest sketches ONLY its
    * increment and the standing table advances by a sketch-level merge
    * ([[quantileSketchMerge]]) — quantile maintenance at cost ∝
    * increment with history never re-scanned. This is the artifact an
    * ingest pipeline reads its perplexity-bucket edges (q_sample_ppl)
    * from WITHOUT a profiling re-scan of the corpus.
    *
    * `k` is the accuracy lever: single-sided normalized rank error
    * ≈ 2.3/k^0.9 (k=2048 → ~0.25% of rank). While a group's total
    * stream fits the sketch's exact regime (n ≤ capacity(k)) the
    * retained items ARE the stream and every estimate is the exact
    * quantile — there graft.RelationalSpec pins merged-increments ≡
    * from-scratch bit-equality; in the compacting regime it pins the
    * rank-error band against the exact quantiles at corpus scale.
    * KLL compaction draws random offsets, so compacting-regime bytes
    * are not replay-identical — the GUARANTEE (rank error) is what an
    * ingest consumer may rely on, exactly as documented by DataSketches.
    *
    * LIBRARY ENTRY POINT — generic over any (group, numeric value) frame. */
  def quantileSketch(rows: DataFrame, group: String, value: String,
      k: Int = 2048): DataFrame =
    rows.groupBy(col(group))
      .agg(call_function("kll_sketch_agg_double",
        col(value).cast("double"), lit(k)).as("qsketch"))

  /** Merge two [[quantileSketch]] tables (standing ∪ increment) into the
    * advanced standing table — groups present in either side survive,
    * shared groups merge at the sketch level (`kll_merge_agg_double`).
    * `k` must be the family's k: a merge buffer coarser than the inputs
    * would silently downgrade every future estimate's guarantee.
    *
    * LIBRARY ENTRY POINT — generic over any two same-group sketch tables. */
  def quantileSketchMerge(standing: DataFrame, increment: DataFrame,
      group: String, k: Int = 2048): DataFrame =
    standing.unionByName(increment)
      .groupBy(col(group))
      .agg(call_function("kll_merge_agg_double", col("qsketch"), lit(k))
        .as("qsketch"))

  /** Column label for quantile q: p50, p95, p99_9, p99_95. The
    * non-multiple-of-10 fraction is zero-padded (0.9905 → p99_05, not
    * the p99_5 that would collide with 0.995 — ADVICE r15), while
    * multiples of 10 keep the single-digit form. */
  private def pLabel(q: Double): String = {
    val bp = math.round(q * 10000).toInt
    val frac = bp % 100
    if (frac == 0) s"p${bp / 100}"
    else if (frac % 10 == 0) s"p${bp / 100}_${frac / 10}"
    else f"p${bp / 100}%d_$frac%02d"
  }

  /** Read quantile estimates off a sketch table — a pure projection of
    * the persisted bytes (`kll_sketch_get_quantile_double`); no data
    * pass, usable on any [[quantileSketch]]/[[quantileSketchMerge]]
    * output or a parquet scan of one.
    *
    * LIBRARY ENTRY POINT. */
  def quantileSketchEstimate(sketches: DataFrame, group: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0d && q <= 1d),
      s"quantiles must be in [0, 1], got $qs")
    sketches.select(col(group) +: qs.map(q =>
      call_function("kll_sketch_get_quantile_double", col("qsketch"),
        lit(q)).as(pLabel(q))): _*)
  }

  /** Bucket edges for [[PipelineOps.bucketQuotaSample]] read off a
    * standing single-group [[quantileSketch]] artifact — the loop
    * VERDICT r14 #2 names, closed: an ingest pipeline derives its
    * score-bucket edges from the persisted, ingest-advanced sketch
    * bytes (`graft.Run`'s `stats/len_quantiles` shape) instead of an
    * order-statistics re-scan of the corpus. Driver-side and tiny (one
    * sketch row in, |qs| doubles out). Tied estimates collapse to one
    * edge — adjacent buckets merge rather than violating
    * bucketQuotaSample's strictly-ascending contract.
    *
    * LIBRARY ENTRY POINT. */
  def sketchEdges(sketches: DataFrame, group: String,
      qs: Seq[Double]): Seq[Double] = {
    val skRows = sketches.select(col(group), col("qsketch")).collect()
    require(skRows.length == 1,
      s"sketchEdges reads a single-group sketch table, got ${skRows.length} groups")
    // an empty sketch (every value in the group NULL) serializes as its
    // bare 8-byte preamble, and estimating it blows up inside the kll
    // function with an opaque SparkRuntimeException — fail loudly with
    // the cause instead (ADVICE r15). A non-empty KLL doubles sketch is
    // at least the 16-byte single-item form.
    require(!skRows(0).isNullAt(1) &&
        skRows(0).getAs[Array[Byte]](1).length > 8,
      s"sketchEdges: the sketch for group '${skRows(0).get(0)}' is " +
        "empty (all values NULL?) — no edges can be estimated")
    val rows = quantileSketchEstimate(sketches, group, qs).collect()
    qs.indices.map { i =>
      require(!rows(0).isNullAt(i + 1),
        s"sketchEdges: quantile ${qs(i)} estimated NULL — the sketch " +
          s"for group '${rows(0).get(0)}' is empty (all values NULL?)")
      rows(0).getDouble(i + 1)
    }.distinct.sorted
  }

  // q_quantiles_incr: the ingest regime for order statistics — the
  // standing per-type value sketch advances by the increment's sketch
  // (75/25 id-mod split, the q_distinct_incr shape), quartiles + p95
  // read off the merged bytes. Not DuckDB-expressible (DataSketches
  // KLL) → rows-only; RelationalSpec pins exact-regime merged ≡
  // from-scratch equality and the compacting-regime rank-error band
  // vs the exact quantiles.
  private def quantilesIncr(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val standing = quantileSketch(ev.filter(col("event_id") % 4 =!= 0),
      "event_type", "value")
    val inc = quantileSketch(ev.filter(col("event_id") % 4 === 0),
      "event_type", "value")
    val est = quantileSketchEstimate(
      quantileSketchMerge(standing, inc, "event_type"),
      "event_type", Seq(0.25, 0.5, 0.75, 0.95))
    est.select(col("event_type") +:
      est.columns.filter(_ != "event_type").toIndexedSeq.map(c =>
        Det.r4(col(c)).as(c)): _*)
      .orderBy("event_type")
  }

  // q_distinct_verify (VERDICT r15 #3): the q_distinct_incr READ path
  // joined to the HASH gate — in the HLL set-mode exact regime the
  // merged estimate IS the exact distinct count, which DuckDB re-derives
  // as COUNT(DISTINCT) over the same rows. Subset: event_id % 4 (max
  // per-group cardinality 1456 at sf0.1) under lgConfigK=14 (set-mode
  // capacity ~2048) — measured exact at both gate SFs; the incr split
  // (75/25 on event_id % 16) mirrors q_distinct_incr so the verified
  // path is sketch → merge → estimate, not a single-sketch shortcut.
  private def distinctVerify(s: SparkSession, d: String): DataFrame = {
    val sub = t(s, d, "events").filter(col("event_id") % 4 === 0)
    val standing = distinctSketch(sub.filter(col("event_id") % 16 =!= 0),
      "event_type", "user_id", lgConfigK = 14)
    val inc = distinctSketch(sub.filter(col("event_id") % 16 === 0),
      "event_type", "user_id", lgConfigK = 14)
    distinctSketchEstimate(
      distinctSketchMerge(standing, inc, "event_type"), "event_type")
      .orderBy("event_type")
  }

  // q_quantiles_verify (VERDICT r15 #3): the q_quantiles_incr READ path
  // joined to the hash gate — in the KLL exact regime (every item
  // retained; k=2048 holds ~1536 items with margin, the subset's max
  // group is 1279 at sf0.1) the merged estimate under INCLUSIVE rank
  // semantics is the sorted item at position ceil(q·n), which DuckDB
  // re-derives with a window rank over the same rows.
  private def quantilesVerify(s: SparkSession, d: String): DataFrame = {
    val sub = t(s, d, "events").filter(col("event_id") % 16 === 0)
    val standing = quantileSketch(sub.filter(col("event_id") % 64 =!= 0),
      "event_type", "value")
    val inc = quantileSketch(sub.filter(col("event_id") % 64 === 0),
      "event_type", "value")
    val est = quantileSketchEstimate(
      quantileSketchMerge(standing, inc, "event_type"),
      "event_type", Seq(0.25, 0.5, 0.75, 0.95))
    est.select(col("event_type") +:
      est.columns.filter(_ != "event_type").toIndexedSeq.map(c =>
        Det.r4(col(c)).as(c)): _*)
      .orderBy("event_type")
  }

  private val quantilesVerifySql: String = {
    val legs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75",
      0.95 -> "p95").map { case (q, label) =>
      Det.r4Sql(s"MIN(CASE WHEN rn >= CEIL($q * n) THEN v END)") +
        s" AS $label"
    }.mkString(",\n ")
    s"""WITH v AS (
       | SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
       | WHERE event_id % 16 = 0),
       |r AS (
       | SELECT event_type, v,
       |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn,
       |  COUNT(*) OVER (PARTITION BY event_type) AS n FROM v)
       |SELECT event_type,
       | $legs
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // Top-k per group, two-phase: a single window partitioned by the group
  // key alone caps parallelism at the group cardinality (5 priorities =
  // 5 tasks forever). Phase 1 ranks within (group, salt) — 64-way salt →
  // group·64 parallel partial sorts — keeping k candidates each; phase 2
  // ranks the tiny candidate set (groups × salt × k rows) exactly. Any
  // true global top-k row is necessarily in its salt bucket's top-k, so
  // the result is identical to the direct window.
  private def topKPerGroup(s: SparkSession, d: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val ord = Seq(desc("o_totalprice"), col("o_orderkey"))
    val local = W.partitionBy(col("o_orderpriority"), col("salt")).orderBy(ord: _*)
    val global = W.partitionBy("o_orderpriority").orderBy(ord: _*)
    t(s, d, "orders")
      .withColumn("salt", pmod(col("o_orderkey"), lit(64)))
      .withColumn("lrk", row_number().over(local))
      .filter(col("lrk") <= 3)
      .withColumn("rk", row_number().over(global))
      .filter(col("rk") <= 3)
      .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rk")
  }

  // Pivot: event_type sums fanned out to columns. Explicit pivot values —
  // no distinct-values inference job, deterministic column order.
  private def pivotEvents(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val e = t(s, d, "events").withColumn("part", (col("user_id") % 8).as("part"))
    e.groupBy("part")
      .pivot("event_type", types)
      .agg(Det.dsum(col("value")))
      .select(col("part") +: types.map(ty => col(ty).as(s"sum_$ty")): _*)
      .orderBy("part")
  }

  // Rollup: hierarchical subtotals region → nation → total, computed as a
  // CASCADE — aggregate once at the finest grain, then re-aggregate the
  // (tiny) result upward. At 100 TB this beats `rollup()`'s Expand plan,
  // which replicates every input row once per grouping level through the
  // shuffle. Intermediate sums stay DECIMAL so every level equals the
  // direct exact sum over raw rows (a double cascade would accumulate
  // rounding that the DuckDB ROLLUP oracle does not have); group markers
  // surface as '(all)' so both engines order identically.
  private def rollupRevenue(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("rn"), col("n_name").as("nn"),
        col("o_totalprice"))
    val detail = base.groupBy("rn", "nn")
      .agg(Det.decSum(col("o_totalprice")).as("rev_dec"), count(lit(1)).as("n"))
    val byRegion = detail.groupBy("rn")
      .agg(sum("rev_dec").as("rev_dec"), sum("n").as("n"))
      .withColumn("nn", lit(null).cast("string"))
    val total = byRegion
      .agg(sum("rev_dec").as("rev_dec"), sum("n").as("n"))
      .withColumn("rn", lit(null).cast("string"))
      .withColumn("nn", lit(null).cast("string"))
    detail.unionByName(byRegion).unionByName(total)
      .select(coalesce(col("rn"), lit("(all)")).as("r_name"),
        coalesce(col("nn"), lit("(all)")).as("n_name"),
        col("rev_dec").cast("double").as("revenue"), col("n"))
      .orderBy("r_name", "n_name")
  }

  // Exact quantiles per group — the oracle-checkable path; the at-scale
  // variant is quantilesApprox below. r7: the `percentile` AGGREGATE
  // (boxed value->count OpenHashMap per group buffer) was the suite's most
  // allocation-bound query and its timings tracked GC pressure (isolated
  // 9-rep spread 1.65× on unchanged code). This sort-based form ranks each
  // group with a Tungsten window sort (primitive, spillable) and
  // interpolates exactly like Percentile.getPercentile: pos = p·(n-1),
  // result = v_lo·(hi-pos) + v_hi·(pos-lo), lower value when pos is
  // integral — same doubles, same answers. Group parallelism is one task
  // per group (fine at gate SF; at 100 TB exact quantiles over a
  // table-scale group is the wrong tool regardless — use quantilesApprox).
  private val QuantileFracs = Seq("q25" -> 0.25, "q50" -> 0.5,
    "q75" -> 0.75, "q95" -> 0.95)
  private def quantiles(s: SparkSession, d: String): DataFrame = {
    val vals = t(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
    val counts = vals.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("v")
    val ranked = vals.join(broadcast(counts), Seq("l_returnflag"))
      .withColumn("rn", row_number().over(w).cast("long") - 1L)
    val qCols = QuantileFracs.map { case (name, p) =>
      val pos = lit(p) * (col("n") - 1).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      val vLo = max(when(col("rn") === lo.cast("long"), col("v")))
      val vHi = max(when(col("rn") === hi.cast("long"), col("v")))
      // n is group-constant: max() just extracts it for the interpolation
      val posA = lit(p) * (max(col("n")) - 1).cast("double")
      val loA = floor(posA)
      val hiA = ceil(posA)
      Det.r4(when(loA === hiA, vLo)
        .otherwise(vLo * (hiA - posA) + vHi * (posA - loA))).as(name)
    }
    ranked
      // only the rank-adjacent rows feed the interpolation — drop the rest
      // before the aggregation
      .filter(QuantileFracs.map { case (_, p) =>
        val pos = lit(p) * (col("n") - 1).cast("double")
        col("rn") === floor(pos).cast("long") ||
          col("rn") === ceil(pos).cast("long")
      }.reduce(_ || _))
      .groupBy("l_returnflag")
      .agg(qCols.head, qCols.tail: _*)
      .orderBy("l_returnflag")
  }

  // Quantiles at scale: percentile_approx (GK sketch — bounded memory, one
  // pass, mergeable across partitions). Rank-error bound vs the exact
  // quantiles is asserted in RelationalSpec.
  private def quantilesApprox(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("q50_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("q95_approx"))
      .orderBy("l_returnflag")

  /** Single-pass table profiler — the per-column stats card (null count,
    * exact distinct count, min/max) an engine ships for data validation
    * and ingest QA. One aggregation over the table computes every column's
    * stats together; the single row then unpivots to one row per column.
    *
    * Scale note: N exact `countDistinct`s in one aggregate make Catalyst
    * Expand the input N-fold before the shuffle — the exact profile of a
    * wide 100 TB table costs N× the scan in shuffle volume. Pass
    * `approx = true` to swap in HLL sketches (one pass, no Expand,
    * mergeable partials) — the default for production-width tables; exact
    * is the oracle-checkable form.
    *
    * LIBRARY ENTRY POINT — generic over ANY DataFrame. */
  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType, LongType, StructType, StructField}
    val names = df.schema.fields.map(_.name).toSeq
    if (names.isEmpty)
      return df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("column", StringType), StructField("n_rows", LongType),
          StructField("n_nulls", LongType), StructField("n_distinct", LongType),
          StructField("min_val", StringType), StructField("max_val", StringType))))
    // Positional rename shields everything downstream from hostile field
    // names (dots, backticks, duplicates after a join) — the original name
    // survives only as the output label.
    val norm = df.toDF(names.indices.map(i => s"c$i"): _*)
    // Maps are neither orderable nor hashable in Spark: no min/max, no
    // countDistinct — profile them as nulls-only rather than refusing the
    // whole frame.
    val orderable = df.schema.fields.map(!_.dataType.isInstanceOf[MapType])
    val aggs = names.indices.flatMap { i =>
      val c = col(s"c$i")
      Seq(count(when(c.isNull, 1)).as(s"c${i}__nulls")) ++ (
        if (!orderable(i)) Seq(
          lit(null).cast("long").as(s"c${i}__distinct"),
          lit(null).cast("string").as(s"c${i}__min"),
          lit(null).cast("string").as(s"c${i}__max"))
        else Seq(
          (if (approx) approx_count_distinct(c, 0.01)
           else countDistinct(c)).as(s"c${i}__distinct"),
          min(c).cast("string").as(s"c${i}__min"),
          max(c).cast("string").as(s"c${i}__max")))
    } :+ count(lit(1)).as("__rows")
    norm.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(names.indices.map(i => struct(
        lit(names(i)).as("column"),
        col("__rows").as("n_rows"),
        col(s"c${i}__nulls").as("n_nulls"),
        col(s"c${i}__distinct").as("n_distinct"),
        col(s"c${i}__min").as("min_val"),
        col(s"c${i}__max").as("max_val"))): _*)).as("p"))
      .select("p.*")
      .orderBy("column")
  }

  // Profile binding: the type-stable columns of events (long + string cast
  // to string identically in both engines; the ns-timestamp and double
  // columns have engine-specific string renderings and stay out of the
  // oracle-checked binding).
  // r19 negative result (kept as shipped): spreading the scan before the
  // profile (repartition on event_id) measured 1.49→1.59 s isolated — the
  // Expand+sort-aggregate chain on the single-row-group bench scan is NOT
  // the line's bottleneck (the multi-distinct cascade's exchanges and
  // per-stage constants are), so the extra exchange only added cost. A
  // library caller's scan brings its own parallelism at corpus scale.
  private def profileEvents(s: SparkSession, d: String): DataFrame =
    profile(t(s, d, "events").select("event_id", "user_id", "event_type", "props"))

  private def profileColSql(c: String) =
    s"""SELECT '$c' AS "column", count(*) AS n_rows,
       | count(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls,
       | count(DISTINCT $c) AS n_distinct,
       | CAST(min($c) AS VARCHAR) AS min_val,
       | CAST(max($c) AS VARCHAR) AS max_val FROM events""".stripMargin

  val defs: Seq[QDef] = Seq(
    QDef("q_profile", profileEvents, Some(
      Seq("event_id", "user_id", "event_type", "props")
        .map(profileColSql)
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""))),
    QDef("q_agg_hash", aggHash, Some(
      s"""SELECT l_returnflag, l_linestatus,
         | ${Det.dsumSql("l_quantity")} AS sum_qty,
         | ${Det.dsumSql("l_extendedprice")} AS sum_base_price,
         | ${Det.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         | CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_qty,
         | count(*) AS n
         | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    QDef("q_join_broadcast", joinBroadcast, Some(
      s"""SELECT r_name, n_name, count(DISTINCT c_custkey) AS n_cust,
         | ${Det.dsumSql("o_totalprice")} AS revenue, count(*) AS n_orders
         | FROM orders
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    QDef("q_join_sortmerge", joinSortMerge, Some(
      s"""SELECT o_orderpriority, count(*) AS n_items,
         | ${Det.dsumSql("l_extendedprice")} AS total_price,
         | count(DISTINCT o_orderkey) AS n_orders
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | GROUP BY 1 ORDER BY 1""".stripMargin)),
    QDef("q_join_salted", joinSalted, Some(
      s"""SELECT o_orderpriority, count(*) AS n_items,
         | ${Det.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | GROUP BY 1 ORDER BY 1""".stripMargin)),
    QDef("q_topk", topK, Some(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),
    QDef("q_set_ops", setOps, Some(
      """SELECT * FROM (
        | SELECT 'both' AS tag, k FROM
        |  (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
        | UNION ALL
        | SELECT 'no_orders' AS tag, k FROM
        |  (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
        |) ORDER BY tag, k""".stripMargin)),
    QDef("q_distinct_users", distinctUsers, Some(
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    QDef("q_distinct_users_approx", distinctUsersApprox, None),
    QDef("q_distinct_incr", distinctIncr, None),
    QDef("q_distinct_verify", distinctVerify, Some(
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct_est
        | FROM events WHERE event_id % 4 = 0
        | GROUP BY 1 ORDER BY 1""".stripMargin)),
    QDef("q_quantiles_incr", quantilesIncr, None),
    QDef("q_quantiles_verify", quantilesVerify, Some(quantilesVerifySql)),
    QDef("q_topk_per_group", topKPerGroup, Some(
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |   ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin)),
    QDef("q_pivot_events", pivotEvents, Some(
      s"""SELECT user_id % 8 AS part,
         | ${Det.dsumSql("CASE WHEN event_type = 'click' THEN value END")} AS sum_click,
         | ${Det.dsumSql("CASE WHEN event_type = 'error' THEN value END")} AS sum_error,
         | ${Det.dsumSql("CASE WHEN event_type = 'purchase' THEN value END")} AS sum_purchase,
         | ${Det.dsumSql("CASE WHEN event_type = 'signup' THEN value END")} AS sum_signup,
         | ${Det.dsumSql("CASE WHEN event_type = 'view' THEN value END")} AS sum_view
         | FROM events GROUP BY 1 ORDER BY part""".stripMargin)),
    QDef("q_rollup_revenue", rollupRevenue, Some(
      s"""SELECT coalesce(r_name, '(all)') AS r_name,
         | coalesce(n_name, '(all)') AS n_name,
         | ${Det.dsumSql("o_totalprice")} AS revenue, count(*) AS n
         | FROM orders
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         | GROUP BY ROLLUP (r_name, n_name) ORDER BY r_name, n_name""".stripMargin)),
    QDef("q_quantiles", quantiles, Some(
      s"""SELECT l_returnflag,
         | ${Det.r4Sql("quantile_cont(l_extendedprice, 0.25)")} AS q25,
         | ${Det.r4Sql("quantile_cont(l_extendedprice, 0.5)")} AS q50,
         | ${Det.r4Sql("quantile_cont(l_extendedprice, 0.75)")} AS q75,
         | ${Det.r4Sql("quantile_cont(l_extendedprice, 0.95)")} AS q95
         | FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),
    // GK sketch internals differ across engines → ScalaTest rank-error
    // bound vs the exact quantiles (RelationalSpec).
    QDef("q_quantiles_approx", quantilesApprox, None)
  )
}
