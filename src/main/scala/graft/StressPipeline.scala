package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One-off large-corpus stress run of the COMPOSED pretraining build
  * ([[graft.operators.PipelineOps.trainReady]]) — the [[StressGraph]] /
  * [[StressDedup]] tradition applied to the round-11 flagship.
  *
  * The bench corpus is 5k docs at sf0.1; this main synthesizes a corpus
  * 30× larger with every fate EXACTLY planted by id range, so the full
  * composition (quality filter → exact dedup → near-dup clustering →
  * decontamination → span-corruption formatter → context-window packing
  * → epoch order) runs end-to-end at scale AND its output is checkable
  * to the row count:
  *
  * (fractions of the N-doc corpus; at the default N=150k the ranges
  * below are ×5):
  *
  *  - first 1/6: 2-token bodies                         → quality
  *  - next 1/6: byte-identical copy of id + N/6         → kept (min-id
  *    keeps the copy; the BASE becomes the exact_dup)
  *  - next 1/6: the copied bases                        → exact_dup
  *  - next 1/12: near-dup cluster reps                  → kept
  *  - next 1/12: 27-of-30 token overlap with id - N/12
  *    (3-shingle jaccard ≈ 0.76)                        → near_dup
  *  - next 1/12: carry an 8-token run shared with every
  *    bench doc — the run's 3-shingles sit in N/12 docs,
  *    far above the inverted index's df cap, so near-dup
  *    NEVER pairs them (the cap doing its job at scale)
  *    while the capless 8-gram decontamination still
  *    catches every one                                 → contaminated
  *  - remaining 1/4: clean unique docs                  → kept
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.StressPipeline"`
  * (env: SPARK_GRAFT_STRESS_DOCS scales the corpus, default 150,000 —
  * must be a multiple of 30,000 so the planted ranges stay exact).
  */
object StressPipeline {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_STRESS_DOCS", "150000").toLong
    require(nDocs % 30000 == 0, s"nDocs must be a multiple of 30000: $nDocs")
    // token = "a{seed}x{j}" — at 7-digit seeds the 11-char tokens push
    // avg_tok_len past qualityFilter's 10.0 bound and the planted fates
    // stop holding; the corpus generator, not the pipeline, is the limit
    // (the r12 increment phase raises the max seed to nDocs·7/6, so the
    // 6-digit ceiling binds at 840k)
    require(nDocs <= 840000,
      s"planted-fate token lengths only hold to 840k docs, got $nDocs")
    val u = nDocs / 30000L // range unit: quality/exact/near blocks scale
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    def cleanBody(seed: Column): Column =
      concat_ws(" ", lit("the"), transform(sequence(lit(0), lit(29)),
        j => concat(lit("a"), seed, lit("x"), j.cast("string"))), lit("and"))
    def nearBody(seed: Column, self: Column): Column =
      concat_ws(" ", lit("the"), transform(sequence(lit(0), lit(29)),
        j => when(j < 27, concat(lit("a"), seed, lit("x"), j.cast("string")))
          .otherwise(concat(lit("b"), self, lit("x"), j.cast("string")))),
        lit("and"))
    val cRun = concat_ws(" ",
      (0 until 8).map(i => lit(s"c$i")): _*)
    def contamBody(self: Column): Column =
      concat_ws(" ", lit("the"), cRun,
        transform(sequence(lit(0), lit(20)),
          j => concat(lit("a"), self, lit("x"), j.cast("string"))),
        lit("and"))

    val b = Seq(5000L * u, 10000L * u, 15000L * u, 17500L * u,
      20000L * u, 22500L * u) // range boundaries, ×3 of the doc counts
    val corpus = spark.range(nDocs).repartition(32)
      .select(col("id"),
        when(col("id") < b(0), lit("too short"))
          .when(col("id") < b(1), cleanBody(col("id") + b(0)))
          .when(col("id") < b(2), cleanBody(col("id")))
          .when(col("id") < b(3), cleanBody(col("id")))
          .when(col("id") < b(4), nearBody(col("id") - 2500L * u, col("id")))
          .when(col("id") < b(5), contamBody(col("id")))
          .otherwise(cleanBody(col("id"))).as("body"))
    val bench = spark.range(500)
      .select(col("id"),
        concat_ws(" ", lit("the"), cRun,
          transform(sequence(lit(0), lit(20)),
            j => concat(lit("z"), col("id"), lit("x"), j.cast("string"))),
          lit("and")).as("body"))

    val dir = "target/stress_pipeline"
    timed(s"trainReady end-to-end ($nDocs docs, full pair derivation)") {
      graft.operators.PipelineOps
        .trainReady(corpus, bench, "id", "body",
          cap = 4096.0, epoch = "s1")
        .write.mode("overwrite").parquet(dir)
    }
    val m = spark.read.parquet(dir)

    val fates = m.groupBy("fate").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Map(
      "quality" -> 5000L * u, "exact_dup" -> 5000L * u,
      "near_dup" -> 2500L * u, "contaminated" -> 2500L * u,
      "kept" -> (nDocs - 15000L * u))
    println(s"[stress] fates: $fates")
    assert(fates == expected, s"planted fates violated: $fates vs $expected")

    val kept = m.filter(col("fate") === "kept")
    val k = kept.count()
    assert(kept.filter(col("chunk").isNull || col("rank").isNull ||
      col("n_tok").isNull).count() == 0,
      "a kept doc is missing its pack/order assignment")
    assert(m.filter(col("fate") =!= "kept" &&
      col("rank").isNotNull).count() == 0,
      "a dropped doc received a training rank")
    val r = kept.agg(min("rank"), max("rank"),
      countDistinct("rank"), sum("n_tok"), max("chunk")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == k - 1 &&
      r.getLong(2) == k,
      s"epoch ranks not dense 0..${k - 1}: $r")
    val totalTok = r.getLong(3)
    val maxChunk = r.getLong(4)
    // first-token-in-window policy: the last chunk is
    // floor((T - n_last)/cap) — within one window of T/cap
    assert(math.abs(maxChunk - totalTok / 4096L) <= 1,
      s"chunk axis inconsistent with the token total: $maxChunk vs " +
        s"${totalTok / 4096L}")
    println(s"[stress] kept=$k totalTok=$totalTok chunks=${maxChunk + 1} " +
      s"ranks dense 0..${k - 1}")

    // --- r12: incremental ingest at scale ------------------------------
    // A 5000u-doc increment (1/6 of the corpus) with every frozen-prior
    // fate branch planted exactly: quality shorts (byte-identical to the
    // prior shorts — quality must still precede the exact check), exact
    // copies of prior kept docs, 27-of-30 near-dups of OTHER prior kept
    // docs (cross-batch pairs through the persisted posting index),
    // contaminated docs whose shared-run shingles sit far above the
    // UNION df cap (the cap must keep pruning them while the capless
    // 8-gram decontamination still catches every one), and fresh clean
    // docs. The ingest consumes the standing artifacts exactly as a
    // production pipeline would: the batch manifest written above, the
    // prior corpus, and a persisted posting index.
    val off = nDocs
    val inc = spark.range(off, off + 5000L * u).repartition(32)
      .select(col("id"),
        when(col("id") < off + 1000L * u, lit("too short"))
          .when(col("id") < off + 2000L * u,
            cleanBody(col("id") - (off + 1000L * u) + 22500L * u))
          .when(col("id") < off + 3000L * u,
            nearBody(col("id") - (off + 2000L * u) + 23500L * u, col("id")))
          .when(col("id") < off + 4000L * u, contamBody(col("id")))
          .otherwise(cleanBody(col("id"))).as("body"))
    val postings = timed("standing posting index (one-time artifact)") {
      val p = graft.operators.DedupOps.ngramPostings(corpus, "id", "body")
      p.write.mode("overwrite").parquet(s"$dir-postings")
      spark.read.parquet(s"$dir-postings")
    }
    val hashes = timed("standing hash table (one-time artifact)") {
      corpus.select(md5(col("body").cast("binary")).as("h"))
        .write.mode("overwrite").parquet(s"$dir-hashes")
      spark.read.parquet(s"$dir-hashes")
    }
    val incDir = s"$dir-incr"
    timed(s"trainReadyIncremental (${5000L * u}-doc ingest onto $nDocs)") {
      graft.operators.PipelineOps
        .trainReadyIncremental(m, corpus, inc, bench, "id", "body",
          cap = 4096.0, epoch = "s1",
          precomputedPostings = Some(postings),
          precomputedHashes = Some(hashes))
        .write.mode("overwrite").parquet(incDir)
    }
    val m1 = spark.read.parquet(incDir)

    // history frozen: the prior block of the merged manifest is
    // row-for-row the batch manifest
    assert(m1.filter(col("doc_id") < nDocs).exceptAll(
      m.select("doc_id", "fate", "n_tok", "chunk", "rank")).count() == 0 &&
      m1.filter(col("doc_id") < nDocs).count() == nDocs,
      "incremental ingest rewrote prior manifest rows")
    val incFates = m1.filter(col("doc_id") >= nDocs)
      .groupBy("fate").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val incExpected = Map(
      "quality" -> 1000L * u, "exact_dup" -> 1000L * u,
      "near_dup" -> 1000L * u, "contaminated" -> 1000L * u,
      "kept" -> 1000L * u)
    println(s"[stress] increment fates: $incFates")
    assert(incFates == incExpected,
      s"planted increment fates violated: $incFates vs $incExpected")
    val keptNew = m1.filter(col("doc_id") >= nDocs && col("fate") === "kept")
    val rn = keptNew.agg(min("rank"), max("rank"), countDistinct("rank"),
      min("chunk")).head()
    assert(rn.getLong(0) == k && rn.getLong(1) == k + 1000L * u - 1 &&
      rn.getLong(2) == 1000L * u,
      s"increment ranks not appended dense after the prior block: $rn")
    assert(rn.getLong(3) >= maxChunk,
      s"increment did not continue the pack cursor: ${rn.getLong(3)} < $maxChunk")
    println(s"[stress] increment kept=${1000L * u} ranks " +
      s"$k..${k + 1000L * u - 1} first chunk=${rn.getLong(3)} " +
      s"(prior last=$maxChunk)")
    spark.stop()
  }
}
