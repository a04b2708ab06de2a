package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off dup-heavy stress run of the near-dup pair path (documented in
  * BASELINE.md).
  *
  * Round 5 removed a forced broadcast of the candidate pair list from
  * [[graft.operators.DedupOps.ngramJaccardPairs]] — a fix whose value only
  * shows when the pair list is LARGE. The test corpus is dup-light (the
  * whole sf0.1 pair list is tiny), so this main derives a dup-HEAVY corpus
  * and runs the full pair + curate path over it once:
  *
  *  - corpus: sf0.1 `documents` unioned with `copies` mutated near-copies
  *    per doc (deterministic token substitutions, ~1/17 of tokens per
  *    copy, new ids) → (copies+1)× the docs and a pair list that is
  *    O(copies²) per original — tens of thousands of times the natural
  *    pair volume;
  *  - written to (and re-read from) `target/stress_corpus` so the path
  *    starts from parquet like production (TESTDATA is read-only);
  *  - reported: wall time per phase, rows, total + peak-stage shuffle
  *    write, and whether any stage's shuffle grew past the driver-memory
  *    regime a broadcast of it would have needed.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.StressDedup"`
  * (env: SPARK_GRAFT_SF_DIR to change the base corpus,
  * SPARK_GRAFT_STRESS_COPIES to change the amplification, default 9).
  */
object StressDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "9").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // stage-level shuffle accounting: total and peak single-stage write
    val totalShuffle = new java.util.concurrent.atomic.AtomicLong(0L)
    val peakShuffle = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val w = e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        totalShuffle.addAndGet(w)
        peakShuffle.getAndAccumulate(w, (a, b) => math.max(a, b))
      }
    })

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // --- derive the dup-heavy corpus -----------------------------------
    val base = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text")
    val copyIdx = array((1 to copies).map(lit): _*)
    // copy c of a doc substitutes tokens at positions ≡ -c (mod 17):
    // distinct copies differ from the original AND from each other in
    // ~1/17 of positions — 8-shingle Jaccard stays ≈ (1-2*8/17) well
    // above the 0.5 threshold for real docs
    val mutated = base
      .select(col("doc_id"), col("text"), explode(copyIdx).as("c"))
      .select(
        (col("doc_id") * (copies + 1) + col("c")).as("doc_id"),
        array_join(
          transform(split(col("text"), " "),
            (t, i) => when(pmod(i + col("c"), lit(17)) === 0,
              concat(t, lit("q"))).otherwise(t)),
          " ").as("text"))
    val corpusPath = "target/stress_corpus"
    timed(s"build ${copies}x mutated corpus -> $corpusPath") {
      base.select((col("doc_id") * (copies + 1)).as("doc_id"), col("text"))
        .unionByName(mutated)
        .repartition(32)
        .write.mode("overwrite").parquet(corpusPath)
    }
    val corpus = spark.read.parquet(corpusPath)
    println(s"[stress] corpus rows: ${corpus.count()}")

    // --- the un-broadcast pair path -------------------------------------
    val pairs = timed("ngramJaccardPairs (minJaccard=0.5)") {
      val p = graft.operators.DedupOps
        .ngramJaccardPairs(corpus, "doc_id", "text", minJaccard = 0.5)
        .localCheckpoint(true)
      println(s"[stress] near-dup pairs: ${p.count()}")
      p
    }

    // --- full curation over the stressed corpus -------------------------
    timed("curate (precomputed pairs)") {
      val bench = corpus.filter(col("doc_id") % 1000 === 0)
      val fates = graft.operators.PipelineOps
        .curate(corpus, bench, "doc_id", "text",
          precomputedPairs = Some(pairs))
        .groupBy("fate").count().orderBy("fate")
        .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
      println(s"[stress] fates: ${fates.mkString(", ")}")
    }

    println(f"[stress] shuffle write total: ${totalShuffle.get / 1e9}%.2f GB, " +
      f"peak stage: ${peakShuffle.get / 1e9}%.2f GB")
    spark.stop()
  }
}
