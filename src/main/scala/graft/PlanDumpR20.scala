package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** r20 optimization-evidence dumper: writes `.explain("formatted")` output
  * for the queries/legs touched this round to `plans/r20/<name>_<tag>.txt`
  * (tag from SPARK_GRAFT_PLAN_TAG, default "after"). Composed builds
  * (trainReadyIncremental, the CC runs) eagerly checkpoint their interior
  * legs, so the declared query's final plan cannot show every change —
  * for those the touched LEG is dumped in the state the build runs it,
  * the same construction the specs pin.
  *
  * Usage: SPARK_GRAFT_PLAN_TAG=before SPARK_GRAFT_PLAN_QUERIES=q_a,q_b \
  *   sbt "runMain graft.PlanDumpR20"
  */
object PlanDumpR20 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "after")
    val names = sys.env.get("SPARK_GRAFT_PLAN_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r20"))
    val fmt = org.apache.spark.sql.execution.FormattedMode

    def write(name: String, content: String): Unit = {
      Files.writeString(Paths.get(s"plans/r20/${name}_$tag.txt"), content)
      println(s"wrote plans/r20/${name}_$tag.txt")
    }

    // The decontamination LEG of the incremental fates barrier — the
    // r20 change feeds the persisted benchmark gram artifact through
    // `precomputedGrams` (bench side: parquet memo scan) instead of
    // re-shingling the benchmark per ingest.
    if (names.contains("q_train_ready_incr_decontam_leg")) {
      val sp = graft.operators.TextOps.splitAssign(spark, sfDir)
      val inc = sp.filter(col("split") === "train" && col("doc_id") % 4 === 0)
        .select(col("doc_id"), col("text"))
      val be = sp.filter(col("split") =!= "train")
      val cont =
        if (tag == "before")
          graft.operators.TextOps.decontaminate(inc, be, "doc_id", "text", 8)
        else
          graft.operators.TextOps.decontaminate(inc, be, "doc_id", "text", 8,
            precomputedGrams = Some(
              graft.operators.PipelineOps.trainReadyIncrBenchGrams(
                spark, sfDir)))
      write("q_train_ready_incr_decontam_leg",
        "// TextOps.decontaminate as trainReadyIncremental's fates barrier\n" +
          "// runs it. BEFORE: the benchmark is re-shingled per ingest\n" +
          "// (ngramSet64 over the eval split feeds the gram distinct).\n" +
          "// AFTER: the gram table is the persisted decontaminationIndex\n" +
          "// artifact (a parquet memo scan); the increment side is\n" +
          "// unchanged. The bloom + exact verify join are identical.\n\n" +
          cont.queryExecution.explainString(fmt))
    }

    // VERDICT r19 #5 audit: what the banded pair generation's exchanges
    // actually carry. The committed shingleBuckets/ngramJaccardPairs
    // checkpoint the capped index at construction, so the index-build
    // subtree is invisible in the declared query's plan — it is
    // reconstructed inline here, expression-for-expression
    // (DedupOps.shingleBuckets, DedupOps.scala): per-doc shingle SETS out
    // of the native kernel as 64-bit hashes, grouped by sh64.
    if (names.contains("_memo_ngram_pairs_audit")) {
      val sh = graft.sources.Tables(spark, sfDir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.TextKernels.shingleSet64(col("text")))
            .as("sh64"))
      val buckets = sh.groupBy("sh64")
        .agg(count(lit(1)).as("df"), collect_list("doc_id").as("ds"))
      write("_memo_ngram_pairs_audit",
        "// The shingle-index build subtree of DedupOps.shingleBuckets\n" +
          "// (the _memo_ngram_pairs builder), reconstructed inline because\n" +
          "// the committed operator checkpoints the capped index at\n" +
          "// construction. AUDIT FINDING: the one corpus-sized exchange\n" +
          "// already carries (sh64 BIGINT, doc_id BIGINT) — 16 B/row of\n" +
          "// longs, no shingle STRINGS (they never leave the kernel).\n" +
          "// VERDICT r19 #5's premise does not hold on this code.\n\n" +
          buckets.queryExecution.explainString(fmt))
    }

    // full declared-query plans for everything else named
    names.filterNot(n => n == "q_train_ready_incr_decontam_leg" ||
        n == "_memo_ngram_pairs_audit").foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          write(n, fn(spark, sfDir).queryExecution.explainString(fmt))
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
