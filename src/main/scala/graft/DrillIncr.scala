package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 optimization drill: sub-stage attribution for the incremental
  * family — q_train_ready_incr (the suite's heaviest non-graph line) and
  * q_dedup_clusters_incr. Times each composed leg in isolation so the
  * optimization effort lands where the seconds are.
  *
  * Throwaway measurement tool — not part of the driver contract.
  */
object DrillIncr {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[drill] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def release(): Unit = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm the session + memos OUTSIDE the timers (the bench does the same)
    noop(graft.sources.Tables(spark, sfDir, "documents"))
    timed("memo: incr prior (trainReady full build)") {
      noop(graft.operators.PipelineOps.memoBuilds
        .find(_._1 == "_memo_incr_prior").get._2(spark, sfDir))
    }
    timed("memo: incr postings") {
      noop(graft.operators.PipelineOps.memoBuilds
        .find(_._1 == "_memo_incr_postings").get._2(spark, sfDir))
    }
    timed("memo: incr hashes") {
      noop(graft.operators.PipelineOps.memoBuilds
        .find(_._1 == "_memo_incr_hashes").get._2(spark, sfDir))
    }
    timed("memo: incr labels") {
      noop(graft.operators.PipelineOps.memoBuilds
        .find(_._1 == "_memo_incr_labels").get._2(spark, sfDir))
    }
    release()

    // ---- q_train_ready_incr sub-stages ---------------------------------
    val sp = graft.operators.TextOps.splitAssign(spark, sfDir)
    val incrPriorFilter = col("doc_id") % 4 =!= 0
    val inc = sp.filter(col("split") === "train" && !incrPriorFilter)

    def memoFrame(name: String): DataFrame =
      graft.operators.PipelineOps.memoBuilds
        .find(_._1 == name).get._2(spark, sfDir)

    (1 to 3).foreach { i =>
      val nPrior = timed(s"[$i] nPrior count") {
        memoFrame("_memo_incr_prior").count()
      }
      val pairs = graft.operators.DedupOps.ngramJaccardPairsIncremental(
        inc.select(col("doc_id"), col("text")), "doc_id", "text",
        memoFrame("_memo_incr_postings"),
        nPrior, minJaccard = 0.1)
      timed(s"[$i] pairs incremental (noop)") { noop(pairs) }
      val run = timed(s"[$i] CC incremental (construct+checkpoints)") {
        graft.operators.DedupOps.connectedComponentsIncrementalManaged(
          memoFrame("_memo_incr_labels"),
          pairs, "da", "db")
      }
      val nd = graft.operators.DedupOps.nearDupFromLabelUpsert(run.labels,
        inc.select(col("doc_id")))
      timed(s"[$i] nearDup bits (noop)") { noop(nd) }
      run.release()
      release()
      timed(s"[$i] FULL q_train_ready_incr") {
        noop(SparkEntry.queries("q_train_ready_incr")(spark, sfDir))
      }
      release()
      timed(s"[$i] FULL q_dedup_clusters_incr") {
        noop(SparkEntry.queries("q_dedup_clusters_incr")(spark, sfDir))
      }
      release()
      timed(s"[$i] q_dedup_ngram_incr (the 10%-increment pair line)") {
        noop(SparkEntry.queries("q_dedup_ngram_incr")(spark, sfDir))
      }
      release()
    }
    spark.stop()
  }
}
