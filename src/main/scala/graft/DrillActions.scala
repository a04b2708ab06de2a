package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame

/** r20 drill: count the DRIVER ACTIONS (Spark jobs) a query run costs —
  * the VERDICT r19 #3 deliverable for q_train_ready_incr ("action count
  * before/after, Spark listener or log"). Memos are prebuilt OUTSIDE the
  * counter (they are standing artifacts, billed as `_memo_*` bench
  * lines); the counter brackets exactly the per-rep query execution the
  * bench times.
  *
  * Throwaway measurement tool — not part of the driver contract.
  * Usage: SPARK_GRAFT_DRILL_QUERIES=q_train_ready_incr,q_dedup_clusters_incr \
  *   sbt "runMain graft.DrillActions"
  */
object DrillActions {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_DRILL_QUERIES",
        "q_train_ready_incr,q_dedup_clusters_incr,q_train_ready_epochs," +
          "q_train_ready_examples,q_dedup_ngram_incr")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def release(): Unit = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // memo prebuilds (standing artifacts) outside the counters
    val memoBuilds =
      graft.operators.DedupOps.memoBuilds ++
        graft.operators.TokenizerOps.memoBuilds ++
        graft.operators.UnigramOps.memoBuilds ++
        graft.operators.PipelineOps.memoBuilds ++
        graft.operators.SimilarityOps.memoBuilds ++
        graft.operators.PqOps.memoBuilds ++
        graft.operators.GraphOps.memoBuilds
    memoBuilds.foreach { case (_, fn) => noop(fn(spark, sfDir)) }
    release()
    names.foreach { n =>
      (1 to 3).foreach { i =>
        // wait for stragglers of prior runs so the counter is clean
        Thread.sleep(300)
        val before = jobs.get()
        val t0 = System.nanoTime()
        noop(SparkEntry.queries(n)(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        val d = jobs.get() - before
        println(f"[actions] $n rep $i: $d jobs, $sec%.2f s")
        release()
      }
    }
    spark.stop()
  }
}
