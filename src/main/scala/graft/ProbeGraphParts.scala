package graft

import org.apache.spark.sql.DataFrame

/** r20 probe (VERDICT r19 "what's wrong" #3): the graph rank loop runs
  * 10 synchronous rounds of fixed-`numShufflePartitions` stages over
  * ~17k-row rank frames at bench SF — per-task overhead dominates and
  * the lines anti-scale with cores (c8/c32 = 0.21 in PERF_r19). This
  * probe times q_graph_pagerank / q_graph_ppr at several
  * `spark.sql.shuffle.partitions` values IN ONE JVM (paired,
  * interleaved) to measure how much of the lines is partition-count
  * overhead, before deciding whether the loop should derive its
  * partition count from the input size (guide §2: scale-adaptive
  * partitioning, not a constant).
  *
  * Throwaway measurement tool — not part of the driver contract.
  */
object ProbeGraphParts {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "32,8,4,2,1")
      .split(",").map(_.trim.toInt).toSeq
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def release(): Unit = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // memo prebuild (the copurchase/influence artifacts) + warmup
    noop(graft.sources.Tables(spark, sfDir, "lineitem"))
    graft.operators.GraphOps.memoBuilds.foreach { case (_, fn) =>
      noop(fn(spark, sfDir))
    }
    release()
    val managed = SparkEntry.managedQueries
    def timeOne(q: String): Double = {
      val t0 = System.nanoTime()
      val (df, cleanup) = managed(q)(spark, sfDir)
      noop(df)
      val sec = (System.nanoTime() - t0) / 1e9
      cleanup()
      release()
      sec
    }
    // interleaved: each round visits every partition count once, so box
    // load lands evenly across the compared configs
    (1 to 3).foreach { rep =>
      parts.foreach { p =>
        spark.conf.set("spark.sql.shuffle.partitions", p.toString)
        val pr = timeOne("q_graph_pagerank")
        val ppr = timeOne("q_graph_ppr")
        println(f"[probe] rep $rep parts $p%2d: pagerank $pr%.2f s, ppr $ppr%.2f s")
      }
    }
    spark.stop()
  }
}
