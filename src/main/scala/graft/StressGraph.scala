package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** One-off large-graph stress run of [[graft.operators.GraphOps]]
  * (documented in BASELINE.md, the [[StressDedup]] tradition).
  *
  * The bench graph (sf0.1 co-purchase) is 1.2M edges / 167k nodes — small
  * enough that per-round fixed overhead dominates. This main synthesizes a
  * graph roughly an order of magnitude larger and runs the full
  * 10-round power iteration once, reporting wall time, shuffle volume,
  * and the invariants a correct run must hold (every node ranked, total
  * mass ≤ 1, no failure at any round):
  *
  *  - V = 2^20 nodes, E = 10M directed edges;
  *  - endpoints hash-derived (deterministic, no RNG): sources uniform,
  *    10% of destinations folded onto a 1024-node hub set so the degree
  *    distribution is skewed like a real link graph, exercising the
  *    hash-aggregation path under hot keys;
  *  - edges written to (and re-read from) `target/stress_graph` so the
  *    run starts from parquet like production;
  *  - both variants run: uniform pageRank and personalizedPageRank
  *    seeded on the hub set (the annotated-influence path).
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.StressGraph"`
  * (env: SPARK_GRAFT_STRESS_EDGES to change E, default 10,000,000).
  */
object StressGraph {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nEdges = sys.env.getOrElse("SPARK_GRAFT_STRESS_EDGES", "10000000").toLong
    val nNodes = 1L << 20
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    val totalShuffle = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        totalShuffle.addAndGet(
          e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val dir = "target/stress_graph"
    timed("edge synthesis + write") {
      spark.range(nEdges)
        .select(
          pmod(xxhash64(col("id")), lit(nNodes)).as("src"),
          // 10% of edges land on a 1024-node hub set → skewed in-degree
          when(pmod(xxhash64(col("id") + 1), lit(10)) === 0,
            pmod(xxhash64(col("id") + 2), lit(1024)))
            .otherwise(pmod(xxhash64(col("id") + 3), lit(nNodes)))
            .as("dst"))
        .write.mode("overwrite").parquet(dir)
    }
    val edges = spark.read.parquet(dir)

    // Managed handles under load (r11): the caller-facing RankRun
    // release path is what a production session would use — this run
    // exercises it at 10M edges instead of the global sweep, and
    // asserts it actually restores the pinned-block count.
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.size
    val run = timed("pageRank 10 rounds") {
      val r = graft.operators.GraphOps
        .pageRankManaged(edges, "src", "dst")
      r.ranks.write.format("noop").mode("overwrite").save()
      r
    }
    val nRanked = run.ranks.count()
    val mass = run.ranks.agg(sum(col("rank").cast("decimal(38,18)"))
      .cast("double")).head().getDouble(0)
    println(s"[stress] nodes ranked: $nRanked (graph nodes = " +
      s"${edges.select(col("src").as("v"))
        .unionByName(edges.select(col("dst").as("v"))).distinct().count()})")
    println(f"[stress] total rank mass: $mass%.6f (sinks leak; must be <= 1)")
    assert(mass <= 1.0 + 1e-9, s"mass conservation violated: $mass")
    run.release()
    val pinnedAfter = spark.sparkContext.getPersistentRDDs.size
    assert(pinnedAfter <= pinnedBefore,
      s"RankRun.release leaked blocks: $pinnedBefore -> $pinnedAfter")
    println(s"[stress] RankRun.release: pinned RDDs " +
      s"$pinnedBefore -> $pinnedAfter")

    val pprRun = timed("personalizedPageRank 10 rounds (hub seeds)") {
      val seeds = spark.range(1024).select(col("id").as("node"),
        lit(1.0).as("w"))
      val pr = graft.operators.GraphOps
        .personalizedPageRankManaged(edges, "src", "dst", seeds, "node", "w")
      pr.ranks.write.format("noop").mode("overwrite").save()
      pr
    }
    // release OUTSIDE the timer, like the pageRank block above and
    // Bench's managed path — the printed seconds stay comparable to the
    // r10 records (r11 review)
    pprRun.release()
    assert(spark.sparkContext.getPersistentRDDs.size <= pinnedBefore,
      "PPR RankRun.release leaked blocks")
    println(f"[stress] total shuffle write: ${totalShuffle.get / 1e9}%.2f GB")
    spark.stop()
  }
}
