package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r19 optimization drill: A/B the pageRank round shape on the bench graph.
  *
  * Variant A = the shipped loop (rank frame broadcast per round, in-link-
  * free constant frame unioned per round, lineage barrier every 3 rounds).
  * Variant B = candidate: zero-weight self-edges for in-link-free nodes
  * folded into the stationary influence relation once at setup (the
  * oracle's own formulation), so the round is ONE co-partitioned
  * shuffled-hash join + ONE aggregation with no per-round union, no
  * per-round driver collect/broadcast.
  *
  * Results are asserted bit-identical before any timing is believed.
  * Throwaway measurement tool — not part of the driver contract.
  */
object DrillGraph {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = 10
    val damping = 0.85
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

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

    // the bench co-purchase graph + its memoized influence relation
    val op = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(concat(lit("o:"), col("l_orderkey").cast("string")).as("s"),
        concat(lit("p:"), col("l_partkey").cast("string")).as("d"))
      .distinct()
    val edges = graft.sources.Materialize.table(spark, s"drill_copurchase") {
      op.unionByName(op.select(col("d").as("s"), col("s").as("d")))
    }
    val infl = graft.sources.Materialize.table(spark, s"drill_influence") {
      graft.operators.GraphOps.influenceRelation(edges, "s", "d")
    }
    // warm both
    edges.write.format("noop").mode("overwrite").save()
    infl.write.format("noop").mode("overwrite").save()

    // ---- variant B ----------------------------------------------------
    def variantB(ckptEvery: Int, shj: Boolean = true): DataFrame = {
      val weighted = infl.select(col("s").as("__s"), col("d").as("__d"),
        col("w").cast("double").as("__w"))
      val (nodes, nodesIds) = graft.operators.Pins.checkpointTracked(
        weighted.select(col("__s").as("__v"))
          .unionByName(weighted.select(col("__d").as("__v")))
          .distinct())
      val n = nodes.count().toDouble
      // in-link-free nodes enter the stationary relation as zero-weight
      // self-edges (the oracle's own infl formulation): the round's
      // aggregation then emits their constant teleport row itself and the
      // per-round union disappears
      val antiIn = nodes.join(
        weighted.select(col("__d").as("__v")).distinct(),
        Seq("__v"), "left_anti")
      val selfRows = antiIn.select(col("__v").as("__s"),
        col("__v").as("__d"), lit(0.0).as("__w"))
      val (infl2, inflIds) = graft.operators.Pins.checkpointTracked(
        weighted.unionByName(selfRows).repartition(col("__s")))
      var (ranks, ranksIds) = graft.operators.Pins.checkpointTracked(
        nodes.select(col("__v"), (lit(1.0) / lit(n)).as("__r"))
          .repartition(col("__v")))
      graft.operators.Pins.release(spark, nodesIds)
      var round = 0
      while (round < iters) {
        val next = infl2.join(
            if (shj) ranks.hint("shuffle_hash") else ranks,
            col("__s") === col("__v"))
          .groupBy(col("__d"))
          .agg(sum((col("__r") * col("__w")).cast(DecimalType(38, 18)))
            .as("__acc"))
          .select(col("__d").as("__v"),
            (lit(1 - damping) / lit(n) +
              lit(damping) * col("__acc").cast("double")).as("__r"))
        round += 1
        if (round % ckptEvery == 0 && round < iters) {
          val (ck, ckIds) = graft.operators.Pins.checkpointTracked(next)
          graft.operators.Pins.release(spark, ranksIds)
          ranks = ck
          ranksIds = ckIds
        } else ranks = next
      }
      ranks.select(col("__v").as("node"), Det.r9(col("__r")).as("rank"))
        .orderBy("node")
    }

    // one throwaway of each to warm codegen paths, then alternating reps
    def runA(): DataFrame = {
      val r = graft.operators.GraphOps.pageRank(edges, "s", "d",
        damping, iters, influence = Some(infl))
      r.select(col("node"), Det.r9(col("rank")).as("rank")).orderBy("node")
    }

    // equivalence first: bitwise-identical rows
    val aRows = runA().collect().map(r => (r.getString(0), r.getDouble(1)))
    release()
    val bRows = variantB(3).collect().map(r => (r.getString(0), r.getDouble(1)))
    release()
    require(aRows.length == bRows.length,
      s"row count differs: A=${aRows.length} B=${bRows.length}")
    aRows.zip(bRows).foreach { case (a, b) =>
      require(a._1 == b._1 && java.lang.Double.doubleToRawLongBits(a._2) ==
        java.lang.Double.doubleToRawLongBits(b._2),
        s"mismatch: A=$a B=$b")
    }
    println(s"[drill] A == B bitwise over ${aRows.length} rows")

    // dump variant B's round plan once (co-partitioned state)
    val wtd = infl.select(col("s").as("__s"), col("d").as("__d"),
      col("w").cast("double").as("__w")).repartition(col("__s"))
      .localCheckpoint(true)
    val rk = wtd.select(col("__s").as("__v"), lit(0.1).as("__r"))
      .repartition(col("__v")).localCheckpoint(true)
    println("[drill] variant B round plan:\n" +
      wtd.join(rk.hint("shuffle_hash"), col("__s") === col("__v"))
        .groupBy(col("__d"))
        .agg(sum((col("__r") * col("__w")).cast(DecimalType(38, 18)))
          .as("__acc"))
        .queryExecution.executedPlan.toString)
    release()

    // alternating timed reps
    (1 to 4).foreach { i =>
      timed(s"A (shipped, ckpt=3) rep $i") {
        runA().write.format("noop").mode("overwrite").save()
      }
      release()
      timed(s"B (self-edge SHJ, ckpt=10) rep $i") {
        variantB(10).write.format("noop").mode("overwrite").save()
      }
      release()
      timed(s"B (self-edge BHJ, ckpt=10) rep $i") {
        variantB(10, shj = false).write.format("noop").mode("overwrite").save()
      }
      release()
      timed(s"B (self-edge SHJ, ckpt=5) rep $i") {
        variantB(5).write.format("noop").mode("overwrite").save()
      }
      release()
    }
    spark.stop()
  }
}
