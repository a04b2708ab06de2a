package graft

// Manual phase-timing probe for graft.operators.GraphOps.pageRank — run with
//   sbt "Test/runMain graft.PageRankPerfManual"
// Not a ScalaTest suite; scratch diagnostics only.
object PageRankPerfManual {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[perf] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val op = graft.sources.Tables(spark, d, "lineitem")
      .select(concat(lit("o:"), col("l_orderkey").cast("string")).as("s"),
        concat(lit("p:"), col("l_partkey").cast("string")).as("d"))
      .distinct()
    val sym = op.unionByName(op.select(col("d").as("s"), col("s").as("d")))
    t("edge count")(println("edges: " + sym.count()))
    // full run, twice (warm)
    t("pageRank full #1")(
      graft.operators.GraphOps.pageRank(sym, "s", "d").write.format("noop")
        .mode("overwrite").save())
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    t("pageRank full #2")(
      graft.operators.GraphOps.pageRank(sym, "s", "d").write.format("noop")
        .mode("overwrite").save())
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    // phase probe: infl build vs rounds
    val edges = sym.select(col("s").as("__s"), col("d").as("__d"))
    val nodes = edges.select(col("__s").as("__v"))
      .unionByName(edges.select(col("__d").as("__v"))).distinct()
    val outdeg = edges.groupBy("__s").agg(count(lit(1)).as("__od"))
    val infl = t("infl build+ckpt")(
      edges.join(outdeg, "__s")
        .select(col("__s"), col("__d"), (lit(1.0) / col("__od")).as("__w"))
        .repartition(col("__s")).localCheckpoint(true))
    val n = t("node count")(nodes.count().toDouble)
    var ranks = t("rank init ckpt")(
      nodes.select(col("__v"), (lit(1.0) / lit(n)).as("__r"))
        .localCheckpoint(true))
    for (i <- 1 to 3) {
      ranks = t(s"round $i (eager ckpt)")(
        graft.operators.GraphOps.iterationRound(infl, ranks, 0.85, n).localCheckpoint(true))
    }
    val lazy3 = t("rounds 4-6 lazy+1 ckpt") {
      var r = ranks
      for (_ <- 1 to 3) r = graft.operators.GraphOps.iterationRound(infl, r, 0.85, n)
      r.localCheckpoint(true)
    }
    t("round 7 noop-write only")(
      graft.operators.GraphOps.iterationRound(infl, lazy3, 0.85, n)
        .write.format("noop").mode("overwrite").save())
    // variant D: AQE off for the iteration (static plans; SMJ fallback)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var ra = ranks
    for (i <- 1 to 3)
      ra = t(s"noAQE round $i (eager ckpt)")(
        graft.operators.GraphOps.iterationRound(infl, ra, 0.85, n)
          .localCheckpoint(true))
    t("noAQE rounds 4-9 lazy + noop") {
      var r = ra
      for (_ <- 1 to 6) r = graft.operators.GraphOps.iterationRound(infl, r, 0.85, n)
      r.write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // variant A: decimal(18,15) accumulator (long-backed fast path)
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.DataFrame
    def roundD15(infl: DataFrame, ranks: DataFrame): DataFrame =
      infl.join(ranks, col("__s") === col("__v"))
        .groupBy(col("__d"))
        .agg(sum((col("__r") * col("__w")).cast(DecimalType(18, 15)))
          .as("__acc"))
        .select(col("__d").as("__v"),
          (lit(1 - 0.85) / lit(n) +
            lit(0.85) * col("__acc").cast("double")).as("__r"))
    var r15 = ranks
    for (i <- 1 to 3)
      r15 = t(s"d15 round $i (eager ckpt)")(roundD15(infl, r15).localCheckpoint(true))
    // variant B: force SMJ (no broadcast) with d15
    var rs = ranks
    for (i <- 1 to 3)
      rs = t(s"d15 SMJ round $i (ckpt)") {
        infl.join(rs.hint("merge"), col("__s") === col("__v"))
          .groupBy(col("__d"))
          .agg(sum((col("__r") * col("__w")).cast(DecimalType(18, 15)))
            .as("__acc"))
          .select(col("__d").as("__v"),
            (lit(1 - 0.85) / lit(n) +
              lit(0.85) * col("__acc").cast("double")).as("__r"))
          .localCheckpoint(true)
      }
    // variant C: integer node ids (xxhash64 relabel), d15, broadcast join
    val inflI = t("int infl build+ckpt")(
      edges.select(xxhash64(col("__s")).as("__s"), xxhash64(col("__d")).as("__d"))
        .join(edges.select(xxhash64(col("__s")).as("__s"))
          .groupBy("__s").agg(count(lit(1)).as("__od")), "__s")
        .select(col("__s"), col("__d"), (lit(1.0) / col("__od")).as("__w"))
        .repartition(col("__s")).localCheckpoint(true))
    var ri = t("int rank init")(
      nodes.select(xxhash64(col("__v")).as("__v"), (lit(1.0) / lit(n)).as("__r"))
        .localCheckpoint(true))
    import org.apache.spark.sql.types.DecimalType
    for (i <- 1 to 3)
      ri = t(s"int round $i (eager ckpt)") {
        inflI.join(ri, col("__s") === col("__v"))
          .groupBy(col("__d"))
          .agg(sum((col("__r") * col("__w")).cast(DecimalType(18, 15)))
            .as("__acc"))
          .select(col("__d").as("__v"),
            (lit(1 - 0.85) / lit(n) +
              lit(0.85) * col("__acc").cast("double")).as("__r"))
          .localCheckpoint(true)
      }
    t("int rounds 4-9 lazy + noop") {
      var r = ri
      for (_ <- 1 to 6)
        r = inflI.join(r, col("__s") === col("__v"))
          .groupBy(col("__d"))
          .agg(sum((col("__r") * col("__w")).cast(DecimalType(18, 15)))
            .as("__acc"))
          .select(col("__d").as("__v"),
            (lit(1 - 0.85) / lit(n) +
              lit(0.85) * col("__acc").cast("double")).as("__r"))
      r.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
