package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r19 optimization-evidence dumper: writes `.explain("formatted")` output
  * for the queries touched this round to `plans/r19/<name>_<tag>.txt`
  * (tag from SPARK_GRAFT_PLAN_TAG, default "after"). For the graph rank
  * queries the committed loop truncates lineage, so what is dumped is the
  * ITERATION ROUND plan in the state the loop runs it (stationary
  * hash-partitioned checkpointed influence relation, rank frame from the
  * previous round) — the same construction PlanSpec pins.
  *
  * Usage: SPARK_GRAFT_PLAN_TAG=before SPARK_GRAFT_PLAN_QUERIES=q_a,q_b \
  *   sbt "runMain graft.PlanDumpR19"
  */
object PlanDumpR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "after")
    val names = sys.env.get("SPARK_GRAFT_PLAN_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Files.createDirectories(Paths.get("plans/r19"))

    def write(name: String, content: String): Unit = {
      Files.writeString(Paths.get(s"plans/r19/${name}_$tag.txt"), content)
      println(s"wrote plans/r19/${name}_$tag.txt")
    }

    // graph iteration round, in the loop's state: infl checkpointed and
    // hash-partitioned on the join key, ranks from the previous round.
    // Only when explicitly named (r19 session 3): an unconditional dump
    // silently overwrote the committed *_before.txt evidence when the
    // tool ran with tag=before for OTHER queries.
    if (names.isEmpty || names.exists(_.startsWith("q_graph"))) {
      val infl = Seq(("a", "b", 0.5), ("a", "c", 0.5), ("b", "a", 1.0),
        ("c", "c", 0.0))
        .toDF("__s", "__d", "__w")
        .repartition(col("__s")).localCheckpoint(true)
      val ranks = Seq(("a", 0.4), ("b", 0.3), ("c", 0.3)).toDF("__v", "__r")
        .repartition(col("__v")).localCheckpoint(true)
      write("q_graph_pagerank",
        "// GraphOps.iterationRound — the plan each of the 10 power-iteration\n" +
          "// rounds runs (the loop's checkpoints truncate lineage, so the\n" +
          "// composed query cannot show it; PlanSpec pins the same shape).\n\n" +
          graft.operators.GraphOps.iterationRound(infl, ranks, 0.85, 3.0)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
      val inflP = Seq(("a", "b", 0.5, 0.0), ("a", "c", 0.5, 0.0),
        ("b", "a", 1.0, 0.15))
        .toDF("__s", "__d", "__w", "__td")
        .repartition(col("__s")).localCheckpoint(true)
      write("q_graph_ppr",
        "// GraphOps.iterationRoundPersonalized — see q_graph_pagerank_round.\n\n" +
          graft.operators.GraphOps.iterationRoundPersonalized(inflP, ranks, 0.85)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
    }

    // _memo_copurchase is a Materialize-backed build (its memoized frame
    // plans as a parquet scan) — dump the BUILDER's plan by replicating
    // the builder expression inline (GraphOps.coPurchase, r19 shape).
    if (names.contains("_memo_copurchase")) {
      val fmt = org.apache.spark.sql.execution.FormattedMode
      if (tag == "before") {
        // the pre-r19 builder shape (concat first, distinct on strings),
        // replicated inline so its plan can still be dumped for evidence
        val op = graft.sources.Tables(spark, sfDir, "lineitem")
          .select(concat(lit("o:"), col("l_orderkey").cast("string")).as("s"),
            concat(lit("p:"), col("l_partkey").cast("string")).as("d"))
          .distinct()
        write("_memo_copurchase",
          "// GraphOps.coPurchase builder, PRE-r19 shape (the distinct's\n" +
            "// exchange carries the prefixed STRINGS, concat runs per\n" +
            "// lineitem row on the scan task).\n\n" +
          op.unionByName(op.select(col("d").as("s"), col("s").as("d")))
            .queryExecution.explainString(fmt))
      } else {
        val op = graft.sources.Tables(spark, sfDir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct()
          .select(concat(lit("o:"), col("l_orderkey").cast("string")).as("s"),
            concat(lit("p:"), col("l_partkey").cast("string")).as("d"))
        write("_memo_copurchase",
          "// GraphOps.coPurchase builder (pre-Materialize write): the edge\n" +
            "// distinct + symmetrize union that _memo_copurchase prices.\n\n" +
            op.unionByName(op.select(col("d").as("s"), col("s").as("d")))
              .queryExecution.explainString(fmt))
      }
    }

    // full declared-query plans for everything else named
    names.filterNot(n => n.startsWith("q_graph") || n.startsWith("_memo"))
      .foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          write(n, fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
