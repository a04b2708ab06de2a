package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Throwaway r19 probe: does an explicit-N `repartition(n, col)` +
  * `localCheckpoint` report its HashPartitioning to a downstream
  * co-partitioned join (i.e. does the round join skip the E-row
  * exchange)? */
object ProbePart {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    val infl = (1 to 1000).map(i => (s"s$i", s"d$i", 0.5))
      .toDF("__s", "__d", "__w")
      .repartition(n, col("__s")).localCheckpoint(true)
    val ranks = (1 to 100).map(i => (s"s$i", 0.1)).toDF("__v", "__r")
      .repartition(n, col("__v")).localCheckpoint(true)
    val j = infl.join(ranks.hint("shuffle_hash"), col("__s") === col("__v"))
      .groupBy(col("__d"))
      .agg(sum((col("__r") * col("__w")).cast(DecimalType(38, 18))).as("a"))
    println("=== executedPlan ===")
    println(j.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
