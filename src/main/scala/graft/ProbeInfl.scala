package graft

import org.apache.spark.sql.functions._

/** Throwaway r19 session-3 probe: the coPurchase long-pair distinct
  * changed the memo parquet's file layout — did the influence build's
  * scan parallelism (and with it the outdeg partial aggregate) change?
  * Writes both builder variants to /tmp, reports file counts and scan
  * partitions, and times influenceRelation over each.
  */
object ProbeInfl {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def oldVariant = {
      val op = graft.sources.Tables(spark, d, "lineitem")
        .select(concat(lit("o:"), col("l_orderkey").cast("string")).as("s"),
          concat(lit("p:"), col("l_partkey").cast("string")).as("d"))
        .distinct()
      op.unionByName(op.select(col("d").as("s"), col("s").as("d")))
    }
    def newVariant = {
      val op = graft.sources.Tables(spark, d, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
        .select(concat(lit("o:"), col("l_orderkey").cast("string")).as("s"),
          concat(lit("p:"), col("l_partkey").cast("string")).as("d"))
      op.unionByName(op.select(col("d").as("s"), col("s").as("d")))
    }

    def probe(tag: String, df: org.apache.spark.sql.DataFrame,
        spread: Boolean): Unit = {
      val p = s"/tmp/probe_infl_$tag"
      df.write.mode("overwrite").parquet(p)
      val files = new java.io.File(p).listFiles
        .count(_.getName.endsWith(".parquet"))
      val rd0 = spark.read.parquet(p)
      val scanParts = rd0.rdd.getNumPartitions
      val rd = if (spread)
        graft.sources.Tables.spreadIfNarrow(spark, rd0, col("s"), col("d"))
      else rd0
      // time the influence build the way _memo_influence runs it
      val t0 = System.nanoTime()
      graft.operators.GraphOps.influenceRelation(rd, "s", "d")
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[$tag] files=$files scanParts=$scanParts influence=${sec}%.2fs")
    }

    // interleave to cancel box drift
    probe("old", oldVariant, spread = false)
    probe("new", newVariant, spread = false)
    probe("newS", newVariant, spread = true)
    probe("old2", oldVariant, spread = false)
    probe("new2", newVariant, spread = false)
    probe("newS2", newVariant, spread = true)
    spark.stop()
  }
}
