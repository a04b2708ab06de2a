package graft

import org.apache.spark.sql.functions._

/** Manual probe for the frequent-items sketch's wall-time constant at
  * stream sizes past the ScaleSpec regime (run via
  * `sbt "Test/runMain graft.SketchPerfManual <rows> <maxMapSize>"`).
  * Generates a deterministic zipf-ish stream, times the full
  * [[graft.operators.TextOps.frequentItems]] composition (sketch pass +
  * exact candidate verify) against the exact `groupBy.count HAVING`
  * alternative over the same stream, and asserts the two lists equal —
  * the r14 BASELINE.md sketch pricing comes from this main; the
  * pass/fail purging regime lives in graft.ScaleSpec. */
object SketchPerfManual {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 20000000L
    val maxMap = if (args.length > 1) args(1).toInt else 1024
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val stream = spark.range(rows)
      .select((floor(exp((pmod(xxhash64(col("id")), lit(1000000L)) / 1e6d)
          * math.log(300000d))))
        .cast("long").as("rank"))
      .select(concat(lit("item_"), col("rank")).as("v"))
      .localCheckpoint(true) // time the operators, not the generator
    val t0 = System.nanoTime()
    val viaSketch = graft.operators.TextOps
      .frequentItems(stream, "v", minShare = 0.005, maxMapSize = maxMap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val tSketch = (System.nanoTime() - t0) / 1e9
    val thr = math.ceil(0.005 * rows).toLong
    val t1 = System.nanoTime()
    val viaExact = stream.groupBy("v").agg(count(lit(1)).as("n"))
      .filter(col("n") >= thr)
      .orderBy(desc("n"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val tExact = (System.nanoTime() - t1) / 1e9
    require(viaSketch == viaExact,
      s"sketch+verify diverged from exact at $rows rows")
    println(f"rows=$rows maxMapSize=$maxMap hitters=${viaSketch.size} " +
      f"sketch+verify=${tSketch}%.1fs exactGroupBy=${tExact}%.1fs")
    spark.stop()
  }
}
