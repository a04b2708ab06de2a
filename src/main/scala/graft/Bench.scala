package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract, BASELINE.md).
  *
  * Each query is fully executed through `write.format("noop")` — every
  * result row is produced and serialized toward a sink, so Catalyst cannot
  * drop final sorts/projections the way a bare `count()` allows. Failures
  * are loud: a failed query records `-1` AND the process exits non-zero, so
  * a broken query can never improve the bench. The JSON line goes to stdout
  * and to `SPARK_GRAFT_BENCH_OUT` (default `BENCH_LAST.json` in cwd) —
  * round 1's stdout-only output got mangled by sbt log prefixes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: pays one-time session costs (codegen compiler,
    // parquet footers, shuffle infra) so the alphabetically-first query
    // isn't billed for them.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Iteration aid: SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // Release any blocks a query pinned (localCheckpoint intermediates):
      // leaked blocks from earlier queries showed up as multi-second GC
      // noise in LATER queries' timings. BLOCKING: an async unpersist
      // returns immediately and the removal work then runs concurrently
      // with the NEXT query's timed section — the wait belongs here,
      // between the timers.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      name -> (if (failed.contains(name)) -1.0 else sec)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":$failedJson}"""
    println(json)
    Files.writeString(Paths.get(outPath), json)
    spark.stop()
    if (failed.nonEmpty) sys.exit(2)
  }
}
