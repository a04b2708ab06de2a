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
    // isn't billed for them. The flagship exercises the engine end-to-end;
    // the table sweep additionally pays the BENCH dir's footer reads and
    // OS page-cache fills — without it those costs land on whichever
    // query alphabetically first touches each table (q_agg_hash was
    // billed ~2s of lineitem cold reads).
    try {
      SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
      graft.sources.Tables.all.foreach { n =>
        graft.sources.Tables(spark, sfDir, n)
          .write.format("noop").mode("overwrite").save()
      }
      // One shuffle+sort round-trip warms the exchange/AQE/janino paths —
      // otherwise the suite's alphabetically-first query (q_agg_hash) is
      // billed several seconds of first-shuffle infrastructure.
      import org.apache.spark.sql.functions._
      graft.sources.Tables(spark, sfDir, "events")
        .groupBy("event_type").agg(count(lit(1)).as("n")).orderBy("n")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
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
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    def render(tot: Double, qs: Seq[(String, Double)], extra: String = ""): String = {
      val m = qs.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", if (extra.isEmpty) "}" else "," + extra + "}")
      s"""{"metric":"total","value":$tot,"unit":"sec","queries":$m,"sf":"$sfDir","failed":$failedJson}"""
    }
    // Full precision, every query → file (committed numbers live here).
    Files.writeString(Paths.get(outPath), render(total, results))
    spark.stop()
    // Stdout: the driver keeps only the LAST 2000 chars of the run's output
    // and parses the JSON line out of that tail; sbt appends its own
    // "[success] Total time …" line (~80 chars) after ours. Rounds 1-3 all
    // printed a ~2.5k-char line and were recorded as "parsed": null. So the
    // printed line is budgeted: 2-decimal seconds, slowest queries first,
    // and if still over budget the cheapest entries collapse into
    // "_other" (their summed seconds) + "_omitted" (their count).
    def r2(v: Double): Double = math.round(v * 100) / 100.0
    val maxLen = 1750
    var keep = results.map { case (k, v) => k -> r2(v) }.sortBy(-_._2)
    var omitted = 0
    var omittedSec = 0.0
    var line = render(r2(total), keep)
    while (line.length > maxLen && keep.nonEmpty) {
      omitted += 1
      omittedSec = r2(omittedSec + math.max(0.0, keep.last._2))
      keep = keep.init
      line = render(r2(total), keep, s""""_other":$omittedSec,"_omitted":$omitted""")
    }
    println(line)
    if (failed.nonEmpty) sys.exit(2)
  }
}
