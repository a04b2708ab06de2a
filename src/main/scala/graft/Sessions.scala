package graft

import org.apache.spark.sql.SparkSession

/** The ONE place the local session is configured — Verify, Bench, Plans,
  * and the test fixture all build through here, so a config change (a new
  * legacy flag, an extension) cannot silently diverge between the plans
  * being benchmarked, verified, dumped, and tested. */
object Sessions {
  def local(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
