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
    // Driver writers have drifted twice: TIMESTAMP(NANOS) (absorbed via the
    // nanosAsLong flag above) and TIMESTAMP(isAdjustedToUTC=false, MICROS),
    // which Spark 4 would otherwise infer as TIMESTAMP_NTZ and reject in
    // TIMESTAMP-typed functions. Session TZ is UTC, so plain-timestamp
    // inference is value-identical to what DuckDB reads from the same file.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
