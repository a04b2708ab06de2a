package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table loader for the driver-generated star schema (TESTDATA.md).
  *
  * The reference's only source concept is a named, replayable log declared
  * per topic (`/root/reference/src/source.ts:3-7`, `src/task.ts:52-73`); the
  * batch analogue is a parquet scan. Filters/projections applied on top of
  * these scans are pushed into the parquet reader by Catalyst (verified via
  * `.explain` — `PushedFilters` / `ReadSchema`), which is the 100 TB story:
  * a scan never reads columns or row groups a query doesn't need.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Temporal columns the driver's writer has stamped differently across
    * regenerations: TIMESTAMP(NANOS) (Spark 4 refuses to map to
    * TimestampType; read nanos as long, floor to µs — DuckDB's exact ns→µs
    * truncation) and TIMESTAMP(isAdjustedToUTC=false, MICROS) (inferred as
    * TIMESTAMP_NTZ unless `inferTimestampNTZ` is off). The conversion here
    * is type-driven — keyed on what the file actually reads as, not on
    * which writer produced it — so both past variants and a plain
    * TIMESTAMP writer all land on TimestampType. Session TZ is UTC, so the
    * NTZ→timestamp cast is value-identical to DuckDB's read of the same
    * file. */
  private val temporalCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  /** Hash-spread `df` on `key` when — and only when — its scan cannot
    * feed the session's cores (r19, optimization guide §1.2/§2.5): a
    * partial aggregate (or any other per-row-expensive stage-1 work) runs
    * at the SCAN's parallelism, and a small/one-row-group parquet input
    * collapses that to a single task regardless of core count. The
    * condition is derived from the INPUT LAYOUT, not a local constant: a
    * corpus-scale table scans in thousands of splits, the branch is not
    * taken, and no repartition of base data is ever paid there. `key`
    * must be high-cardinality (guide §2.5 — a low-cardinality key leaves
    * partitions empty under hash collisions) and should be a column the
    * consumer already reads, so the spread never widens the scan.
    * Callers must be order-insensitive (exact-decimal sums, counts,
    * min/max — the Det contract), which makes the spread bit-invisible
    * in results. */
  def spreadIfNarrow(s: SparkSession, df: DataFrame, key: Column*): DataFrame =
    if (df.rdd.getNumPartitions < s.sparkContext.defaultParallelism)
      df.repartition(key: _*)
    else df

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Set lazily only if the session builder didn't — avoids mutating the
    // session conf on every call (both are also set in Sessions.local).
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (!spark.conf.getOption("spark.sql.parquet.inferTimestampNTZ.enabled").contains("false"))
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    temporalCols.getOrElse(name, Nil).foldLeft(df) { (acc, c) =>
      if (!acc.schema.fieldNames.contains(c)) acc
      else acc.schema(c).dataType match {
        case LongType => acc.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
        case TimestampNTZType => acc.withColumn(c, col(c).cast("timestamp"))
        case _ => acc
      }
    }
  }
}

