package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

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

  /** The driver's parquet carries TIMESTAMP(NANOS), which Spark 4 refuses
    * to map to TimestampType; we read nanos as long and floor-convert to
    * microseconds — exactly DuckDB's ns→µs truncation, so oracle
    * comparisons agree. */
  private val nsTimestampCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Set lazily only if the session builder didn't — avoids mutating the
    // session conf on every call (it is also set in Bench/Verify builders).
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    nsTimestampCols.getOrElse(name, Nil).foldLeft(df) { (acc, c) =>
      if (acc.schema.fieldNames.contains(c) && acc.schema(c).dataType == LongType)
        acc.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      else acc
    }
  }
}

