package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Source/sink format coverage: the engine's scan layer is format-agnostic
  * (the reference's only source is a Kafka log; the batch analogue reads
  * whatever the lake stores). Round-trips the events table through each
  * built-in columnar/row format and asserts row fidelity, plus predicate
  * pushdown on ORC (the other columnar format besides parquet). */
class SourcesSpec extends SparkSpec {

  private def events = Tables(spark, sf, "events")
    .select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"), col("value"), col("props"))

  private def roundTrip(format: String, options: Map[String, String] = Map.empty): Unit = {
    val dir = Files.createTempDirectory(s"graft-src-$format").toString
    val src = events
    src.write.format(format).options(options).mode("overwrite").save(dir)
    val back = spark.read.format(format).options(options)
      .schema(src.schema) // deterministic round-trip: no inference drift
      .load(dir)
    val a = src.orderBy("event_id").collect().toSeq
    val b = back.orderBy("event_id").collect().toSeq
    assert(a == b, s"$format round-trip altered rows")
  }

  test("csv round-trips the events table") {
    roundTrip("csv", Map("header" -> "true"))
  }

  test("json round-trips the events table") {
    roundTrip("json")
  }

  test("orc round-trips the events table") {
    roundTrip("orc")
  }

  // avro: the spark-avro connector module is not on this classpath (only
  // the core Avro library ships in /opt/spark/jars) — not testable here.

  test("orc scans receive pushed filters like parquet") {
    val dir = Files.createTempDirectory("graft-src-orc-push").toString
    events.write.format("orc").mode("overwrite").save(dir)
    val plan = spark.read.format("orc").load(dir)
      .filter(col("event_id") > 100).select("event_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("event_id"),
      s"expected pushdown into the ORC scan:\n$plan")
  }
}
