package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Executable proofs of two 100 TB operational patterns that don't fit the
  * query inventory: salted two-phase aggregation for skewed keys, and
  * zero-cost inline data-quality metrics via `observe()`. */
class ScaleSpec extends SparkSpec {

  test("salted two-phase aggregation equals direct aggregation on skewed keys") {
    // events are skewed by construction toward low user_ids; salting
    // splits each hot key across 8 partial groups, then merges — the
    // standard rewrite when one reducer key dominates a shuffle. Decimal
    // partials keep the double result bit-identical to the direct path.
    val e = Tables(spark, sf, "events")
    val direct = e.groupBy("event_type")
      .agg(Det.dsum(col("value")).as("sum_value"), count(lit(1)).as("n"))
    val salted = e
      .withColumn("salt", pmod(col("user_id"), lit(8)))
      .groupBy("event_type", "salt")
      .agg(Det.decSum(col("value")).as("partial_dec"), count(lit(1)).as("pn"))
      .groupBy("event_type")
      .agg(sum("partial_dec").cast("double").as("sum_value"),
        sum("pn").as("n"))
    val d = direct.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val s2 = salted.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(d == s2)
  }

  test("observe() surfaces inline QA metrics without an extra pass") {
    val observed = Tables(spark, sf, "documents")
      .observe("qa",
        count(lit(1)).as("rows"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("empty_texts"),
        min(length(col("text"))).as("min_len"))
      .select("doc_id")
    // the action must run the SAME QueryExecution the metrics hang off —
    // a write/count builds its own plan and leaves this one unexecuted
    observed.collect()
    val metrics = observed.queryExecution.observedMetrics("qa")
    assert(metrics.getAs[Long]("rows") == 500L)
    assert(metrics.getAs[Long]("empty_texts") == 0L)
    assert(metrics.getAs[Int]("min_len") > 0)
  }
}
