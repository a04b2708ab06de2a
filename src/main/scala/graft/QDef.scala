package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator of the engine's inventory (SURVEY.md §2).
  *
  * @param name   stable query id (`SparkEntry.queries` key)
  * @param build  Spark-side implementation: (session, sfDir) => result
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables, or None when the operator's semantics are not
  *               batch-SQL-expressible (driver then records a weaker
  *               rows-only check; a ScalaTest spec covers it instead).
  * @param managed same result as `build` plus the cleanup that frees the
  *               pinned blocks backing it (GraphOps' RankRun handles) —
  *               consumers that control the consumption point (Bench)
  *               prefer this form, so the caller-facing release path is
  *               the one exercised under load instead of a global
  *               getPersistentRDDs sweep. None for queries that pin
  *               nothing beyond their own execution.
  */
final case class QDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    managed: Option[(SparkSession, String) => (DataFrame, () => Unit)] =
      None)
