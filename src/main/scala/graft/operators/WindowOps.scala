package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, QDef}
import graft.sources.Tables

/** Windowed / stateful layer (SURVEY.md §2.5 G1-G4).
  *
  * The reference's only "query" is a stateful tumbling-window count kept in
  * a per-assignment closure (`/root/reference/examples/introduction.ts:12-27`,
  * `README.md:19-34`); windowing/stores are declared-but-unimplemented goals
  * (`README.md:78-79`). Here they are first-class:
  *  - tumbling → `window(ts, "1 hour")` hash aggregate (map-side partials);
  *  - sliding  → range frame over event-time seconds;
  *  - session  → gap-based sessionization (lag + running sum of boundaries);
  *  - running  → frolyk's store-in-closure pattern as an ordered
  *    window frame (the streaming twin is `mapGroupsWithState`, see
  *    `graft.streaming`).
  *
  * All event-time columns are surfaced as epoch integers (seconds/micros) so
  * the DuckDB oracle compares integers, never engine-local timestamp
  * encodings. Window partitioning is by `event_type`/`user_id` — bounded key
  * cardinality → no unbounded state per key at 100 TB; skewed keys are
  * handled by AQE skew-join/partition-coalescing at the shuffle.
  */
object WindowOps {

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "events")

  // G1: tumbling 1-hour count+sum per event_type — the reference's
  // motivating example (examples/introduction.ts:12-27) made declarative.
  def tumbling(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(unix_seconds(col("w.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")

  // G2: sliding 1-hour average per event_type (README.md:79 windowing
  // goal). Chunked for scale: a window partitioned by event_type alone
  // caps parallelism at the number of types (5) — one task per type
  // forever, dead at 100 TB. Instead rows partition by (type, 4-hour
  // chunk), and each chunk's first hour sees the previous chunk's last
  // hour through replicated CONTEXT rows (flagged, counted in frames,
  // filtered from output). Every row's 1-hour lookback is fully inside
  // its chunk partition, results are exactly the per-type window —
  // decimal frame sums are order-independent — and parallelism is
  // types × chunks.
  private def slidingAvg(s: SparkSession, d: String): DataFrame = {
    val WindowS = 3600L
    val ChunkS = 4 * WindowS
    val base = ev(s, d)
      .select(col("event_id"), col("event_type"),
        unix_seconds(col("ts")).as("ts_s"), col("value"))
    val own = base
      .withColumn("chunk", floor(col("ts_s") / ChunkS))
      .withColumn("ctx", lit(false))
    val tail = base
      .filter(col("ts_s") % ChunkS >= ChunkS - WindowS)
      .withColumn("chunk", floor(col("ts_s") / ChunkS) + 1)
      .withColumn("ctx", lit(true))
    val w = Window.partitionBy("event_type", "chunk").orderBy("ts_s")
      .rangeBetween(-WindowS, 0)
    own.unionByName(tail)
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("avg_win",
        Det.decSum(col("value")).over(w).cast("double") / col("n_win"))
      .filter(!col("ctx"))
      .select("event_id", "event_type", "ts_s", "n_win", "avg_win")
      .orderBy("event_id")
  }

  // G3: session windows, 30-minute gap, per user (README.md:79).
  private def sessionGap(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev", lag("ts_us", 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull || col("ts_us") - col("prev") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_s").over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"))
      .orderBy("user_id", "session_id")
  }

  // G4: stateful running aggregate per user — frolyk's store-in-closure
  // (examples/introduction.ts:12,19-22) as an ordered frame.
  private def statefulRunning(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("running_n", row_number().over(byUser).cast("long"))
      .withColumn("running_sum", Det.decSum(col("value")).over(run).cast("double"))
      .select("user_id", "event_id", "running_n", "running_sum")
      .orderBy("user_id", "running_n")
  }

  val defs: Seq[QDef] = Seq(
    QDef("q_window_tumbling_count", tumbling, Some(
      s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
         | event_type, count(*) AS n, ${Det.dsumSql("value")} AS sum_value
         | FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),
    QDef("q_window_sliding_avg", slidingAvg, Some(
      """SELECT event_id, event_type, ts_s, n_win,
        | CAST(sum_dec AS DOUBLE) / n_win AS avg_win FROM (
        | SELECT event_id, event_type, ts_s,
        |  COUNT(*) OVER w AS n_win,
        |  SUM(CAST(value AS DECIMAL(28,6))) OVER w AS sum_dec
        | FROM (SELECT event_id, event_type,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value FROM events)
        | WINDOW w AS (PARTITION BY event_type ORDER BY ts_s
        |              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |) ORDER BY event_id""".stripMargin)),
    QDef("q_session_gap", sessionGap, Some(
      """SELECT user_id, session_id, count(*) AS n_events,
        | min(ts_us) AS start_us, max(ts_us) AS end_us FROM (
        | SELECT user_id, event_id, ts_us,
        |  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        | FROM (
        |  SELECT user_id, event_id, ts_us,
        |   CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |        FROM events)))
        | GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin)),
    QDef("q_stateful_running_count", statefulRunning, Some(
      """SELECT user_id, event_id,
        | ROW_NUMBER() OVER w AS running_n,
        | CAST(SUM(CAST(value AS DECIMAL(28,6)))
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_sum
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        | ORDER BY user_id, running_n""".stripMargin))
  )
}
