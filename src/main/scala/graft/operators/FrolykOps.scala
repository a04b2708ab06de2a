package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, QDef}
import graft.sources.Tables

/** Batch analogues of the reference's message-log surface (SURVEY.md §2.1-2.3).
  *
  * The reference (JaapRood/frolyk) models a Kafka topic-partition: an
  * ordered, replayable log consumed per partition with manual offset
  * management (`/root/reference/src/streams.ts:8-19`,
  * `src/assignment-contexts/index.ts:11-58`). The `events` table plays the
  * log: `event_id` ≈ offset, `user_id % 8` ≈ partition, `props` ≈ raw
  * message value, `ts` ≈ message timestamp.
  *
  * Scale notes (100 TB): every query below is a narrow scan + projection, a
  * single hash aggregation on the partition key, or a window bounded per
  * partition — no cross-key shuffle beyond the one the semantics require,
  * no driver-side collection. Watermark/commit ledgers aggregate ~10^1 rows
  * per partition regardless of input size.
  */
object FrolykOps {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  /** partition id of the log (reference: `Message.partition`, streams.ts:10). */
  private def part: Column = (col("user_id") % 8).as("part")

  // S1: task.source — declare + scan a topic (src/task.ts:52-73).
  // Kafka wire shape: topic/partition/offset/key/value/timestamp
  // (src/streams.ts:8-19).
  private def scanSource(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(
      lit("events").as("topic"), part, col("event_id").as("offset"),
      col("user_id").cast("string").as("key"), col("props").as("value"),
      unix_micros(col("ts")).as("ts_us"))
      .orderBy("offset")

  // S3: per-partition ordered demux (src/streams.ts:118-146): within a
  // partition, consumption order == offset order.
  private def partitionOrdering(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("part").orderBy("offset")
    ev(s, d).select(part, col("event_id").as("offset"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .orderBy("part", "offset")
  }

  // P3: sequential transform chain (src/processors.ts:80-98): each message
  // folded through processors; here parse -> scale -> tag -> derive.
  private def transformChain(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      (col("value") * 2).as("v2"),
      upper(col("event_type")).as("tag"))
      .withColumn("score", col("v2") + col("k"))
      .orderBy("event_id")

  // P4: context.abandon — drop message, skip rest of chain
  // (src/processors.ts:6,82-86).
  private def filterAbandon(s: SparkSession, d: String): DataFrame =
    ev(s, d).filter(col("event_type") =!= "error" && col("value") >= 5.0)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")

  // P5: payload decode — the JSON convention of the local context
  // (src/assignment-contexts/local.ts:70-76).
  private def jsonParse(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy("k")

  // S4: assignment.send — producer projection (kafka.ts:105-124,
  // local.ts:183-201): route to topic/partition with key+value.
  private def sendSink(s: SparkSession, d: String): DataFrame =
    ev(s, d).filter(col("event_type") === "purchase")
      .select(
        lit("events-out").as("topic"), (col("user_id") % 4).as("part"),
        col("user_id").cast("string").as("key"), col("props").as("value"),
        col("event_id").as("source_offset"))
      .orderBy("source_offset")

  // O1: commit(offset+1) ledger with string metadata
  // (src/assignment-contexts/kafka.ts:65-78; "+1" semantics
  // test/tests/processors.ts:160-196).
  private def commitLedger(s: SparkSession, d: String): DataFrame =
    ev(s, d).groupBy(part)
      .agg((max("event_id") + 1).as("commit_offset"),
        count(lit(1)).as("n_processed"))
      .withColumn("metadata", concat(lit("processed="), col("n_processed")))
      .orderBy("part")

  // O3: watermarks() — {lowOffset, highOffset=last+1}
  // (src/assignment-contexts/local.ts:114-122, kafka.ts:41-49).
  private def offsetsWatermarks(s: SparkSession, d: String): DataFrame =
    ev(s, d).groupBy(part)
      .agg(min("event_id").as("low_offset"),
        (max("event_id") + 1).as("high_offset"),
        count(lit(1)).as("n"))
      .orderBy("part")

  // O4: caughtUp(offset) — offset+1 >= highWatermark (local.ts:125-128).
  private def caughtUp(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("part")
    ev(s, d).select(part, col("event_id").as("offset"))
      .withColumn("caught_up",
        (col("offset") + 1 >= max("offset").over(w) + 1).cast("int"))
      .orderBy("part", "offset")
  }

  // O5: isEmpty() — high - low <= 0 (kafka.ts:89-93, local.ts:149-151).
  // Only partitions 0..2 receive 'purchase' traffic here, so 3..7 are empty.
  private def isEmpty(s: SparkSession, d: String): DataFrame = {
    val parts = s.range(0, 8).toDF("part")
    val counts = ev(s, d)
      .filter(col("event_type") === "purchase" && col("user_id") % 8 < 3)
      .groupBy((col("user_id") % 8).as("part")).agg(count(lit(1)).as("n"))
    parts.join(counts, Seq("part"), "left")
      .select(col("part"),
        (coalesce(col("n"), lit(0L)) === 0L).cast("int").as("is_empty"))
      .orderBy("part")
  }

  // O6: seek(absolute) — forward skip / backward replay from an offset
  // (local.ts:156-181, streams.ts:80-100). Batch analogue: offset predicate;
  // the midpoint is computed from the log itself so it scales with SF.
  private def seekAbsolute(s: SparkSession, d: String): DataFrame = {
    val th = ev(s, d).agg(
      floor(max("event_id") * 0.5).cast("long").as("th"))
    ev(s, d).crossJoin(broadcast(th))
      .filter(col("event_id") >= col("th"))
      .select(part, col("event_id").as("offset"))
      .orderBy("part", "offset")
  }

  // O7: seek(logical) — resolve earliest/latest aliases to the low/high
  // watermark then seek (src/offsets.ts:1-39). 'earliest'+3 and 'latest'-5
  // anchored windows per partition.
  private def seekLogical(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("part")
    ev(s, d).select(part, col("event_id").as("offset"))
      .withColumn("mx", max("offset").over(w))
      .withColumn("mn", min("offset").over(w))
      .filter(col("offset") >= col("mx") - 4 || col("offset") <= col("mn") + 2)
      .withColumn("tag",
        when(col("offset") >= col("mx") - 4, "latest-5").otherwise("earliest+3"))
      .select("part", "offset", "tag")
      .orderBy("part", "offset")
  }

  val defs: Seq[QDef] = Seq(
    QDef("q_scan_source", scanSource, Some(
      """SELECT 'events' AS topic, user_id % 8 AS part, event_id AS "offset",
        | CAST(user_id AS VARCHAR) AS key, props AS value, epoch_us(ts) AS ts_us
        | FROM events ORDER BY "offset"""".stripMargin)),
    QDef("q_partition_ordering", partitionOrdering, Some(
      """SELECT user_id % 8 AS part, event_id AS "offset",
        | ROW_NUMBER() OVER (PARTITION BY user_id % 8 ORDER BY event_id) AS seq
        | FROM events ORDER BY part, "offset"""".stripMargin)),
    QDef("q_transform_chain", transformChain, Some(
      """SELECT event_id, k, v2, tag, v2 + k AS score FROM (
        | SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  value * 2 AS v2, upper(event_type) AS tag FROM events)
        | ORDER BY event_id""".stripMargin)),
    QDef("q_filter_abandon", filterAbandon, Some(
      """SELECT event_id, event_type, value FROM events
        | WHERE event_type <> 'error' AND value >= 5.0 ORDER BY event_id""".stripMargin)),
    QDef("q_json_parse", jsonParse, Some(
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
         | count(*) AS n, ${Det.dsumSql("value")} AS sum_value
         | FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    QDef("q_send_sink", sendSink, Some(
      """SELECT 'events-out' AS topic, user_id % 4 AS part,
        | CAST(user_id AS VARCHAR) AS key, props AS value, event_id AS source_offset
        | FROM events WHERE event_type = 'purchase' ORDER BY source_offset""".stripMargin)),
    QDef("q_commit_ledger", commitLedger, Some(
      """SELECT part, commit_offset, n_processed,
        | 'processed=' || CAST(n_processed AS VARCHAR) AS metadata FROM (
        | SELECT user_id % 8 AS part, max(event_id) + 1 AS commit_offset,
        |  count(*) AS n_processed FROM events GROUP BY 1) ORDER BY part""".stripMargin)),
    QDef("q_offsets_watermarks", offsetsWatermarks, Some(
      """SELECT user_id % 8 AS part, min(event_id) AS low_offset,
        | max(event_id) + 1 AS high_offset, count(*) AS n
        | FROM events GROUP BY 1 ORDER BY part""".stripMargin)),
    QDef("q_caught_up", caughtUp, Some(
      """SELECT part, "offset", CAST("offset" + 1 >= mx + 1 AS INT) AS caught_up FROM (
        | SELECT user_id % 8 AS part, event_id AS "offset",
        |  max(event_id) OVER (PARTITION BY user_id % 8) AS mx FROM events)
        | ORDER BY part, "offset"""".stripMargin)),
    QDef("q_is_empty", isEmpty, Some(
      """SELECT r.range AS part, CAST(COALESCE(s.n, 0) = 0 AS INT) AS is_empty
        | FROM range(0, 8) r LEFT JOIN (
        |  SELECT user_id % 8 AS part, count(*) AS n FROM events
        |  WHERE event_type = 'purchase' AND user_id % 8 < 3 GROUP BY 1) s
        | ON r.range = s.part ORDER BY part""".stripMargin)),
    QDef("q_seek_absolute", seekAbsolute, Some(
      """SELECT user_id % 8 AS part, event_id AS "offset" FROM events
        | WHERE event_id >= (SELECT CAST(floor(max(event_id) * 0.5) AS BIGINT) FROM events)
        | ORDER BY part, "offset"""".stripMargin)),
    QDef("q_seek_logical", seekLogical, Some(
      """SELECT part, "offset",
        | CASE WHEN "offset" >= mx - 4 THEN 'latest-5' ELSE 'earliest+3' END AS tag
        | FROM (SELECT user_id % 8 AS part, event_id AS "offset",
        |  max(event_id) OVER (PARTITION BY user_id % 8) AS mx,
        |  min(event_id) OVER (PARTITION BY user_id % 8) AS mn FROM events)
        | WHERE "offset" >= mx - 4 OR "offset" <= mn + 2
        | ORDER BY part, "offset"""".stripMargin))
  )
}
