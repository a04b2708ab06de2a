package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream-static enrichment (the streaming twin of q_join_broadcast): a
  * message stream joined per micro-batch against a static dimension table —
  * how a live ingest pipeline attaches catalog/metadata attributes before
  * sinking. The static side re-resolves per batch and broadcasts; the
  * stream side never shuffles for the join. */
class StreamingJoinSpec extends SparkSpec {

  test("stream-static broadcast join enriches micro-batches with dimension rows") {
    val s = spark
    import s.implicits._
    val dim = graft.sources.Tables(s, sf, "nation")
      .select(col("n_nationkey").cast("long").as("key"), col("n_name"))
    val in = MemoryStream[(Long, Long)](s)
    val enriched = in.toDS().toDF("event_id", "nation_key")
      .join(broadcast(dim), col("nation_key") === col("key"))
      .select("event_id", "n_name")
    val q = enriched.writeStream
      .format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData((1L, 0L), (2L, 3L), (3L, 9999L)) // 9999: no dim match
      q.processAllAvailable()
      val rows = s.table("ss_join").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.keySet == Set(1L, 2L), s"unmatched rows must drop: $rows")
      val expect = dim.filter(col("key").isin(0L, 3L)).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows == Map(1L -> expect(0L), 2L -> expect(3L)))
    } finally q.stop()
  }
}
