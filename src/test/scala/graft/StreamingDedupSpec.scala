package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of the exact-dedup operator (SURVEY §2.5 G10): ingest-time
  * deduplication on the micro-batch engine — what a training-data pipeline
  * runs at the firehose BEFORE documents ever land in the corpus, so the
  * batch dedup passes start from a smaller set.
  *
  * Two state regimes, both keyed on the 128-bit content hash (state carries
  * 16-byte keys, never documents — same 100 TB rule as the batch family):
  *  - unbounded `dropDuplicates`: exact across the whole stream lifetime;
  *  - `dropDuplicatesWithinWatermark`: state bounded by the event-time
  *    watermark — the only sustainable regime on an infinite stream, exact
  *    within the dedup horizon (duplicates of a document arrive in a
  *    bounded window in practice: replays, retries, crawl refetches).
  */
class StreamingDedupSpec extends SparkSpec {

  test("G10 streaming: dropDuplicates on content hash across micro-batches") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[(Long, String)](s)
    val deduped = in.toDS()
      .toDF("doc_id", "text")
      .withColumn("h", md5(col("text").cast("binary")))
      .dropDuplicates("h")
    val q = deduped.writeStream
      .format("memory").queryName("g10_dedup")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      // duplicate arriving BATCHES later is still dropped (state, not
      // batch-local distinct)
      in.addData((4L, "beta"), (5L, "gamma"))
      q.processAllAvailable()
      val kept = s.table("g10_dedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept.map(_.toInt).subsetOf(Set(1, 2, 3, 5)) && kept.size == 3,
        s"expected one survivor per distinct text, got $kept")
      val texts = s.table("g10_dedup").select("text")
        .collect().map(_.getString(0)).toSet
      assert(texts == Set("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("streaming decontamination: the batch Bloom sketch gates a stream") {
    // The decontaminate sketch is engine-agnostic: built ONCE batch-side
    // over the benchmark, then applied to the ingest stream as a pure
    // per-row filter (stateless, codegen'd) — a crawler drops benchmark
    // contamination before it ever lands in the corpus. Exactness note:
    // stream-side the sketch is a PREFILTER (~1% false positives flagged
    // conservatively); the exact verify join stays a batch pass.
    val s = spark
    import s.implicits._
    val leak = (1 to 8).map(i => s"b$i").mkString(" ")
    val benchGrams = Seq(leak).toDF("text")
      .select(xxhash64(col("text")).as("g64"))
    val bloom = benchGrams
      .agg(graft.functions.BloomF.bloomAgg(col("g64"), 1024L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val in = MemoryStream[(Long, String)](s)
    val flagged = in.toDS().toDF("doc_id", "text")
      .filter(!graft.functions.BloomF.mightContain(bloom, xxhash64(col("text"))))
    val q = flagged.writeStream
      .format("memory").queryName("bloom_gate")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData((1L, leak), (2L, "clean document one"))
      q.processAllAvailable()
      in.addData((3L, leak), (4L, "clean document two"))
      q.processAllAvailable()
      val kept = s.table("bloom_gate").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(2L, 4L),
        s"contaminated rows must be gated out, clean rows kept: $kept")
    } finally q.stop()
  }

  test("G10 streaming: watermark-bounded dedup drops in-horizon duplicates") {
    val s = spark
    import s.implicits._
    val in = MemoryStream[(Timestamp, Long, String)](s)
    val deduped = in.toDS()
      .toDF("ts", "doc_id", "text")
      .withColumn("h", md5(col("text").cast("binary")))
      .withWatermark("ts", "1 minute")
      .dropDuplicatesWithinWatermark("h")
    val q = deduped.writeStream
      .format("memory").queryName("g10_dedup_wm")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def t(sec: Int) = new Timestamp(sec * 1000L)
      // t=0 would sit AT the initial watermark and be discarded as late —
      // start above it
      in.addData((t(100), 1L, "alpha"), (t(105), 2L, "beta"))
      q.processAllAvailable()
      // same content, 10s later — inside the 1-minute horizon → dropped
      in.addData((t(110), 3L, "alpha"))
      q.processAllAvailable()
      val kept = s.table("g10_dedup_wm").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L),
        s"in-horizon duplicate leaked or original lost: $kept")
    } finally q.stop()
  }

  test("streaming incremental dedup: the persisted corpus hash table gates the ingest stream") {
    // the streaming twin of DedupOps.exactDedupIncremental: the corpus's
    // persisted content-hash table joins the ingest stream STATIC-side
    // (stream-static left join is stateless — no stream state grows with
    // the corpus), then dropDuplicates bounds the in-stream copies; what
    // survives is exactly what a nightly batch ingest would keep
    val s = spark
    import s.implicits._
    val corpusHashes = Seq("known doc one", "known doc two")
      .toDF("text").select(md5(col("text").cast("binary")).as("h"))
      .withColumn("in_corpus", lit(true))
    val in = MemoryStream[(Long, String)](s)
    val fresh = in.toDS().toDF("doc_id", "text")
      .withColumn("h", md5(col("text").cast("binary")))
      .join(corpusHashes, Seq("h"), "left")
      .filter(col("in_corpus").isNull)
      .dropDuplicates("h")
    val q = fresh.writeStream
      .format("memory").queryName("incr_gate")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData((1L, "known doc one"), (2L, "brand new doc"))
      q.processAllAvailable()
      // corpus dup in a later batch still dropped (static side, not
      // state); in-stream dup across batches dropped by state
      in.addData((3L, "known doc two"), (4L, "brand new doc"),
        (5L, "another new doc"))
      q.processAllAvailable()
      val kept = s.table("incr_gate").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(2L, 5L),
        s"expected only the genuinely new docs to survive, got $kept")
    } finally q.stop()
  }
}
