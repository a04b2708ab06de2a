package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.Processing._

/** Watermarks of a partition log: `{lowOffset, highOffset = last + 1}`
  * (`/root/reference/src/assignment-contexts/index.ts:55-58`). */
case class Watermarks(lowOffset: Long, highOffset: Long)

/** Broker-free local assignment context + test interface — the Spark
  * rendering of the reference's most-tested surface
  * (`/root/reference/src/assignment-contexts/local.ts:9-20,253-289`,
  * exercised by all 612 lines of `test/tests/inject.ts`).
  *
  * The log is a [[MemoryStream]] of [[KMessage]]; the pipeline is the SAME
  * `Processing.processPartition` the production path runs, executed
  * through a real Structured Streaming query (micro-batch engine). The
  * chain itself runs DRIVER-SIDE inside the sink, on the long-lived
  * processor instances created at inject time: the P2 contract — setup
  * once per assignment, processor closure state alive for the whole
  * assignment (`examples/introduction.ts:12`) — requires the same
  * instances across micro-batches, and executor-side closures are
  * re-deserialized per batch, which would silently reset captured state.
  * This mirrors the reference's local context exactly (an in-process
  * harness, `local.ts:52-67`); the distributed path is [[Task.start]],
  * where cross-batch state belongs in `mapGroupsWithState`, not closures.
  * Each micro-batch is sorted by offset before the chain runs, so the
  * per-partition depth-first order contract (S3/P3) holds; the sink
  * applies carried effects in offset order:
  *  - results → `processingResults` (local.ts `processingResults`),
  *  - offsets → `processedOffsets` (abandoned messages included — P4),
  *  - commits → `committedOffsets` ledger (O1/O2),
  *  - produced → `producedMessages`, with send-LOOPBACK: a message
  *    produced to this context's own topic+partition re-enters the log
  *    with the next offset (local.ts:183-201).
  *
  * Offset assignment is monotonic from `lowOffset`
  * (guard at local.ts:80-82); injected errors surface on the next
  * [[await]] as a StreamingQueryException (P7).
  *
  * The `collect()` in the sink is a TEST-HARNESS property, mirroring the
  * reference's in-memory local context: assertions live on the driver and
  * batches are test-sized. The production sink ([[Task.start]]) never
  * collects.
  */
final class AssignmentTestInterface private[streaming] (
    spark: SparkSession,
    group: String,
    val topic: String,
    val partition: Int,
    procs: Seq[Processor],
    initial: Seq[KMessage],
    lowOffset: Long,
    offsetReset: String) {

  private implicit val kEnc: org.apache.spark.sql.Encoder[KMessage] =
    Encoders.product[KMessage]
  private implicit val pEnc: org.apache.spark.sql.Encoder[Processed] =
    Encoders.product[Processed]

  private val lock = new Object
  private var nextOffset: Long = lowOffset
  private var clock: Long = 0L

  private val results = mutable.Buffer.empty[String]
  private val offsets = mutable.Buffer.empty[Long]
  private val produced = mutable.Buffer.empty[NewMessage]
  private val commits = mutable.Buffer.empty[CommitReq]

  /** Full retained log (the local context's in-memory log,
    * local.ts:52-67) — the replay source for backward seeks. */
  private val log = mutable.Buffer.empty[KMessage]

  /** Seek fence: messages below it are discarded at the sink before the
    * pipeline runs — the Spark rendering of the reference's SeekOp
    * stale-batch fencing (`src/streams.ts:28-36,64-78`). */
  @volatile private var fence: Long = Long.MinValue

  private val stream = MemoryStream[KMessage](spark)

  /** Coerce an incoming message into the log: monotonic offset (explicit
    * offsets may only move forward), logical clock timestamp. */
  private def stamp(m: KMessage): KMessage = lock.synchronized {
    val off =
      if (m.offset >= 0) {
        require(m.offset >= nextOffset,
          s"offsets must increase monotonically: ${m.offset} < $nextOffset " +
            "(local.ts:80-82)")
        m.offset
      } else nextOffset
    nextOffset = off + 1
    clock += 1
    val stamped = m.copy(topic = topic, partition = partition, offset = off,
      timestamp = if (m.timestamp > 0) m.timestamp else clock)
    log += stamped
    stamped
  }

  /** Messages seeded from initial state (local.ts `initialMessages`). */
  val initialMessages: Seq[KMessage] = initial.map(stamp)
  if (initialMessages.nonEmpty) stream.addData(initialMessages)

  private val ckptDir = Files.createTempDirectory("graft-inject-ckpt")

  private val query: StreamingQuery = stream.toDS()
    .writeStream
    .queryName(s"graft-inject-$group-$topic-$partition-${System.identityHashCode(this)}")
    .option("checkpointLocation", ckptDir.toString)
    .foreachBatch { (batch: Dataset[KMessage], _: Long) =>
      val f = fence
      // Driver-side chain over the long-lived `procs` (see class doc):
      // collect the (test-sized) batch in offset order, then fold. The
      // fence drops stale messages before the pipeline sees them
      // (streams.ts:64-78).
      val msgs = batch
        .filter(col("offset") >= f)
        .sort("offset")
        .collect()
      val done = Processing.processPartition(group, procs)(msgs.iterator).toArray
      val loopback = lock.synchronized {
        done.foreach { p =>
          offsets += p.offset
          if (!p.abandoned) results += p.result
          commits ++= p.commits
          produced ++= p.produced
        }
        done.toSeq.flatMap(_.produced)
          .filter(m => m.topic == topic &&
            (m.partition == partition || m.partition < 0))
          .map(m => stamp(KMessage(topic, partition, -1L, m.key, m.value, 0L,
            headers = m.headers)))
      }
      // Send-loopback re-enters the log and is drained by the same
      // processAllAvailable that revealed it (local.ts:188-190).
      if (loopback.nonEmpty) stream.addData(loopback)
      ()
    }
    .start()

  // --- injection (S5) ----------------------------------------------------

  /** Inject a payload; returns the stamped message (local.ts:253-268). */
  def inject(value: String): KMessage = inject(KMessage(topic, partition, -1L, null, value, 0L))

  def inject(key: String, value: String): KMessage =
    inject(KMessage(topic, partition, -1L, key, value, 0L))

  def inject(m: KMessage): KMessage = {
    val stamped = stamp(m)
    stream.addData(stamped)
    stamped
  }

  /** Inject a stream ERROR (local.ts:103-105): the pipeline throws on it,
    * the query dies, and the next [[await]]/[[end]] rethrows — frolyk's
    * error propagation (P7). The error occupies a log position like any
    * message (stamped offset), so it propagates in stream order after
    * everything injected before it. */
  def injectError(message: String): Unit =
    stream.addData(stamp(KMessage(topic, partition, -1L, null, null, 0L, error = message)))

  /** Drain everything injected so far through the pipeline (the awaited
    * promise of the reference's async inject). Throws
    * StreamingQueryException if a processor threw or an error was
    * injected. */
  def await(): Unit = query.processAllAvailable()

  // --- seek (O6/O7) ------------------------------------------------------

  /** O6: absolute seek (local.ts:156-181). Forward: not-yet-processed
    * messages below the target are fenced out (skip). Backward: processed
    * messages from the target on are re-enqueued from the retained log
    * (replay) — both land in the same micro-batch as any pending
    * originals, and the sink's offset sort restores consumption order.
    * Out-of-range targets clamp per the source's offsetReset policy: low
    * for `earliest`, high for `latest` (local.ts:162-173).
    *
    * Call discipline: like every method of this interface, seek is
    * synchronous-use — don't race it against an in-flight [[await]] (the
    * reference's local context is single-threaded JS and has the same
    * implicit contract). A seek between inject and await fences exactly
    * the pending messages below the target, which is the forward-skip
    * semantics under test. */
  def seek(target: Long): Unit = {
    val replay = lock.synchronized {
      val low = lowOffset
      val high = nextOffset
      val t =
        if (target < low || target > high)
          if (offsetReset == "earliest") low else high
        else target
      // next unprocessed offset: processing is in-order, so everything
      // below max(processed)+1 has been consumed
      val p = if (offsets.isEmpty) low else offsets.max + 1
      fence = t
      if (t < p) log.filter(m => m.offset >= t && m.offset < p).toSeq
      else Seq.empty
    }
    if (replay.nonEmpty) stream.addData(replay)
  }

  /** O7: logical seek — resolve the reference's six aliases + two enum
    * names to the low/high watermark (`src/offsets.ts:1-39`), then seek. */
  def seek(logical: String): Unit = logical.toLowerCase match {
    case "earliest" | "beginning" | "smallest" | "-2" =>
      seek(lock.synchronized(lowOffset))
    case "latest" | "end" | "largest" | "-1" =>
      seek(lock.synchronized(nextOffset))
    case other =>
      throw new IllegalArgumentException(
        s"unknown logical offset '$other' (src/offsets.ts:1-17)")
  }

  /** End the log and await processing (local.ts:280-283). */
  def end(): Unit = {
    await()
    query.stop()
    query.awaitTermination()
    cleanup()
  }

  private[streaming] def close(): Unit = {
    try query.stop() catch { case _: Throwable => () }
    cleanup()
  }

  /** Remove the temp checkpoint (one per interface; tests create many). */
  private def cleanup(): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(ckptDir)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(p => Files.deleteIfExists(p))
      finally walk.close() // Files.walk holds open directory handles
    } catch { case _: Throwable => () }

  // --- observers (the AssignmentTestInterface surface, local.ts:9-20) ----

  def processingResults: Seq[String] = lock.synchronized(results.toSeq)
  def processedOffsets: Seq[Long] = lock.synchronized(offsets.toSeq)
  def producedMessages: Seq[NewMessage] = lock.synchronized(produced.toSeq)
  def committedOffsets: Seq[CommitReq] = lock.synchronized(commits.toSeq)

  /** O2: last committed offset, -1 when nothing committed
    * (kafka.ts:80-87). */
  def committed(): Long =
    lock.synchronized(commits.lastOption.map(_.offset).getOrElse(-1L))

  /** O3: `{low, high = last + 1}`; empty log → both = lowOffset
    * (local.ts:114-122). */
  def watermarks(): Watermarks =
    lock.synchronized(Watermarks(lowOffset, nextOffset))

  /** O4: processed up to the high watermark (local.ts:125-128: caught up
    * iff `offset + 1 >= high`). */
  def caughtUp(): Boolean = lock.synchronized {
    nextOffset == lowOffset ||
      offsets.lastOption.exists(_ + 1 >= nextOffset)
  }

  /** O5: `high - low <= 0` (local.ts:149-151). */
  def isEmpty(): Boolean = lock.synchronized(nextOffset - lowOffset <= 0)
}
