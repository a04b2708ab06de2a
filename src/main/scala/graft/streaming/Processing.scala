package graft.streaming

import scala.collection.mutable

/** The processor chain — the reference's only computation model
  * (`/root/reference/src/processors.ts`).
  *
  * P1/P2: a source carries processor SETUPS; each setup runs once per
  * assignment (`src/processors.ts:36-44`) and returns one-or-more
  * per-message processors. P3: each message folds through the processors
  * sequentially, depth-first — message m is fully processed before m+1
  * enters (`src/processors.ts:80-98`; ordering test
  * `test/tests/processors.ts:64-68`). P4: a processor returning
  * [[Processing.Abandon]] drops the message and skips the rest of the
  * chain, but the offset still counts as processed
  * (`src/processors.ts:6,82-93`). P7: a throwing processor aborts the
  * stream (`src/processors.ts:95-98`) — here the Spark task fails and the
  * streaming query dies with a StreamingQueryException.
  */
object Processing {

  /** Sentinel returned by `ctx.abandon` (`src/processors.ts:6`). */
  case object Abandon

  /** Per-message processor: (previous result | message, context) → result.
    * The first processor in the chain receives the [[KMessage]] itself
    * (`src/processors.ts:80-87`). */
  type Processor = (Any, ProcessingContext) => Any

  /** Once-per-assignment setup (`ProcessorSetup`, `src/processors.ts:8-10`). */
  type ProcessorSetup = AssignmentInfo => Seq[Processor]

  /** The (topic, partition, group) handle a setup receives — the static
    * part of the reference's assignment context
    * (`src/assignment-contexts/index.ts:11-24`). */
  case class AssignmentInfo(topic: String, partition: Int, group: String)

  /** Per-message context (`src/processors.ts:12-21,65-78`): metadata
    * accessors plus effect-recording `commit`/`send`. Effects are NOT
    * applied here — they're collected into the [[Processed]] row and
    * applied by the sink in offset order (see KMessage.scala rationale). */
  final class ProcessingContext private[streaming] (
      val topic: String,
      val partition: Int,
      val offset: Long,
      val timestamp: Long,
      val group: String) extends Serializable {

    private[streaming] val commits = mutable.Buffer.empty[CommitReq]
    private[streaming] val produced = mutable.Buffer.empty[NewMessage]

    /** Commit offset+1 with optional metadata (`src/processors.ts:68`,
      * `src/assignment-contexts/kafka.ts:65-78`). */
    def commit(): Unit = commit(null)
    def commit(metadata: String): Unit =
      commits += CommitReq(offset + 1, Option(metadata))

    /** Produce a message (`src/assignment-contexts/kafka.ts:105-124`). */
    def send(m: NewMessage): Unit = produced += m

    /** Drop this message, skip remaining processors (`src/processors.ts:6`). */
    def abandon: Any = Abandon

    /** `topic-partition@offset` (`src/processors.ts:76-78`; test
      * `test/tests/processors.ts:215-238`). */
    override def toString: String = s"$topic-$partition@$offset"
  }

  /** The inner loop shared by the production and test paths (SURVEY §3.3):
    * strictly serial per partition, depth-first per message. Runs inside
    * `mapPartitions`, so per-partition order is preserved and the chain is
    * a narrow operation — Spark's unit of parallelism is the partition,
    * exactly like the reference's per-partition streams. */
  def processPartition(group: String, procs: Seq[Processor])(
      msgs: Iterator[KMessage]): Iterator[Processed] =
    msgs.map { m =>
      if (m.error != null)
        // Injected stream error: propagate through the pipeline
        // (local.ts:103-105 → processors.ts:95-98).
        throw new IllegalStateException(s"injected stream error: ${m.error}")
      val ctx = new ProcessingContext(m.topic, m.partition, m.offset,
        m.timestamp, group)
      var cur: Any = m
      var abandoned = false
      val it = procs.iterator
      while (it.hasNext && !abandoned) {
        cur = it.next()(cur, ctx)
        if (cur.asInstanceOf[AnyRef] eq Abandon) abandoned = true
      }
      Processed(m.topic, m.partition, m.offset,
        if (abandoned) null else String.valueOf(cur), abandoned,
        ctx.commits.toSeq, ctx.produced.toSeq)
    }
}
