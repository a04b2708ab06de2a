package graft.streaming

/** The message model of the engine's streaming surface — the Kafka wire
  * shape of the reference's `Message` (`/root/reference/src/streams.ts:8-19`:
  * topic, partition, key, value, offset, timestamp, highWaterOffset).
  *
  * Deltas from the reference, by design:
  *  - key/value are Strings under the JSON convention the reference's local
  *    context applies anyway (`src/assignment-contexts/local.ts:70-76`
  *    JSON-serializes non-Buffer keys/values); raw bytes would be
  *    `Array[Byte]` columns with identical plumbing.
  *  - offsets are native 64-bit longs — the reference ships them as strings
  *    only because JS numbers can't hold int64 (`src/streams.ts:80-85`).
  *  - `headers` is a string→string map under the same JSON convention
  *    (the reference's `IHeaders` carries Buffer/string values,
  *    `src/streams.ts:15`); the Kafka source's
  *    array<struct<key,binary>> shape converts at the read edge.
  *  - `error` carries an injected failure through the log (the reference
  *    injects `Error` objects into the stream,
  *    `src/assignment-contexts/local.ts:103-105`); the pipeline throws on
  *    encountering it, which surfaces as a StreamingQueryException — the
  *    Spark rendering of frolyk's stream-error propagation
  *    (`src/processors.ts:95-98`, `src/task.ts:241-243`).
  */
case class KMessage(
    topic: String,
    partition: Int,
    offset: Long,
    key: String,
    value: String,
    timestamp: Long,
    error: String = null,
    headers: Map[String, String] = Map.empty)

/** A message to produce — the reference's `NewMessage`
  * (`src/assignment-contexts/index.ts:31-42`). `partition = -1` leaves
  * routing to the sink (the reference's optional partition). */
case class NewMessage(
    topic: String,
    value: String,
    partition: Int = -1,
    key: String = null,
    headers: Map[String, String] = Map.empty)

/** One commit request: `commit(offset + 1)` plus optional string metadata —
  * the reference's `OffsetAndMetadata` (`src/assignment-contexts/index.ts:26-29`,
  * "+1" semantics per `test/tests/processors.ts:160-196`). */
case class CommitReq(offset: Long, metadata: Option[String])

/** The pipeline's output row for one consumed message: the processor-chain
  * result plus every side effect the processors requested, carried AS DATA.
  *
  * The reference's `ProcessingContext` mutates broker state mid-message
  * (commit/send hit the network from inside the chain,
  * `src/assignment-contexts/kafka.ts:65-78,105-124`); on a cluster that
  * imperative model breaks down — executors must not own offset state. So
  * effects ride in the row and the SINK applies them in offset order:
  * commits to the ledger/checkpoint, produced messages to the producer (or
  * loopback). Same observable semantics, but replayable and exactly-once
  * per micro-batch. */
case class Processed(
    topic: String,
    partition: Int,
    offset: Long,
    result: String,
    abandoned: Boolean,
    commits: Seq[CommitReq],
    produced: Seq[NewMessage])
