package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitter) sketch aggregate — the Misra-Gries /
  * Space-Saving family via Apache DataSketches' `ItemsSketch` (the same
  * library Spark's own HLL functions wrap), exposed as a Catalyst
  * [[TypedImperativeAggregate]].
  *
  * Why a sketch and not `groupBy(key).count`: the exact form shuffles the
  * FULL key stream (every token of a 100 TB corpus moves once, keyed by
  * token) to find the handful of keys that matter. The sketch inverts the
  * cost: each partition folds its stream into a bounded `maxMapSize`-entry
  * map, and only those kilobyte buffers move in the final merge — heavy
  * hitters with ZERO data-sized shuffle, at the price of estimates with a
  * PROVEN error band: estimate ∈ [lb, ub], ub - lb ≤ getMaximumError ≤
  * N·3.5/maxMapSize, and NO FALSE NEGATIVES above that band (every item
  * with true count > maxError is retained — the Misra-Gries guarantee).
  * [[graft.operators.TextOps.frequentTokens]] composes this with an exact
  * verify pass over just the returned candidates — the Bloom-prefilter /
  * exact-verify pattern of the decontamination operator, applied to
  * frequency.
  *
  * The eval result is the SERIALIZED sketch (binary) — persistable as a
  * standing artifact and mergeable across ingests ([[FreqItems.decode]] /
  * `ItemsSketch.merge`), the same bytes-level incremental contract as the
  * HLL distinct sketches.
  */
case class FreqItemsAgg(child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"freq_items_agg takes a STRING column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String],
      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any = serialize(buffer)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe)

  override def deserialize(storage: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(storage), new ArrayOfStringsSerDe)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override protected def withNewChildInternal(
      newChild: Expression): FreqItemsAgg = copy(child = newChild)
}

object FreqItems {

  /** Aggregate a StringType column into a serialized frequent-items
    * sketch. `maxMapSize` (power of two ≥ 8) is the accuracy lever:
    * error band ≤ N·3.5/maxMapSize. */
  def freqItemsAgg(c: Column, maxMapSize: Int): Column = {
    require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
      s"maxMapSize must be a power of two >= 8, got $maxMapSize")
    // the string-input contract is enforced by the aggregate's
    // checkInputDataTypes at analysis time (the Column here is not yet
    // resolved against a plan, so its dataType is unknowable)
    graftshim.toColumn(
      FreqItemsAgg(graftshim.toExpression(c), maxMapSize)
        .toAggregateExpression())
  }

  /** One decoded candidate row: `count ∈ [lb, ub]` always; `est` is the
    * sketch's point estimate. */
  final case class Candidate(item: String, est: Long, lb: Long, ub: Long)

  /** Decode a serialized sketch: (stream length, maximum error, the
    * NO-FALSE-NEGATIVES candidate list above `threshold`). Every item
    * whose TRUE count ≥ max(threshold, maxError + 1) is guaranteed
    * present. */
  def decode(bytes: Array[Byte], threshold: Long): (Long, Long, Seq[Candidate]) = {
    val sk = ItemsSketch.getInstance(Memory.wrap(bytes),
      new ArrayOfStringsSerDe)
    val rows = sk.getFrequentItems(threshold, ErrorType.NO_FALSE_NEGATIVES)
      .map(r => Candidate(r.getItem, r.getEstimate, r.getLowerBound,
        r.getUpperBound))
      .toSeq
    (sk.getStreamLength, sk.getMaximumError, rows)
  }

  /** Merge two serialized sketches into one (register-level, loss-free
    * within the sketch's own guarantees) — the ingest path: the standing
    * sketch advances by each increment's bytes. */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val serde = new ArrayOfStringsSerDe
    val sa = ItemsSketch.getInstance(Memory.wrap(a), serde)
    val sb = ItemsSketch.getInstance(Memory.wrap(b), serde)
    sa.merge(sb)
    sa.toByteArray(serde)
  }
}
