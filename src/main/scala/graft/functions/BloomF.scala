package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.BinaryType

/** Column entry points for Spark's native Bloom-filter sketch pair —
  * the same `BloomFilterAggregate` / `BloomFilterMightContain` expressions
  * Catalyst injects for runtime shuffle pruning (SPARK-32268), exposed for
  * explicit use by the decontamination operator.
  *
  * The aggregate builds one compact binary sketch distributed (per-partition
  * partial blooms OR-merged in a final reduce); the probe is a codegen'd
  * per-row bit test against that sketch baked into the plan as a literal.
  * Shape at 100 TB: the sketch's size depends only on the EXPECTED ITEM
  * COUNT (bits/item × items), never on the probed corpus — a benchmark
  * suite's n-grams fit a few MB however large the training corpus that
  * probes them.
  */
object BloomF {

  /** Aggregate `c` (LongType — pre-hashed keys) into a serialized Bloom
    * filter sized for `expectedItems` at ~10 bits/item (fpp ≈ 1%). */
  def bloomAgg(c: Column, expectedItems: Long): Column = {
    val bits = math.min(expectedItems * 10L, 64L * 1024 * 1024)
    graftshim.toColumn(new BloomFilterAggregate(
      graftshim.toExpression(c),
      Literal(expectedItems), Literal(bits), 0, 0).toAggregateExpression())
  }

  /** Probe: true iff `c` (LongType) MAY be in the sketch — no false
    * negatives, ~1% false positives (removed by an exact verify join
    * downstream). The sketch rides the plan as a binary literal — the
    * broadcast-model pattern; `BloomFilterMightContain` requires a
    * foldable bloom side, which the literal satisfies. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    graftshim.toColumn(BloomFilterMightContain(
      Literal(bloom, BinaryType), graftshim.toExpression(c)))
}
