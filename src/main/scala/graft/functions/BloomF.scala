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
    * filter sized for `expectedItems` at ~10 bits/item (fpp ≈ 1%).
    *
    * SIZE CLIFF (logged, not fatal): the bit count is capped at 64M bits
    * (8 MiB — the sketch rides every task binary as a plan literal), and
    * Spark additionally clamps the aggregate's estimatedNumItems to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default 4M).
    * Beyond ~6.7M items the fpp therefore degrades past the documented
    * ~1% and the prefilter trends toward a pass-through — still CORRECT
    * (no false negatives; the verify join downstream removes false
    * positives) but no longer cheap. A benchmark suite's grams are far
    * below the cap; a caller probing something corpus-sized gets a loud
    * warning instead of a silent perf cliff. */
  def bloomAgg(c: Column, expectedItems: Long): Column = {
    val maxBits = 64L * 1024 * 1024
    val bits = math.min(expectedItems * 10L, maxBits)
    if (expectedItems * 10L > maxBits)
      System.err.println(
        s"[graft] BloomF.bloomAgg: expectedItems=$expectedItems wants " +
          s"${expectedItems * 10L} bits > cap $maxBits — fpp will degrade " +
          "past ~1% and the prefilter loses selectivity (correctness is " +
          "unaffected; the exact verify join still removes false positives)")
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
