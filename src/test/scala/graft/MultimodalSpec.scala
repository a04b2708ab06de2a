package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** The mapPartitions decode plumbing must produce exactly the rows the
  * declarative (oracle-checked) q_multimodal_meta query computes — the
  * stub kernel and the SQL mirror the same arithmetic by construction. */
class MultimodalSpec extends SparkSpec {

  test("decodeAssets (mapPartitions path) == q_multimodal_meta (declarative path)") {
    val viaKernel = MultimodalOps
      .decodeAssets(spark, MultimodalOps.assets(spark, sf))
      .toDF()
      .orderBy("doc_id")
      .collect().toSeq
    val declarative = SparkEntry.queries("q_multimodal_meta")(spark, sf)
      .collect().toSeq
    assert(viaKernel.nonEmpty)
    assert(viaKernel == declarative)
  }

  test("metadata-only query never reads the blob column (column pruning)") {
    val plan = MultimodalOps.assets(spark, sf)
      .select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("text"),
      s"blob/text column should be pruned from the scan:\n$plan")
  }
}
