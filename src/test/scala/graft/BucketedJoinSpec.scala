package graft

import org.apache.spark.sql.functions._

/** The bucketed-layout story asserted for real: writing both fact tables
  * bucketed on the join key lets the join run with NO exchange on either
  * side — the co-located join that turns the biggest shuffle of a 100 TB
  * pipeline into a local merge. (The operator docs cite `bucketBy` as the
  * persistence strategy for repeated joins/ANN probes; this spec is the
  * proof.) */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero exchanges and matches the plain join") {
    val s = spark
    val li = graft.sources.Tables(s, sf, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val ord = graft.sources.Tables(s, sf, "orders")
      .select("o_orderkey", "o_orderpriority")
    s.sql("DROP TABLE IF EXISTS lineitem_b")
    s.sql("DROP TABLE IF EXISTS orders_b")
    // the in-memory catalog forgets tables across sessions but their
    // warehouse directories survive — remove them or saveAsTable refuses
    val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("lineitem_b", "orders_b").foreach { t =>
      val dir = new java.io.File(wh, t).toPath
      if (java.nio.file.Files.exists(dir)) {
        // recursive: an aborted write can leave _temporary subdirs that a
        // flat delete silently skips, failing saveAsTable confusingly
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(dir)
        try walk.iterator().asScala.toSeq.reverseIterator
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")

    // merge hint: at this test SF the planner would broadcast the small
    // side; the claim under test is the sort-merge path both sides take
    // at fact-fact scale
    val joined = s.table("lineitem_b").hint("merge")
      .join(s.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")

    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
  }
}
