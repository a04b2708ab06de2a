package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the analytic layer that the DuckDB oracle can't
  * express as a single query: cross-query consistency (semi/anti
  * complement, cube face totals, sample rate) on the sf0.001 fixture. */
class AnalyticSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_join_semi and q_join_anti partition the customer set exactly") {
    val nSemi = q("q_join_semi").count()
    val nAnti = q("q_join_anti").agg(sum("n_cust")).head.getLong(0)
    val nCust = graft.sources.Tables(spark, sf, "customer").count()
    assert(nSemi + nAnti == nCust,
      s"semi ($nSemi) + anti ($nAnti) != customers ($nCust)")
  }

  test("every cube face sums to the same grand total") {
    val cube = q("q_cube_revenue").cache()
    try {
      val total = cube
        .filter(col("o_orderpriority") === "(all)" && col("o_orderstatus") === "(all)")
        .head.getLong(3)
      val detail = cube
        .filter(col("o_orderpriority") =!= "(all)" && col("o_orderstatus") =!= "(all)")
        .agg(sum("n")).head.getLong(0)
      val byPri = cube
        .filter(col("o_orderpriority") =!= "(all)" && col("o_orderstatus") === "(all)")
        .agg(sum("n")).head.getLong(0)
      assert(detail == total && byPri == total,
        s"face totals diverge: detail=$detail byPri=$byPri total=$total")
    } finally cube.unpersist()
  }

  test("stratified sample keeps ~10% of every stratum (hash-deterministic)") {
    val rows = q("q_sample_stratified")
      .select("event_type", "n_total", "n_sampled").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (total, sampled) = (r.getLong(1), r.getLong(2))
      val rate = sampled.toDouble / total
      // md5 buckets are uniform; 3σ tolerance at the fixture's stratum sizes
      val tol = 3 * math.sqrt(0.1 * 0.9 / total)
      assert(math.abs(rate - 0.1) <= tol,
        s"${r.getString(0)}: sample rate $rate off 0.1 beyond $tol")
    }
  }

  test("corr_qp is a valid correlation and matches the built-in to 1e-3") {
    val ours = q("q_corr_stats").select("l_returnflag", "corr_qp").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val builtin = graft.sources.Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours.keySet == builtin.keySet)
    for ((k, v) <- ours) {
      assert(v >= -1.0 && v <= 1.0, s"$k: corr $v out of range")
      assert(math.abs(v - builtin(k)) < 1e-3,
        s"$k: decimal-moment corr $v vs built-in ${builtin(k)}")
    }
  }

  test("q_embed_centroids: 10 labels x 64 dims, counts sum to corpus size") {
    val c = q("q_embed_centroids").cache()
    try {
      assert(c.count() == 10 * 64)
      val perLabel = c.filter(col("pos") === 1)
        .agg(sum("n")).head.getLong(0)
      val nVec = graft.sources.Tables(spark, sf, "embeddings").count()
      assert(perLabel == nVec, s"centroid counts $perLabel != vectors $nVec")
    } finally c.unpersist()
  }

  test("funnel counts are monotonically non-increasing across steps") {
    val r = SparkEntry.queries("q_funnel")(spark, sf).head
    val (v, vc, f) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_view_click"),
      r.getAs[Long]("n_full_funnel"))
    assert(v >= vc && vc >= f, s"funnel not monotone: $v >= $vc >= $f")
    assert(v > 0, "no users entered the funnel")
  }

  test("time-weighted average lies within each user's value range") {
    val ev = graft.sources.Tables(spark, sf, "events")
    val bounds = ev.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.min("value").as("lo"),
        org.apache.spark.sql.functions.max("value").as("hi"))
    val twa = SparkEntry.queries("q_time_weighted")(spark, sf)
    val viol = twa.join(bounds, Seq("user_id"))
      .filter(col("twa") < col("lo") - 1e-4 || col("twa") > col("hi") + 1e-4)
      .count()
    assert(viol == 0, s"$viol users have TWA outside their value range")
  }
}
