package graft

import org.apache.spark.sql.functions._

/** Accuracy check for the one no-oracle relational query: HLL++ approx
  * distinct (rsd = 0.01) against the oracle-verified exact counts. */
class RelationalSpec extends SparkSpec {

  test("percentile_approx within 1% relative error of exact per returnflag") {
    val exact = SparkEntry.queries("q_quantiles")(spark, sf)
      .select("l_returnflag", "q50", "q95")
    val approx = SparkEntry.queries("q_quantiles_approx")(spark, sf)
    val joined = exact.join(approx, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val pairs = Seq((r.getDouble(1), r.getDouble(3)), (r.getDouble(2), r.getDouble(4)))
      pairs.foreach { case (e, a) =>
        assert(math.abs(a - e) / e <= 0.01,
          s"${r.getString(0)}: approx $a vs exact $e")
      }
    }
  }

  test("approx_count_distinct within 2% of exact per event_type") {
    val exact = SparkEntry.queries("q_distinct_users")(spark, sf)
    val approx = SparkEntry.queries("q_distinct_users_approx")(spark, sf)
    val joined = exact.join(approx, "event_type")
      .select(col("event_type"), col("n_users"), col("n_users_approx"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getLong(1).toDouble
      val a = r.getLong(2).toDouble
      assert(math.abs(a - e) / e <= 0.02,
        s"${r.getString(0)}: approx $a vs exact $e off by ${math.abs(a - e) / e}")
    }
  }

  test("distinct sketches: merged increments estimate == from-scratch, within 2% of exact") {
    import graft.operators.RelationalOps
    val ev = graft.sources.Tables(spark, sf, "events")
    // three disjoint increments advance the standing sketch pairwise —
    // the ingest regime; HLL registers max-merge, so the merged bytes
    // must carry the IDENTICAL estimate to sketching the union directly
    val parts = (0 to 2).map(i =>
      RelationalOps.distinctSketch(ev.filter(col("event_id") % 3 === i),
        "event_type", "user_id"))
    val merged = RelationalOps.distinctSketchEstimate(
      RelationalOps.distinctSketchMerge(
        RelationalOps.distinctSketchMerge(parts(0), parts(1), "event_type"),
        parts(2), "event_type"), "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = RelationalOps.distinctSketchEstimate(
      RelationalOps.distinctSketch(ev, "event_type", "user_id"),
      "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct,
      s"merged-increment estimates diverged: $merged vs $direct")
    val exact = SparkEntry.queries("q_distinct_users")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    merged.foreach { case (k, a) =>
      val e = exact(k).toDouble
      assert(math.abs(a - e) / e <= 0.02,
        s"$k: sketch $a vs exact $e off by ${math.abs(a - e) / e}")
    }
    // the gate binding is the same composition at a 75/25 split
    val gate = SparkEntry.queries("q_distinct_incr")(spark, sf).collect()
    assert(gate.map(_.getString(0)).toSet == exact.keySet)
  }
}
