package graft

/** The Det contract, executed: results of floating-point aggregates must be
  * IDENTICAL under different shuffle partitioning — the property that makes
  * the DuckDB hash-compare valid and the results stable on a 1000-executor
  * cluster where partial-aggregation order is nondeterministic. Plain
  * double sums would fail this (addition is not associative in IEEE);
  * the decimal accumulator (Det.dsum) and the moment-sum formulations are
  * what make it hold. */
class DetSpec extends SparkSpec {

  test("float-heavy queries are bit-identical under different shuffle partitioning") {
    // one query per accumulation pattern: grouped decimal sums (agg_hash),
    // moment-sum statistics (corr), exploded element sums (centroids),
    // per-doc surprisal sums over a token join (lm_score), windowed
    // duration-weighted sums (time_weighted), iterative decimal rank sums
    // with a seed-normalized teleport (graph_ppr, r9 — also covers the
    // exact-decimal normalizing total), HOF decimal folds ranked into a
    // shortlist (pq_adc_verify, r9), and pow-weighted rate derivation
    // through a decimal-normalized weight table (mixture_temperature, r9)
    val queries = Seq("q_agg_hash", "q_corr_stats", "q_embed_centroids",
      "q_lm_score", "q_time_weighted", "q_graph_ppr", "q_pq_adc_verify",
      "q_mixture_temperature")
    val conf = spark.conf
    val original = conf.get("spark.sql.shuffle.partitions")
    try {
      for (q <- queries) {
        conf.set("spark.sql.shuffle.partitions", "3")
        val a = SparkEntry.queries(q)(spark, sf).collect().toSeq
        conf.set("spark.sql.shuffle.partitions", "13")
        val b = SparkEntry.queries(q)(spark, sf).collect().toSeq
        assert(a.nonEmpty, s"$q returned nothing")
        assert(a == b,
          s"$q differs between 3-way and 13-way shuffle partitioning")
      }
    } finally conf.set("spark.sql.shuffle.partitions", original)
  }
}
