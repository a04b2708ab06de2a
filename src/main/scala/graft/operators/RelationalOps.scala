package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, QDef}
import graft.sources.Tables

/** Relational layer (SURVEY.md §2.5 G5-G9, G15).
  *
  * The reference implements no relational operators (SURVEY.md §2 preamble;
  * exhaustive read of `/root/reference/src/`), but the north star requires
  * full query capability. Everything here is declarative DataFrame API so
  * Catalyst owns pushdown/pruning/join-selection, and AQE re-plans at
  * runtime — the properties that carry to a 1000-executor, 100 TB run.
  *
  * Join strategy at scale:
  *  - dimension tables (nation 25 rows, region 5 rows — fixed size at every
  *    SF) are broadcast explicitly: zero shuffle of the fact side;
  *  - customer⋈orders and lineitem⋈orders are key-partitioned shuffles
  *    (sort-merge / shuffled-hash chosen by AQE from runtime sizes); both
  *    sides shuffle once on the join key and aggregation reuses that
  *    partitioning where possible;
  *  - top-k never sorts globally: TakeOrderedAndProject keeps k rows per
  *    partition then merges k·p rows on the driver.
  */
object RelationalOps {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  // G5: hash aggregate, TPC-H Q1 shape on lineitem. Partial (map-side)
  // aggregation reduces each scan partition to ~6 groups before the shuffle.
  private def aggHash(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        (sum(col("l_quantity").cast(DecimalType(28, 6))).cast("double") /
          count(lit(1))).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  // G6: broadcast equi-join — dim enrich through nation/region (both tiny
  // and SF-invariant → explicit broadcast), then shuffle-join to orders.
  private def joinBroadcast(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        countDistinct("c_custkey").as("n_cust"),
        Det.dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")

  // G7: fact⋈fact shuffle join (sort-merge / shuffled-hash via AQE):
  // lineitem ⋈ orders on the order key.
  private def joinSortMerge(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("l_extendedprice")).as("total_price"),
        countDistinct("o_orderkey").as("n_orders"))
      .orderBy("o_orderpriority")

  // G8: top-k — planned as TakeOrderedAndProject (no global sort).
  private def topK(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)

  // G9: set ops on key sets (customers with vs without orders).
  private def setOps(s: SparkSession, d: String): DataFrame = {
    val ck = t(s, d, "customer").select(col("c_custkey").as("k"))
    val ok = t(s, d, "orders").select(col("o_custkey").as("k"))
    ck.intersect(ok).withColumn("tag", lit("both"))
      .unionByName(ck.except(ok).withColumn("tag", lit("no_orders")))
      .select("tag", "k")
      .orderBy("tag", "k")
  }

  // G15: distinct users — exact for the oracle; the at-scale variant is
  // q_distinct_users_approx below (HLL++, one pass, constant memory).
  private def distinctUsers(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("event_type")

  // G15 at scale: approx_count_distinct (HLL++) — deterministic for a given
  // dataset but not DuckDB-comparable → rows-only check + ScalaTest.
  private def distinctUsersApprox(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id", 0.01).as("n_users_approx"))
      .orderBy("event_type")

  val defs: Seq[QDef] = Seq(
    QDef("q_agg_hash", aggHash, Some(
      s"""SELECT l_returnflag, l_linestatus,
         | ${Det.dsumSql("l_quantity")} AS sum_qty,
         | ${Det.dsumSql("l_extendedprice")} AS sum_base_price,
         | ${Det.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         | CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_qty,
         | count(*) AS n
         | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    QDef("q_join_broadcast", joinBroadcast, Some(
      s"""SELECT r_name, n_name, count(DISTINCT c_custkey) AS n_cust,
         | ${Det.dsumSql("o_totalprice")} AS revenue, count(*) AS n_orders
         | FROM orders
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    QDef("q_join_sortmerge", joinSortMerge, Some(
      s"""SELECT o_orderpriority, count(*) AS n_items,
         | ${Det.dsumSql("l_extendedprice")} AS total_price,
         | count(DISTINCT o_orderkey) AS n_orders
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | GROUP BY 1 ORDER BY 1""".stripMargin)),
    QDef("q_topk", topK, Some(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),
    QDef("q_set_ops", setOps, Some(
      """SELECT * FROM (
        | SELECT 'both' AS tag, k FROM
        |  (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
        | UNION ALL
        | SELECT 'no_orders' AS tag, k FROM
        |  (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
        |) ORDER BY tag, k""".stripMargin)),
    QDef("q_distinct_users", distinctUsers, Some(
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),
    QDef("q_distinct_users_approx", distinctUsersApprox, None)
  )
}
