package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Det, QDef}
import graft.sources.Tables

/** Graph analytics — link-based importance over an edge relation.
  *
  * Nothing graph-shaped exists in the reference (its surface is Kafka
  * message routing); PageRank is here because link-graph importance is a
  * standard corpus-quality signal in large-scale training-data curation
  * (rank a crawl's pages by the link graph, filter the tail), and because
  * the repo already has the other half of the graph toolbox
  * ([[DedupOps.connectedComponents]]).
  *
  * Scale design: classic synchronous power iteration. Each round is ONE
  * equi-join (current ranks against the influence relation on its source
  * key) plus ONE hash aggregation (grouped by destination) — shuffle
  * volume O(E) per round, no driver-side data, no candidate
  * materialization beyond the edge relation itself. The influence
  * relation is built once, hash-partitioned on the per-round join key,
  * and checkpointed, so the big side of the iteration join stays put
  * across rounds; only the V-row rank frame and the product rows move.
  *
  * Round overhead (r9 rework — this was the cost floor): lineage is
  * truncated by an eager localCheckpoint every [[CkptEvery]] rounds, not
  * every round — a synchronous V-row materialization per round was ~10
  * stage barriers of pure overhead for a 10-round run, while ≤3 rounds of
  * join+agg lineage between checkpoints is well inside Catalyst's
  * comfort. Superseded checkpoints are released by RDD id
  * (`SparkContext.getPersistentRDDs`): `Dataset.unpersist()` on a
  * localCheckpoint'd frame is a CacheManager no-op that leaks the
  * underlying blocks (ADVICE r8) — the ids observed to appear across the
  * checkpoint call are the blocks to free, and that set is released
  * blocking once the next checkpoint supersedes it.
  */
object GraphOps {

  /** Rounds of lazy join+agg lineage between eager checkpoint barriers. */
  private val CkptEvery = 3

  /** Eagerly localCheckpoint `df`, returning the checkpointed frame plus
    * the persistent-RDD ids the call pinned — the handle a caller needs
    * to actually free the blocks later (`Dataset.unpersist()` cannot:
    * the blocks belong to an internal RDD the CacheManager never saw). */
  private def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = df.localCheckpoint(eager = true)
    (out, sc.getPersistentRDDs.keySet.toSet -- before)
  }

  private def release(spark: SparkSession, ids: Set[Int]): Unit = {
    val persisted = spark.sparkContext.getPersistentRDDs
    ids.foreach(id => persisted.get(id).foreach(_.unpersist(blocking = true)))
  }

  /** PageRank by fixed-round power iteration.
    *
    * Walk semantics: from a node, follow one of its outgoing edges
    * uniformly (a duplicated (src,dst) row counts twice — parallel edges
    * weight their endpoint proportionally); with probability
    * `1 - damping`, teleport anywhere. Nodes are the union of both edge
    * endpoints. A node with no outgoing edges (a sink) passes no mass on
    * — its rank leaks each round, so total mass stays below 1 on graphs
    * with sinks (the plain formulation; symmetrize the edge list for a
    * mass-conserving rank, as q_graph_pagerank does).
    *
    * Determinism: per-destination contributions are summed through an
    * exact decimal accumulator (see [[graft.Det]]) — order-independent,
    * so results are bit-stable under any parallelism; a fixed round
    * count (no convergence test) keeps the whole computation expressible
    * as a DuckDB recursive CTE for the oracle. A node with no in-links
    * receives only the teleport term, so its rank is the CONSTANT
    * `(1-d)/n` in every round ≥ 1 — those nodes live in a one-time
    * checkpointed constant frame unioned onto each round's aggregate
    * (replacing r7's V zero-weight self-rows, which re-flowed every node
    * through the join AND the decimal aggregation every round purely to
    * keep it present as a destination).
    *
    * The one driver-side scalar is the node count (the `1/n` teleport
    * share); everything else is executor-side.
    *
    * Returns (`node`, `rank`) — unrounded doubles; cross-engine
    * comparisons should round (the bundled query uses [[Det.r9]]:
    * ranks are ~1/V, far below [[Det.r4]]'s grid).
    *
    * LIBRARY ENTRY POINT — generic over any two-column edge relation
    * (GraphSpec exercises directed, multi-edge, and sink-bearing
    * synthetic graphs against a sequential reference).
    */
  def pageRank(edgeList: DataFrame, src: String, dst: String,
      damping: Double = 0.85, iters: Int = 10): DataFrame = {
    require(damping > 0 && damping < 1,
      s"damping must be in (0, 1), got $damping")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    Seq(src, dst).foreach { c =>
      require(edgeList.columns.contains(c),
        s"edge list has no column '$c' (columns: " +
          s"${edgeList.columns.mkString(", ")})")
    }
    val spark = edgeList.sparkSession
    val edges = edgeList.select(col(src).as("__s"), col(dst).as("__d"))
    // The V-row node set is consumed three times (count, rank init,
    // in-link-free frame) — checkpoint the E-row distinct once instead of
    // recomputing it per consumer (~1.5s × 2 of pure setup waste at
    // sf0.1), and release its blocks as soon as the three consumers have
    // materialized.
    val (nodes, nodesIds) = checkpointTracked(
      edges.select(col("__s").as("__v"))
        .unionByName(edges.select(col("__d").as("__v")))
        .distinct())
    val outdeg = edges.groupBy("__s").agg(count(lit(1)).as("__od"))
    // influence = edge weights 1/outdeg. Built and shuffled ONCE:
    // hash-partitioned on the round join key and checkpointed, consumed
    // every round.
    val (infl, inflIds) = checkpointTracked(
      edges.join(outdeg, "__s")
        .select(col("__s"), col("__d"), (lit(1.0) / col("__od")).as("__w"))
        .repartition(col("__s")))
    val n = nodes.count().toDouble
    // In-link-free nodes: constant rank (1-d)/n from round 1 on (Scaladoc)
    // — empty on symmetrized graphs, ≤V rows on any graph. Checkpointed
    // once, unioned lazily onto every round's aggregate.
    val (noInbound, noInboundIds) = checkpointTracked(
      nodes.join(edges.select(col("__d").as("__v")).distinct(),
          Seq("__v"), "left_anti")
        .select(col("__v"), (lit(1 - damping) / lit(n)).as("__r")))
    var (ranks, ranksIds) = checkpointTracked(
      nodes.select(col("__v"), (lit(1.0) / lit(n)).as("__r")))
    release(spark, nodesIds) // all three consumers are materialized
    var round = 0
    while (round < iters) {
      val next = iterationRound(infl, ranks, damping, n)
        .unionByName(noInbound)
      round += 1
      // Lineage barrier every CkptEvery rounds. The FINAL round stays
      // lazy (≤ CkptEvery-1 joins deep) — the caller's one consumption
      // plans it directly; a terminal checkpoint would be a wasted
      // materialization plus blocks nobody could ever free.
      if (round % CkptEvery == 0 && round < iters) {
        val (ck, ckIds) = checkpointTracked(next)
        release(spark, ranksIds) // superseded barrier's blocks, by RDD id
        ranks = ck
        ranksIds = ckIds
      } else ranks = next
    }
    val out = ranks.select(col("__v").as("node"), col("__r").as("rank"))
    // infl/noInbound/last-barrier blocks stay pinned until the caller has
    // consumed `out` (they back its lineage); Bench's release barrier (or
    // any getPersistentRDDs sweep) frees them after the action.
    out
  }

  /** One power-iteration round:
    * r'(v) = (1-d)/n + d * Σ_{(u,v) ∈ E} r(u)/outdeg(u). The decimal
    * cast happens per product (magnitude ≤ max rank, no overflow at
    * precision 38) and the exact sum collapses to double once.
    *
    * Extracted so PlanSpec can pin the round's physical plan (the
    * checkpoints in the loop truncate lineage, so the plan is invisible
    * from the operator's result): V-row rank frame broadcast against the
    * stationary influence relation (no per-round edge shuffle at rank
    * frames below the broadcast threshold; beyond it, the join falls
    * back to SMJ on the key `infl` is already partitioned by), partial
    * decimal aggregation map-side, one exchange on the destination key.
    */
  private[graft] def iterationRound(infl: DataFrame, ranks: DataFrame,
      damping: Double, n: Double): DataFrame =
    infl.join(ranks, col("__s") === col("__v"))
      .groupBy(col("__d"))
      .agg(sum((col("__r") * col("__w")).cast(DecimalType(38, 18)))
        .as("__acc"))
      .select(col("__d").as("__v"),
        (lit(1 - damping) / lit(n) +
          lit(damping) * col("__acc").cast("double")).as("__r"))

  /** The order↔part co-purchase graph: an undirected bipartite graph with
    * real degree spread (orders span 1..7 parts; part in-degree follows
    * demand), symmetrized so the walk is proper and rank mass is
    * conserved — the natural "important parts / central orders" ranking.
    * The 'o:'/'p:' prefixes make the two id spaces disjoint, so the
    * reversed pairs never collide with the forward ones and no dedup of
    * the union is needed (the oracle's DISTINCT over the same union is a
    * no-op for the same reason). */
  private def qPageRank(s: SparkSession, d: String): DataFrame = {
    val op = Tables(s, d, "lineitem")
      .select(concat(lit("o:"), col("l_orderkey").cast("string")).as("s"),
        concat(lit("p:"), col("l_partkey").cast("string")).as("d"))
      .distinct()
    val sym = op.unionByName(op.select(col("d").as("s"), col("s").as("d")))
    pageRank(sym, "s", "d", damping = 0.85, iters = 10)
      .select(col("node"), Det.r9(col("rank")).as("rank"))
      .orderBy("node")
  }

  // The oracle mirrors the power iteration as a DuckDB recursive CTE
  // keyed on an iteration counter. DuckDB quirk (verified on 1.x): ANY
  // top-level UNION inside a WITH RECURSIVE block is treated as
  // recursive-shaped and loses its dedup — hence the DISTINCT-over-
  // UNION-ALL-subquery shape for the non-recursive CTEs.
  val defs: Seq[QDef] = Seq(
    QDef("q_graph_pagerank", qPageRank, Some(
      s"""WITH RECURSIVE
         | op AS (SELECT DISTINCT 'o:' || CAST(l_orderkey AS VARCHAR) AS s,
         |               'p:' || CAST(l_partkey AS VARCHAR) AS d FROM lineitem),
         | edges AS (SELECT DISTINCT s, d FROM
         |           (SELECT s, d FROM op UNION ALL SELECT d, s FROM op)),
         | nodes AS (SELECT DISTINCT v FROM
         |           (SELECT s AS v FROM edges UNION ALL SELECT d FROM edges)),
         | nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         | outdeg AS (SELECT s, count(*) AS od FROM edges GROUP BY 1),
         | infl AS (SELECT s, d, w FROM
         |          (SELECT e.s, e.d, CAST(1 AS DOUBLE)/o.od AS w
         |           FROM edges e JOIN outdeg o USING (s)
         |           UNION ALL SELECT v, v, CAST(0 AS DOUBLE) FROM nodes)),
         | pr AS (
         |   SELECT 0 AS it, v, CAST(1 AS DOUBLE)/(SELECT n FROM nn) AS r FROM nodes
         |   UNION ALL
         |   SELECT min(p.it) + 1 AS it, i.d AS v,
         |     (1 - CAST(0.85 AS DOUBLE))/(SELECT n FROM nn)
         |       + CAST(0.85 AS DOUBLE) *
         |         CAST(SUM(CAST(p.r * i.w AS DECIMAL(38,18))) AS DOUBLE) AS r
         |   FROM pr p JOIN infl i ON i.s = p.v
         |   WHERE p.it < 10
         |   GROUP BY i.d
         | )
         |SELECT v AS node, ${Det.r9Sql("r")} AS rank
         |FROM pr WHERE it = 10 ORDER BY node""".stripMargin)))
}
