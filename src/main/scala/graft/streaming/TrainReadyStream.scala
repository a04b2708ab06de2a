package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{DedupOps, PipelineOps}

/** Streaming ingest twin of the COMPOSED build
  * ([[graft.operators.PipelineOps.trainReadyIncremental]]) — the
  * packWindows pattern applied to the end-to-end pipeline (VERDICT r12
  * brief #4): per micro-batch, new documents are fated against the
  * STANDING corpus's persisted artifacts (content-hash table, shingle
  * posting index, manifest), the formatter/pack/rank stages run over
  * the increment with the pack cursor and epoch-rank block continued,
  * and the standing artifacts advance by exactly the increment.
  *
  * WHY foreachBatch, not a single streaming plan: the composed build's
  * near-dup stage runs connected components — a driver-side iteration
  * over a checkpointed edge list — which cannot live inside one
  * incremental streaming plan. Per-micro-batch batch semantics
  * (`foreachBatch`, Structured Streaming's escape hatch for exactly
  * this) gives batch ≡ stream parity BY CONSTRUCTION: feeding batches
  * B1, B2, … as micro-batches yields the same manifest as chaining
  * `trainReadyIncremental` over the same batch split (pinned in
  * graft.StreamingWindowSpec against the planted-fates fixture).
  *
  * State discipline: the cursor holds exactly the standing artifacts
  * `graft.Run` persists — manifest, hash table, posting index, near-dup
  * cluster-label table (as eagerly-checkpointed frames; the label table
  * advances per ingest by the same contracted upsert that fates the
  * batch — VERDICT r16 #2), the prior doc count (one long), and
  * the corpus PROFILE (r15: the three mergeable sketch artifacts —
  * token frequent-items bytes held driver-side at kilobyte size,
  * length-KLL and content-HLL as 1-row checkpointed frames). Every
  * ingest builds the successors, then releases the superseded blocks —
  * pinned storage is ∝ the artifacts' size, NEVER ∝ the number of
  * ingests (asserted in the spec). A production deployment writes the
  * same artifacts to tables (the README walkthrough) instead of
  * holding them as checkpoint blocks; the per-batch algebra —
  * `hashes ∪ md5(batch)`, [[DedupOps.ngramPostingsAppend]],
  * `manifest ∪ increment rows`, the profile bytes-merges — is
  * identical.
  */
final class TrainReadyCursor private (
    bench: DataFrame, id: String, text: String, cap: Double,
    epoch: String, formatter: String, startRateBp: Int, meanSpan: Int,
    fimRateBp: Int, minJaccard: Double, contamN: Int,
    profileSrc: Option[String],
    initManifest: DataFrame, initHashes: DataFrame,
    initPostings: DataFrame, initClusterLabels: DataFrame,
    initDocCount: Long,
    initTokenSketch: Array[Byte], initLenQuantiles: DataFrame,
    initDistinctContent: DataFrame,
    initSourceDistinct: Option[DataFrame],
    initSourceLen: Option[DataFrame]) {

  // A standing artifact is a checkpointed frame PLUS the ids of the
  // RDDs its localCheckpoint pinned: Dataset.unpersist does NOT release
  // a localCheckpoint's pinned RDD (it only uncaches plans through the
  // cache manager — verified on Spark 4.1), so releasing superseded
  // artifacts through it merely drops the reference and waits for the
  // ContextCleaner to GC the blocks — storage then floats with GC
  // timing instead of being ∝ the artifacts. Ids are read off the
  // checkpointed frame's own plan (ADVICE r16: the earlier
  // getPersistentRDDs diff could capture a FOREIGN checkpoint pinned in
  // the window by another cursor or job, whose release fails that job
  // irrecoverably); the one remaining window diff — the interior stage
  // pins of the pair derivation and trainReadyIncremental, invisible to
  // leaf inspection — runs under the JVM-global
  // [[graft.operators.Pins.sweepWindow]] write lock, which every
  // tracked checkpoint excludes via its read side. Ad-hoc UNTRACKED
  // persists on the same SparkContext during an ingest remain unsafe.
  private type Ckpt = (DataFrame, Set[Int])
  private def ckpt(d: DataFrame): Ckpt =
    graft.operators.Pins.checkpointTracked(d)
  private def release(c: Ckpt): Unit =
    graft.operators.Pins.release(bench.sparkSession, c._2)

  private var manifestC: Ckpt = ckpt(initManifest)
  private var hashesC: Ckpt = ckpt(initHashes)
  private var postingsC: Ckpt = ckpt(initPostings)
  private var labelsC: Ckpt = ckpt(initClusterLabels)
  private var nPrior: Long = initDocCount
  private var tokenSk: Array[Byte] = initTokenSketch
  private var lenQC: Ckpt = ckpt(initLenQuantiles)
  private var distCC: Ckpt = ckpt(initDistinctContent)
  private var srcDC: Option[Ckpt] = initSourceDistinct.map(ckpt)
  private var srcLC: Option[Ckpt] = initSourceLen.map(ckpt)

  /** The standing manifest (one row per doc ever ingested: fate +
    * formatted n_tok + chunk + rank) as of the last completed ingest. */
  def manifest: DataFrame = synchronized { manifestC._1 }

  /** Docs in the standing corpus (the near-dup df cap's denominator). */
  def docCount: Long = synchronized { nPrior }

  /** The STANDING near-dup cluster-label table `(doc_id, cluster_rep)` —
    * `graft.Run`'s `index/cluster_labels` artifact, in-cursor (VERDICT
    * r16 #2): advanced per ingest by the supernode-contraction upsert
    * whose run also fates the batch, so after any number of ingests it
    * equals a from-scratch [[graft.operators.DedupOps.connectedComponents]]
    * over the union's pairs bit-for-bit (pinned in
    * graft.StreamingWindowSpec). */
  def clusterLabels: DataFrame = synchronized { labelsC._1 }

  /** The standing token profile — serialized frequent-items bytes over
    * every token ever delivered (decode with
    * [[graft.functions.FreqItems.decode]], compare builds with
    * [[graft.operators.TextOps.tokenDivergenceSketch]]). */
  def tokenSketch: Array[Byte] = synchronized { tokenSk }

  /** The standing length profile — [[graft.operators.RelationalOps
    * .quantileSketch]] table (grp = "all") over per-doc token counts. */
  def lenQuantiles: DataFrame = synchronized { lenQC._1 }

  /** The standing distinct-content profile —
    * [[graft.operators.RelationalOps.distinctSketch]] table
    * (grp = "all") over content hashes. */
  def distinctContent: DataFrame = synchronized { distCC._1 }

  /** The standing PER-SOURCE distinct-content profile (grp = the
    * configured `profileSource` column's values) — `graft.Run`'s
    * `stats/source_distinct` dimension, in-cursor (VERDICT r15 #5).
    * None when the cursor was opened without a profileSource. */
  def sourceDistinct: Option[DataFrame] = synchronized { srcDC.map(_._1) }

  /** The standing PER-SOURCE length profile — `stats/source_len`'s
    * twin: a per-source [[graft.operators.RelationalOps.quantileSketch]]
    * table over per-doc token counts. */
  def sourceLen: Option[DataFrame] = synchronized { srcLC.map(_._1) }

  /** Ingest one batch: fate against the standing artifacts, continue
    * the pack cursor and rank block, advance the artifacts. Returns the
    * NEW standing manifest (prior rows frozen — manifest in ≡ manifest
    * out, so ingests chain). Empty batches are a no-op. */
  def ingest(batch: DataFrame): DataFrame = synchronized {
    // the checkpointed batch carries the source column only when the
    // per-source profile is configured; the pipeline stages below see
    // exactly (id, text) either way
    val bC = ckpt(batch
      .select((col(id) +: col(text) +: profileSrc.map(col).toSeq): _*))
    val b = bC._1
    val n = b.count()
    if (n == 0L) { release(bC); return manifestC._1 }
    val sc = b.sparkSession.sparkContext
    // successors first (eager), then release the superseded blocks —
    // the order that keeps every ingest's cost ∝ increment without a
    // window where the standing state is unmaterialized. The composed
    // build pins stage intermediates during construction (the fate
    // barrier, the formatted token counts, the CC edge rounds); those
    // are invisible to plan-leaf inspection (the returned plan no
    // longer references them), so they are swept by id delta — under
    // the JVM-global capture lock, which excludes every TRACKED
    // checkpoint (other cursors, managed graph/CC runs) from the
    // window (ADVICE r16: the instance-level synchronized could not).
    //
    // Near-dup fates + the standing-label advance share ONE contracted
    // propagation run (VERDICT r16 #2, mirroring graft.Run's ingest):
    // the batch's pairs against the standing postings advance the label
    // state, and the frozen-prior fate bits are read off the upsert.
    // The pair derivation and the contracted run live INSIDE the sweep
    // window: the pair kernel eagerly checkpoints interior frames
    // (increment postings, hot-union buckets) that are invisible to the
    // returned plan's leaves and released by nothing else — outside the
    // window they would pin one block-set per ingest for the session
    // (caught by the r17 self-review). The upsert run's own tracked
    // blocks land in the same delta; releasing them through the sweep
    // AFTER the successor checkpoints below makes the managed handle's
    // release() redundant here (release-by-id is idempotent).
    val (labelRun, built, innerIds) = graft.operators.Pins.sweepWindow {
      val before = sc.getPersistentRDDs.keySet
      val run = DedupOps.connectedComponentsIncrementalManaged(
        labelsC._1,
        DedupOps.ngramJaccardPairsIncremental(
          b.select(col(id).as("doc_id"), col(text).as("text")),
          "doc_id", "text", postingsC._1, nPrior, minJaccard),
        "da", "db")
      val nd = DedupOps.nearDupFromLabelUpsert(run.labels,
        b.select(col(id).as("doc_id")))
      val bm = PipelineOps.trainReadyIncremental(
        manifestC._1, bench.limit(0), b.select(col(id), col(text)), bench,
        id, text, cap, epoch,
        formatter, startRateBp, meanSpan, fimRateBp, minJaccard, contamN,
        precomputedPostings = Some(postingsC._1),
        precomputedHashes = Some(hashesC._1),
        priorDocCount = Some(nPrior), sorted = false,
        precomputedNearDup = Some(nd))
      (run, bm, sc.getPersistentRDDs.keySet.toSet.filterNot(before))
    }
    val newManifest = ckpt(built)
    val newHashes = ckpt(hashesC._1
      .unionByName(b.select(md5(col(text).cast("binary")).as("h"))))
    val newPostings = ckpt(DedupOps
      .ngramPostingsAppend(postingsC._1, b, id, text))
    // standing-label advance: untouched rows ∪ the upsert — the same
    // apply graft.Run stages to index/cluster_labels (the upsert's
    // blocks are released by the window sweep below, after this
    // checkpoint has materialized)
    val newLabels = ckpt(labelsC._1
      .join(labelRun.labels.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(labelRun.labels.select("doc_id", "cluster_rep")))
    // profile advance — the Run ingest's bytes-merges, in-cursor: token
    // bytes merge on the driver (kilobytes), the two 1-row sketch
    // tables through the library merge entry points
    val newTokenSk = graft.functions.FreqItems.mergeBytes(tokenSk,
      graft.operators.TextOps.tokenSketchBytes(b, text)
        .head().getAs[Array[Byte]]("sk"))
    val newLenQ = ckpt(graft.operators.RelationalOps.quantileSketchMerge(
      lenQC._1, TrainReadyCursor.lenSketch(b, id, text), "grp"))
    val newDistC = ckpt(graft.operators.RelationalOps.distinctSketchMerge(
      distCC._1, TrainReadyCursor.contentSketch(b, text), "grp"))
    // per-source profile advance (when configured): same group-keyed
    // merges as graft.Run's stats/source_* artifacts — new sources
    // appear as new groups, existing ones merge
    val newSrcD = profileSrc.map { src =>
      ckpt(graft.operators.RelationalOps.distinctSketchMerge(
        srcDC.get._1, TrainReadyCursor.sourceContentSketch(b, src, text),
        "grp"))
    }
    val newSrcL = profileSrc.map { src =>
      ckpt(graft.operators.RelationalOps.quantileSketchMerge(
        srcLC.get._1, TrainReadyCursor.sourceLenSketch(b, src, text),
        "grp"))
    }
    val pinned = sc.getPersistentRDDs
    innerIds.foreach(i =>
      pinned.get(i).foreach(_.unpersist(blocking = true)))
    labelRun.release() // subset of innerIds — idempotent belt-and-braces
    release(manifestC); release(hashesC); release(postingsC)
    release(labelsC); release(lenQC); release(distCC)
    srcDC.foreach(release); srcLC.foreach(release)
    release(bC)
    manifestC = newManifest
    hashesC = newHashes
    postingsC = newPostings
    labelsC = newLabels
    tokenSk = newTokenSk
    lenQC = newLenQ
    distCC = newDistC
    srcDC = newSrcD
    srcLC = newSrcL
    nPrior += n
    newManifest._1
  }

  /** Wire a STREAMING `(id, text)` frame into this cursor: one
    * [[ingest]] per micro-batch. The returned query's progress IS the
    * cursor's: after `processAllAvailable()`, [[manifest]] reflects
    * every delivered batch. */
  def attach(stream: DataFrame): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        ingest(batch); ()
      }
      .start()
}

object TrainReadyCursor {

  /** Per-batch length-profile sketch (grp = "all"), shared by ingest
    * and bootstrap. */
  private def lenSketch(d: DataFrame, id: String, text: String): DataFrame =
    graft.operators.RelationalOps.quantileSketch(
      graft.operators.TextOps.tokenCounts(d, id, text)
        .withColumn("grp", lit("all")), "grp", "n_tok")

  /** Per-batch content-hash distinct sketch (grp = "all"). */
  private def contentSketch(d: DataFrame, text: String): DataFrame =
    graft.operators.RelationalOps.distinctSketch(
      d.select(lit("all").as("grp"),
        md5(col(text).cast("binary")).as("h")), "grp", "h")

  /** Per-batch PER-SOURCE content-hash distinct sketch (grp = the
    * source column's values) — `graft.Run`'s stats/source_distinct. */
  private def sourceContentSketch(d: DataFrame, src: String,
      text: String): DataFrame =
    graft.operators.RelationalOps.distinctSketch(
      d.select(col(src).cast("string").as("grp"),
        md5(col(text).cast("binary")).as("h")), "grp", "h")

  /** Per-batch PER-SOURCE length sketch — stats/source_len's shape:
    * tokenCounts keyed by the source column gives the (grp, n_tok)
    * relation directly, no join. */
  private def sourceLenSketch(d: DataFrame, src: String,
      text: String): DataFrame =
    graft.operators.RelationalOps.quantileSketch(
      graft.operators.TextOps.tokenCounts(d, src, text)
        .select(col("doc_id").cast("string").as("grp"), col("n_tok")),
      "grp", "n_tok")

  /** Open a cursor over a standing build: `priorManifest` is a
    * [[graft.operators.PipelineOps.trainReady]] /
    * `trainReadyIncremental` output over `priorCorpus`, built with the
    * SAME cap/epoch/formatter/rate parameters passed here (the
    * same-config rule of the batch incremental). An EMPTY pair
    * bootstraps from nothing — the first micro-batch becomes the
    * initial build. The standing artifacts (hash table + posting index
    * + the three profile sketches over `priorCorpus`) are derived once
    * here and then advanced incrementally per ingest, never
    * re-derived.
    *
    * `profileSource` (VERDICT r15 #5) names a source column present in
    * BOTH `priorCorpus` and every ingested batch: the cursor then also
    * maintains the per-source profile dimension (`graft.Run`'s
    * stats/source_distinct + source_len), advanced per ingest by the
    * same group-keyed bytes-merges as the global profile. */
  def apply(priorManifest: DataFrame, priorCorpus: DataFrame,
      bench: DataFrame, id: String, text: String, cap: Double = 4096.0,
      epoch: String = "ep1", formatter: String = "span",
      startRateBp: Int = 500, meanSpan: Int = 3, fimRateBp: Int = 9000,
      minJaccard: Double = 0.1, contamN: Int = 8,
      profileSource: Option[String] = None): TrainReadyCursor = {
    val prior = priorCorpus.select(
      (col(id).as("doc_id") +: col(text).as("text") +:
        profileSource.map(col).toSeq): _*)
    // bootstrap through the MANAGED run so the prior corpus's
    // propagation blocks free once the constructor's own checkpoint of
    // the label table has materialized (the plain form would pin them
    // for the session — the exact leak CcRun exists to prevent)
    val ccRun = DedupOps.connectedComponentsManaged(
      DedupOps.ngramJaccardPairs(prior, "doc_id", "text", minJaccard),
      "da", "db")
    val cursor = new TrainReadyCursor(bench, id, text, cap, epoch,
      formatter,
      startRateBp, meanSpan, fimRateBp, minJaccard, contamN,
      profileSrc = profileSource,
      initManifest = priorManifest
        .select("doc_id", "fate", "n_tok", "chunk", "rank"),
      initHashes = prior
        .select(md5(col("text").cast("binary")).as("h")),
      initPostings = DedupOps.ngramPostings(prior, "doc_id", "text"),
      initClusterLabels = ccRun.labels,
      initDocCount = priorCorpus.count(),
      initTokenSketch = graft.operators.TextOps
        .tokenSketchBytes(prior, "text").head().getAs[Array[Byte]]("sk"),
      initLenQuantiles = lenSketch(prior, "doc_id", "text"),
      initDistinctContent = contentSketch(prior, "text"),
      initSourceDistinct = profileSource.map(src =>
        sourceContentSketch(prior, src, "text")),
      initSourceLen = profileSource.map(src =>
        sourceLenSketch(prior, src, "text")))
    ccRun.release() // the constructor's eager ckpt re-materialized them
    cursor
  }
}
