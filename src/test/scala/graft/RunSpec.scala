package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.operators.PipelineOps

/** The config-driven build runner (graft.Run): spec parsing, artifact
  * layout, store round-trip vs the direct library composition, and the
  * no-clobber contract. */
class RunSpec extends SparkSpec {

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => f"$prefix$i%02d")
  private def clean(prefix: String): String =
    ("the" +: words(prefix, 31) :+ "and").mkString(" ")

  test("Run.execute builds fates/report/manifest/windows matching the direct composition") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-run").toFile.getAbsolutePath
    val nearDupOfB =
      ("the" +: (words("beta", 28) ++ words("zeta", 3)) :+ "and").mkString(" ")
    val corpus = Seq(
      (1L, "too short"),          // quality
      (2L, clean("alpha")),       // kept
      (3L, clean("alpha")),       // exact_dup
      (4L, clean("beta")),        // kept
      (5L, nearDupOfB),           // near_dup
      (6L, clean("gamma")))       // contaminated
      .toDF("id", "body")
    val bench = Seq(
      (100L, (words("bench", 5) ++ words("gamma", 8) ++ words("bench2", 5))
        .mkString(" ")))
      .toDF("id", "body")
    corpus.write.parquet(s"$dir/corpus")
    bench.write.parquet(s"$dir/bench")

    val spec = Run.parseSpec(
      s"""{"corpus": "$dir/corpus", "benchmark": "$dir/bench",
         | "out": "$dir/build", "id": "id", "text": "body",
         | "cap": 16, "formatter": "plain", "chunksPerPart": 2}"""
        .stripMargin)
    assert(spec.cap == 16L && spec.formatter == "plain" &&
      spec.minJaccard == 0.1 && spec.contamN == 8 && !spec.overwrite)

    val summary = Run.execute(s, spec)

    // the summary attests the on-disk artifacts
    val j = new ObjectMapper().readTree(summary)
    assert(j.get("n_windows").asLong > 0)
    val fateCounts = (0 until j.get("fates").size).map { i =>
      val f = j.get("fates").get(i)
      f.get("fate").asText -> f.get("n_docs").asLong
    }.toMap
    assert(fateCounts == Map("quality" -> 1L, "kept" -> 2L,
      "exact_dup" -> 1L, "near_dup" -> 1L, "contaminated" -> 1L),
      s"fates: $fateCounts")
    // the written SUMMARY.json is the returned string
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/build/SUMMARY.json")),
      StandardCharsets.UTF_8) == summary)

    // manifest: one row per corpus doc; kept docs packed, dropped NULL
    val manifest = s.read.parquet(s"$dir/build/manifest")
    assert(manifest.count() == 6)
    assert(manifest.filter(col("fate") === "kept" &&
      col("chunk").isNotNull).count() == 2)
    assert(manifest.filter(col("fate") =!= "kept" &&
      col("chunk").isNull).count() == 4)

    // window store round-trip == the direct sorted library composition
    val direct = PipelineOps.trainReadyExamples(corpus, bench, "id", "body",
        cap = 16L, formatter = "plain")
      .collect().map(_.toString).toSeq
    val storedRows = PipelineOps.readWindows(s, s"$dir/build/windows",
        chunksPerPart = 2L)
      .select("chunk", "n_segs", "n_tokens", "doc_ids", "doc_starts",
        "chunk_text", "is_partial")
      .orderBy("chunk")
      .collect().map(_.toString).toSeq
    assert(storedRows == direct, s"store: $storedRows\nvs direct: $direct")

    // no-clobber: a second run without overwrite refuses
    val e = intercept[Exception](Run.execute(s, spec))
    assert(e.getMessage != null)
  }
}
