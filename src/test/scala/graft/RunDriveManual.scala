package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** One-off operational drive of the FULL `graft.Run` surface at bench
  * scale — not part of `sbt test` (a `main`, the SketchPerfManual
  * pattern). Splits the sf corpus 90/10 into build/increment (disjoint
  * ids), then runs the whole lifecycle a production operator would:
  *
  *   build (fates/report/manifest/windows/index/stats/ann+pq)
  *   → ingest (manifest append, window-store advance, index append,
  *     profile bytes-merge, ann/pq drift gates)
  *   → recluster (tier-guard recovery: the label table re-derived from
  *     the posting index under the grown corpus's cap)
  *   → stats (exact refresh over the grown corpus)
  *   → compact (append-artifact small-file maintenance)
  *   → repair (must be a NO-OP on the healthy directory)
  *   → audit (read-only consistency fsck; a failed check here fails
  *     the drive — the post-maintenance directory must audit clean)
  *
  * and prints each summary plus wall times. Run:
  * {{{
  * SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.RunDriveManual /root/testdata/sf0.1"
  * }}}
  */
object RunDriveManual {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-run-drive").toFile
      .getAbsolutePath
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    docs.filter(col("doc_id") % 10 =!= 0).write.parquet(s"$dir/corpus")
    docs.filter(col("doc_id") % 10 === 0).write.parquet(s"$dir/inc")
    docs.write.parquet(s"$dir/whole") // the grown corpus, for stats
    emb.filter(col("vec_id") % 10 =!= 0).select("vec_id", "embedding")
      .write.parquet(s"$dir/vecs")
    emb.filter(col("vec_id") % 10 === 0).select("vec_id", "embedding")
      .write.parquet(s"$dir/vecsInc")
    // the standing decontamination benchmark: the val/test split docs
    docs.filter(col("doc_id") % 97 === 3).select("doc_id", "text")
      .write.parquet(s"$dir/bench")

    def drive(tag: String, json: String): Unit = {
      val t0 = System.nanoTime()
      val out = Run.execute(spark, Run.parseSpec(json))
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.1f s  $out")
    }
    val common =
      s""""benchmark": "$dir/bench", "out": "$dir/build",
         | "id": "doc_id", "text": "text", "cap": 512,
         | "formatter": "span", "chunksPerPart": 64,
         | "vectors": "%s", "nlist": 16, "pq": true,
         | "pqM": 8, "pqKsub": 16, "profileSource": "source"""".stripMargin
    drive("build",
      s"""{"corpus": "$dir/corpus", ${common.format(s"$dir/vecs")}}""")
    drive("ingest",
      s"""{"mode": "ingest", "increment": "$dir/inc",
         | ${common.format(s"$dir/vecsInc")}}""".stripMargin)
    // the tier guard's recovery arm: re-derive the standing label table
    // from the posting index under the grown corpus's cap (at sf0.1 the
    // cap is clamp-pinned at 100, so the guard stays quiet here — the
    // crossing case is StressRunManual's 60k-band corpus and the
    // planted RunSpec test; this drive proves the arm's wall and that
    // the rebuilt table keeps the directory audit-clean)
    drive("recluster",
      s"""{"mode": "recluster",
         | ${common.format(s"$dir/vecs")}}""".stripMargin)
    drive("stats",
      s"""{"mode": "stats",
         | "corpus": "$dir/whole",
         | ${common.format(s"$dir/vecs")}}""".stripMargin)
    drive("compact", s"""{"mode": "compact", "out": "$dir/build"}""")
    // repair on a healthy post-maintenance directory is a no-op
    val repair = Run.execute(spark,
      Run.parseSpec(s"""{"mode": "repair", "out": "$dir/build"}"""))
    println(s"[repair] $repair")
    require(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(repair).get("n_actions").asInt == 0,
      s"repair acted on a clean directory: $repair")
    val t0 = System.nanoTime()
    val audit = Run.execute(spark,
      Run.parseSpec(s"""{"mode": "audit", "out": "$dir/build"}"""))
    println(f"[audit] ${(System.nanoTime() - t0) / 1e9}%.1f s  $audit")
    require(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(audit).get("ok").asBoolean,
      s"post-lifecycle audit found inconsistencies: $audit")
    println(s"[drive] artifacts at $dir/build")
    spark.stop()
  }
}
