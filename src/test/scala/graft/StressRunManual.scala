package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off SCALING drive of the full `graft.Run` lifecycle (VERDICT r15
  * #4): the sf0.1 drive (RunDriveManual) is one data point; this main
  * generates a synthetic corpus at 1× and 10× and runs
  * build → ingest → recluster → stats → compact → audit at BOTH scales
  * with the SAME fixed-size increment, to separate the costs that must
  * scale with the
  * corpus (build, stats) from the ones that must scale with the
  * increment (ingest — the whole point of the standing-artifact
  * design). A near-flat ingest wall across the 10× corpus growth is the
  * claim; any corpus-proportional ingest term shows up as the ingest
  * ratio tracking the build ratio.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.StressRunManual"`
  * (env: SPARK_GRAFT_STRESS_RUN_DOCS overrides the 1× corpus size,
  * default 60,000 docs; the increment is fixed at 1,500 docs at every
  * scale; embeddings are 8-dim, one per doc;
  * SPARK_GRAFT_STRESS_RUN_SCALES — default "1,10" — sets the ladder,
  * e.g. "1,10,100" adds the 6M-doc decade; shuffle partitions scale
  * with the rung (~50k docs/task) so every rung runs the 1× memory
  * profile inside the default 8g heap — see the note at the
  * lifecycle head for the two measured failure modes this avoids).
  */
object StressRunManual {

  private def body(seed: org.apache.spark.sql.Column) =
    concat_ws(" ", lit("the"), transform(sequence(lit(0), lit(29)),
      j => concat(lit("a"), seed, lit("x"), j.cast("string"))), lit("and"))

  /** (doc_id, text, source) over [lo, hi); ~7% of docs duplicate the
    * content of doc id-mod anchor (planted exact dups), the rest are
    * unique clean bodies. */
  private def corpus(s: SparkSession, lo: Long, hi: Long): DataFrame =
    s.range(lo, hi).repartition(32)
      .select(col("id").as("doc_id"),
        when(col("id") % 15 === 7, body(col("id") / 15 * 15))
          .otherwise(body(col("id"))).as("text"),
        concat(lit("src"), col("id") % 4).as("source"))

  /** Deterministic 8-dim embeddings, one per doc id. */
  private def vectors(s: SparkSession, lo: Long, hi: Long): DataFrame =
    s.range(lo, hi).repartition(32)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(7)), j =>
          sin(col("id") * 0.37 + j.cast("double") * 1.13)
            .cast("float")).as("embedding"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.getOrElse("SPARK_GRAFT_STRESS_RUN_DOCS", "60000").toLong
    val incN = 1500L
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: => String): Double = {
      val t0 = System.nanoTime()
      val out = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stress-run]   ${sec}%.1f s  ${out.take(240)}")
      sec
    }

    /** Full lifecycle at `n` docs + a fixed `incN`-doc increment;
      * returns (build, ingest, recluster, stats, compact, audit) walls. */
    def lifecycle(tag: String,
        n: Long): (Double, Double, Double, Double, Double, Double) = {
      // Size the shuffle grid to the rung (the 100 TB rule: partitions
      // sized so per-task working sets fit executor memory at the
      // target scale): the 32-partition default that fits the 8g
      // bench-tuned heap at 60k docs overflows it at 6M (measured r18:
      // UNABLE_TO_ACQUIRE_MEMORY in the build's pack sort), and
      // "fixing" it by raising the heap to 48g trades the OOM for G1
      // mixed-collection stalls that inflate the 10x ingest 2.5x (the
      // build.sbt -Xmx comment's exact pathology). ~50k docs per task
      // keeps every rung at the 1x memory profile.
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(cpus.toInt, (n / 50000L).toInt).toString)
      val dir = Files.createTempDirectory(s"graft-stress-run-$tag")
        .toFile.getAbsolutePath
      corpus(spark, 0, n).write.parquet(s"$dir/corpus")
      corpus(spark, n, n + incN).write.parquet(s"$dir/inc")
      // the grown corpus for the exact stats refresh
      spark.read.parquet(s"$dir/corpus")
        .unionByName(spark.read.parquet(s"$dir/inc"))
        .write.parquet(s"$dir/whole")
      vectors(spark, 0, n).write.parquet(s"$dir/vecs")
      vectors(spark, n, n + incN).write.parquet(s"$dir/vecsInc")
      // benchmark: 200 docs sharing no content with the corpus
      spark.range(200)
        .select(col("id").as("doc_id"),
          concat_ws(" ", lit("the"), transform(sequence(lit(0), lit(20)),
            j => concat(lit("z"), col("id"), lit("x"), j.cast("string"))),
            lit("and")).as("text"))
        .write.parquet(s"$dir/bench")
      val common =
        s""""benchmark": "$dir/bench", "out": "$dir/build",
           | "id": "doc_id", "text": "text", "cap": 512,
           | "formatter": "span", "chunksPerPart": 64,
           | "vectors": "%s", "nlist": 16, "pq": true,
           | "pqM": 8, "pqKsub": 16,
           | "profileSource": "source"""".stripMargin
      println(s"[stress-run] == $tag: $n docs + $incN-doc increment ==")
      val b = timed(Run.execute(spark, Run.parseSpec(
        s"""{"corpus": "$dir/corpus", ${common.format(s"$dir/vecs")}}""")))
      val i = timed(Run.execute(spark, Run.parseSpec(
        s"""{"mode": "ingest", "increment": "$dir/inc",
           | ${common.format(s"$dir/vecsInc")}}""".stripMargin)))
      // a 60k-band corpus crosses a df-cap tier on almost every ingest
      // (the cap moves with the corpus between 50k and 500k docs), so
      // the tier guard's recovery is part of this drive: recluster
      // re-derives the standing label table from the posting index —
      // corpus-proportional (one index scan + the pair/CC build), the
      // stats/compact maintenance band, and the guard must be quiet
      // afterwards
      var reclusterJson = ""
      val rc = timed { reclusterJson = Run.execute(spark, Run.parseSpec(
        s"""{"mode": "recluster", ${common.format(s"$dir/vecs")}}"""));
        reclusterJson }
      assert(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(reclusterJson).get("docs").asLong == n + incN,
        s"recluster did not cover the union: $reclusterJson")
      val st = timed(Run.execute(spark, Run.parseSpec(
        s"""{"mode": "stats", "corpus": "$dir/whole",
           | ${common.format(s"$dir/vecs")}}""".stripMargin)))
      val c = timed(Run.execute(spark, Run.parseSpec(
        s"""{"mode": "compact", "out": "$dir/build"}""")))
      // the fsck closes every lifecycle: the post-maintenance directory
      // must audit clean at BOTH scales (its wall is recorded — one
      // aggregate scan per artifact, ∝ corpus like compact)
      var auditJson = ""
      val a = timed { auditJson = Run.execute(spark, Run.parseSpec(
        s"""{"mode": "audit", "out": "$dir/build"}""")); auditJson }
      assert(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(auditJson).get("ok").asBoolean,
        s"post-lifecycle audit found inconsistencies: $auditJson")
      (b, i, rc, st, c, a)
    }

    // the SCALE LADDER (VERDICT r17 #5): default 1x,10x; set
    // SPARK_GRAFT_STRESS_RUN_SCALES=1,10,100 for the decade-deeper
    // 6M-doc rung (100x of the 60k base). Every consecutive rung pair
    // must satisfy the same separation claims — the flat-ingest and
    // sublinear-recluster story has to hold for ANOTHER decade, not
    // just the first one.
    val scales = sys.env.getOrElse("SPARK_GRAFT_STRESS_RUN_SCALES", "1,10")
      .split(",").map(_.trim.toLong).toSeq
    require(scales.size >= 2 && scales == scales.sorted,
      s"SPARK_GRAFT_STRESS_RUN_SCALES must be >=2 ascending ints: $scales")
    val walls = scales.map(m =>
      m -> lifecycle(s"${m}x", base * m))
    walls.zip(walls.tail).foreach { case ((mA, wA), (mB, wB)) =>
      val step = mB / mA
      val (b1, i1, r1, s1, c1, a1) = wA
      val (b10, i10, r10, s10, c10, a10) = wB
      val rb = b10 / b1
      val ri = i10 / i1
      println(f"[stress-run] == rung ${mA}x -> ${mB}x (${step}x docs) ==")
      println(f"[stress-run] build  $b1%.1f -> $b10%.1f s (${rb}%.1fx)")
      println(f"[stress-run] ingest $i1%.1f -> $i10%.1f s (${ri}%.1fx)  " +
        f"[fixed $incN-doc increment]")
      println(f"[stress-run] recluster $r1%.1f -> $r10%.1f s (${r10 / r1}%.1fx)")
      println(f"[stress-run] stats  $s1%.1f -> $s10%.1f s (${s10 / s1}%.1fx)")
      println(f"[stress-run] compact $c1%.1f -> $c10%.1f s (${c10 / c1}%.1fx)")
      println(f"[stress-run] audit  $a1%.1f -> $a10%.1f s (${a10 / a1}%.1fx)")
      // the claim, per rung: a fixed-size ingest stays NEAR-FLAT across
      // the corpus growth (the standing-artifact design prices ingests
      // by the increment; residual growth is index-scan volume + box
      // noise); when the build has left its constants-dominated regime
      // (rb >= 2), the ingest's growth must also sit far below it
      assert(ri < 2.0,
        f"ingest wall tracks the corpus ($ri%.1fx across a ${step}x " +
          "corpus) — a corpus-proportional ingest term")
      assert(rb < 2.0 || ri < rb / 2.0,
        f"ingest growth ($ri%.1fx) does not separate from the build's " +
          f"(${rb}%.1fx)")
    }
    println("[stress-run] PASS: ingest scales with the increment, " +
      s"build with the corpus, across ${scales.mkString("/")}x")
    spark.stop()
  }
}
