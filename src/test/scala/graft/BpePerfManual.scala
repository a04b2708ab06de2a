package graft

/** Manual probe for the distributed BPE merge loop's per-round constant
  * (VERDICT r12 #3/#5 — run via
  * `sbt "Test/runMain graft.BpePerfManual <vocabRows> <nMerges> <cadence>"`).
  * Builds a deterministic synthetic vocab, forces the distributed
  * regime (driverVocabRows = 0), and prints total + per-round wall
  * time. The r13 BASELINE.md cadence table comes from this main; the
  * pass/fail regime lives in graft.ScaleSpec. */
object BpePerfManual {
  def main(args: Array[String]): Unit = {
    val vocabRows = if (args.length > 0) args(0).toInt else 30000
    val nMerges = if (args.length > 1) args(1).toInt else 300
    val cadence = if (args.length > 2) args(2).toInt else 8
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def word(i: Int): String = {
      var x = i.toLong * 2654435761L + 11L
      val len = 8 + (i % 9)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        sb += ('a' + ((x >>> 33) % 16).toInt).toChar
      }
      sb.result()
    }
    val corpus = (0 until vocabRows).map { i =>
      (i.toLong, List.fill(1 + i % 7)(word(i)).mkString(" "))
    }.toDF("id", "text").repartition(8).localCheckpoint(true)
    corpus.count()
    val t0 = System.nanoTime()
    val n = graft.operators.TokenizerOps
      .bpeMerges(corpus, "text", nMerges, driverVocabRows = 0,
        checkpointEvery = cadence)
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-perf] vocab=$vocabRows merges=$n cadence=$cadence " +
      f"total=$secs%.1fs perRound=${secs / nMerges * 1000}%.0f ms")
    spark.stop()
  }
}
