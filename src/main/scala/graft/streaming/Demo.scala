package graft.streaming

import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo of the Task facade — the reference's
  * motivating example (`/root/reference/examples/introduction.ts:12-27`,
  * duplicated in `examples/inject.ts`): parse a JSON-ish event, bucket it
  * into a time window, keep a running count per window, `send` the updated
  * count downstream and `commit` the offset. Run with
  * `sbt "runMain graft.streaming.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val task = new Task("demo-group")
    val events = task.source("user-events", "earliest")
    task.processor(events) { assignment =>
      // per-assignment store, exactly introduction.ts:12 countsPerTimeWindow
      val counts = scala.collection.mutable.Map.empty[Long, Int]
      Seq(
        (m, _) => {
          val km = m.asInstanceOf[KMessage]
          val window = km.timestamp / 10 // 10-tick tumbling window
          counts(window) = counts.getOrElse(window, 0) + 1
          (window, counts(window))
        },
        (v, ctx) => {
          val (window, n) = v.asInstanceOf[(Long, Int)]
          ctx.send(NewMessage("window-counts", s"""{"window":$window,"count":$n}"""))
          ctx.commit()
          s"window=$window count=$n"
        })
    }

    val itf = task.inject(spark, "user-events", 0)
    (1 to 25).foreach(i => itf.inject(s"""{"event":"click","n":$i}"""))
    itf.await()

    println(s"processed ${itf.processedOffsets.size} messages, " +
      s"caughtUp=${itf.caughtUp()}, committed=${itf.committed()}, " +
      s"watermarks=${itf.watermarks()}")
    println("last results: " + itf.processingResults.takeRight(3).mkString(" | "))
    println("produced to window-counts: " + itf.producedMessages.size)

    // rewind and replay the last window (O6 seek — backward replay)
    itf.seek(20L)
    itf.await()
    println(s"after seek(20): processed ${itf.processedOffsets.size} " +
      s"(replayed ${itf.processedOffsets.size - 25})")
    task.stop()
    spark.stop()
  }
}
