package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DotF.dotf

/** r19 optimization drill: where do q_similarity_knn's seconds go, and
  * does the explode-mirror shape (score each unordered pair ONCE, emit
  * both directions from the scored row) beat the shipped two-leg union
  * (each leg re-executes the half-grid scoring subtree)?
  *
  * Results are asserted bit-identical before any timing is believed.
  * Throwaway measurement tool — not part of the driver contract.
  */
object DrillKnn {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val k = 5
    val numBlocks = 8

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[drill] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def release(): Unit = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    noop(emb) // warm

    // ---- shipped (A) ---------------------------------------------------
    def runA(): DataFrame =
      graft.operators.SimilarityOps.knnJoin(emb, "vec_id", "embedding", k)

    // ---- candidate (B): explode-mirror ---------------------------------
    def gridPairs(rows: DataFrame): DataFrame = {
      val grid = array((0 until numBlocks).map(lit): _*)
      val e = rows.select(col("vec_id"), col("embedding"))
        .select(col("vec_id"), col("embedding"),
          sqrt(dotf(col("embedding"), col("embedding"))).as("nrm"),
          pmod(col("vec_id"), lit(numBlocks)).cast("int").as("blk"))
        .filter(col("nrm") > 0)
      val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"),
        col("nrm").as("na"), col("blk").as("ba"), explode(grid).as("bb"))
      val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"),
        col("nrm").as("nb"), explode(grid).as("ba"), col("blk").as("bb"))
      a.join(broadcast(b), Seq("ba", "bb"))
    }
    def variantB(): DataFrame = {
      val wLocal = Window.partitionBy("va", "cb")
        .orderBy(desc("cos"), col("vb"))
      val wFinal = Window.partitionBy("va").orderBy(desc("cos"), col("vb"))
      val scored = gridPairs(emb)
        .filter(col("va") < col("vb"))
        .select(col("va"), col("vb"), col("ba"), col("bb"),
          Det.r4(dotf(col("ea"), col("eb")) / (col("na") * col("nb")))
            .as("cos"))
      scored
        .select(explode(array(
          struct(col("va"), col("bb").as("cb"), col("vb"), col("cos")),
          struct(col("vb").as("va"), col("ba").as("cb"),
            col("va").as("vb"), col("cos")))).as("p"))
        .select(col("p.va").as("va"), col("p.cb").as("cb"),
          col("p.vb").as("vb"), col("p.cos").as("cos"))
        .withColumn("rl", row_number().over(wLocal))
        .filter(col("rl") <= k)
        .withColumn("rk", row_number().over(wFinal))
        .filter(col("rk") <= k)
        .select(col("va"), col("rk"), col("vb"), col("cos"))
        .orderBy("va", "rk")
    }

    // ---- equivalence ----------------------------------------------------
    val aRows = runA().collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    release()
    val bRows = variantB().collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    release()
    require(aRows.length == bRows.length,
      s"row count differs: A=${aRows.length} B=${bRows.length}")
    aRows.zip(bRows).foreach { case (a, b) =>
      require(a._1 == b._1 && a._2 == b._2 && a._3 == b._3 &&
        java.lang.Double.doubleToRawLongBits(a._4) ==
          java.lang.Double.doubleToRawLongBits(b._4),
        s"mismatch: A=$a B=$b")
    }
    println(s"[drill] A == B bitwise over ${aRows.length} rows")

    // ---- sub-stage attribution ------------------------------------------
    // scoring only (one leg, no windows): is the 5.4s in the dots or in
    // the window machinery?
    val scoreOnly = gridPairs(emb)
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"),
        Det.r4(dotf(col("ea"), col("eb")) / (col("na") * col("nb")))
          .as("cos"))
    timed("score-only (half grid, no windows)") { noop(scoreOnly) }
    release()
    timed("score-only rep 2") { noop(scoreOnly) }
    release()

    // ---- alternating timed reps ----------------------------------------
    (1 to 4).foreach { i =>
      timed(s"A (shipped two-leg union) rep $i") { noop(runA()) }
      release()
      timed(s"B (explode-mirror) rep $i") { noop(variantB()) }
      release()
    }
    spark.stop()
  }
}
