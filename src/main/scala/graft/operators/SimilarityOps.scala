package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Det, QDef}
import graft.sources.Tables

/** Similarity search over the `embeddings` table (north star of
  * BASELINE.json; absent in the reference, whose payloads are opaque bytes,
  * `/root/reference/src/streams.ts:12-13`).
  *
  * Cosine math is pure higher-order-array arithmetic (`zip_with` +
  * `aggregate`): codegen-friendly, no UDF, and — because float→double
  * element casts, products and left-fold sums are IEEE-deterministic —
  * bit-identical to the DuckDB oracle's `list_*` rendering of the same
  * formula.
  *
  * Scale paths:
  *  - brute-force top-k vs ONE query vector: broadcast the query, narrow
  *    scan, TakeOrderedAndProject — linear, embarrassingly parallel;
  *  - all-pairs near-dup: quadratic by definition — provided as the exact
  *    baseline; the scale path is [[annTopK]]: random-hyperplane LSH
  *    bucketing (4 tables × 8 planes), candidates = bucket collisions only;
  *  - at 100 TB one would persist the bucketed layout (bucketBy on the
  *    bucket id) so queries touch a handful of partitions.
  */
object SimilarityOps {

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "embeddings")

  /** Left-fold double sum of an array column (deterministic order). */
  private def asum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v)

  private def dot(a: Column, b: Column): Column =
    asum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  private def norm(a: Column): Column =
    sqrt(asum(transform(a, x => x.cast("double") * x.cast("double"))))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  // Brute-force cosine top-20 for the query vector vec_id=0 (broadcast).
  private def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val q = emb(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    emb(s, d).crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .withColumn("cos", Det.r4(cosine(col("embedding"), col("qe"))))
      .select(col("vec_id"), col("label"), col("cos"))
      .orderBy(desc("cos"), col("vec_id"))
      .limit(20)
  }

  // All-pairs near-duplicate by embedding cosine (exact, quadratic baseline).
  private def embNearDup(s: SparkSession, d: String): DataFrame = {
    val a = emb(s, d).select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = emb(s, d).select(col("vec_id").as("vb"), col("embedding").as("eb"))
    a.join(b, col("va") < col("vb"))
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .filter(col("cos") >= 0.4)
      .select(col("va"), col("vb"), Det.r4(col("cos")).as("cos"))
      .orderBy("va", "vb")
  }

  // --- ANN: random-hyperplane LSH ----------------------------------------
  private val NumTables = 4
  private val PlanesPerTable = 8
  private val Dim = 64

  /** Deterministic pseudo-random hyperplanes (fixed LCG, seed 42). */
  private[operators] val planes: Array[Array[Double]] = {
    var x = 42L
    def next(): Double = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.fill(NumTables * PlanesPerTable)(Array.fill(Dim)(next()))
  }

  /** LSH bucket ids, one per table: 8 sign bits of plane dot products. */
  private[operators] def bucketCols(v: Column): Seq[Column] =
    (0 until NumTables).map { t =>
      (0 until PlanesPerTable).map { j =>
        val p = typedLit(planes(t * PlanesPerTable + j).toSeq)
        when(dot(v, p) > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
    }

  /** ANN top-20 for vec_id=0: candidates share an LSH bucket in ≥1 table,
    * then exact cosine ranks the candidates only. */
  private def annTopK(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
    val withBuckets = e.select(
      (col("vec_id") +: col("label") +: col("embedding") +:
        bucketCols(col("embedding")).zipWithIndex
          .map { case (c, t) => c.as(s"b$t") }): _*)
    val buckets = withBuckets.select(col("vec_id"), col("label"),
      col("embedding"),
      posexplode(array((0 until NumTables).map(t => col(s"b$t")): _*))
        .as(Seq("tbl", "bucket")))
    val qb = buckets.filter(col("vec_id") === 0)
      .select(col("tbl"), col("bucket"), col("embedding").as("qe"))
    buckets.filter(col("vec_id") =!= 0)
      .join(broadcast(qb), Seq("tbl", "bucket"))
      .select(col("vec_id"), col("label"), col("embedding"), col("qe"))
      .distinct()
      .withColumn("cos", Det.r4(cosine(col("embedding"), col("qe"))))
      .select(col("vec_id"), col("label"), col("cos"))
      .orderBy(desc("cos"), col("vec_id"))
      .limit(20)
  }

  private val cosSql =
    """list_sum(list_transform(list_zip(%s, %s),
      | x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
      |(sqrt(list_sum(list_transform(%s, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      | sqrt(list_sum(list_transform(%s, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""
      .stripMargin

  val defs: Seq[QDef] = Seq(
    QDef("q_similarity_cosine", cosineTopK, Some(
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, ${Det.r4Sql(cosSql.format("embedding", "qe", "embedding", "qe"))} AS cos
         | FROM embeddings, q WHERE vec_id <> 0
         | ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin)),
    QDef("q_embed_neardup", embNearDup, Some(
      s"""SELECT va, vb, ${Det.r4Sql("c")} AS cos FROM (
         | SELECT a.vec_id AS va, b.vec_id AS vb,
         |  ${cosSql.format("a.embedding", "b.embedding", "a.embedding", "b.embedding")} AS c
         | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         | WHERE c >= 0.4 ORDER BY va, vb""".stripMargin)),
    // LSH planes are Scala-side constants — not DuckDB-expressible; recall
    // vs the brute-force baseline is asserted in ScalaTest.
    QDef("q_similarity_ann", annTopK, None)
  )
}
