package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.Tables

/** Multimodal-column plumbing (north star of BASELINE.json).
  *
  * Images/audio/video travel as opaque `binary` columns with typed
  * metadata — exactly the reference's stance that payload bytes are the
  * user's concern (`/root/reference/src/streams.ts:12-13`). The actual
  * codec libraries are not in this container, so the decode kernel is a
  * clearly-marked deterministic STUB; everything Spark-side — binary
  * column handling, batch iteration via `mapPartitions`, typed output
  * schema, partition-preserving shape — is real and tested.
  *
  * At 100 TB: decode is a narrow per-partition op (no shuffle); binary
  * payloads stay columnar in parquet; metadata-only queries never read the
  * blob column (column pruning — verified via ReadSchema in `.explain`).
  */
object MultimodalOps {

  /** A decoded asset: what a real image decode would yield. */
  final case class AssetMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, format: String)

  /** STUB decode kernel: derives metadata deterministically from the blob
    * instead of decoding it (codec libs unavailable — see Scaladoc).
    * Replace the body with a real codec call in production. */
  private[graft] def stubDecode(docId: Long, blob: Array[Byte]): AssetMeta = {
    val n = blob.length.toLong
    AssetMeta(docId, n, n % 640 + 1, (n * 7) % 480 + 1,
      (n % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
  }

  /** Batch decode over binary columns: per-partition iteration, no shuffle.
    * This is the Spark plumbing a real decoder plugs into (the Python twin
    * would be `mapInPandas` with an Arrow batch of binary + metadata). */
  def decodeAssets(s: SparkSession, blobs: DataFrame): Dataset[AssetMeta] = {
    import s.implicits._
    blobs.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => stubDecode(id, b) })
  }

  /** Documents as fake binary assets (text bytes stand in for image bytes). */
  private[graft] def assets(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))

  // Metadata extraction over the binary column. The arithmetic mirrors
  // stubDecode so the SQL oracle can check the Spark-side plumbing
  // end-to-end; ScalaTest covers the mapPartitions path producing the
  // identical rows.
  private def multimodalMeta(s: SparkSession, d: String): DataFrame =
    assets(s, d)
      .withColumn("n_bytes", length(col("blob")).cast("long"))
      .select(
        col("doc_id"), col("n_bytes"),
        (col("n_bytes") % 640 + 1).as("width"),
        ((col("n_bytes") * 7) % 480 + 1).as("height"),
        when(col("n_bytes") % 3 === 0, "jpeg")
          .when(col("n_bytes") % 3 === 1, "png")
          .otherwise("webp").as("format"))
      .orderBy("doc_id")

  val defs: Seq[QDef] = Seq(
    QDef("q_multimodal_meta", multimodalMeta, Some(
      """SELECT doc_id, n_bytes, n_bytes % 640 + 1 AS width,
        | (n_bytes * 7) % 480 + 1 AS height,
        | CASE n_bytes % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |  ELSE 'webp' END AS format
        | FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes
        |       FROM documents) ORDER BY doc_id""".stripMargin))
  )
}
