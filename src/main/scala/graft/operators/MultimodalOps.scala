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

  // Resize to fit a 224×224 box preserving aspect ratio — the standard
  // vision-model preprocessing step. Pure integer metadata arithmetic
  // (the pixel resample itself is the stubbed codec step); at scale this
  // is a narrow projection over the metadata columns, blob untouched.
  private def multimodalResize(s: SparkSession, d: String): DataFrame =
    multimodalMeta(s, d)
      // greatest(1, …): extreme aspect ratios (> 224:1) floor to zero
      // pixels otherwise — a 224×0 output is invalid for any model input
      .withColumn("out_w",
        when(col("width") >= col("height"), 224L)
          .otherwise(greatest(lit(1L), floor(col("width") * 224 / col("height")))))
      .withColumn("out_h",
        when(col("width") >= col("height"),
          greatest(lit(1L), floor(col("height") * 224 / col("width"))))
          .otherwise(224L))
      .select("doc_id", "width", "height", "out_w", "out_h")
      .orderBy("doc_id")

  // Frame sampling: 8 evenly-spaced byte offsets per asset (the frame
  // decode at each offset is the stubbed codec step). The explode is the
  // real plumbing: one row per (asset, frame) with offset + chunk length,
  // partition-preserving, no shuffle.
  private def multimodalFrames(s: SparkSession, d: String): DataFrame =
    assets(s, d)
      .select(col("doc_id"), length(col("blob")).cast("long").as("n_bytes"))
      .select(col("doc_id"), col("n_bytes"),
        explode(sequence(lit(0L), lit(7L))).as("frame_idx"))
      .withColumn("byte_offset", floor(col("frame_idx") * col("n_bytes") / 8))
      .withColumn("chunk_len", floor(col("n_bytes") / 8))
      .orderBy("doc_id", "frame_idx")

  // Audio framing manifest: the blob as stub PCM (1 byte/sample @ 8 kHz —
  // the codec decode is the stubbed step) cut into the standard
  // fixed-frame/hop windowing an ASR or audio-embedding stage consumes
  // (100-sample frames, 40-sample hop). Per-asset duration + frame count:
  // pure metadata arithmetic, narrow projection, blob never shuffled.
  private def multimodalAudio(s: SparkSession, d: String): DataFrame = {
    val frame = 100L
    val hop = 40L
    assets(s, d)
      .select(col("doc_id"), length(col("blob")).cast("long").as("n_samples"))
      .withColumn("duration_ms", floor(col("n_samples") * 1000 / 8000))
      .withColumn("n_frames",
        when(col("n_samples") >= frame,
          floor((col("n_samples") - frame) / hop) + 1).otherwise(0L))
      .orderBy("doc_id")
  }

  // Feature extraction: 4 pseudo-features in [0, 1) derived from the
  // content hash (the real embedding model call is the stubbed step; the
  // hash keeps it deterministic and cross-engine checkable). Narrow
  // projection — the shape a mapInPandas/mapPartitions model-inference
  // stage plugs into.
  private def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    val h = md5(col("blob"))
    def f(k: Int) =
      graft.Det.r4(conv(substring(h, 1 + 8 * k, 8), 16, 10).cast("long") /
        lit(4294967296.0))
    assets(s, d)
      .select(col("doc_id"), f(0).as("f0"), f(1).as("f1"), f(2).as("f2"),
        f(3).as("f3"))
      .orderBy("doc_id")
  }

  private val featuresSqlF: Int => String = k =>
    graft.Det.r4Sql(s"CAST(('0x' || substr(md5(text), ${1 + 8 * k}, 8)) AS BIGINT) / 4294967296.0")

  val defs: Seq[QDef] = Seq(
    QDef("q_multimodal_meta", multimodalMeta, Some(
      """SELECT doc_id, n_bytes, n_bytes % 640 + 1 AS width,
        | (n_bytes * 7) % 480 + 1 AS height,
        | CASE n_bytes % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |  ELSE 'webp' END AS format
        | FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes
        |       FROM documents) ORDER BY doc_id""".stripMargin)),
    QDef("q_multimodal_resize", multimodalResize, Some(
      """SELECT doc_id, width, height,
        | CASE WHEN width >= height THEN 224
        |  ELSE greatest(1, CAST(floor(width * 224 / height) AS BIGINT)) END AS out_w,
        | CASE WHEN width >= height THEN greatest(1, CAST(floor(height * 224 / width) AS BIGINT))
        |  ELSE 224 END AS out_h
        | FROM (SELECT doc_id, n_bytes % 640 + 1 AS width,
        |        (n_bytes * 7) % 480 + 1 AS height FROM
        |        (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes
        |         FROM documents))
        | ORDER BY doc_id""".stripMargin)),
    QDef("q_multimodal_frames", multimodalFrames, Some(
      """SELECT doc_id, n_bytes, frame_idx,
        | CAST(floor(frame_idx * n_bytes / 8) AS BIGINT) AS byte_offset,
        | CAST(floor(n_bytes / 8) AS BIGINT) AS chunk_len
        | FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |        unnest(generate_series(0, 7)) AS frame_idx FROM documents)
        | ORDER BY doc_id, frame_idx""".stripMargin)),
    QDef("q_multimodal_audio", multimodalAudio, Some(
      """SELECT doc_id, n_samples,
        | CAST(floor(n_samples * 1000 / 8000) AS BIGINT) AS duration_ms,
        | CASE WHEN n_samples >= 100
        |  THEN CAST(floor((n_samples - 100) / 40) AS BIGINT) + 1
        |  ELSE 0 END AS n_frames
        | FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_samples
        |       FROM documents) ORDER BY doc_id""".stripMargin)),
    QDef("q_multimodal_features", multimodalFeatures, Some(
      s"""SELECT doc_id, ${featuresSqlF(0)} AS f0, ${featuresSqlF(1)} AS f1,
         | ${featuresSqlF(2)} AS f2, ${featuresSqlF(3)} AS f3
         | FROM documents ORDER BY doc_id""".stripMargin))
  )
}
