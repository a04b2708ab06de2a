package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, QDef}
import graft.sources.Tables

/** Deduplication operators (north star of BASELINE.json; the reference has
  * none — its log is append-only bytes, `/root/reference/src/streams.ts:8-19`).
  *
  * Family, in increasing fuzziness:
  *  - exact        — group on a 128-bit content hash (never on the full
  *                   text: at 100 TB the shuffle carries 16-byte keys, not
  *                   documents);
  *  - keep-latest  — row_number over (entity, recency) — the CDC compaction
  *                   pattern;
  *  - n-gram Jaccard — inverted-index self-join on shingles (candidate
  *                   pairs share ≥1 shingle; hot shingles pruned by a
  *                   document-frequency cap so no quadratic blowup on
  *                   stop-shingles);
  *  - MinHash+LSH  — signature/banding: candidates collide in ≥1 of 16
  *                   bands of 4 minhashes, then exact Jaccard verifies.
  *                   At 100 TB this is THE scalable near-dup path: cost is
  *                   O(docs × perms) + a bucket-join, never O(docs²);
  *  - SimHash      — 64-bit sign-of-weighted-sum fingerprint; Hamming-ball
  *                   candidates via 4×16-bit band collisions.
  */
object DedupOps {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")

  private def toks(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  /** Word 3-shingles of the document (empty for <3-token docs). */
  private def shingles(c: Column): Column = {
    val l = toks(c)
    when(size(l) >= 3,
      transform(sequence(lit(1), size(l) - 2),
        i => concat_ws(" ", element_at(l, i), element_at(l, i + 1),
          element_at(l, i + 2))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct (doc_id, shingle) pairs with hot shingles (df > maxDf) pruned. */
  private def shingleIndex(s: SparkSession, d: String, maxDf: Int): DataFrame = {
    val sh = docs(s, d)
      .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))
      .distinct()
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    sh.join(dfreq.filter(col("df") <= maxDf), Seq("shingle"))
      .select("doc_id", "shingle")
  }

  // G10: exact dedup via content hash.
  private def dedupExact(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("h")

  // G11: keep-latest per entity (events: latest event per user).
  private def dedupLatest(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(desc("ts"), desc("event_id"))
    Tables(s, d, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .orderBy("user_id")
  }

  // n-gram Jaccard near-dup: inverted-index join, exact similarity.
  private def dedupNgramJaccard(s: SparkSession, d: String): DataFrame = {
    val idx = shingleIndex(s, d, maxDf = 100).cache()
    val cnt = idx.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = idx.as("a")
      .join(idx.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(cnt.as("ca"), col("da") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("db") === col("cb.doc_id"))
      .withColumn("jaccard",
        col("inter") / (col("ca.n") + col("cb.n") - col("inter")))
      .filter(col("jaccard") >= 0.1)
      .select(col("da"), col("db"), Det.r4(col("jaccard")).as("jaccard"))
      .orderBy("da", "db")
  }

  // --- MinHash + LSH ---------------------------------------------------
  // Universal-hash family over 31-bit shingle hashes: h_i(x) = (a_i x + b_i)
  // mod p, p = 2^31 - 1 (Mersenne prime); a,b from a fixed LCG so the
  // signature is reproducible across runs and cluster sizes.
  private val MersenneP = 2147483647L
  private val NumPerms = 64
  private val BandRows = 4 // 16 bands × 4 rows → ~certain recall at j≥0.8
  private[operators] val perms: Seq[(Long, Long)] = {
    var x = 42L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; x }
    Seq.fill(NumPerms)(((next() % (MersenneP - 1)) + 1, next() % MersenneP))
  }

  /** doc_id + sig: array of 64 minhashes over word 3-shingles. */
  private[operators] def minhashSignatures(s: SparkSession, d: String): DataFrame = {
    val h31 = pmod(xxhash64(col("shingle")), lit(MersenneP))
    val sigCols = perms.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(h31 * a + b, lit(MersenneP))).as(s"s$i")
    }
    docs(s, d)
      .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))
      .distinct()
      .groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"),
        array((0 until NumPerms).map(i => col(s"s$i")): _*).as("sig"))
  }

  /** Candidate pairs from LSH banding, verified with exact Jaccard ≥ 0.5. */
  private def dedupMinhashLsh(s: SparkSession, d: String): DataFrame = {
    val nBands = NumPerms / BandRows
    val sigs = minhashSignatures(s, d)
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until nBands).map(bI =>
        concat_ws("_", (0 until BandRows).map(r =>
          element_at(col("sig"), bI * BandRows + r + 1)): _*)): _*))
        .as(Seq("band_idx", "band_key")))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    // exact-Jaccard verification restricted to the candidate set
    val idx = shingleIndex(s, d, maxDf = Int.MaxValue)
    val cnt = idx.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = idx.as("a")
      .join(idx.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
      .join(cand, Seq("da", "db"), "left_semi")
    inter
      .join(cnt.as("ca"), col("da") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("db") === col("cb.doc_id"))
      .withColumn("jaccard",
        col("inter") / (col("ca.n") + col("cb.n") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("da"), col("db"), Det.r4(col("jaccard")).as("jaccard"))
      .orderBy("da", "db")
  }

  // --- SimHash ----------------------------------------------------------
  /** 64-bit SimHash per doc: bit k of the fingerprint is the sign of the
    * term-frequency-weighted sum over tokens of ±1 according to bit k of
    * xxhash64(token). Tokens are pre-aggregated per doc so the 64-way bit
    * fan-out multiplies distinct tokens, not raw token occurrences. */
  private[operators] def simhash(s: SparkSession, d: String): DataFrame = {
    val tok = docs(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("tok")))
    tok
      .select(col("doc_id"), col("cnt"), col("h"),
        explode(sequence(lit(0), lit(63))).as("bit"))
      .withColumn("w",
        when(expr("(shiftright(h, bit) & 1) = 1"), col("cnt"))
          .otherwise(-col("cnt")))
      .groupBy("doc_id", "bit")
      .agg(sum("w").as("sw"))
      .groupBy("doc_id")
      .agg(sum(when(col("sw") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .otherwise(0L)).as("simhash"))
      .select(col("doc_id"), col("simhash"))
      .orderBy("doc_id")
  }

  private def dedupSimhash(s: SparkSession, d: String): DataFrame =
    simhash(s, d)

  val defs: Seq[QDef] = Seq(
    QDef("q_dedup_exact", dedupExact, Some(
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        | FROM documents GROUP BY 1 ORDER BY h""".stripMargin)),
    QDef("q_dedup_latest", dedupLatest, Some(
      """SELECT user_id, event_id, event_type FROM (
        | SELECT user_id, event_id, event_type,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin)),
    QDef("q_dedup_ngram_jaccard", dedupNgramJaccard, Some(
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS l
        |  FROM documents),
        |s AS (SELECT DISTINCT doc_id,
        |  unnest([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |          for i in generate_series(1, len(l) - 2)]) AS shingle
        |  FROM w WHERE len(l) >= 3),
        |s2 AS (SELECT doc_id, shingle FROM s WHERE shingle IN
        |  (SELECT shingle FROM s GROUP BY 1 HAVING count(*) <= 100)),
        |cnt AS (SELECT doc_id, count(*) AS n FROM s2 GROUP BY 1),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM s2 a JOIN s2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db, floor((inter / (ca.n + cb.n - inter)) * 10000 + 0.5) / 10000 AS jaccard
        | FROM p JOIN cnt ca ON p.da = ca.doc_id JOIN cnt cb ON p.db = cb.doc_id
        | WHERE inter / (ca.n + cb.n - inter) >= 0.1 ORDER BY da, db""".stripMargin)),
    // xxhash64-based — not expressible in DuckDB; verified by ScalaTest
    // (candidates ⊇ high-Jaccard pairs) + driver rows-only check.
    QDef("q_dedup_minhash", dedupMinhashLsh, None),
    QDef("q_dedup_simhash", dedupSimhash, None)
  )
}
