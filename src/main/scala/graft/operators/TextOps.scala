package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Det, QDef}
import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline (north star of
  * BASELINE.json; the reference has no text processing — payloads are
  * opaque bytes, `/root/reference/src/streams.ts:12-13`).
  *
  * All operators are narrow per-document projections built from codegen'd
  * built-ins (`split`/`filter`/`regexp_count`/higher-order array fns): they
  * scan once, shuffle nothing (except the token top-k aggregation), and
  * parallelize embarrassingly — the right shape for 100 TB of documents.
  */
object TextOps {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")

  /** Whitespace tokens of lower-cased text, empties removed. */
  private def toks(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  private val enStop = "\\b(the|and|of|to|in|is|that|it|was|for)\\b"
  private val deStop = "\\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\\b"
  private val esStop = "\\b(el|la|los|las|que|y|en|un|una|por)\\b"
  private val frStop = "\\b(le|les|des|et|est|une|dans|pour|sur|avec)\\b"

  // Corpus token frequency: explode + count, top 100. At scale this is the
  // canonical map-side-combine aggregation (partial counts per partition,
  // one shuffle on token).
  private def textTokens(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(explode(toks(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("tok"))
      .limit(100)

  // Per-document token counting: whitespace tokenizer + a BPE-ish
  // alphanumeric-run tokenizer (subword pieces split on any non-[a-z0-9]).
  private def tokenCount(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("doc_id"),
      size(toks(col("text"))).cast("long").as("n_tokens_ws"),
      size(filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0))
        .cast("long").as("n_tokens_re"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .orderBy("doc_id")

  // Language ID: stopword-hit heuristic over 4 Latin-script languages +
  // CJK-codepoint detection for zh. Deterministic integer scoring.
  private def langId(s: SparkSession, d: String): DataFrame = {
    val lc = lower(col("text"))
    docs(s, d).select(
      col("doc_id"),
      regexp_count(lc, lit(enStop)).cast("long").as("en_hits"),
      regexp_count(lc, lit(deStop)).cast("long").as("de_hits"),
      regexp_count(lc, lit(esStop)).cast("long").as("es_hits"),
      regexp_count(lc, lit(frStop)).cast("long").as("fr_hits"),
      regexp_count(col("text"), lit("[一-鿿]")).cast("long").as("zh_hits"))
      .withColumn("lang_pred",
        when(col("zh_hits") > 0, "zh")
          .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits")
            && col("en_hits") >= col("fr_hits") && col("en_hits") > 0, "en")
          .when(col("de_hits") >= col("es_hits") && col("de_hits") >= col("fr_hits")
            && col("de_hits") > 0, "de")
          .when(col("es_hits") >= col("fr_hits") && col("es_hits") > 0, "es")
          .when(col("fr_hits") > 0, "fr")
          .otherwise("und"))
      .select("doc_id", "lang_pred", "en_hits", "de_hits", "es_hits",
        "fr_hits", "zh_hits")
      .orderBy("doc_id")
  }

  // Quality scoring: length / punctuation / stopword-density ratios →
  // composite score. Integer counts + single divisions → bit-deterministic.
  private def qualityScore(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("doc_id"),
      length(col("text")).cast("long").as("len"),
      regexp_count(col("text"), lit("[A-Za-z]")).cast("long").as("n_alpha"),
      regexp_count(col("text"), lit("[.,;:!?]")).cast("long").as("n_punct"),
      size(toks(col("text"))).cast("long").as("n_tok"),
      regexp_count(lower(col("text")), lit(enStop)).cast("long").as("n_stop"))
      .filter(col("n_tok") > 0 && col("len") > 0)
      .withColumn("alpha_ratio", Det.r4(col("n_alpha") / col("len")))
      .withColumn("punct_ratio", Det.r4(col("n_punct") / col("len")))
      .withColumn("stop_ratio", Det.r4(col("n_stop") / col("n_tok")))
      .withColumn("avg_tok_len", Det.r4(col("n_alpha") / col("n_tok")))
      .withColumn("quality",
        Det.r4(col("alpha_ratio") * lit(0.5) + col("stop_ratio") * lit(0.3)
          + (lit(1.0) - col("punct_ratio")) * lit(0.2)))
      .select("doc_id", "len", "n_tok", "alpha_ratio", "punct_ratio",
        "stop_ratio", "avg_tok_len", "quality")
      .orderBy("doc_id")

  // Document fingerprint: min-hash over word 3-shingles (one 128-bit hash
  // per shingle, keep the lexicographic min) — an order-invariant,
  // locality-insensitive content fingerprint; md5(text) fallback for
  // sub-3-token docs. The token array is bound once per row
  // (graft.functions.bindOnce) — inlined references inside the shingle
  // lambda would re-tokenize per index — and documents are spread across
  // the shuffle partitioning because the test parquet is one file → one
  // scan partition.
  private def fingerprint(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"), graft.functions.bindOnce(toks(col("text")), l =>
        coalesce(
          when(size(l) >= 3,
            array_min(transform(sequence(lit(1), size(l) - 2),
              i => md5(concat_ws(" ",
                element_at(l, i),
                element_at(l, i + 1),
                element_at(l, i + 2)).cast("binary"))))),
          md5(col("text").cast("binary")))).as("fp"))
      .orderBy("doc_id")

  private val oracleToks =
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)"

  val defs: Seq[QDef] = Seq(
    QDef("q_text_tokens", textTokens, Some(
      s"""SELECT tok, count(*) AS n FROM (
         | SELECT unnest($oracleToks) AS tok FROM documents)
         | GROUP BY 1 ORDER BY n DESC, tok LIMIT 100""".stripMargin)),
    QDef("q_token_count", tokenCount, Some(
      s"""SELECT doc_id, len($oracleToks) AS n_tokens_ws,
         | len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |     x -> len(x) > 0)) AS n_tokens_re,
         | octet_length(CAST(text AS BLOB)) AS n_bytes
         | FROM documents ORDER BY doc_id""".stripMargin)),
    QDef("q_lang_id", langId, Some(
      s"""SELECT doc_id,
         | CASE WHEN zh_hits > 0 THEN 'zh'
         |  WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits
         |   AND en_hits > 0 THEN 'en'
         |  WHEN de_hits >= es_hits AND de_hits >= fr_hits AND de_hits > 0 THEN 'de'
         |  WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
         |  WHEN fr_hits > 0 THEN 'fr'
         |  ELSE 'und' END AS lang_pred,
         | en_hits, de_hits, es_hits, fr_hits, zh_hits FROM (
         | SELECT doc_id,
         |  len(regexp_extract_all(lower(text), '$enStop')) AS en_hits,
         |  len(regexp_extract_all(lower(text), '$deStop')) AS de_hits,
         |  len(regexp_extract_all(lower(text), '$esStop')) AS es_hits,
         |  len(regexp_extract_all(lower(text), '$frStop')) AS fr_hits,
         |  len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS zh_hits
         | FROM documents) ORDER BY doc_id""".stripMargin)),
    QDef("q_quality_score", qualityScore, Some(
      s"""SELECT doc_id, len, n_tok,
         | ${Det.r4Sql("n_alpha / len")} AS alpha_ratio,
         | ${Det.r4Sql("n_punct / len")} AS punct_ratio,
         | ${Det.r4Sql("n_stop / n_tok")} AS stop_ratio,
         | ${Det.r4Sql("n_alpha / n_tok")} AS avg_tok_len,
         | ${Det.r4Sql(Det.r4Sql("n_alpha / len") + " * 0.5 + " + Det.r4Sql("n_stop / n_tok") + " * 0.3 + (1.0 - " + Det.r4Sql("n_punct / len") + ") * 0.2")} AS quality
         | FROM (
         | SELECT doc_id, length(text) AS len,
         |  len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
         |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         |  len($oracleToks) AS n_tok,
         |  len(regexp_extract_all(lower(text), '$enStop')) AS n_stop
         | FROM documents)
         | WHERE n_tok > 0 AND len > 0 ORDER BY doc_id""".stripMargin)),
    QDef("q_fingerprint", fingerprint, Some(
      s"""SELECT doc_id,
         | CASE WHEN len(l) >= 3 THEN
         |  list_aggregate([md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2])
         |                  for i in generate_series(1, len(l) - 2)], 'min')
         | ELSE md5(text) END AS fp
         | FROM (SELECT doc_id, text, $oracleToks AS l FROM documents)
         | ORDER BY doc_id""".stripMargin))
  )
}
