package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.Gen

/** Property-based guarantees for the round-11 composition pieces, on
  * ARBITRARY inputs rather than the corpus or a fixed planted case:
  * incremental packing must equal the batch-major re-pack for ANY corpus
  * and ANY batch split (zero-token docs, empty batches, odd caps
  * included), and the span-corruption formatter must round-trip ANY
  * token stream at ANY noise parameters. Deterministic Gen seeds — a
  * failure reproduces. */
class PipelinePropertySpec extends SparkSpec {

  private def toksC(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  test("incremental packing equals the batch-major re-pack on arbitrary corpora and splits") {
    val s = spark
    import s.implicits._
    val scenario = for {
      nDocs <- Gen.choose(1, 50)
      toks <- Gen.listOfN(nDocs, Gen.choose(0, 40))
      batch <- Gen.listOfN(nDocs, Gen.choose(0, 2))
      cap <- Gen.oneOf(16.0, 64.0, 100.0)
    } yield (toks, batch, cap)
    val cases = Gen.listOfN(6, scenario)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(11L)).get
    cases.zipWithIndex.foreach { case ((toks, batch, cap), ci) =>
      val docs = toks.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(j => s"w$j").mkString(" "), batch(i))
      }
      def batchDf(b: Int) = {
        val rows = docs.filter(_._3 == b).map(d => (d._1, d._2))
        if (rows.isEmpty) Seq.empty[(Long, String)].toDF("id", "body")
        else rows.toDF("id", "body")
      }
      var packed = graft.operators.PipelineOps
        .packSequences(batchDf(0), "id", "body", cap)
      packed = graft.operators.PipelineOps
        .packSequencesIncremental(packed, batchDf(1), "id", "body", cap)
      packed = graft.operators.PipelineOps
        .packSequencesIncremental(packed, batchDf(2), "id", "body", cap)
      val ref = docs.toDF("id", "body", "batch")
        .select($"id", $"batch", md5($"id".cast("string")).as("ord"),
          size(toksC($"body")).cast("long").as("n_tok"))
        .withColumn("cum",
          sum("n_tok").over(Window.orderBy("batch", "ord", "id")))
        .withColumn("chunk", floor(($"cum" - $"n_tok") / cap).cast("long"))
        .groupBy("chunk")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          min("id").as("min_doc"), max("id").as("max_doc"))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
      assert(rows(packed) == rows(ref),
        s"scenario $ci (cap=$cap, docs=${toks.length}) diverged")
    }
  }

  test("packExamples windows reconstruct the exact md5-ordered stream on arbitrary corpora") {
    val s = spark
    import s.implicits._
    val scenario = for {
      nDocs <- Gen.choose(1, 40)
      toks <- Gen.listOfN(nDocs, Gen.choose(0, 50))
      cap <- Gen.oneOf(8L, 16L, 64L)
    } yield (toks, cap)
    val cases = Gen.listOfN(6, scenario)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(12L)).get
    cases.zipWithIndex.foreach { case ((toks, cap), ci) =>
      val docs = toks.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(j => s"w${i}x$j").mkString(" ")) }
      val got = graft.operators.PipelineOps
        .packExamples(docs.toDF("id", "body"), "id", "body", cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getString(4), r.getString(5), r.getBoolean(6)))
        .sortBy(_._1).toSeq
      def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val stream = docs.filter(_._2.nonEmpty)
        .sortBy(d => (md5hex(d._1.toString), d._1))
        .flatMap { case (id, b) => b.split(" ").toSeq.map(t => (id, t)) }
      if (stream.isEmpty) assert(got.isEmpty, s"scenario $ci not empty")
      else {
        assert(got.map(_._1) == got.indices.map(_.toLong),
          s"scenario $ci chunk ids not contiguous")
        assert(got.flatMap(_._6.split(" ")) == stream.map(_._2),
          s"scenario $ci (cap=$cap) stream reconstruction diverged")
        assert(got.init.forall(w => w._3 == cap && !w._7),
          s"scenario $ci interior window not exact-cap/full")
        assert(got.last._3 == stream.size - cap * (got.size - 1) &&
          got.last._7 == (got.last._3 < cap),
          s"scenario $ci tail window wrong")
        val expSegs = stream.zipWithIndex
          .groupBy(_._2 / cap).toSeq.sortBy(_._1)
          .map { case (ck, xs) =>
            xs.groupBy(_._1._1)
              .map { case (id, ys) => (ys.map(_._2).min - ck * cap, id) }
              .toSeq.sorted }
        val gotSegs = got.map(w => w._5.split(",").map(_.toLong)
          .zip(w._4.split(",").map(_.toLong)).toSeq)
        assert(gotSegs == expSegs, s"scenario $ci lineage diverged")
        assert(got.map(_._2) == expSegs.map(_.size.toLong),
          s"scenario $ci n_segs diverged")
      }
    }
  }

  test("span-corruption round-trips arbitrary token streams at any noise parameters") {
    val s = spark
    import s.implicits._
    val lengths = Gen.listOfN(60, Gen.choose(0, 50))
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(12L)).get
    val docsDf = lengths.zipWithIndex
      .map { case (n, i) =>
        (i.toLong, (1 to n).map(j => s"t${i}x$j").mkString(" "))
      }
      .toDF("id", "body")
    val sentRe = "<extra_id_(\\d+)>".r
    Seq((500, 3), (2000, 5), (9999, 1)).foreach { case (rateBp, meanSpan) =>
      val out = graft.operators.PipelineOps
        .spanCorruptApply(docsDf, "id", "body", rateBp, meanSpan)
        .collect()
      // token-less docs are skipped, everything else round-trips
      assert(out.length == lengths.count(_ > 0),
        s"($rateBp,$meanSpan): token-less docs must be skipped")
      out.foreach { r =>
        val id = r.getLong(0)
        val orig = (1 to lengths(id.toInt)).map(j => s"t${id}x$j")
        val nRuns = r.getInt(1)
        val input = r.getString(2)
        val target = r.getString(3)
        if (nRuns == 0) {
          assert(target.isEmpty && input == orig.mkString(" "),
            s"($rateBp,$meanSpan) doc $id: zero-run doc altered")
        } else {
          val ms = sentRe.findAllMatchIn(target).toVector
          assert(ms.map(_.group(1).toInt) == (0 to nRuns).toVector,
            s"($rateBp,$meanSpan) doc $id: sentinel sequence broken")
          val segs = ms.zipWithIndex.map { case (m, i) =>
            val end = if (i + 1 < ms.length) ms(i + 1).start
              else target.length
            m.group(1).toInt -> target.substring(m.end, end).trim
              .split("\\s+").filter(_.nonEmpty).toSeq
          }.toMap
          assert(segs(nRuns).isEmpty,
            s"($rateBp,$meanSpan) doc $id: terminal sentinel not last")
          val reconstructed = input.split(" ").toSeq.flatMap {
            case sentRe(k) => segs(k.toInt)
            case t => Seq(t)
          }
          assert(reconstructed == orig,
            s"($rateBp,$meanSpan) doc $id: round-trip failed")
        }
      }
    }
  }
}
