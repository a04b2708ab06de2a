package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the batch temporal operators.
  *
  * The pattern (precedent: the transition-matrix twin in
  * graft.StreamingWindowSpec): a `flatMapGroupsWithState` stage holds the
  * minimal per-key state and emits INCREMENTS; a downstream streaming
  * aggregation folds the increments into the metric. The reference's
  * stateful-processing surface is exactly this shape — per-key stores fed
  * by a keyed log (`/root/reference/src/task.ts:75-91`) — re-expressed on
  * the micro-batch engine.
  */
object StreamingTemporal {

  /** Streaming twin of [[graft.operators.TemporalOps.rollingDistinct]]
    * (trailing-window distinct actives — the DAU/WAU metric).
    *
    * Input: `(key, bucket)` where `bucket = floor(event_time / step)` —
    * bucketing happens before this operator, exactly as the batch
    * operator derives `__b`. Output: `(bucket, delta)` increments; a
    * downstream `groupBy(bucket).sum(delta)` (any output mode) holds the
    * running `n_active` per bucket, equal to the batch operator's count
    * of keys active in `(bucket - windowBuckets, bucket]`.
    *
    * Per-key state is the key's active buckets RESTRICTED to the trailing
    * `windowBuckets` of its max seen bucket — ≤ `windowBuckets` longs per
    * key, the same bound that makes the batch operator's ×W replication
    * affordable; nothing grows with history. A key arriving in bucket `b`
    * emits +1 for each output bucket in `[b, b + windowBuckets - 1]` it
    * newly covers (no previously-recorded bucket falls inside that output
    * bucket's trailing window), so every (key, output-bucket) pair
    * contributes at most once.
    *
    * Disorder bound (the watermark analogue, stated not hidden): counts
    * are exact while each key's arrivals are at most `windowBuckets`
    * buckets out of order — beyond that the pruned state can no longer
    * prove a prior contribution and a duplicate +1 for an old bucket can
    * slip through, the standard eviction/correctness trade every
    * watermarked stream makes.
    *
    * LIBRARY ENTRY POINT — parity with the batch operator on a planted
    * cross-batch log is pinned in graft.StreamingWindowSpec. */
  def rollingDistinctDeltas(events: Dataset[(String, Long)],
      windowBuckets: Int): Dataset[(Long, Long)] = {
    require(windowBuckets >= 1,
      s"windowBuckets must be >= 1, got $windowBuckets")
    val session = events.sparkSession
    import session.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: String, values: Iterator[(String, Long)],
         state: GroupState[Seq[Long]]) =>
          var active = state.getOption.getOrElse(Seq.empty).toSet
          val out = Vector.newBuilder[(Long, Long)]
          values.foreach { case (_, b) =>
            if (!active.contains(b)) {
              var ob = b
              while (ob <= b + windowBuckets - 1) {
                // key newly covers ob iff no recorded bucket sits in ob's
                // trailing window (b itself always does)
                if (!active.exists(s => s > ob - windowBuckets && s <= ob))
                  out += ((ob, 1L))
                ob += 1
              }
              active += b
              val mx = active.max
              active = active.filter(_ > mx - windowBuckets)
            }
          }
          state.update(active.toSeq.sorted)
          out.result().iterator
      }
  }

  /** Streaming twin of [[graft.operators.PipelineOps.corpusDelta]] (the
    * snapshot diff is the batch form of a CDC stream — this is the stream
    * form): a compacted change feed of document upserts/deletes in, a
    * change manifest `(doc_id, change)` out, `change ∈ {added, removed,
    * changed}` — no-op events (same-hash upsert, delete of an absent doc)
    * emit nothing, exactly as the batch operator drops `unchanged`.
    *
    * Input: `(doc_id, contentHash, delete)` — the hash is whatever the
    * pipeline keys content identity on (the batch twin uses md5 of the
    * text; NULL text hashes to None and is a legal PRESENT state, the
    * same presence-vs-hash-nullness distinction the batch operator
    * carries via its per-side flags). Each micro-batch must hold at most
    * one operation per doc — the compacted-CDC shape every changelog
    * consumer (Debezium, Delta CDF) hands downstream; within-batch
    * multi-op ordering is otherwise undefined under shuffle.
    *
    * Per-key state is ONE optional hash (presence = the doc exists,
    * value = its last content hash): O(live corpus) keys × O(16 bytes),
    * nothing grows with history — the bounded-state requirement every
    * twin in this file meets.
    *
    * Batch ≡ stream: feeding snapshot A as upserts, then (snapshot B's
    * rows as upserts + deletes for A∖B) produces, in the second batch,
    * exactly `corpusDelta(A, B)` — pinned in graft.StreamingWindowSpec,
    * NULL-text fates included.
    *
    * LIBRARY ENTRY POINT. */
  def corpusDeltaChanges(events: Dataset[(Long, Option[String], Boolean)])
      : Dataset[(Long, String)] = {
    val session = events.sparkSession
    import session.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (id: Long, values: Iterator[(Long, Option[String], Boolean)],
         state: GroupState[Option[String]]) =>
          var present = state.exists
          var h: Option[String] = if (present) state.get else None
          val out = Vector.newBuilder[(Long, String)]
          values.foreach { case (_, nh, del) =>
            if (del) {
              if (present) { out += ((id, "removed")); present = false
                h = None }
            } else if (!present) {
              out += ((id, "added")); present = true; h = nh
            } else if (h != nh) { // None == None → unchanged (null-safe)
              out += ((id, "changed")); h = nh
            }
          }
          if (present) state.update(h)
          else if (state.exists) state.remove()
          out.result().iterator
      }
  }

  /** Streaming twin of the RATE stage of
    * [[graft.operators.PipelineOps.temperatureMixture]]: running
    * per-source token totals in, the CURRENT sampling-rate table out —
    * re-derived every trigger exactly as the batch operator derives it
    * from its one-pass totals, so a pipeline can watch its mixture rates
    * converge while the corpus is still landing.
    *
    * Input: `(source, n_tok)` — per-document token counts, the same
    * upstream reduction the batch operator's first projection performs
    * (token counting stays embarrassingly parallel before this operator).
    * Output per trigger: the FULL updated `(source, tok_total, rate)`
    * table — |sources| rows, the driver-sized model artifact the batch
    * twin broadcasts.
    *
    * Shape: a stateless per-partition pre-sum compacts each micro-batch
    * to ≤ |sources| rows per partition (Structured Streaming forbids
    * chained aggregations, so the compaction is a narrow mapPartitions,
    * not a groupBy), then a single-key `flatMapGroupsWithState` folds the
    * compacted deltas into the per-source totals map — state is
    * O(|sources|) longs, nothing grows with history, and the single-task
    * fold touches partitions × |sources| rows per trigger, never the
    * corpus. Cross-source normalization (the reason this cannot be a
    * plain streaming aggregation: `w_total` needs every source) happens
    * in plain Scala over the state map, mirroring the batch arithmetic
    * term for term — `w_total` accumulates 6-decimal-rounded terms
    * exactly as `Det.dsum`'s decimal(28,6) cast does, and the emitted
    * rate applies the same IEEE `floor(x·1e4 + 0.5)/1e4` rounding — so
    * after the last batch the table is BIT-IDENTICAL to the batch
    * operator's (pinned in graft.StreamingWindowSpec).
    *
    * LIBRARY ENTRY POINT. */
  def temperatureMixtureRates(docs: Dataset[(String, Long)],
      alpha: Double = 0.3, budgetFraction: Double = 0.5)
      : Dataset[(String, Long, Double)] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(budgetFraction > 0 && budgetFraction <= 1,
      s"budgetFraction must be in (0, 1], got $budgetFraction")
    val session = docs.sparkSession
    import session.implicits._
    val compacted = docs.mapPartitions { it =>
      val m = collection.mutable.HashMap.empty[String, Long]
      it.foreach { case (s, n) => m(s) = m.getOrElse(s, 0L) + n }
      m.iterator
    }
    compacted.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (_: Int, values: Iterator[(String, Long)],
         state: GroupState[Map[String, Long]]) =>
          var totals = state.getOption.getOrElse(Map.empty[String, Long])
          values.foreach { case (s, n) =>
            totals = totals.updated(s, totals.getOrElse(s, 0L) + n)
          }
          state.update(totals)
          val corpusTok = totals.values.sum
          val ws = totals.map { case (s, t) =>
            s -> math.pow(t.toDouble, alpha)
          }
          // Det.dsum mirror: each w rounded to 6 decimals (HALF_UP on the
          // shortest decimal rendering — BigDecimal.valueOf, the same path
          // Spark's double→decimal(28,6) cast takes), summed exactly.
          val wTotal = ws.values
            .map(w => java.math.BigDecimal.valueOf(w)
              .setScale(6, java.math.RoundingMode.HALF_UP))
            .reduceOption(_.add(_))
            .map(_.doubleValue()).getOrElse(0.0d)
          totals.toSeq.sortBy(_._1).iterator.map { case (s, t) =>
            // term-for-term the batch expression: least(1, corpus_tok ·
            // budgetFraction · (w / w_total) / tok_total), then r4.
            // batch mirror incl. the edge: a token-less source's rate is
            // vacuously 1.0. Here the guard is load-bearing — scala
            // 0.0/0.0 = NaN would poison the r4 rounding; the batch
            // operator guards the same edge for clarity (its double
            // division NaNs under ANSI too and least() would absorb it)
            val rate =
              if (t == 0L) 1.0d
              else {
                val raw = ((corpusTok.toDouble * budgetFraction) *
                  (ws(s) / wTotal)) / t.toDouble
                math.floor(math.min(1.0d, raw) * 10000d + 0.5d) / 10000d
              }
            (s, t, rate)
          }
      }
  }

  /** Streaming twin of
    * [[graft.operators.PipelineOps.packSequencesIncremental]] — the
    * live-ingest form of context-window packing: documents arrive as
    * `(doc_id, n_tok)` micro-batches, each is assigned the chunk where
    * its first token lands, and the running corpus token total carries
    * across batches, so new documents first fill the previous batch's
    * partially-filled last window. Output: `(doc_id, n_tok, chunk)`
    * assignments, append-mode.
    *
    * Packing is a GLOBALLY SEQUENTIAL fold by definition — every chunk
    * boundary depends on every prior token — so the stream form funnels
    * through one pack cursor: a single-key `flatMapGroupsWithState`
    * whose state is ONE long (the grand total; nothing grows with
    * history), laying each micro-batch out in the same md5(doc_id)
    * order the batch operator uses. The micro-batch is held and sorted
    * in the cursor task's memory — bounded by the trigger size, the
    * unit a streaming ingest already buffers. This is the INGEST-TAIL
    * shape (per-hour/day increments); the initial bulk build belongs to
    * the batch operator, whose within-batch layout is fully
    * distributed.
    *
    * Batch ≡ stream: feeding batches B0, B1, … as micro-batches yields
    * per-doc assignments identical to chaining
    * `packSequencesIncremental` over the same batch split (equivalently
    * the batch-major re-pack of the union) — pinned in
    * graft.StreamingWindowSpec.
    *
    * LIBRARY ENTRY POINT. */
  /** Streaming twin of
    * [[graft.operators.PipelineOps.packExamplesIncremental]] — live
    * WINDOW EMISSION: pre-tokenized documents arrive as
    * `(doc_id, tokens)` micro-batches and every window that CLOSES
    * (fills to exactly `cap` tokens) is emitted with the full
    * packExamples row shape `(chunk, n_segs, n_tokens, doc_ids,
    * doc_starts, chunk_text, is_partial)` — `is_partial` always false
    * here, because the still-open tail window stays in state until
    * later tokens close it (emitted training windows are immutable;
    * the batch operator's partial-tail row is exactly the window a
    * live ingest has not finished yet).
    *
    * Same sequential-fold funnel as [[packAssignments]] (packing is
    * global by definition): a single pack cursor whose state is the
    * next chunk id plus the open window's buffered segments — BOUNDED
    * BY `cap` TOKENS at any corpus size and any history, the
    * bounded-state requirement every twin in this file meets. Each
    * micro-batch lays out in the batch operator's md5(doc_id) order
    * inside the cursor task (bounded by the trigger size).
    *
    * Batch ≡ stream: feeding batches B0, B1, … yields exactly the
    * closed (`is_partial = false`) windows of the batch chain
    * `packExamples(B0)` → `packExamplesIncremental(B1)` → … — pinned
    * in graft.StreamingWindowSpec.
    *
    * LIBRARY ENTRY POINT. */
  def packWindows(docs: Dataset[(Long, Seq[String])], cap: Long)
      : Dataset[(Long, Long, Long, String, String, String, Boolean)] = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val session = docs.sparkSession
    import session.implicits._
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: Int, values: Iterator[(Long, Seq[String])],
         state: GroupState[(Long, Seq[(Long, Long, Seq[String])])]) =>
          var (chunk, open) = state.getOption.getOrElse(
            (0L, Seq.empty[(Long, Long, Seq[String])]))
          var fill = open.map(_._3.size.toLong).sum
          val out = Vector.newBuilder[
            (Long, Long, Long, String, String, String, Boolean)]
          def close(): Unit = {
            out += ((chunk, open.size.toLong, cap,
              open.map(_._1).mkString(","),
              open.map(_._2).mkString(","),
              open.flatMap(_._3).mkString(" "), false))
            chunk += 1; open = Seq.empty; fill = 0L
          }
          values.toVector
            .sortBy { case (id, _) => (md5hex(id.toString), id) }
            .foreach { case (id, toks) =>
              var pos = 0
              while (pos < toks.length) {
                val take = math.min(cap - fill, (toks.length - pos).toLong)
                  .toInt
                open :+= ((id, fill, toks.slice(pos, pos + take)))
                fill += take; pos += take
                if (fill == cap) close()
              }
            }
          state.update((chunk, open))
          out.result().iterator
      }
  }

  def packAssignments(docs: Dataset[(Long, Long)],
      cap: Double): Dataset[(Long, Long, Long)] = {
    require(cap > 0, s"cap must be > 0, got $cap")
    val session = docs.sparkSession
    import session.implicits._
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: Int, values: Iterator[(Long, Long)],
         state: GroupState[Long]) =>
          var total = state.getOption.getOrElse(0L)
          val out = values.toVector
            .sortBy { case (id, _) => (md5hex(id.toString), id) }
            .map { case (id, n) =>
              total += n
              (id, n, math.floor((total - n) / cap).toLong)
            }
          state.update(total)
          out.iterator
      }
  }

  /** Streaming twin of
    * [[graft.operators.PipelineOps.epochAllocation]] — the live
    * data-constrained allocation table: per trigger, the running
    * per-source (docs, tokens) totals re-solve the water-filling in
    * closed form and emit the CURRENT `(source, n_docs, tok_total,
    * epochs, full_copies, frac_cut)` rows, bit-identical to the batch
    * operator over everything delivered so far (the
    * [[temperatureMixtureRates]] pattern: O(|sources|) state, a
    * per-partition pre-sum feeding one single-key fold, driver-sized
    * math mirrored term-for-term — same pow, same decimal-6 summation
    * of the weights, same r4/floor renderings). Batch ≡ stream parity
    * is pinned in graft.StreamingWindowSpec. */
  def epochAllocationRates(docs: Dataset[(String, Long)],
      budgetTokens: Long, maxEpochs: Double, alpha: Double = 0.5)
      : Dataset[(String, Long, Long, Double, Long, Long)] = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    require(maxEpochs > 0, s"maxEpochs must be > 0, got $maxEpochs")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val session = docs.sparkSession
    import session.implicits._
    val compacted = docs.mapPartitions { it =>
      val m = collection.mutable.HashMap.empty[String, (Long, Long)]
      it.foreach { case (s, n) =>
        val (d0, t0) = m.getOrElse(s, (0L, 0L))
        m(s) = (d0 + 1L, t0 + n)
      }
      m.iterator.map { case (s, (d, t)) => (s, d, t) }
    }
    compacted.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (_: Int, values: Iterator[(String, Long, Long)],
         state: GroupState[Map[String, (Long, Long)]]) =>
          var totals = state.getOption
            .getOrElse(Map.empty[String, (Long, Long)])
          values.foreach { case (s, d, t) =>
            val (d0, t0) = totals.getOrElse(s, (0L, 0L))
            totals = totals.updated(s, (d0 + d, t0 + t))
          }
          state.update(totals)
          // the batch operator's water-filling, term-for-term in scala
          val per = totals.toSeq.collect {
            case (src, (nd, tok)) if tok > 0 =>
              val m = tok.toDouble
              val w = math.pow(m, alpha)
              (src, nd, tok, m, w, maxEpochs * m / w)
          }.sortBy { case (src, _, _, _, _, t) => (t, src) }
          def dec6(x: Double): java.math.BigDecimal =
            java.math.BigDecimal.valueOf(x)
              .setScale(6, java.math.RoundingMode.HALF_UP)
          val tokAll = per.map(_._3).sum
          val wAll = per.map(p => dec6(p._5))
            .reduceOption(_.add(_))
            .map(_.doubleValue()).getOrElse(0.0d)
          val b = budgetTokens.toDouble
          // candidate rk per sorted row (prefix sums mirror the batch's
          // decimal-accumulated cw); the k=0 segment is B / w_all
          var cm = 0L
          var cwDec = java.math.BigDecimal.ZERO
          val cands = per.zipWithIndex.map { case (p, i) =>
            cm += p._3
            cwDec = cwDec.add(dec6(p._5))
            val cw = cwDec.doubleValue()
            val rk = if (wAll - cw > 0d)
              Some((b - maxEpochs * cm) / (wAll - cw)) else None
            val nt = if (i + 1 < per.length) Some(per(i + 1)._6) else None
            (p._6, rk, nt)
          }
          val rCap = cands.collect {
            case (t, Some(rk), nt) if t <= rk && nt.forall(rk < _) => rk
          }.reduceOption((a: Double, b: Double) => math.min(a, b))
          val rFree = per.headOption.collect {
            case h if b / wAll < h._6 => b / wAll
          }
          // deterministic fallback mirroring the batch twin (ADVICE
          // r13): a boundary tie matching no segment clamps to the rk
          // of the highest-breakpoint row with t <= rk, then to r0 —
          // never a NoSuchElementException killing the stream.
          // max by (t, rk) — the EXACT mirror of the batch twin's
          // max(struct(t, rk)).getField("rk") (ADVICE r14): on a t tie
          // the max rk wins, not whichever source sorted last.
          val rClamp = cands.collect {
            case (t, Some(rk), _) if t <= rk => (t, rk)
          }.maxByOption { case (t, rk) => (t, rk) }.map(_._2)
          val r = rFree.orElse(rCap).orElse(rClamp).getOrElse(b / wAll)
          per.sortBy(_._1).iterator.map {
            case (src, nd, tok, m, w, _) =>
              val e =
                if (b >= maxEpochs * tokAll.toDouble) maxEpochs
                else math.min(maxEpochs, r * w / m)
              val epochs = math.floor(e * 10000d + 0.5d) / 10000d
              val full = math.floor(e).toLong
              val frac = math.floor((e - math.floor(e)) * 10000d).toLong
              (src, nd, tok, epochs, full, frac)
          }
      }
  }
}
