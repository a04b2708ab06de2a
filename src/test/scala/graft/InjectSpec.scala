package graft

import org.apache.spark.sql.functions.{col, struct, transform}
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.streaming._
import graft.streaming.Processing._

/** The injection-harness suite — mirrors the reference's most-tested
  * surface: `/root/reference/test/tests/inject.ts` (612 lines) and
  * `test/tests/processors.ts`, over the MemoryStream-backed
  * [[AssignmentTestInterface]].
  */
class InjectSpec extends SparkSpec {

  private def newTask(topic: String = "events")(
      setups: ProcessorSetup*): Task = {
    val task = new Task("test-group")
    val src = task.source(topic, "earliest")
    setups.foreach(st => task.processor(src)(st))
    task
  }

  test("source dedups by name and rejects conflicting offsetReset (task.ts:52-73)") {
    val task = new Task("g")
    val a = task.source("t", "earliest")
    assert(task.source("t", "earliest") eq a)
    assertThrows[IllegalArgumentException](task.source("t", "latest"))
  }

  test("processor rejects a source from another task (task.ts:75-84)") {
    val t1 = new Task("g1"); val t2 = new Task("g2")
    val foreign = t2.source("t")
    assertThrows[IllegalArgumentException] {
      t1.processor(foreign)(_ => Seq((m, _) => m))
    }
  }

  test("inject requires a declared source (task.ts:92-96)") {
    val task = new Task("g")
    assertThrows[IllegalArgumentException](task.inject(spark, "nope", 0))
  }

  test("inject assigns monotonic offsets and processes in order (inject.ts:23-129)") {
    val task = newTask()(_ => Seq((m, _) => m.asInstanceOf[KMessage].value))
    val itf = task.inject(spark, "events", 0)
    val m1 = itf.inject("a"); val m2 = itf.inject("b"); val m3 = itf.inject("c")
    assert(Seq(m1.offset, m2.offset, m3.offset) == Seq(0L, 1L, 2L))
    itf.await()
    assert(itf.processingResults == Seq("a", "b", "c"))
    assert(itf.processedOffsets == Seq(0L, 1L, 2L))
    task.stop()
  }

  test("explicit offsets may only move forward (local.ts:80-82)") {
    val task = newTask()(_ => Seq((m, _) => m))
    val itf = task.inject(spark, "events", 0)
    itf.inject(KMessage("events", 0, 5L, null, "x", 0L))
    assertThrows[IllegalArgumentException] {
      itf.inject(KMessage("events", 0, 3L, null, "y", 0L))
    }
    task.stop()
  }

  test("processor chain folds sequentially, depth-first (processors.ts:24-69)") {
    val task = newTask()(
      _ => Seq(
        (m, _) => m.asInstanceOf[KMessage].value.toInt,
        (v, _) => v.asInstanceOf[Int] * 2),
      _ => Seq((v, _) => v.asInstanceOf[Int] + 1))
    val itf = task.inject(spark, "events", 0)
    itf.inject("10"); itf.inject("20")
    itf.await()
    assert(itf.processingResults == Seq("21", "41"))
    task.stop()
  }

  test("setup runs once per assignment and can return many processors (processors.ts:36-44)") {
    @volatile var setupRuns = 0
    val task = newTask() { info =>
      setupRuns += 1
      assert(info.topic == "events" && info.partition == 3 && info.group == "test-group")
      Seq((m, _) => m.asInstanceOf[KMessage].value, (v, _) => v.toString.toUpperCase)
    }
    val itf = task.inject(spark, "events", 3)
    itf.inject("x"); itf.inject("y"); itf.await()
    assert(setupRuns == 1)
    assert(itf.processingResults == Seq("X", "Y"))
    task.stop()
  }

  test("context exposes message metadata and toString (processors.ts:71-125,215-238)") {
    val task = newTask()(_ => Seq((_, ctx) =>
      s"${ctx.topic}|${ctx.partition}|${ctx.offset}|${ctx.group}|${ctx.toString}"))
    val itf = task.inject(spark, "events", 7)
    itf.inject("x")
    itf.await()
    assert(itf.processingResults == Seq("events|7|0|test-group|events-7@0"))
    task.stop()
  }

  test("abandon drops the message, skips the chain, offset still processed (processors.ts:127-158)") {
    val task = newTask()(
      _ => Seq((m, ctx) => {
        val v = m.asInstanceOf[KMessage].value
        if (v == "drop") ctx.abandon else v
      }),
      _ => Seq((v, _) => { assert(v != Abandon); v.toString + "!" }))
    val itf = task.inject(spark, "events", 0)
    itf.inject("keep"); itf.inject("drop"); itf.inject("also")
    itf.await()
    assert(itf.processingResults == Seq("keep!", "also!"))
    assert(itf.processedOffsets == Seq(0L, 1L, 2L))
    task.stop()
  }

  test("commit records offset+1 with metadata (processors.ts:160-196, inject.ts:445-517)") {
    val task = newTask()(_ => Seq((m, ctx) => {
      val km = m.asInstanceOf[KMessage]
      if (km.value == "mark") ctx.commit(s"at=${km.offset}")
      km.value
    }))
    val itf = task.inject(spark, "events", 0)
    assert(itf.committed() == -1L)
    itf.inject("a"); itf.inject("mark"); itf.inject("b")
    itf.await()
    assert(itf.committedOffsets == Seq(CommitReq(2L, Some("at=1"))))
    assert(itf.committed() == 2L)
    task.stop()
  }

  test("headerMap dedups repeated Kafka header keys keep-last; headerEntries round-trips") {
    val s = spark
    import s.implicits._
    // Kafka legally delivers REPEATED header keys — the read edge must
    // dedup (keep-last), not throw DUPLICATED_MAP_KEY
    val raw = Seq(
      (1L, Seq(("trace", "a"), ("kind", "x"), ("trace", "b"))),
      (2L, Seq.empty[(String, String)])).toDF("id", "hs")
      .select(col("id"), transform(col("hs"), h =>
        struct(h.getField("_1").as("key"),
          h.getField("_2").cast("binary").as("value"))).as("headers"))
    val m = raw.select(col("id"),
      graft.streaming.Task.headerMap(col("headers")).as("hm"))
      .collect().map(r => r.getLong(0) -> r.getMap[String, String](1).toMap).toMap
    assert(m(1L) == Map("trace" -> "b", "kind" -> "x"), s"got $m")
    assert(m(2L) == Map.empty[String, String])
    // produce edge: string map → array<struct<key,value:binary>> and back
    val rt = raw.select(col("id"), graft.streaming.Task.headerEntries(
      graft.streaming.Task.headerMap(col("headers"))).as("es"))
      .select(col("id"), graft.streaming.Task.headerMap(col("es")).as("hm"))
      .collect().map(r => r.getLong(0) -> r.getMap[String, String](1).toMap).toMap
    assert(rt(1L) == Map("trace" -> "b", "kind" -> "x"), s"round trip: $rt")
  }

  test("headers ride the message through inject, processing, and send-loopback (streams.ts:15)") {
    val task = newTask()(_ => Seq((m, ctx) => {
      val km = m.asInstanceOf[KMessage]
      if (km.headers.get("kind").contains("trigger") &&
          !km.headers.contains("hop"))
        ctx.send(NewMessage("events", "relayed", partition = 0,
          headers = km.headers + ("hop" -> "1")))
      km.headers.getOrElse("kind", "none")
    }))
    val itf = task.inject(spark, "events", 0)
    itf.inject(KMessage("events", 0, -1L, null, "x", 0L,
      headers = Map("kind" -> "trigger", "src" -> "crawler")))
    itf.await()
    // the processor read the injected headers...
    assert(itf.processingResults.headOption.contains("trigger"))
    // ...the produced message carries the augmented headers...
    assert(itf.producedMessages.head.headers ==
      Map("kind" -> "trigger", "src" -> "crawler", "hop" -> "1"))
    // ...and the loopback re-entered the log WITH its headers intact
    assert(itf.processingResults == Seq("trigger", "trigger"))
    task.stop()
  }

  test("send collects produced messages; same-partition sends loop back (inject.ts:238-277, local.ts:183-201)") {
    val task = newTask()(_ => Seq((m, ctx) => {
      val km = m.asInstanceOf[KMessage]
      if (km.value == "fanout") {
        ctx.send(NewMessage("events-out", "derived"))
        ctx.send(NewMessage("events", "echoed", partition = 0))
      }
      km.value
    }))
    val itf = task.inject(spark, "events", 0)
    itf.inject("fanout")
    itf.await()
    assert(itf.producedMessages ==
      Seq(NewMessage("events-out", "derived"), NewMessage("events", "echoed", 0)))
    // the loopback message re-entered the log and was processed
    assert(itf.processingResults == Seq("fanout", "echoed"))
    assert(itf.processedOffsets == Seq(0L, 1L))
    task.stop()
  }

  test("watermarks track {low, high=last+1}; empty log → both low (inject.ts:151-202)") {
    val task = newTask()(_ => Seq((m, _) => m))
    val itf = task.inject(spark, "events", 0)
    assert(itf.watermarks() == Watermarks(0L, 0L))
    assert(itf.isEmpty())
    itf.inject("a"); itf.inject("b")
    assert(itf.watermarks() == Watermarks(0L, 2L))
    assert(!itf.isEmpty())
    task.stop()
  }

  test("lowOffset seeds both the log and the watermarks (inject.ts initialState)") {
    val task = newTask()(_ => Seq((m, _) => m.asInstanceOf[KMessage].value))
    val itf = task.inject(spark, "events", 0,
      initial = Seq(KMessage("events", 0, -1L, null, "seed1", 0L),
        KMessage("events", 0, -1L, null, "seed2", 0L)),
      lowOffset = 100L)
    assert(itf.initialMessages.map(_.offset) == Seq(100L, 101L))
    itf.await()
    assert(itf.processingResults == Seq("seed1", "seed2"))
    assert(itf.watermarks() == Watermarks(100L, 102L))
    task.stop()
  }

  test("caughtUp once processed reaches the high watermark (inject.ts:204-236)") {
    val task = newTask()(_ => Seq((m, _) => m))
    val itf = task.inject(spark, "events", 0)
    assert(itf.caughtUp()) // empty
    itf.inject("a")
    assert(!itf.caughtUp())
    itf.await()
    assert(itf.caughtUp())
    task.stop()
  }

  test("end() drains then stops (inject.ts:131-149)") {
    val task = newTask()(_ => Seq((m, _) => m.asInstanceOf[KMessage].value))
    val itf = task.inject(spark, "events", 0)
    itf.inject("last")
    itf.end()
    assert(itf.processingResults == Seq("last"))
    task.stop()
  }

  test("P2: processor closure state survives across micro-batches (introduction.ts:12)") {
    val task = newTask() { _ =>
      var count = 0 // the reference's store-in-closure pattern
      Seq((_, _) => { count += 1; count.toString })
    }
    val itf = task.inject(spark, "events", 0)
    itf.inject("a"); itf.await() // batch 1
    itf.inject("b"); itf.await() // batch 2 — same processor instance
    itf.inject("c"); itf.await() // batch 3
    assert(itf.processingResults == Seq("1", "2", "3"),
      "closure state must persist across micro-batches")
    task.stop()
  }

  test("P7: a throwing processor fails the streaming query (task.ts:247-278)") {
    val task = newTask()(_ => Seq((m, _) => {
      if (m.asInstanceOf[KMessage].value == "boom")
        throw new RuntimeException("processor exploded")
      m.asInstanceOf[KMessage].value
    }))
    val itf = task.inject(spark, "events", 0)
    itf.inject("ok"); itf.inject("boom")
    val e = intercept[StreamingQueryException](itf.await())
    assert(e.getMessage.contains("processor exploded") ||
      Option(e.getCause).exists(_.getMessage.contains("processor exploded")))
    task.stop()
  }

  test("P7: injected stream errors propagate (inject.ts:121-128, local.ts:103-105)") {
    val task = newTask()(_ => Seq((m, _) => m))
    val itf = task.inject(spark, "events", 0)
    itf.injectError("broken upstream")
    val e = intercept[StreamingQueryException](itf.await())
    assert(e.toString.contains("injected stream error") ||
      Option(e.getCause).exists(_.toString.contains("injected stream error")))
    task.stop()
  }

  test("four assignments, interleaved injection: isolation and per-partition order hold") {
    val task = newTask()(_ => Seq((m, _) => m.asInstanceOf[KMessage].value))
    val itfs = task.inject(spark, (0 until 4).map("events" -> _))
    // round-robin interleave 4 × 50 messages across the assignments
    for (i <- 0 until 50; p <- 0 until 4) itfs(p).inject(s"p$p-m$i")
    itfs.foreach(_.await())
    itfs.zipWithIndex.foreach { case (itf, p) =>
      assert(itf.processedOffsets == (0L until 50L),
        s"partition $p processed out of order or lost messages")
      assert(itf.processingResults == (0 until 50).map(i => s"p$p-m$i"),
        s"partition $p results leaked across assignments")
      assert(itf.caughtUp())
    }
    task.stop()
  }

  test("multi-assignment inject returns one context per assignment (task.ts:99-104)") {
    val task = newTask()(_ => Seq((m, _) => m.asInstanceOf[KMessage].value))
    val itfs = task.inject(spark, Seq("events" -> 0, "events" -> 1))
    itfs(0).inject("p0"); itfs(1).inject("p1")
    itfs.foreach(_.await())
    assert(itfs(0).processingResults == Seq("p0"))
    assert(itfs(1).processingResults == Seq("p1"))
    task.stop()
  }

  test("scale-out mid-stream: new assignment arrives, existing one is undisturbed " +
      "(replacement for the reference's rebalance, task.ts:280-338)") {
    // The reference demonstrates REBALANCE: a second consumer joins the
    // group, partitions move, sessions end and restart. Here the driver
    // owns assignment (L2 n/a by design) — the replacement claim is that
    // scaling out means MORE assignments appearing, with existing ones
    // untouched: no session end, no replay, no re-setup, offsets and
    // closure state continuing unbroken. This test observes exactly that.
    val setupCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val task = newTask() { info =>
      setupCount.incrementAndGet()
      // per-assignment running count — would reset if the assignment's
      // session were torn down and re-setup by a rebalance
      var n = 0
      Seq((m, _) => { n += 1; s"${info.partition}:$n:${m.asInstanceOf[KMessage].value}" })
    }
    val itf0 = task.inject(spark, "events", 0)
    itf0.inject("a"); itf0.inject("b")
    itf0.await()
    assert(setupCount.get == 1)
    assert(itf0.processingResults == Seq("0:1:a", "0:2:b"))

    // scale-out: a second assignment joins mid-stream
    val itf1 = task.inject(spark, "events", 1)
    assert(setupCount.get == 2, "setup runs once for the NEW assignment only")
    itf1.inject("x")
    itf0.inject("c") // existing assignment keeps processing concurrently
    itf0.await(); itf1.await()
    // new assignment: fresh state, fresh offsets from its own log start
    assert(itf1.processingResults == Seq("1:1:x"))
    assert(itf1.processedOffsets == Seq(0L))
    // existing assignment: state and offsets continued — no reset/replay
    assert(itf0.processingResults == Seq("0:1:a", "0:2:b", "0:3:c"))
    assert(itf0.processedOffsets == Seq(0L, 1L, 2L))
    assert(itf0.caughtUp() && itf1.caughtUp())
    task.stop()
  }
}
