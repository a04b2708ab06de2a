package graft

import graft.streaming._
import graft.streaming.Processing._

/** Seek scenarios over the injection harness — mirrors
  * `/root/reference/test/tests/inject.ts:279-443` (forward skip, backward
  * replay, out-of-range clamping per offsetReset, logical aliases). */
class SeekSpec extends SparkSpec {

  private def newItf(offsetReset: String = "earliest"): (Task, AssignmentTestInterface) = {
    val task = new Task("seek-group")
    val src = task.source("events", offsetReset)
    task.processor(src)(_ => Seq((m, _) => m.asInstanceOf[KMessage].value))
    (task, task.inject(spark, "events", 0))
  }

  test("forward seek skips pending messages below the target (inject.ts:281-308)") {
    val (task, itf) = newItf()
    Seq("a", "b", "c", "d", "e").foreach(itf.inject)
    itf.seek(3L)
    itf.await()
    assert(itf.processedOffsets == Seq(3L, 4L))
    assert(itf.processingResults == Seq("d", "e"))
    task.stop()
  }

  test("backward seek replays processed messages from the retained log (inject.ts:310-340)") {
    val (task, itf) = newItf()
    Seq("a", "b", "c").foreach(itf.inject)
    itf.await()
    itf.seek(1L)
    itf.await()
    assert(itf.processedOffsets == Seq(0L, 1L, 2L, 1L, 2L))
    assert(itf.processingResults == Seq("a", "b", "c", "b", "c"))
    task.stop()
  }

  test("out-of-range seek clamps to low when offsetReset=earliest (inject.ts:342-380)") {
    val (task, itf) = newItf("earliest")
    Seq("a", "b").foreach(itf.inject)
    itf.await()
    itf.seek(999L)
    itf.await()
    assert(itf.processingResults == Seq("a", "b", "a", "b"))
    task.stop()
  }

  test("out-of-range seek clamps to high when offsetReset=latest (inject.ts:342-380)") {
    val (task, itf) = newItf("latest")
    Seq("a", "b", "c").foreach(itf.inject)
    itf.seek(999L) // clamp to high: everything pending is skipped
    itf.await()
    assert(itf.processingResults.isEmpty)
    // new traffic after the seek flows normally
    itf.inject("d")
    itf.await()
    assert(itf.processingResults == Seq("d"))
    task.stop()
  }

  test("logical seek resolves the reference's aliases (offsets.ts:1-39, inject.ts:410-442)") {
    val (task, itf) = newItf()
    Seq("a", "b").foreach(itf.inject)
    itf.await()
    itf.seek("beginning") // alias of earliest
    itf.await()
    assert(itf.processingResults == Seq("a", "b", "a", "b"))
    itf.seek("end") // alias of latest: nothing replays
    itf.await()
    assert(itf.processingResults == Seq("a", "b", "a", "b"))
    assertThrows[IllegalArgumentException](itf.seek("sideways"))
    task.stop()
  }
}
