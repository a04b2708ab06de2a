package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming._
import graft.streaming.Processing._

/** L1 `Task.start` batch path (reference `test/tests/task.ts:107-401`).
  *
  * The sandbox has no Kafka broker or spark-sql-kafka connector, so
  * `start` itself cannot run — but its `foreachBatch` body is the factored
  * [[Task.processBatch]] + [[Task.producedFrame]], and this suite drives
  * THAT exact closure through a MemoryStream streaming query with the
  * processor chain built by `Task.processorsFor` (start's own
  * construction). The only lines left unexecuted are the Kafka
  * reader/producer options themselves.
  *
  * The input batch arrives SHUFFLED across partitions and offsets — the
  * repartition(partition) + sortWithinPartitions(partition, offset) in the
  * batch body must restore per-partition offset order, proven by a
  * running-concatenation processor whose output for each message depends
  * on every previously processed message of its partition. */
class TaskStartSpec extends SparkSpec {

  test("start's micro-batch closure restores order, runs the chain, applies effects") {
    val s = spark
    implicit val kEnc = org.apache.spark.sql.Encoders.product[KMessage]

    val task = new Task("start-group")
    val src = task.source("in-topic", "earliest")
    task.processor(src) { info =>
      assert(info.topic == "in-topic" && info.group == "start-group")
      // keyed per partition: start's setup runs once for the whole topic
      // (partition = -1), so closure state is per-task, not per-partition;
      // keying by ctx.partition makes the order proof robust to however
      // the shuffle groups the two partitions into tasks.
      val seen = mutable.Map.empty[Int, StringBuilder]
      Seq(
        (m: Any, ctx: ProcessingContext) => {
          val msg = m.asInstanceOf[KMessage]
          if (msg.value == "drop") ctx.abandon
          else seen.getOrElseUpdate(ctx.partition, new StringBuilder)
            .append(msg.value).toString
        },
        (r: Any, ctx: ProcessingContext) => {
          ctx.commit(s"m@${ctx.offset}")
          ctx.send(NewMessage("out-topic", r.toString,
            key = s"${ctx.partition}:${ctx.offset}",
            headers = Map("h" -> "v")))
          r
        })
    }

    val msgs = Seq(
      KMessage("in-topic", 0, 0, "k0", "a", 1000L),
      KMessage("in-topic", 0, 1, "k1", "b", 1001L),
      KMessage("in-topic", 0, 2, "k2", "drop", 1002L),
      KMessage("in-topic", 0, 3, "k3", "c", 1003L),
      KMessage("in-topic", 0, 4, "k4", "d", 1004L),
      KMessage("in-topic", 1, 10, "k5", "x", 1010L),
      KMessage("in-topic", 1, 11, "k6", "y", 1011L),
      KMessage("in-topic", 1, 12, "k7", "z", 1012L))

    val in = MemoryStream[KMessage](s)
    val procs = task.processorsFor(src)
    val processed = mutable.Buffer.empty[Processed]
    val produced = mutable.Buffer.empty[Row]
    // foreachBatch runs driver-side: plain local buffers are safe.
    val q = in.toDS().writeStream
      .foreachBatch { (batch: Dataset[KMessage], _: Long) =>
        val p = Task.processBatch(task.group, procs)(batch)
        processed ++= p.collect()
        produced ++= Task.producedFrame(p).collect()
        ()
      }
      .start()
    try {
      in.addData(new Random(7).shuffle(msgs))
      q.processAllAvailable()
    } finally q.stop()

    // Every message yields a Processed row, in restored per-partition order.
    assert(processed.size == 8)
    val p0 = processed.filter(_.partition == 0).sortBy(_.offset)
    val p1 = processed.filter(_.partition == 1).sortBy(_.offset)
    // Running concat = proof each message was processed after exactly its
    // per-partition predecessors (offset order), despite shuffled input.
    assert(p0.map(_.result) == Seq("a", "ab", null, "abc", "abcd"))
    assert(p1.map(_.result) == Seq("x", "xy", "xyz"))
    // P4: abandon drops the message, skips the rest of the chain, but the
    // offset still counts as processed.
    val dropped = processed.find(_.offset == 2).get
    assert(dropped.abandoned && dropped.commits.isEmpty && dropped.produced.isEmpty)
    // O1: commit(offset + 1) + metadata carried on every non-abandoned row.
    processed.filterNot(_.abandoned).foreach { r =>
      assert(r.commits == Seq(CommitReq(r.offset + 1, Some(s"m@${r.offset}"))))
    }
    // Produce projection: 7 rows (abandoned skipped) in producer shape,
    // headers as array<struct<key, value:binary>>.
    assert(produced.size == 7)
    val byKey = produced.map(r => r.getString(1) -> r).toMap
    assert(byKey("0:4").getString(0) == "out-topic")
    assert(byKey("0:4").getString(2) == "abcd")
    assert(byKey("1:12").getString(2) == "xyz")
    val hdr = byKey("0:0").getSeq[Row](3)
    assert(hdr.size == 1 && hdr.head.getString(0) == "h" &&
      new String(hdr.head.getAs[Array[Byte]](1), "UTF-8") == "v")
  }
}
