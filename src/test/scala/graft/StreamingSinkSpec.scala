package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{StreamingOps, StreamingSink}
import graft.streaming.StreamingOps.Event

/** The exactly-once sink across a real stop/restart: the second query
  * resumes from the checkpoint, so committed batches are not replayed
  * and the output contains every input row exactly once.
  */
class StreamingSinkSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("idempotent parquet sink survives restart without duplicating batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val out = Files.createTempDirectory("graft_sink_out").toString
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString

    val input = MemoryStream[Event]
    input.addData(Event(1, ts(10), 1, "view", 0), Event(2, ts(11), 1, "click", 0))
    val q1 = StreamingSink.idempotentParquet(input.toDF(), out, ckpt).start()
    q1.awaitTermination()

    // restart from the same checkpoint with more data: batch 0 must not rerun
    input.addData(Event(3, ts(12), 2, "view", 0))
    val q2 = StreamingSink.idempotentParquet(input.toDF(), out, ckpt).start()
    q2.awaitTermination()

    val result = spark.read.parquet(out)
    assert(result.count() == 3)
    assert(result.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // batch dirs are the partition layout
    assert(new java.io.File(out).listFiles().count(_.getName.startsWith("batch_id=")) >= 1)
  }

  test("a stale marker from a DIFFERENT checkpoint does not suppress the write") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val out = Files.createTempDirectory("graft_sink_out2").toString

    // run 1: checkpoint A commits batch 0 with events 1-2
    val inA = MemoryStream[Event]
    inA.addData(Event(1, ts(10), 1, "view", 0), Event(2, ts(11), 1, "click", 0))
    val ckptA = Files.createTempDirectory("graft_sink_ckptA").toString
    StreamingSink.idempotentParquet(inA.toDF(), out, ckptA).start().awaitTermination()

    // run 2: FRESH checkpoint B reuses the same outDir — its batch 0 holds
    // DIFFERENT data; the old run's commit marker must not swallow it
    val inB = MemoryStream[Event]
    inB.addData(Event(7, ts(20), 3, "view", 0))
    val ckptB = Files.createTempDirectory("graft_sink_ckptB").toString
    StreamingSink.idempotentParquet(inB.toDF(), out, ckptB).start().awaitTermination()

    val ids = spark.read.parquet(out).select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(7L), s"batch 0 must be REWRITTEN by the new run, got $ids")
  }
}
