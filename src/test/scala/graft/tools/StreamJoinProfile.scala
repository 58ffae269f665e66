package graft.tools

import java.sql.Timestamp
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

/** Scratch profiling harness (test scope, not shipped): WHERE does the
  * interval stream-stream join's wall time go? StreamBench publishes
  * ~1.9k rows/s for the join vs ~10.5k for dedup; this breaks a run
  * down by StreamingQueryProgress.durationMs phase and the state
  * operators' update/removal/commit components, per topology.
  */
object StreamJoinProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nChunks = args.headOption.map(_.toInt).getOrElse(20)
    val changelog = sys.env.getOrElse("SJP_CHANGELOG", "false")
    val spark: SparkSession =
      graft.core.GraftSession
        .builder(master = s"local[$cpus]", shufflePartitions = cpus)
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", changelog)
        .getOrCreate()
    println(s"changelogCheckpointing=$changelog cpus=$cpus")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events: Array[Event] = graft.sources.Tables
      .events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    def chunked[T](xs: Array[T]): Seq[Seq[T]] = {
      val size = math.max(1, math.ceil(xs.length.toDouble / nChunks).toInt)
      xs.grouped(size).map(_.toSeq).toSeq
    }

    def noopSink(df: DataFrame): StreamingQuery =
      df.writeStream
        .format("noop")
        .outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("graft_sjp_ckpt").toString)
        .start()

    def report(name: String, q: StreamingQuery, sec: Double, rowsIn: Long): Unit = {
      val progs = q.recentProgress
      val withRows = progs.filter(_.numInputRows > 0)
      println(f"== $name: $sec%.2fs rows_in=$rowsIn (${rowsIn / sec}%.0f rows/s) batches=${progs.length} (with-rows ${withRows.length})")
      val phases = Seq("triggerExecution", "queryPlanning", "getBatch", "latestOffset", "addBatch", "walCommit", "commitOffsets")
      phases.foreach { ph =>
        val tot = progs.flatMap(p => Option(p.durationMs.get(ph)).map(_.toLong)).sum
        println(f"   $ph%-18s total=${tot / 1000.0}%7.2fs")
      }
      // state operator components (ms, summed across batches/operators)
      val ops = progs.flatMap(p => Option(p.stateOperators).toSeq.flatten)
      if (ops.nonEmpty) {
        val upd = ops.map(_.allUpdatesTimeMs).sum
        val rem = ops.map(_.allRemovalsTimeMs).sum
        val com = ops.map(_.commitTimeMs).sum
        println(f"   state: updates=${upd / 1000.0}%.2fs removals=${rem / 1000.0}%.2fs commit=${com / 1000.0}%.2fs peakRows=${ops.map(_.numRowsTotal).max}")
        val cm = ops.flatMap(_.customMetrics.entrySet().toArray.map(_.asInstanceOf[java.util.Map.Entry[String, java.lang.Long]]))
        cm.groupBy(_.getKey).map { case (k, es) => k -> es.map(_.getValue.longValue()).sum }
          .toSeq.sortBy(-_._2).take(8)
          .foreach { case (k, v) => println(f"   rocksdb: $k%-42s $v%12d") }
      }
    }

    // dedup leg (the fast sibling, for contrast)
    locally {
      val in = MemoryStream[Event]
      val t0 = System.nanoTime()
      val q = noopSink(StreamingOps.firstWinsDedup(in.toDS(), windowSec = 900).toDF())
      val chunks = chunked(events)
      chunks.foreach { c => in.addData(c); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      report("first_wins_dedup", q, sec, chunks.map(_.size.toLong).sum)
      q.stop()
    }

    // interval join leg (the slow one)
    locally {
      val clicks = MemoryStream[(Long, Long, Timestamp)]
      val views = MemoryStream[(Long, Long, Timestamp)]
      val clickChunks = chunked(events.collect { case e if e.event_type == "click" => (e.event_id, e.user_id, e.ts) })
      val viewChunks = chunked(events.collect { case e if e.event_type == "view" => (e.event_id, e.user_id, e.ts) })
      val t0 = System.nanoTime()
      val q = noopSink(
        StreamingOps.clickstreamLeftJoin(
          clicks.toDS().toDF("click_id", "user_id", "click_ts"),
          views.toDS().toDF("v_id", "v_user", "v_ts"),
          joinWindowSec = 600
        )
      )
      clickChunks.zipAll(viewChunks, Seq.empty, Seq.empty).foreach { case (c, v) =>
        if (c.nonEmpty) clicks.addData(c)
        if (v.nonEmpty) views.addData(v)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      report("interval_left_join", q, sec, (clickChunks ++ viewChunks).map(_.size.toLong).sum)
      q.stop()
    }
    spark.stop()
  }
}
