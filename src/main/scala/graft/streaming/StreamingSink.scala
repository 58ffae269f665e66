package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Exactly-once file sink: `foreachBatch` writing each micro-batch to a
  * `batch_id=N` partition directory, skipping batches already marked
  * committed.
  *
  * Structured Streaming replays a failed micro-batch under the SAME
  * batchId after restart, so idempotency on batchId upgrades the
  * pipeline's at-least-once delivery (the reference's Kafka Streams
  * semantics — commit interval + redelivery,
  * Kafka.scala:85 COMMIT_INTERVAL_MS) to effective exactly-once at the
  * sink. The commit record is a marker file CONTAINING the checkpoint
  * location: batchIds are only meaningful relative to one checkpoint,
  * so a marker left by a previous run with a DIFFERENT checkpoint (same
  * outDir reused with a fresh checkpoint — different data under the
  * same batchId) does NOT suppress the write; it is overwritten.
  *
  * Paths go through the Hadoop FileSystem API, so the guard works on
  * HDFS/S3, not only the driver's local disk.
  */
object StreamingSink {

  private val Marker = "_GRAFT_COMMIT"

  def idempotentParquet(
      df: DataFrame,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val conf = batch.sparkSession.sparkContext.hadoopConfiguration
        val target = new Path(s"$outDir/batch_id=$batchId")
        val marker = new Path(target, Marker)
        val fs = target.getFileSystem(conf)
        val committed = fs.exists(marker) && {
          val in = fs.open(marker)
          try {
            val bytes = new Array[Byte](math.min(fs.getFileStatus(marker).getLen, 65536L).toInt)
            in.readFully(bytes)
            new String(bytes, StandardCharsets.UTF_8) == checkpointDir
          } finally in.close()
        }
        if (!committed) {
          batch.write.mode("overwrite").parquet(target.toString)
          val out = fs.create(marker, true)
          try out.write(checkpointDir.getBytes(StandardCharsets.UTF_8))
          finally out.close()
        }
      }
      .trigger(trigger)
}
