package graft.streaming

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
  * sink: a replayed batch overwrites its own directory and never
  * duplicates a committed one. The parquet `_SUCCESS` marker is the
  * commit record.
  */
object StreamingSink {

  def idempotentParquet(df: DataFrame, outDir: String, checkpointDir: String): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val target = s"$outDir/batch_id=$batchId"
        val committed = new java.io.File(s"$target/_SUCCESS").exists()
        if (!committed) {
          batch.write.mode("overwrite").parquet(target)
        }
      }
      .trigger(Trigger.AvailableNow())
}
