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
  private val Latest = "_GRAFT_LATEST"

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

  /** Exactly-once streaming APPEND into a manifest table
    * ([[graft.sources.Formats.manifestAppend]] — s17's O(delta) commit
    * protocol driven by a stream): micro-batch N commits as manifest
    * version N+1, so the table grows one immutable file-list snapshot
    * per batch and readers ([[graft.sources.Formats.readManifestTable]])
    * always see a complete prefix of the stream — never a torn batch.
    * Idempotency follows [[idempotentParquet]]'s contract: a replayed
    * batchId finds its checkpoint-scoped commit marker and skips, so
    * at-least-once redelivery never double-appends; a marker from a
    * DIFFERENT checkpoint does not suppress the write. Commit order is
    * data → manifest → pointer → marker: a crash at any point leaves
    * either the old table or the new one, and the redelivered batch
    * rewrites the same version deterministically.
    */
  def manifestAppendSink(
      df: DataFrame,
      tableDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val conf = batch.sparkSession.sparkContext.hadoopConfiguration
        val version = batchId + 1
        val marker = new Path(s"$tableDir/${Marker}_v=$version")
        val fs = marker.getFileSystem(conf)
        val committed = fs.exists(marker) && {
          val in = fs.open(marker)
          try {
            val bytes = new Array[Byte](math.min(fs.getFileStatus(marker).getLen, 65536L).toInt)
            in.readFully(bytes)
            new String(bytes, StandardCharsets.UTF_8) == checkpointDir
          } finally in.close()
        }
        if (!committed) {
          graft.sources.Formats.manifestAppend(batch.sparkSession, tableDir, batch, version)
          val out = fs.create(marker, true)
          try out.write(checkpointDir.getBytes(StandardCharsets.UTF_8))
          finally out.close()
        }
      }
      .trigger(trigger)

  /** The current version directory name recorded in the `_GRAFT_LATEST`
    * pointer, if any — versions are immutable `v=<batchId>` dirs and
    * the pointer flip is the "commit" (the lakehouse version-pointer
    * pattern on plain files).
    */
  private def latestVersion(fs: org.apache.hadoop.fs.FileSystem, tableDir: String): Option[String] = {
    val p = new Path(tableDir, Latest)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](math.min(fs.getFileStatus(p).getLen, 65536L).toInt)
        in.readFully(bytes)
        Some(new String(bytes, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** Read the upsert table's current state (empty when no version has
    * committed yet throws — callers check after the stream has run).
    */
  def upsertTable(spark: org.apache.spark.sql.SparkSession, tableDir: String): DataFrame = {
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latestVersion(fs, tableDir)
      .getOrElse(throw new IllegalStateException(s"no committed version under $tableDir"))
    spark.read.parquet(s"$tableDir/$v")
  }

  /** Time-travel read: version dirs are IMMUTABLE once the pointer has
    * moved past them, so any historical `v=<n>` stays readable forever
    * (subject to retention) — the audit/rollback/reproducibility read
    * path of the version-pointer table ([[graft.sources.Formats.s11TimeTravel]]
    * proves v1 is byte-stable after the v2 commit).
    */
  def readVersion(spark: org.apache.spark.sql.SparkSession, tableDir: String, version: Long): DataFrame =
    spark.read.parquet(s"$tableDir/v=$version")

  /** Point `_GRAFT_LATEST` at `v=<version>` — the atomic "commit" of the
    * version-pointer protocol (a one-block file create; readers see the
    * old table or the new, never a torn state).
    */
  def flipLatest(spark: org.apache.spark.sql.SparkSession, tableDir: String, version: Long): Unit = {
    val p = new Path(tableDir, Latest)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"v=$version".getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The version number the `_GRAFT_LATEST` pointer currently publishes
    * — what a reader of [[upsertTable]] will see. Throws when nothing
    * has committed yet (same contract as [[upsertTable]]).
    */
  def currentVersion(spark: org.apache.spark.sql.SparkSession, tableDir: String): Long = {
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    latestVersion(fs, tableDir)
      .map(_.stripPrefix("v=").toLong)
      .getOrElse(throw new IllegalStateException(s"no committed version under $tableDir"))
  }

  /** List the committed version numbers under the table, ascending —
    * every immutable `v=<n>` dir, whether or not the pointer has moved
    * past it.
    */
  def listVersions(spark: org.apache.spark.sql.SparkSession, tableDir: String): Seq[Long] = {
    val p = new Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .toSeq
        .map(_.getPath.getName)
        .collect { case s if s.matches("v=\\d+") => s.stripPrefix("v=").toLong }
        .sorted
  }

  /** Retention vacuum: delete every version dir EXCEPT the newest
    * `keepVersions` (which always includes the pointer's target —
    * `keepVersions >= 1` is enforced), returning the removed version
    * numbers. Kept versions stay byte-untouched (spec-asserted), so
    * time travel within the retention window keeps working; anything
    * older becomes unreadable — the storage-reclaim half of the
    * version-pointer table's contract (a 100 TB table cannot keep
    * every nightly snapshot forever). Deletion order is oldest-first
    * and each dir is independent and unreferenced by the kept ones
    * (full-copy versions here; a delta-file layout vacuums file
    * granules with the same reachability rule), so a crash mid-vacuum
    * leaves a table that is merely less reclaimed, never corrupt.
    * Idempotent: a re-run finds nothing below the retention line.
    */
  def vacuum(
      spark: org.apache.spark.sql.SparkSession,
      tableDir: String,
      keepVersions: Int
  ): Seq[Long] = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val p = new Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // retention counts back from the POINTER, not the newest dir: a
    // version past the pointer is an in-flight commit (crash between
    // data write and flip) — vacuum must neither count nor delete it
    val pointer = latestVersion(fs, tableDir).map(_.stripPrefix("v=").toLong)
    val committed = pointer match {
      case None    => Seq.empty // no commit yet — nothing is safe to expire
      case Some(v) => listVersions(spark, tableDir).filter(_ <= v)
    }
    val expired = committed.dropRight(keepVersions)
    expired.foreach(v => fs.delete(new Path(tableDir, s"v=$v"), true))
    expired
  }

  /** Streaming MERGE INTO: each micro-batch upserts into the table —
    * one row per key survives the batch (max `seqCol`, computed by the
    * native bounded-heap [[graft.plans.TopKPerKey]] with k=1, so a
    * million-row batch never sorts per key), then
    * [[graft.sources.Formats.mergeInto]] folds it into the current
    * version and the result commits as immutable `v=<batchId>` with a
    * `_GRAFT_LATEST` pointer flip. Commit order is data → pointer →
    * marker, so every replay after a crash lands safely: before the
    * pointer flip a replay recomputes from the old parent; after the
    * flip the pointer itself proves `v=<batchId>` is complete, so the
    * replay only restores the missing marker (it must NOT re-merge —
    * reading a version while overwriting it would corrupt it).
    * Idempotent on (batchId, checkpoint) like [[idempotentParquet]];
    * a tableDir belongs to ONE checkpoint lifetime (its history IS the
    * checkpoint's). Callers must make (key, seqCol) unique per batch —
    * MERGE's own precondition.
    */
  def upsertParquet(
      df: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      tableDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val conf = spark.sparkContext.hadoopConfiguration
        val table = new Path(tableDir)
        val fs = table.getFileSystem(conf)
        val target = new Path(s"$tableDir/v=$batchId")
        val marker = new Path(target, Marker)
        val committed = fs.exists(marker) && {
          val in = fs.open(marker)
          try {
            val bytes = new Array[Byte](math.min(fs.getFileStatus(marker).getLen, 65536L).toInt)
            in.readFully(bytes)
            new String(bytes, StandardCharsets.UTF_8) == checkpointDir
          } finally in.close()
        }
        if (!committed) {
          val parent = latestVersion(fs, tableDir)
          if (!parent.contains(s"v=$batchId")) {
            val keyed = graft.plans.TopKPerKey.topKPerKey(
              batch,
              keyCols,
              orderBy = Seq((seqCol, false)),
              k = 1
            )
            val merged = parent match {
              case Some(v) =>
                graft.sources.Formats.mergeInto(spark.read.parquet(s"$tableDir/$v"), keyed, keyCols)
              case None => keyed
            }
            merged.write.mode("overwrite").parquet(target.toString)
            val ptr = fs.create(new Path(table, Latest), true)
            try ptr.write(s"v=$batchId".getBytes(StandardCharsets.UTF_8))
            finally ptr.close()
          }
          // pointer already at v=<batchId>: the data write completed
          // before the flip — only the marker was lost; restore it
          val out = fs.create(marker, true)
          try out.write(checkpointDir.getBytes(StandardCharsets.UTF_8))
          finally out.close()
        }
      }
      .trigger(trigger)
}
