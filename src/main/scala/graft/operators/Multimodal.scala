package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing (SURVEY.md §2 c12): media as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * distributed batches.
  *
  * The Spark-side shape is real and scale-correct: binary payloads stay
  * columnar, metadata is typed, and the decode runs per-partition (the
  * Scala analogue of an Arrow-batched `mapInPandas` — one codec
  * instance per partition, streaming rows, no driver collect). The
  * codec itself is a STUB — this container has no image/audio
  * libraries — replaced by a deterministic fake that computes features
  * from the raw bytes. Swapping in a real codec touches only
  * `decodeStub`.
  */
object Multimodal {

  /** Stub-codec feature moduli and pipeline budgets — the SINGLE source
    * for both the Scala decode and the DuckDB oracle SQL (SparkEntry
    * interpolates these, so the two sides cannot drift).
    */
  val WidthSpan = 624
  val HeightSpan = 464
  val FrameSpan = 299
  val FrameBudget = 4
  val SizeBudget = 224

  case class MediaRow(doc_id: Long, fmt: String, media: Array[Byte], n_bytes: Long)

  case class MediaFeatures(
      doc_id: Long,
      fmt: String,
      width: Int,
      height: Int,
      n_frames: Int,
      brightness: Double
  )

  /** STUB decoder — deterministic fake standing in for an image/audio/
    * video codec. Real implementation would parse `media` with the
    * format's library; the signature (bytes in, typed features out) and
    * the per-partition execution are what matter for the pipeline.
    *
    * Features derive from the first 32 bits of md5(payload) — chosen
    * because any engine can recompute it, so the whole mapPartitions
    * stage is verified hash-exact against a DuckDB oracle (the one part
    * a real codec swap would change).
    *
    * ==Codec swap contract==
    * A real codec replaces EXACTLY this function: `MediaRow →
    * MediaFeatures`, total (throw only on corrupt input you intend to
    * fail the job; return a sentinel row to quarantine instead), pure
    * per-row (no cross-row state — Spark may re-execute a partition
    * after failure, so side effects must be idempotent). Expensive
    * library handles (decoder contexts, model sessions) belong in a
    * per-partition init: swap [[c12MultimodalDecode]]'s `mapPartitions`
    * body to `iter => { val codec = Codec.open(); iter.map(decode(codec,
    * _)) }` — the surrounding plan (binary column projection, partition
    * sizing, downstream schema) is unchanged. After a swap the DuckDB
    * oracle no longer reproduces the features; the gate then covers the
    * plumbing only (row count + schema via a rows-only entry), and
    * feature correctness moves to a golden-file spec beside the codec —
    * c23's explode/resize stage stays oracle-exact either way because
    * its integer math is codec-independent given (width, height,
    * n_frames).
    */
  private def decodeStub(m: MediaRow): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(m.media)
    val cs = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    MediaFeatures(
      doc_id = m.doc_id,
      fmt = m.fmt,
      width = (16 + cs % WidthSpan).toInt,
      height = (16 + (cs / 7) % HeightSpan).toInt,
      n_frames = if (m.fmt == "video") (1 + cs % FrameSpan).toInt else 1,
      brightness = (cs % 256).toDouble / 255.0
    )
  }

  /** C23: frame sampling + resize planning — the remaining multimodal
    * ops from the pipeline surface (decode and feature-extract are
    * c12). For each video, sample up to 4 evenly spaced frame indices
    * (explode — one row per sampled frame, the batch shape a real
    * frame extractor feeds downstream) and compute the
    * aspect-preserving resize of the decoded dimensions into a 224×224
    * budget in pure integer arithmetic. Per-frame scores come from the
    * same md5 stub codec, so the entire explode/resize stage is
    * oracle-exact; a real decoder replaces only the score expression.
    */
  def c23FrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val cnt = least(col("n_frames"), lit(FrameBudget))
    val longSide = greatest(col("width"), col("height"))
    c12MultimodalDecode(spark, sfDir)
      .filter(col("fmt") === "video")
      .withColumn("i", explode(sequence(lit(0), cnt - 1)))
      .select(
        col("doc_id"),
        floor(col("i") * col("n_frames") / cnt).cast("long").as("frame_idx"),
        col("n_frames"),
        floor(col("width") * SizeBudget / longSide).cast("int").as("resized_w"),
        floor(col("height") * SizeBudget / longSide).cast("int").as("resized_h"),
        (graft.functions.TextFunctions
          .hash32(concat(col("doc_id").cast("string"), lit("_"), floor(col("i") * col("n_frames") / cnt).cast("long").cast("string"))) % 256)
          .cast("double")./(255.0)
          .as("frame_score")
      )
  }

  /** C12: media table → per-partition decode → typed feature table.
    * The media column is synthesized from document text bytes (the
    * driver test data has no real media); everything downstream of the
    * binary column is the production path.
    */
  /** The decode stage as a Dataset transform — stateless
    * per-partition, so it runs verbatim on a streaming Dataset too
    * (incremental media ingest; StreamingSpec asserts parity).
    */
  def decodeFeatures(media: org.apache.spark.sql.Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(decodeStub)).toDF()
  }

  def c12MultimodalDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables
      .documents(spark, sfDir)
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int"))
          .as("fmt"),
        encode(col("text"), "UTF-8").as("media"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")
      )
      .as[MediaRow]

    decodeFeatures(media)
  }
}
