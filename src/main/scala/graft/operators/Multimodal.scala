package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** c105 geometry: a [[PhashRows]]×[[PhashCols]] stub pixel grid
    * yields 8 horizontal gradients per row → a 56-bit dHash, banded
    * into [[PhashBands]] 7-bit blocks for the pigeonhole join; any
    * pair within hamming ≤ [[PhashHammingMax]] = bands − 1 shares an
    * intact band, so the candidate set is exhaustive (c4's argument).
    * 56 bits (not the classic 64) keeps the packed signature strictly
    * positive in a signed BIGINT — the cross-engine arithmetic stays
    * shift-and-add in both Spark and DuckDB.
    */
  val PhashRows = 7
  val PhashCols = 9
  val PhashBands = 8
  val PhashBandBits = 7
  val PhashHammingMax = 7

  /** Per-image dHash signature over any (doc_id, text) media frame.
    * The stub "decoder" must be LOCALITY-PRESERVING like a real one —
    * near-identical payloads must decode to near-identical pixel
    * grids, or perceptual hashing has nothing to hash (an
    * md5-of-whole-payload stub avalanche-randomizes the grid and the
    * operator degenerates to exact dedup). Pixel (r, c) therefore
    * samples the CONTENT REGION the cell covers: grid index
    * i = (r·cols + c) mod n_tokens, intensity = 32-bit
    * md5(token_i ‖ "_" ‖ i) mod 256 — payloads sharing a prefix ≥ the
    * sampled span decode to (near-)identical grids, exactly how a
    * thumbnail of a padded/truncated image shares its pixels (a real
    * codec replaces exactly these pixel expressions with decoded
    * luma). The dHash bit (r, c) is the horizontal gradient
    * p(r,c) < p(r,c+1) — neighbor ORDER only, the invariance to
    * global brightness/contrast shifts that makes production image
    * dedup key on gradient hashes rather than raw bytes. Pixels are
    * staged as their own projection (each is read by two gradient
    * bits — the lambda-inlining discipline), the 56 disjoint
    * power-of-two terms add exactly in any order, and everything is
    * integer math end-to-end → the gate is hash-exact.
    */
  def imageDhashSignatures(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.hash32
    val withW = docs
      .filter(col("doc_id") % 3 === 0) // c12's fmt convention: these rows are the images
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("w"))
    val pixelCols = for { r <- 0 until PhashRows; c <- 0 until PhashCols } yield {
      val idx = lit(r * PhashCols + c) % size(col("w"))
      (hash32(concat(element_at(col("w"), idx + 1), lit("_"), idx.cast("string"))) % 256)
        .as(s"p_${r}_$c")
    }
    val px = withW.select((col("doc_id") +: pixelCols): _*)
    val bits = for { r <- 0 until PhashRows; c <- 0 until PhashCols - 1 } yield
      shiftleft(
        when(col(s"p_${r}_$c") < col(s"p_${r}_${c + 1}"), lit(1L)).otherwise(lit(0L)),
        r * (PhashCols - 1) + c
      )
    px.select(col("doc_id"), bits.reduce(_ + _).as("dhash"))
  }

  /** The banded near-dup join over any (doc_id, dhash) frame — c4's
    * pigeonhole idiom verbatim (first-matching-band emit-once, no
    * distinct(), hamming as one row-local bit_count): split out so the
    * spec can exercise exact signature-level geometry (planted bit
    * flips at the pigeonhole boundary) independently of the grid stub.
    */
  def dhashPairsFrom(sigIn: DataFrame): DataFrame = {
    val sig = sigIn.localCheckpoint()
    val blockCols = (0 until PhashBands).map { i =>
      struct(
        lit(i).as("block_idx"),
        shiftright(col("dhash"), i * PhashBandBits).bitwiseAND((1L << PhashBandBits) - 1).as("bval")
      )
    }
    val blocks = sig
      .select(col("doc_id"), col("dhash"), explode(array(blockCols: _*)).as("b"))
      .select(col("doc_id"), col("dhash"), col("b.block_idx").as("bi"), col("b.bval").as("bv"))
    val xorSig = col("sig_a").bitwiseXOR(col("sig_b"))
    val firstBlock = (0 until PhashBands).reverse
      .foldLeft(lit(-1): Column) { (tail, i) =>
        when(shiftright(xorSig, i * PhashBandBits).bitwiseAND((1L << PhashBandBits) - 1) === 0, lit(i))
          .otherwise(tail)
      }
    // hamming-first conjunct order inside the ONE join filter (c92/c93's
    // r12 discipline): the single popcount rejects ~every candidate
    // before the 8-branch dedup fold runs, and failed candidates never
    // materialize out of the join
    blocks
      .select(col("bi"), col("bv"), col("doc_id").as("doc_a"), col("dhash").as("sig_a"))
      .join(
        blocks.select(col("bi"), col("bv"), col("doc_id").as("doc_b"), col("dhash").as("sig_b")),
        Seq("bi", "bv")
      )
      .filter(
        col("doc_a") < col("doc_b") &&
          bit_count(xorSig) <= PhashHammingMax &&
          col("bi") === firstBlock
      )
      .select(col("doc_a"), col("doc_b"), bit_count(xorSig).cast("long").as("hamming"))
  }

  /** C105: perceptual-hash image near-dup — the multimodal member of
    * the dedup family (c1 whole-doc text, c4/c92/c93 text SimHash,
    * c5/c17/c35 embeddings; until now the media columns had decode
    * (c12) and frame sampling (c23) but NO dedup). dHash signatures
    * over the stub pixel grid, banded pigeonhole join, exact hamming
    * filter — integer math end-to-end, gated hash-exact against a
    * DuckDB oracle that recomputes pixels, gradients, packing and the
    * exhaustive pair set from first principles. Scale = c4's: one
    * row-local signature scan (the 63 pixel hashes per image are the
    * stub decoder's stand-in cost), an 8-way banded self-join whose
    * candidate volume is bounded by the band-value distribution, and
    * nothing but (doc_id, long) pairs on any exchange.
    */
  def c105ImageDhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    dhashPairsFrom(
      imageDhashSignatures(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
    )

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
