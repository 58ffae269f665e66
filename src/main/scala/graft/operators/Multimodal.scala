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
    // degenerate-payload screen: a 0/1-token payload decodes to a
    // CONSTANT pixel grid (every cell samples the same token), whose
    // gradients are all zero — every such row would share dhash = 0
    // and the banded self-join would pair them quadratically for a
    // "similarity" that is really "both payloads were empty". Real
    // perceptual dedup excludes below-minimum-size media the same way
    // (a 1×1 thumbnail matches everything); the oracle mirrors the
    // filter, so the gate stays hash-exact.
    val withW = docs
      .filter(col("doc_id") % 3 === 0) // c12's fmt convention: these rows are the images
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
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

  /** Census floor for the c105 refine decision (c93's posture): a
    * (band, value) bucket of ≤ this many members never refines — its
    * flat fan is below any re-key payoff — and is excluded from the
    * sub-band census, bounding census cost to the warm members.
    */
  val DhashHotFloor = 32

  /** Refinement sub-band widths over the 49 REMAINING bits (the 56-bit
    * dhash with the bucket band's 7 bits removed): 8 sub-bands of
    * 6,6,6,6,6,6,6,7 bits. Why 8 and why over the COMPACTED value:
    * c93's "re-key hot buckets on the other full bands" is NOT
    * exhaustive here — at threshold [[PhashHammingMax]] = 7 the 7
    * differing bits can occupy all 7 remaining bands (one each),
    * leaving no second intact FULL band. But all ≤ 7 differing bits of
    * a pair met in an intact band live in the remaining 49 bits, and 7
    * differing bits over EIGHT sub-bands leave ≥ 1 intact sub-band
    * (pigeonhole, 8 > 7) — so re-keying hot members on these 8 keys is
    * exhaustive, with ~6-bit keys (64-value spread per sub-band: fan
    * Σ sub² ≈ n²/8.6 on spread geometry vs n² flat).
    */
  private val DhashSubWidths: Seq[Int] = Seq(6, 6, 6, 6, 6, 6, 6, 7)
  private val DhashSubOffsets: Seq[Int] = DhashSubWidths.scanLeft(0)(_ + _).init

  /** The 49-bit remaining-bits value: `v` (a dhash or a dhash XOR —
    * bit removal is linear, so xor-of-compacts = compact-of-xor) with
    * band `bi`'s 7 bits spliced out. 8-branch when-fold over the
    * bucket band index (a run-time column on the hot path); each
    * branch is two shifts and a mask.
    */
  private def dhashCompact(v: Column, bi: Column): Column =
    (0 until PhashBands).foldLeft(lit(0L)) { (acc, b) =>
      when(
        bi === b,
        shiftleft(shiftright(v, (b + 1) * PhashBandBits), b * PhashBandBits) +
          v.bitwiseAND((1L << (b * PhashBandBits)) - 1)
      ).otherwise(acc)
    }

  private def dhashSubVal(compact: Column, j: Int): Column =
    shiftright(compact, DhashSubOffsets(j)).bitwiseAND((1L << DhashSubWidths(j)) - 1)

  /** c105's measured refine plan — c93's per-bucket cost arbitration
    * ported to the dHash band algebra (round 13; the r12 verdict's one
    * open scale-killer: on correlated band values — the text-derived
    * stub at natural sf10, or an adversarial real-image corpus — the
    * flat 8-band self-join is enumeration-bound, exp 2.26). A (band,
    * value) bucket of n members pays n² flat; re-keying its members on
    * the 8 remaining-bit sub-bands pays 8n re-key rows + Σ sub² join
    * fan — both MEASURED by a slim census (map-side combined counts,
    * no signatures on the wide exchange), so the bucket refines
    * exactly where measurement says it wins: Σ sub² + 8n < n².
    * Exact-dup families (identical dhashes) price out correctly:
    * every sub-bucket equals the bucket there, Σ sub² = 8n² > n², the
    * bucket stays flat, and its n² IS the output being emitted —
    * irreducible by any bucketing. Returns (warmMembers — the
    * checkpointed 8-way re-key frame the census and the hot path
    * share —, refineKeys); both checkpointed (re-referenced by the
    * two self-join sides — c93's measured lesson: un-checkpointed,
    * the census re-runs per action).
    */
  private[graft] def dhashRefinePlan(blocks: DataFrame): (DataFrame, DataFrame) = {
    val sizes = blocks
      .groupBy(col("bi"), col("bv"))
      .agg(count(lit(1)).as("nn"))
      .filter(col("nn") > DhashHotFloor)
    val subCols = (0 until DhashSubWidths.size).map { j =>
      struct(lit(j).as("half_idx"), dhashSubVal(col("compact"), j).as("hval"))
    }
    val warmMembers = blocks
      .join(broadcast(sizes.select(col("bi"), col("bv"))), Seq("bi", "bv"))
      .withColumn("compact", dhashCompact(col("dhash"), col("bi")))
      .select(col("doc_id"), col("dhash"), col("bi"), col("bv"), explode(array(subCols: _*)).as("sb"))
      .select(
        col("doc_id"), col("dhash"), col("bi"), col("bv"),
        col("sb.half_idx").as("hbi"), col("sb.hval").as("hbv")
      )
      .localCheckpoint()
    val refineKeys = sizes
      .join(
        warmMembers
          .groupBy(col("bi"), col("bv"), col("hbi"), col("hbv"))
          .agg(count(lit(1)).as("sn"))
          .groupBy(col("bi"), col("bv"))
          .agg(sum(col("sn") * col("sn")).as("refined_est"), sum(col("sn")).as("rekey")),
        Seq("bi", "bv")
      )
      .filter(col("refined_est") + col("rekey") < col("nn") * col("nn"))
      .select(col("bi"), col("bv"))
      .localCheckpoint()
    (warmMembers, refineKeys)
  }

  /** The banded near-dup join over any (doc_id, dhash) frame — c4's
    * pigeonhole idiom (emit-once, no distinct(), hamming as row-local
    * bit_count) with c93's measured-cost bucket refinement (round 13):
    * hot (band, value) buckets — where the census prices a sub-band
    * re-key cheaper than the flat self-join — re-key on the 8
    * remaining-bit sub-bands ([[DhashSubWidths]]; exhaustive by
    * pigeonhole, 8 sub-keys > 7 differing bits). Emit-once stays pure
    * row-local bit math across both paths, exactly c93's partition
    * argument: a pair lives in the cold path iff its FIRST intact
    * band's bucket is cold (emit at bi = first intact), else in the
    * hot path (emit at bi = first intact, hbi = first intact
    * remaining-bit sub-band, which exists by the pigeonhole). The
    * hamming test — one xor + one popcount — runs FIRST in each join
    * filter, so ~every candidate is rejected before the mask math and
    * failed candidates never materialize out of the join. Split out so
    * the spec can exercise exact signature-level geometry (planted bit
    * flips at the pigeonhole boundary, planted hot buckets routing
    * pairs through both paths) independently of the grid stub.
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
      .localCheckpoint() // feeds the census, the decision, and both path splits
    val (warmMembers, refineKeys) = dhashRefinePlan(blocks)
    val hotKeys = refineKeys.withColumn("is_hot", lit(true))
    val cold = blocks.join(broadcast(hotKeys), Seq("bi", "bv"), "left").filter(col("is_hot").isNull).drop("is_hot")
    val hot = warmMembers.join(broadcast(refineKeys), Seq("bi", "bv"))

    // ——— hamming-first emit filters, evaluated inside each join ———
    val xorSig = col("sig_a").bitwiseXOR(col("sig_b"))
    val hamOk = bit_count(xorSig) <= PhashHammingMax
    // first intact band as lowest-set-bit mask math (no when-folds in
    // the hot loop — c93's measured lesson)
    val imask = (0 until PhashBands)
      .map { i =>
        when(shiftright(xorSig, i * PhashBandBits).bitwiseAND((1L << PhashBandBits) - 1) === 0, lit(1L << i))
          .otherwise(lit(0L))
      }
      .reduce(_ + _)
    val fiOk = col("bi") === bit_count(imask.bitwiseAND(-imask) - 1)
    // first intact remaining-bit sub-band (hot path only): the xor's
    // compact shares the row's bucket band, so ≥ 1 of the 8 sub-bands
    // is intact at hamming ≤ 7
    val cxor = dhashCompact(xorSig, col("bi"))
    val hmask = (0 until DhashSubWidths.size)
      .map(j => when(dhashSubVal(cxor, j) === 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val hfiOk = col("hbi") === bit_count(hmask.bitwiseAND(-hmask) - 1)
    val hamming = bit_count(xorSig).cast("long")

    def sides(df: DataFrame, keys: Seq[String]): (DataFrame, DataFrame) = (
      df.select((keys.map(col) :+ col("doc_id").as("doc_a") :+ col("dhash").as("sig_a")): _*),
      df.select((keys.map(col) :+ col("doc_id").as("doc_b") :+ col("dhash").as("sig_b")): _*)
    )
    val out = Seq(col("doc_a"), col("doc_b"), hamming.as("hamming"))
    val (ca, cb) = sides(cold, Seq("bi", "bv"))
    val coldPairs = ca
      .join(cb, Seq("bi", "bv"))
      .filter(col("doc_a") < col("doc_b") && hamOk && fiOk)
      .select(out: _*)
    val (ha, hb) = sides(hot, Seq("bi", "bv", "hbi", "hbv"))
    val hotPairs = ha
      .join(hb, Seq("bi", "bv", "hbi", "hbv"))
      .filter(col("doc_a") < col("doc_b") && hamOk && fiOk && hfiOk)
      .select(out: _*)
    coldPairs.unionByName(hotPairs)
  }

  /** c110 geometry: the same 7×9 stub pixel grid read BOTH ways —
    * [[PhashRows]]×8 horizontal gradients (c105's 56 bits) plus 6×9
    * VERTICAL gradients (54 bits) — production dHash's full H+V form.
    * Widening the signature is c92's scale lesson applied to images:
    * at the same absolute threshold (hamming ≤ [[PhashHammingMax]]
    * over the combined 110 bits, a stricter per-bit bar — both
    * calibrations stay served, like c4 vs c92), the 110 bits band as
    * NINE 10-14-bit bands — the FEWEST bands that still guarantee
    * ≥ 2 intact at the threshold (9 ≥ 7 + 2), hence the WIDEST keys.
    * Band count is the whole trade: a first 17-narrow-band cut of
    * this operator measured natural sf10 at 262.5 s / exp 1.60 —
    * WORSE than refined c105 — because band rows scale with the
    * count while bucket spread scales with 2^width; 9×12-bit-class
    * bands restore exactly the c92/c93 key width whose absence
    * capped c105's refined exponent at 1.42 (its 56 bits at
    * threshold 7 cannot give 9 bands of useful width; 110 can).
    * c93's full later-band hot-bucket re-key is exhaustive here.
    */
  val VhashRows = PhashRows - 1 // 6 rows of vertical gradients

  /** Per-image (h, v) wide signature: horizontal + vertical gradient
    * packs over the same staged pixel projection (each pixel read by
    * up to four gradient bits — the lambda-inlining discipline).
    * Same degenerate-payload screen as c105 (a 0/1-token payload's
    * constant grid zeroes BOTH packs).
    */
  def imageDhashWideSignatures(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.hash32
    val withW = docs
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
    val pixelCols = for { r <- 0 until PhashRows; c <- 0 until PhashCols } yield {
      val idx = lit(r * PhashCols + c) % size(col("w"))
      (hash32(concat(element_at(col("w"), idx + 1), lit("_"), idx.cast("string"))) % 256)
        .as(s"p_${r}_$c")
    }
    val px = withW.select((col("doc_id") +: pixelCols): _*)
    val hBits = for { r <- 0 until PhashRows; c <- 0 until PhashCols - 1 } yield
      shiftleft(
        when(col(s"p_${r}_$c") < col(s"p_${r}_${c + 1}"), lit(1L)).otherwise(lit(0L)),
        r * (PhashCols - 1) + c
      )
    val vBits = for { r <- 0 until VhashRows; c <- 0 until PhashCols } yield
      shiftleft(
        when(col(s"p_${r}_$c") < col(s"p_${r + 1}_$c"), lit(1L)).otherwise(lit(0L)),
        r * PhashCols + c
      )
    px.select(col("doc_id"), hBits.reduce(_ + _).as("h"), vBits.reduce(_ + _).as("v"))
  }

  /** The 9-band layout over the (h, v) signature pair: band index →
    * (source column name, bit offset, width). H = 4 bands of 14 bits
    * (56), V = 4 of 11 + 1 of 10 (54).
    */
  private[graft] val WideBandLayout: Seq[(String, Int, Int)] =
    (0 until 4).map(i => ("h", i * 14, 14)) ++
      (0 until 4).map(j => ("v", j * 11, 11)) :+ (("v", 44, 10))

  private def wideBandVal(sigOf: String => Column, band: Int): Column = {
    val (s, off, w) = WideBandLayout(band)
    shiftright(sigOf(s), off).bitwiseAND((1L << w) - 1)
  }

  /** c110's measured refine plan — c93's level-1 arbitration on the
    * 9-band algebra ([[WideBandLayout]]: 4×14-bit H + 4×11-bit +
    * 1×10-bit V; a 17-narrow-band first cut measured 6.4× slower and
    * was rejected — band count vs key width is a measured design
    * rule): with ≥ 2 intact bands guaranteed at hamming ≤ 7, hot-
    * bucket members re-key on their LATER bands only (the emit point
    * (first, second intact) always has second > first — c93's
    * halving), and a bucket refines iff the measured census says the
    * re-key wins: Σ sub² + Σ sub < n². Full-band sub-keys (10-14 bits
    * per band, and conditioned on a shared first band the sub-bucket
    * spread is the OTHER signature dimension's) — the width c105's
    * 49-remaining-bit split could not offer.
    */
  private[graft] def wideRefinePlan(blocks: DataFrame): (DataFrame, DataFrame) = {
    val nBands = WideBandLayout.size
    val sizes = blocks
      .groupBy(col("bi"), col("bv"))
      .agg(count(lit(1)).as("nn"))
      .filter(col("nn") > DhashHotFloor)
    def sigOf(s: String): Column = col(s)
    val subCols = (0 until nBands).map { j =>
      struct(lit(j).as("sub_idx"), wideBandVal(sigOf, j).as("sval"))
    }
    val warmMembers = blocks
      .join(broadcast(sizes.select(col("bi"), col("bv"))), Seq("bi", "bv"))
      .select(col("doc_id"), col("h"), col("v"), col("bi"), col("bv"), explode(array(subCols: _*)).as("sb"))
      .select(
        col("doc_id"), col("h"), col("v"), col("bi"), col("bv"),
        col("sb.sub_idx").as("sbi"), col("sb.sval").as("sbv")
      )
      .filter(col("sbi") > col("bi"))
      .localCheckpoint()
    val refineKeys = sizes
      .join(
        warmMembers
          .groupBy(col("bi"), col("bv"), col("sbi"), col("sbv"))
          .agg(count(lit(1)).as("sn"))
          .groupBy(col("bi"), col("bv"))
          .agg(sum(col("sn") * col("sn")).as("refined_est"), sum(col("sn")).as("rekey")),
        Seq("bi", "bv")
      )
      .filter(col("refined_est") + col("rekey") < col("nn") * col("nn"))
      .select(col("bi"), col("bv"))
      .localCheckpoint()
    (warmMembers, refineKeys)
  }

  /** The banded near-dup join over any (doc_id, h, v) wide-signature
    * frame — c93's two-path emit algebra on the 9-band layout
    * ([[WideBandLayout]]): a pair lives in the cold path iff its
    * FIRST intact band's bucket is cold (emit at bi = first intact),
    * else in the hot path (emit at bi = first, sbi = SECOND intact —
    * which exists because 7 differing bits leave ≥ 2 of 9 bands
    * intact). Hamming-first filter; everything row-local bit math,
    * no distinct().
    */
  def dhashWidePairsFrom(sigIn: DataFrame): DataFrame = {
    val sig = sigIn.localCheckpoint()
    val nBands = WideBandLayout.size
    def sigOf(s: String): Column = col(s)
    val bandCols = (0 until nBands).map { i =>
      struct(lit(i).as("band_idx"), wideBandVal(sigOf, i).as("bval"))
    }
    val blocks = sig
      .select(col("doc_id"), col("h"), col("v"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("h"), col("v"), col("b.band_idx").as("bi"), col("b.bval").as("bv"))
      .localCheckpoint()
    val (warmMembers, refineKeys) = wideRefinePlan(blocks)
    val hotKeys = refineKeys.withColumn("is_hot", lit(true))
    val cold = blocks.join(broadcast(hotKeys), Seq("bi", "bv"), "left").filter(col("is_hot").isNull).drop("is_hot")
    val hot = warmMembers.join(broadcast(refineKeys), Seq("bi", "bv"))

    val xh = col("h_a").bitwiseXOR(col("h_b"))
    val xv = col("v_a").bitwiseXOR(col("v_b"))
    val hamOk = (bit_count(xh) + bit_count(xv)) <= PhashHammingMax
    def xorOf(s: String): Column = if (s == "h") xh else xv
    val imask = (0 until nBands)
      .map(i => when(wideBandVal(xorOf, i) === 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val lsb = imask.bitwiseAND(-imask)
    val fiOk = col("bi") === bit_count(lsb - 1)
    val m2 = imask - lsb
    val siOk = col("sbi") === bit_count(m2.bitwiseAND(-m2) - 1)
    val hamming = (bit_count(xh) + bit_count(xv)).cast("long")

    def sides(df: DataFrame, keys: Seq[String]): (DataFrame, DataFrame) = (
      df.select((keys.map(col) :+ col("doc_id").as("doc_a") :+ col("h").as("h_a") :+ col("v").as("v_a")): _*),
      df.select((keys.map(col) :+ col("doc_id").as("doc_b") :+ col("h").as("h_b") :+ col("v").as("v_b")): _*)
    )
    val out = Seq(col("doc_a"), col("doc_b"), hamming.as("hamming"))
    val (ca, cb) = sides(cold, Seq("bi", "bv"))
    val coldPairs = ca
      .join(cb, Seq("bi", "bv"))
      .filter(col("doc_a") < col("doc_b") && hamOk && fiOk)
      .select(out: _*)
    val (ha, hb) = sides(hot, Seq("bi", "bv", "sbi", "sbv"))
    val hotPairs = ha
      .join(hb, Seq("bi", "bv", "sbi", "sbv"))
      .filter(col("doc_a") < col("doc_b") && hamOk && fiOk && siOk)
      .select(out: _*)
    coldPairs.unionByName(hotPairs)
  }

  /** C110: WIDE perceptual-hash image near-dup — c105's next rung,
    * named by its BASELINE adjudication: the 56-bit single-direction
    * signature caps refinement sub-keys at 6 bits, so the scale fix
    * is to WIDEN the signature (c92's lesson), not re-tune the
    * arbitration. Production dHash serves exactly this H+V gradient
    * pair; the combined 110-bit hamming ≤ 7 is the stricter
    * calibration next to c105's 56-bit one, both served. Integer
    * math end-to-end; the oracle recomputes pixels, BOTH gradient
    * packs and the exhaustive pair set from first principles.
    */
  def c110ImageDhashWidePairs(spark: SparkSession, sfDir: String): DataFrame =
    dhashWidePairsFrom(
      imageDhashWideSignatures(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
    )

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
