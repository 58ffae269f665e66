package graft

import graft.operators.TextDedup.{MinHashParams, ShingleSize, JaccardNum, JaccardDen, SimHashBits, HammingMax}

/** Generates the DuckDB oracle SQL for the hash-heavy C-series
  * operators from the SAME constants the Spark pipelines use
  * (TextDedup.MinHashParams etc.), so pipeline and oracle can never
  * drift apart.
  */
object OracleGen {

  private val n1 = ShingleSize - 1

  /** Shared CTEs: docs → token hashes → rolling polynomial shingle
    * hashes, distinct per doc (mirrors TextDedup.shingleHashes /
    * TextFunctions.rollingShingleHashes bit-for-bit).
    */
  private val shingleCtes: String = {
    import graft.functions.TextFunctions.{rollCoeffs, RollP}
    val n = ShingleSize
    val terms = rollCoeffs(n).zipWithIndex
      .map { case (k, j) => s"ht[i + $j] * $k" }
      .mkString(" + ")
    s"""docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |toks AS (SELECT doc_id, list_transform(w, t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)) AS ht FROM docs),
       |shh AS (SELECT DISTINCT doc_id, unnest(list_transform(
       |  generate_series(1, greatest(len(ht) - $n1, 0)),
       |  i -> ($terms) % $RollP)) AS h FROM toks)""".stripMargin
  }

  private def jaccardTailOn(src: String): String =
    s"""n AS (SELECT doc_id, count(*) ns FROM $src GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |          FROM $src a JOIN $src b ON a.h = b.h AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)""".stripMargin

  private val jaccardTail: String = jaccardTailOn("shh")

  /** C2 mirrors the Spark side's shingle-df cap (TextDedup.MaxShingleDf)
    * so the hot-key bound moves in lock-step with the output contract.
    */
  val c2NgramJaccard: String = {
    import graft.operators.TextDedup.MaxShingleDf
    s"""WITH $shingleCtes,
       |hot AS (SELECT h FROM shh GROUP BY h HAVING count(*) > $MaxShingleDf),
       |shc AS (SELECT doc_id, h FROM shh WHERE h NOT IN (SELECT h FROM hot)),
       |${jaccardTailOn("shc")}
       |SELECT doc_a, doc_b, common, CAST(common AS DOUBLE) / (na.ns + nb.ns - common) AS jaccard
       |FROM pairs JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
       |WHERE common * $JaccardDen >= (na.ns + nb.ns - common) * $JaccardNum""".stripMargin
  }

  /** C59 mirrors c2's capped index, then scores Broder containment of
    * the smaller shingle set in the bigger (ties → lower id first).
    */
  val c59Containment: String = {
    import graft.operators.TextDedup.{MaxShingleDf, ContainNum, ContainDen}
    s"""WITH $shingleCtes,
       |hot AS (SELECT h FROM shh GROUP BY h HAVING count(*) > $MaxShingleDf),
       |shc AS (SELECT doc_id, h FROM shh WHERE h NOT IN (SELECT h FROM hot)),
       |${jaccardTailOn("shc")}
       |SELECT CASE WHEN na.ns <= nb.ns THEN doc_a ELSE doc_b END AS doc_small,
       |  CASE WHEN na.ns <= nb.ns THEN doc_b ELSE doc_a END AS doc_big,
       |  least(na.ns, nb.ns) AS n_small,
       |  greatest(na.ns, nb.ns) AS n_big,
       |  common,
       |  CAST(common AS DOUBLE) / CAST(least(na.ns, nb.ns) AS DOUBLE) AS containment
       |FROM pairs JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
       |WHERE common * $ContainDen >= least(na.ns, nb.ns) * $ContainNum""".stripMargin
  }

  /** Shared c3 CTE body + verified-pair select, reused by the c3 gate
    * and anything built on its pair set (c34).
    */
  private val c3Ctes: String = {
    import MinHashParams._
    val minCols = (0 until NumPerms)
      .map(j => s"min((h * ${A(j)} + ${B(j)}) % $P) AS m$j")
      .mkString(", ")
    val bandSelects = (0 until Bands)
      .map { b =>
        val ms = (0 until RowsPerBand).map(r => s"m${b * RowsPerBand + r}").mkString(", ")
        s"SELECT doc_id, $b AS band_idx, md5(concat_ws('_', $ms)) AS bkey FROM sig"
      }
      .mkString(" UNION ALL ")
    s"""$shingleCtes,
       |sig AS (SELECT doc_id, $minCols FROM shh GROUP BY doc_id),
       |bands AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b
       |           ON a.band_idx = b.band_idx AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |$jaccardTail""".stripMargin
  }

  private val c3Select: String =
    s"""SELECT doc_a, doc_b, common, CAST(common AS DOUBLE) / (na.ns + nb.ns - common) AS jaccard
       |FROM pairs JOIN cand USING (doc_a, doc_b)
       |  JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
       |WHERE common * $JaccardDen >= (na.ns + nb.ns - common) * $JaccardNum""".stripMargin

  val c3MinHashLsh: String =
    s"""WITH $c3Ctes
       |$c3Select""".stripMargin

  /** c71 = the c3 pair set with the exact Levenshtein second opinion:
    * unit-cost edit distance in both engines (integer-exact), the
    * normalized similarity divides the distance by the longer length.
    */
  val c71EditVerify: String = {
    import graft.operators.TextDedup.EditSimThreshold
    s"""WITH vp AS ($c3MinHashLsh)
       |SELECT p.doc_a, p.doc_b, p.jaccard,
       |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance,
       |  1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE) / greatest(length(a.text), length(b.text)) AS edit_sim,
       |  (1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE) / greatest(length(a.text), length(b.text))) >= $EditSimThreshold AS edit_confirmed
       |FROM vp p JOIN documents a ON a.doc_id = p.doc_a JOIN documents b ON b.doc_id = p.doc_b""".stripMargin
  }

  /** C34 = c3's verified pairs with each member's source attached,
    * cross-source only.
    */
  /** c85: the c3 pair set swept over the candidate cutoffs; spine
    * left-joined so empty cutoffs keep their zero rows.
    */
  val c85DedupSweep: String = {
    import graft.operators.TextDedup.SweepThresholds
    val values = SweepThresholds.map(t => s"($t)").mkString(", ")
    s"""WITH pairs AS ($c3MinHashLsh),
       |t(threshold) AS (VALUES $values),
       |f AS (SELECT t.threshold, p.doc_a, p.doc_b FROM t JOIN pairs p ON p.jaccard >= t.threshold),
       |pc AS (SELECT threshold, COUNT(*) AS np FROM f GROUP BY threshold),
       |dc AS (SELECT threshold, COUNT(DISTINCT d) AS nd FROM (
       |  SELECT threshold, doc_a AS d FROM f UNION ALL SELECT threshold, doc_b FROM f) u GROUP BY threshold)
       |SELECT t.threshold, COALESCE(pc.np, 0) AS n_pairs, COALESCE(dc.nd, 0) AS n_docs
       |FROM t LEFT JOIN pc ON t.threshold = pc.threshold LEFT JOIN dc ON t.threshold = dc.threshold""".stripMargin
  }

  val c34CrossSourceNearDups: String =
    s"""WITH $c3Ctes,
       |res AS ($c3Select)
       |SELECT p.doc_a, p.doc_b, a.source AS source_a, b.source AS source_b, p.jaccard
       |FROM res p
       |JOIN documents a ON a.doc_id = p.doc_a
       |JOIN documents b ON b.doc_id = p.doc_b
       |WHERE a.source <> b.source""".stripMargin

  /** C55 = the symmetric membership of c3's verified pairs, filtered
    * to blocking partners of batch docs (c26's % split), aggregated
    * per rejected doc. SUMs cast BIGINT per the widening meta-spec.
    */
  val c55NearDupIncremental: String = {
    val e = graft.operators.Sampling.IncrEvery
    s"""WITH $c3Ctes,
       |res AS ($c3Select),
       |mem AS (SELECT doc_a AS d, doc_b AS o FROM res UNION ALL SELECT doc_b AS d, doc_a AS o FROM res),
       |blk AS (SELECT d, o FROM mem WHERE d % $e = 0 AND (o % $e <> 0 OR o < d)),
       |rej AS (SELECT d AS doc_id,
       |  CAST(SUM(CASE WHEN o % $e <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hist_partners,
       |  CAST(SUM(CASE WHEN o % $e = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_batch_partners,
       |  MIN(o) AS min_partner FROM blk GROUP BY d)
       |SELECT r.doc_id, dcs.lang, r.n_hist_partners, r.n_batch_partners, r.min_partner
       |FROM rej r JOIN documents dcs ON dcs.doc_id = r.doc_id""".stripMargin
  }

  val c4SimHash: String = {
    val voteCols = (0 until SimHashBits)
      .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN cnt ELSE -cnt END) AS v$i")
      .mkString(", ")
    val shiftSum = (0 until SimHashBits)
      .map(i => s"(CASE WHEN v$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |tok AS (SELECT doc_id, unnest(w) AS t FROM docs),
       |tc AS (SELECT doc_id, t, count(*) AS cnt FROM tok GROUP BY 1, 2),
       |h AS (SELECT doc_id, cnt, CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h FROM tc),
       |votes AS (SELECT doc_id, $voteCols FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($shiftSum AS BIGINT) AS simhash FROM votes)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingMax""".stripMargin
  }

  /** c92 = c4's SUM(CASE) vote formulation run over BOTH hash families
    * (the second = md5 of the salted token), pairs filtered on the
    * summed 120-bit hamming — the exact contract of the widened
    * pigeonhole join, recomputed from first principles.
    */
  val c92DedupSimhashWide: String = {
    import graft.operators.TextDedup.WideSalt
    def votes(src: String, pfx: String) = (0 until SimHashBits)
      .map(i => s"SUM(CASE WHEN ($src >> $i) & 1 = 1 THEN cnt ELSE -cnt END) AS $pfx$i")
      .mkString(", ")
    def shiftSum(pfx: String) = (0 until SimHashBits)
      .map(i => s"(CASE WHEN $pfx$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |tok AS (SELECT doc_id, unnest(w) AS t FROM docs),
       |tc AS (SELECT doc_id, t, count(*) AS cnt FROM tok GROUP BY 1, 2),
       |h AS (SELECT doc_id, cnt,
       |  CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h1,
       |  CAST(concat('0x', substr(md5(concat('$WideSalt', t)), 1, 15)) AS BIGINT) AS h2 FROM tc),
       |votes AS (SELECT doc_id, ${votes("h1", "v")}, ${votes("h2", "u")} FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST(${shiftSum("v")} AS BIGINT) AS s1,
       |  CAST(${shiftSum("u")} AS BIGINT) AS s2 FROM votes)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.s1, b.s1)) + bit_count(xor(a.s2, b.s2)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.s1, b.s1)) + bit_count(xor(a.s2, b.s2)) <= $HammingMax""".stripMargin
  }

  /** c105 = the dHash pipeline recomputed from first principles:
    * locality-preserving stub pixels p(r,c) = 32-bit
    * md5(token_i ‖ '_' ‖ i) mod 256 at grid index i = (r·cols + c) mod
    * n_tokens over the image rows (doc_id % 3 = 0, c12's fmt
    * convention), gradient bits p(r,c) < p(r,c+1) packed as
    * shift-and-add (disjoint powers — order-free integer sum),
    * exhaustive pair join at hamming ≤ max. The banded join is a pure
    * candidate optimization (pigeonhole exhaustive at ≤ bands − 1), so
    * the oracle skips it.
    */
  val c105ImageDhashPairs: String = {
    import graft.operators.Multimodal.{PhashCols, PhashHammingMax, PhashRows}
    s"""WITH img AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE doc_id % 3 = 0 AND len(string_split(text, ' ')) >= 2),
       |px AS (SELECT doc_id, rr.r, cc.c,
       |  CAST(concat('0x', substr(md5(
       |    w[CAST((rr.r * $PhashCols + cc.c) % len(w) AS INT) + 1] || '_' ||
       |    CAST((rr.r * $PhashCols + cc.c) % len(w) AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS p
       |  FROM img
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${PhashRows - 1})) AS r) rr
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${PhashCols - 1})) AS c) cc),
       |sig AS (SELECT a.doc_id,
       |  CAST(SUM(CASE WHEN a.p < b.p THEN (CAST(1 AS BIGINT) << CAST(a.r * ${PhashCols - 1} + a.c AS INT)) ELSE 0 END) AS BIGINT) AS dhash
       |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
       |  GROUP BY a.doc_id)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.dhash, b.dhash)) <= $PhashHammingMax""".stripMargin
  }

  /** c110 = the WIDE dHash recomputed from first principles: the same
    * stub pixel grid as c105, BOTH gradient packs (horizontal 56 bits,
    * vertical 54), exhaustive pair join at combined hamming ≤ max.
    * The 17-band refinement is a pure candidate optimization (≥ 2
    * intact bands at ≤ 7 differing bits), so the oracle skips it.
    */
  val c110ImageDhashWidePairs: String = {
    import graft.operators.Multimodal.{PhashCols, PhashHammingMax, PhashRows}
    s"""WITH img AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE doc_id % 3 = 0 AND len(string_split(text, ' ')) >= 2),
       |px AS (SELECT doc_id, rr.r, cc.c,
       |  CAST(concat('0x', substr(md5(
       |    w[CAST((rr.r * $PhashCols + cc.c) % len(w) AS INT) + 1] || '_' ||
       |    CAST((rr.r * $PhashCols + cc.c) % len(w) AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS p
       |  FROM img
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${PhashRows - 1})) AS r) rr
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${PhashCols - 1})) AS c) cc),
       |sigh AS (SELECT a.doc_id,
       |  CAST(SUM(CASE WHEN a.p < b.p THEN (CAST(1 AS BIGINT) << CAST(a.r * ${PhashCols - 1} + a.c AS INT)) ELSE 0 END) AS BIGINT) AS h
       |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
       |  GROUP BY a.doc_id),
       |sigv AS (SELECT a.doc_id,
       |  CAST(SUM(CASE WHEN a.p < b.p THEN (CAST(1 AS BIGINT) << CAST(a.r * $PhashCols + a.c AS INT)) ELSE 0 END) AS BIGINT) AS v
       |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.r = a.r + 1 AND b.c = a.c
       |  GROUP BY a.doc_id),
       |sig AS (SELECT doc_id, h, v FROM sigh JOIN sigv USING (doc_id))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.h, b.h)) + bit_count(xor(a.v, b.v)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.h, b.h)) + bit_count(xor(a.v, b.v)) <= $PhashHammingMax""".stripMargin
  }

  /** C27 mirrors the Spark side's non-deduped rolling shingle hashes:
    * dup_ratio = 1 − distinct/total over the SAME hash math.
    */
  val c27DocRepetition: String = {
    import graft.functions.TextFunctions.{rollCoeffs, RollP}
    val terms = rollCoeffs(ShingleSize).zipWithIndex
      .map { case (k, j) => s"ht[i + $j] * $k" }
      .mkString(" + ")
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |toks AS (SELECT doc_id, list_transform(w, t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)) AS ht FROM docs),
       |sh AS (SELECT doc_id, list_transform(
       |  generate_series(1, greatest(len(ht) - $n1, 0)),
       |  i -> ($terms) % $RollP) AS hs FROM toks)
       |SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_shingles,
       |  CAST(len(list_distinct(hs)) AS BIGINT) AS n_distinct,
       |  CASE WHEN len(hs) > 0 THEN 1.0 - CAST(len(list_distinct(hs)) AS DOUBLE) / len(hs) ELSE 0.0 END AS dup_ratio
       |FROM sh""".stripMargin
  }

  val c15BigramLm: String = {
    import graft.functions.TextFunctions.{rollCoeffs, RollP}
    val terms = rollCoeffs(2).zipWithIndex
      .map { case (k, j) => s"ht[i + $j] * $k" }
      .mkString(" + ")
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |toks AS (SELECT doc_id, list_transform(w, t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)) AS ht FROM docs),
       |bg AS (SELECT doc_id, unnest(list_transform(
       |  generate_series(1, greatest(len(ht) - 1, 0)),
       |  i -> ($terms) % $RollP)) AS h FROM toks),
       |freq AS (SELECT h, COUNT(*) AS freq FROM bg GROUP BY h)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  CAST(SUM(freq) AS DOUBLE) / COUNT(*) AS lm_score
       |FROM bg JOIN freq USING (h)
       |GROUP BY doc_id""".stripMargin
  }

  val c16Clusters: String =
    s"""WITH RECURSIVE $shingleCtes,
       |$jaccardTail,
       |nd AS (SELECT doc_a, doc_b FROM pairs
       |       JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
       |       WHERE common * $JaccardDen >= (na.ns + nb.ns - common) * $JaccardNum),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM nd UNION SELECT doc_b, doc_a FROM nd),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |)
       |SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id FROM reach GROUP BY a""".stripMargin

  /** C51 = the size distribution over C16's clusters: (cluster size,
    * number of clusters of that size).
    */
  val c51ClusterSizes: String =
    s"""WITH RECURSIVE $shingleCtes,
       |$jaccardTail,
       |nd AS (SELECT doc_a, doc_b FROM pairs
       |       JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
       |       WHERE common * $JaccardDen >= (na.ns + nb.ns - common) * $JaccardNum),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM nd UNION SELECT doc_b, doc_a FROM nd),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |),
       |lab AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id FROM reach GROUP BY a),
       |sz AS (SELECT cluster_id, COUNT(*) AS n_members FROM lab GROUP BY cluster_id)
       |SELECT CAST(n_members AS BIGINT) AS n_members, COUNT(*) AS n_clusters FROM sz GROUP BY 1""".stripMargin

  /** C33 = C16's labels applied back to the corpus: keep each
    * cluster's min-id member plus every unclustered document.
    */
  val c33CanonicalCorpus: String =
    s"""WITH RECURSIVE $shingleCtes,
       |$jaccardTail,
       |nd AS (SELECT doc_a, doc_b FROM pairs
       |       JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
       |       WHERE common * $JaccardDen >= (na.ns + nb.ns - common) * $JaccardNum),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM nd UNION SELECT doc_b, doc_a FROM nd),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |),
       |labels AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id FROM reach GROUP BY a)
       |SELECT d.doc_id, d.lang, d.n_chars
       |FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
       |WHERE l.cluster_id IS NULL OR l.cluster_id = d.doc_id""".stripMargin

  /** c9's quality score as CTEs `m` → `qs` (doc_id → quality_score) —
    * the exact FP expression the engine computes (left-associated
    * three-term sum of correctly-rounded products), shared by every
    * quality-consuming oracle.
    */
  private val qualityCtes: String =
    """m AS (SELECT doc_id,
      |  CAST(len(w) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(w, t -> t = 'the' OR t = 'a')) AS BIGINT) AS n_stop,
      |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS alpha_chars,
      |  CAST(length(text) AS BIGINT) AS n_chars
      |FROM (SELECT doc_id, text, string_split(text, ' ') w FROM documents)),
      |qs AS (SELECT doc_id,
      |  CASE WHEN n_chars = 0 THEN 0.0 ELSE
      |    CAST(n_stop AS DOUBLE) / n_tokens * 0.4 +
      |    CAST(alpha_chars AS DOUBLE) / n_chars * 0.3 +
      |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3 END AS quality_score
      |FROM m)""".stripMargin

  /** c107 = the TRAINING fold unrolled from first principles: c9
    * labels at the threshold, per-bucket label-conditioned occurrence
    * counts over the md5-hash feature buckets, the integer
    * cross-product weights pos·T_neg − neg·T_pos, sign-split
    * quantization (non-negative DIV only — truncating and flooring
    * division agree there, so `//` here equals Spark's DIV), then the
    * per-doc served sum and score. Every stage is exact integer math
    * until the final double division — the gate is hash-exact through
    * the TRAINING, not just the scoring.
    */
  val c107TrainedQuality: String = {
    import graft.operators.TextAnalysis.{QcDim, QcLabelThreshold, QcScale}
    s"""WITH $qualityCtes,
       |lab AS (SELECT d.doc_id, string_split(d.text, ' ') AS w,
       |  CASE WHEN qs.quality_score >= $QcLabelThreshold THEN 1 ELSE 0 END AS label
       |  FROM documents d JOIN qs USING (doc_id)),
       |occ AS (SELECT label, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % $QcDim AS bucket
       |  FROM (SELECT label, unnest(w) AS tok FROM lab)),
       |bs AS (SELECT bucket,
       |  CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos_cnt,
       |  CAST(SUM(CASE WHEN label = 1 THEN 0 ELSE 1 END) AS BIGINT) AS neg_cnt
       |  FROM occ GROUP BY bucket),
       |tot AS (SELECT CAST(SUM(pos_cnt) AS BIGINT) AS t_pos, CAST(SUM(neg_cnt) AS BIGINT) AS t_neg FROM bs),
       |raw AS (SELECT bucket, pos_cnt * t_neg - neg_cnt * t_pos AS w_raw FROM bs, tot),
       |mx AS (SELECT MAX(ABS(w_raw)) AS max_abs FROM raw),
       |wq AS (SELECT bucket,
       |  CASE WHEN max_abs = 0 THEN 0
       |       ELSE (CASE WHEN w_raw < 0 THEN -1 WHEN w_raw > 0 THEN 1 ELSE 0 END)
       |            * ((ABS(w_raw) * $QcScale) // max_abs) END AS w_q
       |  FROM raw, mx),
       |ds AS (SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % $QcDim AS bucket
       |  FROM (SELECT doc_id, unnest(w) AS tok FROM lab)),
       |sums AS (SELECT ds.doc_id, CAST(SUM(wq.w_q) AS BIGINT) AS w_sum
       |  FROM ds JOIN wq USING (bucket) GROUP BY ds.doc_id)
       |SELECT m.doc_id, m.n_tokens, sums.w_sum,
       |  CAST(sums.w_sum AS DOUBLE) / ($QcScale.0 * m.n_tokens) AS qc_score,
       |  CAST(CASE WHEN sums.w_sum > 0 THEN 1 ELSE 0 END AS INT) AS admit
       |FROM m JOIN sums USING (doc_id)""".stripMargin
  }

  /** c109 = the unigram-LM hard-EM trainer unrolled: substring
    * seeding, then per round a Viterbi forward pass as a RECURSIVE CTE
    * carrying the same sliding 4-value DP window + backpointer list
    * the Spark fold threads, the same strict-greater/smallest-l tie
    * chain (nested CASE, not ROW_NUMBER — identical comparisons on
    * identical doubles), a recursive backtrack walk, Laplace
    * re-estimation and the count-ranked prune. Integer counts
    * everywhere; doubles only in the products and one division per
    * piece — hash-exact through training.
    */
  /** The unigram trainer's recursive-CTE chain through the final
    * probabilities (seed → per-round Viterbi fwd/backtrack → prune →
    * Laplace) plus the per-round builder, shared by c109 (emits the
    * inventory) and c111 (appends one more Viterbi round under
    * p_final and emits per-word segmentations).
    */
  private lazy val (unigramChain: String, unigramRound: ((Int, String) => String)) = {
    import graft.operators.TextAnalysis.{UniEmRounds, UniKeepPieces, UniMaxPieceLen, UniMaxWordLen, UniSeedCandidates}
    // nested best/backpointer chains: sL = vL * pL (pL NULL→0 when the
    // piece would start before the word), strict > replacement from
    // l = 1 up — ties keep the smaller l, Spark's fold order
    def bestExpr(upTo: Int): String =
      (2 to upTo).foldLeft("(s.v1 * COALESCE(wp.p1, 0.0))") { (acc, l) =>
        s"(CASE WHEN (s.v$l * COALESCE(wp.p$l, 0.0)) > $acc THEN (s.v$l * COALESCE(wp.p$l, 0.0)) ELSE $acc END)"
      }
    def blExpr(upTo: Int): String =
      (2 to upTo).foldLeft("1") { (acc, l) =>
        s"(CASE WHEN (s.v$l * COALESCE(wp.p$l, 0.0)) > ${bestExpr(l - 1)} THEN $l ELSE $acc END)"
      }
    val pPivot = (1 to UniMaxPieceLen).map(l => s"MAX(CASE WHEN l = $l THEN p END) AS p$l").mkString(", ")
    // one EM round: probabilities table pIn(piece, p) -> counts table
    // cntOut(piece, n) via forward fwd + backtrack bt
    def round(r: Int, pIn: String): String =
      s"""wpl$r AS MATERIALIZED (SELECT v.w, pos.i, ln.l, p.p
         |  FROM vocab v
         |  CROSS JOIN (SELECT unnest(generate_series(1, $UniMaxWordLen)) AS i) pos
         |  CROSS JOIN (SELECT unnest(generate_series(1, $UniMaxPieceLen)) AS l) ln
         |  JOIN $pIn p ON p.piece = substr(v.w, pos.i - ln.l + 1, ln.l)
         |  WHERE pos.i <= length(v.w) AND ln.l <= pos.i),
         |wp$r AS MATERIALIZED (SELECT w, i, $pPivot FROM wpl$r GROUP BY w, i),
         |fwd$r(w, cnt, i, v1, v2, v3, v4, bps) AS (
         |  -- the DP values MUST be typed DOUBLE in the recursive base:
         |  -- bare 1.0 infers DECIMAL(2,1) and the whole recursion then
         |  -- truncates every product to one decimal place
         |  SELECT w, cnt, 0, CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
         |    CAST([] AS INT[]) FROM vocab
         |  UNION ALL
         |  SELECT s.w, s.cnt, s.i + 1,
         |    ${bestExpr(UniMaxPieceLen)}, s.v1, s.v2, s.v3,
         |    list_append(s.bps, ${blExpr(UniMaxPieceLen)})
         |  FROM fwd$r s JOIN wp$r wp ON wp.w = s.w AND wp.i = s.i + 1
         |  WHERE s.i < length(s.w)),
         |fin$r AS (SELECT w, cnt, bps FROM fwd$r WHERE i = length(w)),
         |bt$r(w, cnt, cur, bps, pieces) AS (
         |  SELECT w, cnt, length(w), bps, CAST([] AS VARCHAR[]) FROM fin$r
         |  UNION ALL
         |  SELECT w, cnt, cur - bps[cur], bps, list_append(pieces, substr(w, cur - bps[cur] + 1, bps[cur]))
         |  FROM bt$r WHERE cur > 0),
         |cnt$r AS MATERIALIZED (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS n
         |  FROM (SELECT unnest(pieces) AS piece, cnt FROM bt$r WHERE cur = 0) GROUP BY piece)""".stripMargin
    // inventory after round r: chars keep their (possibly 0) counts,
    // multi-char pieces with n > 0 ranked (n DESC, piece) keep the top
    def inv(r: Int): String =
      s"""inv$r AS MATERIALIZED (
         |  SELECT c.piece, COALESCE(t.n, CAST(0 AS BIGINT)) AS n FROM chars c LEFT JOIN cnt$r t USING (piece)
         |  UNION ALL
         |  SELECT piece, n FROM cnt$r WHERE length(piece) >= 2
         |  QUALIFY ROW_NUMBER() OVER (ORDER BY n DESC, piece) <= $UniKeepPieces)""".stripMargin
    def probs(r: Int): String =
      s"""p$r AS MATERIALIZED (SELECT piece,
         |  CAST(n + 1 AS DOUBLE) / CAST((SELECT SUM(n) + COUNT(*) FROM inv$r) AS DOUBLE) AS p
         |  FROM inv$r)""".stripMargin
    val rounds = (1 to UniEmRounds)
      .map(r => s"${round(r, s"p${r - 1}")},\n${inv(r)},\n${probs(r)}")
      .mkString(",\n")
    val chain =
      s"""WITH RECURSIVE voc AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) >= 1 GROUP BY w),
         |vocab AS MATERIALIZED (SELECT w, cnt FROM voc WHERE length(w) <= $UniMaxWordLen),
         |occ AS MATERIALIZED (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS n FROM (
         |  SELECT substr(v.w, pos.i, ln.l) AS piece, v.cnt
         |  FROM vocab v
         |  CROSS JOIN (SELECT unnest(generate_series(1, $UniMaxWordLen)) AS i) pos
         |  CROSS JOIN (SELECT unnest(generate_series(1, $UniMaxPieceLen)) AS l) ln
         |  WHERE pos.i + ln.l - 1 <= length(v.w)) GROUP BY piece),
         |chars AS (SELECT piece, n FROM occ WHERE length(piece) = 1),
         |inv0 AS MATERIALIZED (
         |  SELECT piece, n FROM chars
         |  UNION ALL
         |  SELECT piece, n FROM occ WHERE length(piece) >= 2
         |  QUALIFY ROW_NUMBER() OVER (ORDER BY n DESC, piece) <= $UniSeedCandidates),
         |${probs(0)},
         |$rounds""".stripMargin
    (chain, round _)
  }

  val c109UnigramTrain: String = {
    import graft.operators.TextAnalysis.UniEmRounds
    s"""$unigramChain
       |SELECT i.piece, i.n AS n_tokens, p.p AS prob
       |FROM inv$UniEmRounds i JOIN p$UniEmRounds p USING (piece)""".stripMargin
  }

  /** c111 = one more Viterbi round under the FINAL probabilities on
    * top of the shared trainer chain, emitting each word's
    * segmentation record; the piece-sequence fingerprint reverses the
    * backtrack's end-to-start order exactly as the Spark side does.
    */
  val c111UnigramSegment: String = {
    import graft.operators.TextAnalysis.UniEmRounds
    val applyRound = UniEmRounds + 1
    s"""$unigramChain,
       |${unigramRound(applyRound, s"p$UniEmRounds")}
       |SELECT b.w, b.cnt,
       |  CAST(length(b.w) AS BIGINT) AS n_chars,
       |  CAST(len(b.pieces) AS BIGINT) AS n_pieces,
       |  md5(array_to_string(list_reverse(b.pieces), ' ')) AS pieces_md5
       |FROM bt$applyRound b
       |WHERE b.cur = 0""".stripMargin
  }

  /** c64 = the NAIVE global definition the two-phase plan must equal:
    * per-lang row_number over (quality DESC, doc_id), kept while
    * rn ≤ ceil(n·num/den) (as the integer cross-product 10·rn ≤ 3n+9).
    */
  val c64QualityTopFrac: String = {
    import graft.operators.Sampling.{QTopNum, QTopDen}
    s"""WITH $qualityCtes,
       |j AS (SELECT d.doc_id, d.lang, qs.quality_score
       |  FROM documents d JOIN qs ON qs.doc_id = d.doc_id),
       |n AS (SELECT lang, COUNT(*) AS cnt FROM j GROUP BY lang),
       |r AS (SELECT j.*, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY quality_score DESC, doc_id) AS rn FROM j)
       |SELECT r.lang, r.doc_id, r.quality_score
       |FROM r JOIN n USING (lang)
       |WHERE rn * $QTopDen <= cnt * $QTopNum + ${QTopDen - 1}""".stripMargin
  }

  /** c46 = Efraimidis-Spirakis priority keys u^(1/w) with power-of-two
    * weights (sqrt chains — correctly rounded in both engines), per-lang
    * top-k by (priority DESC, doc_id).
    */
  val c46WeightedSample: String = {
    import graft.operators.Sampling.{WeightHighQuality, WeightMidQuality, WeightedSampleK}
    s"""WITH $qualityCtes,
       |w AS (SELECT d.doc_id, d.lang,
       |  CASE WHEN quality_score >= $WeightHighQuality THEN 4
       |       WHEN quality_score >= $WeightMidQuality THEN 2 ELSE 1 END AS wt,
       |  CAST(CAST(concat('0x', substr(md5('wsamp_' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
       |FROM documents d JOIN qs ON qs.doc_id = d.doc_id),
       |p AS (SELECT doc_id, lang, CAST(wt AS BIGINT) AS weight,
       |  CASE wt WHEN 4 THEN sqrt(sqrt(u)) WHEN 2 THEN sqrt(u) ELSE u END AS priority FROM w),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY priority DESC, doc_id) AS rn FROM p)
       |SELECT lang, doc_id, weight, priority FROM r WHERE rn <= $WeightedSampleK""".stripMargin
  }

  /** c47 = per-position duplicated-window coverage: same rolling hash
    * as the engine (shared [[graft.functions.TextFunctions.rollCoeffs]]
    * constants), corpus-wide count ≥ 2, covered positions expanded and
    * counted distinct per doc.
    */
  val c47DupSpans: String = {
    import graft.functions.TextFunctions.{rollCoeffs, RollP}
    import graft.operators.TextAnalysis.DupSpanW
    val n1 = DupSpanW - 1
    val terms = rollCoeffs(DupSpanW).zipWithIndex
      .map { case (k, j) => s"ht[i + $j] * $k" }
      .mkString(" + ")
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |toks AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
       |  list_transform(w, t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)) AS ht FROM docs),
       |pos AS (SELECT doc_id, ht, unnest(generate_series(1, greatest(len(ht) - $n1, 0))) AS i FROM toks),
       |occ AS (SELECT doc_id, i, ($terms) % $RollP AS h FROM pos),
       |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
       |ext AS (SELECT doc_id, i, unnest(generate_series(0, $n1)) AS j FROM occ JOIN dup USING (h)),
       |cov AS (SELECT doc_id, count(DISTINCT i + j) AS n_dup_tokens FROM ext GROUP BY doc_id)
       |SELECT c.doc_id, t.n_tokens, CAST(c.n_dup_tokens AS BIGINT) AS n_dup_tokens,
       |  CAST(c.n_dup_tokens AS DOUBLE) / t.n_tokens AS dup_frac
       |FROM cov c JOIN toks t ON t.doc_id = c.doc_id""".stripMargin
  }

  /** c103 = c47's duplicated-window stream, then gaps-and-islands per
    * doc: consecutive 1-based window starts group on
    * i − row_number() and each island is one maximal span covering
    * tokens [min(i), max(i) + W − 1]. Same rolling-hash constants as
    * the engine; positions are integers end-to-end, so hash-exact.
    */
  val c103ExactSubstrSpans: String = {
    import graft.functions.TextFunctions.{rollCoeffs, RollP}
    import graft.operators.TextAnalysis.DupSpanW
    val n1 = DupSpanW - 1
    val terms = rollCoeffs(DupSpanW).zipWithIndex
      .map { case (k, j) => s"ht[i + $j] * $k" }
      .mkString(" + ")
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |toks AS (SELECT doc_id,
       |  list_transform(w, t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)) AS ht FROM docs),
       |pos AS (SELECT doc_id, ht, unnest(generate_series(1, greatest(len(ht) - $n1, 0))) AS i FROM toks),
       |occ AS (SELECT doc_id, i, ($terms) % $RollP AS h FROM pos),
       |dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, i FROM occ JOIN dup USING (h)),
       |r AS (SELECT doc_id, i,
       |  i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS isl FROM dp),
       |s AS (SELECT doc_id, MIN(i) AS span_start, MAX(i) + $n1 AS span_end,
       |  COUNT(*) AS n_windows FROM r GROUP BY doc_id, isl)
       |SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
       |  CAST(span_end AS BIGINT) AS span_end,
       |  CAST(span_end - span_start + 1 AS BIGINT) AS span_len,
       |  CAST(n_windows AS BIGINT) AS n_windows
       |FROM s""".stripMargin
  }

  /** c48's vocabulary is re-derived in SQL (top-V by freq, term
    * tie-break); the per-doc coverage joins each token against it, so
    * the literal-array scoring path is checked end-to-end.
    */
  val c48VocabCoverage: String = {
    import graft.operators.TextAnalysis.VocabV
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |freq AS (SELECT term, COUNT(*) AS freq FROM tok GROUP BY term),
       |vocab AS (SELECT term FROM freq ORDER BY freq DESC, term LIMIT $VocabV),
       |per AS (SELECT t.doc_id,
       |    COUNT(*) AS n_tokens,
       |    COUNT(v.term) AS n_in_vocab,
       |    COUNT(DISTINCT CASE WHEN v.term IS NULL THEN t.term END) AS n_oov_types
       |  FROM tok t LEFT JOIN vocab v ON t.term = v.term
       |  GROUP BY t.doc_id)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_in_vocab AS BIGINT) AS n_in_vocab,
       |  CAST(n_oov_types AS BIGINT) AS n_oov_types,
       |  CASE WHEN n_tokens > 0 THEN CAST(n_in_vocab AS DOUBLE) / n_tokens ELSE 0.0 END AS coverage
       |FROM per""".stripMargin
  }

  /** c45 = c33's connected-component labels, survivor = argmax quality
    * (tie → min doc_id) per cluster, singletons their own cluster.
    */
  val c45QualityCanonical: String =
    s"""WITH RECURSIVE $shingleCtes,
       |$jaccardTail,
       |nd AS (SELECT doc_a, doc_b FROM pairs
       |       JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
       |       WHERE common * $JaccardDen >= (na.ns + nb.ns - common) * $JaccardNum),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM nd UNION SELECT doc_b, doc_a FROM nd),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |),
       |labels AS (SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id FROM reach GROUP BY a),
       |$qualityCtes,
       |lab AS (SELECT d.doc_id, d.lang, COALESCE(l.cluster_id, d.doc_id) AS cluster_id, qs.quality_score
       |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
       |  JOIN qs ON qs.doc_id = d.doc_id),
       |best AS (SELECT *, ROW_NUMBER() OVER (
       |  PARTITION BY cluster_id ORDER BY quality_score DESC, doc_id) rn FROM lab)
       |SELECT cluster_id, doc_id, lang, quality_score FROM best WHERE rn = 1""".stripMargin

  val c5EmbeddingDedup: String = {
    import graft.operators.VectorOps.NearDupThreshold
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |n AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, list_dot_product(a.vn, b.vn) AS cos
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE list_dot_product(a.vn, b.vn) >= $NearDupThreshold""".stripMargin
  }

  /** c96 = the IVF co-residence near-dup pass recomputed exactly:
    * seeded centroids, top-2 assignment per vector (ties to lowest
    * cid, matching the heap's order), DISTINCT shared-list pairs (the
    * relational mirror of the Spark side's min-shared-list emit-once
    * rule), exact cosine at the shared threshold.
    */
  val c96DedupEmbeddingIvf: String = {
    import graft.operators.VectorOps.{C96Lists, NearDupThreshold}
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |cent AS (SELECT vec_id AS cid, vn AS cv FROM nm
       |  WHERE vec_id < (SELECT GREATEST($C96Lists, CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) FROM embeddings)),
       |asgr AS (SELECT n.vec_id, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.vn, c.cv) DESC, c.cid) rn
       |  FROM nm n CROSS JOIN cent c),
       |asg AS (SELECT vec_id, cid FROM asgr WHERE rn <= 2),
       |p AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id),
       |s AS (SELECT vec_a, vec_b, list_dot_product(na.vn, nb.vn) AS cos
       |  FROM p JOIN nm na ON na.vec_id = p.vec_a JOIN nm nb ON nb.vec_id = p.vec_b)
       |SELECT vec_a, vec_b, cos FROM s WHERE cos >= $NearDupThreshold""".stripMargin
  }

  val c6AnnBruteforce: String = {
    import graft.operators.VectorOps.{NumQueryVecs, TopK}
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |q AS (SELECT vec_id AS query_id, vn AS qv FROM nm WHERE vec_id < $NumQueryVecs),
       |c AS (SELECT vec_id AS neighbor_id, vn AS cv FROM nm WHERE vec_id >= $NumQueryVecs),
       |s AS (SELECT query_id, neighbor_id, list_dot_product(qv, cv) AS cos
       |  FROM q, c)
       |SELECT query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  cos
       |FROM s
       |QUALIFY rank <= $TopK""".stripMargin
  }

  /** c60 = c6 with the label-disequality predicate: top-k negatives of
    * a DIFFERENT label per query.
    */
  val c60HardNegatives: String = {
    import graft.operators.VectorOps.{NumQueryVecs, TopK}
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, label, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |q AS (SELECT vec_id AS query_id, label AS ql, vn AS qv FROM nm WHERE vec_id < $NumQueryVecs),
       |c AS (SELECT vec_id AS neighbor_id, label AS cl, vn AS cv FROM nm WHERE vec_id >= $NumQueryVecs),
       |s AS (SELECT query_id, neighbor_id, list_dot_product(qv, cv) AS cos
       |  FROM q JOIN c ON cl <> ql)
       |SELECT query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  cos
       |FROM s
       |QUALIFY rank <= $TopK""".stripMargin
  }

  /** c7's oracle is the EXACT top-5 (c6 restricted to rank ≤ 5).
    * Adjudicated: at sf0.01 AND sf0.1 the deterministic 16×3 banding
    * returns full-row identity with the brute-force ranking (pairs,
    * ranks, and bit-exact cos) — zero bucket misses — so the exact
    * oracle applies unchanged, the same way c17 gates on the c5 oracle.
    * VectorRecallSpec keeps the ≥0.9 floor as the regression tripwire.
    */
  val c7AnnLsh: String = {
    import graft.operators.VectorOps.NumQueryVecs
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |q AS (SELECT vec_id AS query_id, vn AS qv FROM nm WHERE vec_id < $NumQueryVecs),
       |c AS (SELECT vec_id AS neighbor_id, vn AS cv FROM nm WHERE vec_id >= $NumQueryVecs),
       |s AS (SELECT query_id, neighbor_id, list_dot_product(qv, cv) AS cos
       |  FROM q, c)
       |SELECT query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  cos
       |FROM s
       |QUALIFY rank <= 5""".stripMargin
  }

  /** C29 mirrors the deterministic PQ pipeline end-to-end: seeded
    * codebooks, argmax-dot encoding, ADC via a pivoted d0+d1+…+d7 sum
    * (explicit left-association — a SUM() aggregate would reorder the
    * float additions and break the hash), shortlist, exact re-rank.
    */
  val c29AnnPq: String = {
    import graft.operators.VectorOps.{NumQueryVecs, PqM, PqSubDim, PqKs, PqReRank}
    val dPivot = (0 until PqM).map(m => s"MAX(CASE WHEN m = $m THEN d END) AS d$m").mkString(", ")
    val dSum = (0 until PqM).map(m => s"d$m").reduce((a, b) => s"($a + $b)")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |ms AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS m),
       |cb AS (SELECT ms.m, s.vec_id - $NumQueryVecs AS j,
       |  list_slice(s.vn, ms.m * $PqSubDim + 1, ms.m * $PqSubDim + $PqSubDim) AS cw
       |  FROM nm s CROSS JOIN ms WHERE s.vec_id >= $NumQueryVecs AND s.vec_id < ${NumQueryVecs + PqKs}),
       |encr AS (SELECT n.vec_id, c.m, c.j,
       |  ROW_NUMBER() OVER (PARTITION BY n.vec_id, c.m
       |    ORDER BY list_dot_product(list_slice(n.vn, c.m * $PqSubDim + 1, c.m * $PqSubDim + $PqSubDim), c.cw) DESC, c.j) AS rn
       |  FROM nm n CROSS JOIN cb c WHERE n.vec_id >= $NumQueryVecs),
       |enc AS (SELECT vec_id AS neighbor_id, m, j AS code FROM encr WHERE rn = 1),
       |perm AS (SELECT q.vec_id AS query_id, enc.neighbor_id, enc.m,
       |  list_dot_product(list_slice(q.vn, enc.m * $PqSubDim + 1, enc.m * $PqSubDim + $PqSubDim), c.cw) AS d
       |  FROM enc JOIN cb c ON c.m = enc.m AND c.j = enc.code
       |  CROSS JOIN nm q WHERE q.vec_id < $NumQueryVecs),
       |adcp AS (SELECT query_id, neighbor_id, $dPivot FROM perm GROUP BY 1, 2),
       |adcv AS (SELECT query_id, neighbor_id, $dSum AS adc FROM adcp),
       |sl AS (SELECT query_id, neighbor_id FROM adcv
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) <= $PqReRank),
       |s AS (SELECT sl.query_id, sl.neighbor_id, list_dot_product(qn.vn, nn.vn) AS cos
       |  FROM sl JOIN nm qn ON qn.vec_id = sl.query_id JOIN nm nn ON nn.vec_id = sl.neighbor_id)
       |SELECT query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  cos
       |FROM s
       |QUALIFY rank <= 5""".stripMargin
  }

  val c18AnnIvf: String = {
    import graft.operators.VectorOps.{IvfLists, IvfProbes, NumQueryVecs}
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |cent AS (SELECT vec_id AS cid, vn AS cv FROM nm WHERE vec_id >= $NumQueryVecs AND vec_id < $NumQueryVecs + $IvfLists),
       |asgr AS (SELECT n.vec_id, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.vn, c.cv) DESC, c.cid) rn
       |  FROM nm n CROSS JOIN cent c WHERE n.vec_id >= $NumQueryVecs),
       |asg AS (SELECT vec_id, cid AS list_id FROM asgr WHERE rn = 1),
       |pr AS (SELECT q.vec_id AS query_id, c.cid AS list_id,
       |  ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY list_dot_product(q.vn, c.cv) DESC, c.cid) pn
       |  FROM nm q CROSS JOIN cent c WHERE q.vec_id < $NumQueryVecs),
       |s AS (SELECT p.query_id, a.vec_id AS neighbor_id, list_dot_product(qn.vn, nn.vn) AS cos
       |  FROM (SELECT query_id, list_id FROM pr WHERE pn <= $IvfProbes) p
       |  JOIN asg a ON a.list_id = p.list_id
       |  JOIN nm qn ON qn.vec_id = p.query_id JOIN nm nn ON nn.vec_id = a.vec_id)
       |SELECT query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  cos
       |FROM s
       |QUALIFY rank <= 5""".stripMargin
  }

  /** c101 = the inverted multi-index recomputed structurally: per-half
    * codebooks from the same seed ranges, per-half argmax assignment
    * via ROW_NUMBER, query cells ranked by the half-dot SUM (added in
    * the Spark operand order), top-P cells joined to the single-cell
    * members, exact cosine QUALIFY top-5. DuckDB's v[1:h] / v[h+1:2h]
    * list slices match Spark's slice() elementwise, so every float op
    * sees identical inputs.
    */
  val c101AnnImi: String = {
    import graft.operators.VectorOps.{ImiHalfKFloor, ImiCellProbes, NumQueryVecs, Dim}
    val h = Dim / 2
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |nc AS (SELECT GREATEST($ImiHalfKFloor, CAST(ROUND(SQRT(SQRT(COUNT(*)))) AS BIGINT)) AS hk FROM embeddings),
       |ca AS (SELECT CAST(vec_id - $NumQueryVecs AS INT) AS aid, vn[1:$h] AS av FROM nm
       |  WHERE vec_id >= $NumQueryVecs AND vec_id < $NumQueryVecs + (SELECT hk FROM nc)),
       |cb AS (SELECT CAST(vec_id - $NumQueryVecs - (SELECT hk FROM nc) AS INT) AS bid, vn[${h + 1}:${2 * h}] AS bv FROM nm
       |  WHERE vec_id >= $NumQueryVecs + (SELECT hk FROM nc) AND vec_id < $NumQueryVecs + 2 * (SELECT hk FROM nc)),
       |mar AS (SELECT n.vec_id, a.aid,
       |  ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.vn[1:$h], a.av) DESC, a.aid) rn
       |  FROM nm n CROSS JOIN ca a WHERE n.vec_id >= $NumQueryVecs),
       |mbr AS (SELECT n.vec_id, b.bid,
       |  ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.vn[${h + 1}:${2 * h}], b.bv) DESC, b.bid) rn
       |  FROM nm n CROSS JOIN cb b WHERE n.vec_id >= $NumQueryVecs),
       |mem AS (SELECT a.vec_id, a.aid, b.bid FROM (SELECT vec_id, aid FROM mar WHERE rn = 1) a
       |  JOIN (SELECT vec_id, bid FROM mbr WHERE rn = 1) b USING (vec_id)),
       |qa AS (SELECT q.vec_id AS query_id, a.aid, list_dot_product(q.vn[1:$h], a.av) AS da
       |  FROM nm q CROSS JOIN ca a WHERE q.vec_id < $NumQueryVecs),
       |qb AS (SELECT q.vec_id AS query_id, b.bid, list_dot_product(q.vn[${h + 1}:${2 * h}], b.bv) AS db
       |  FROM nm q CROSS JOIN cb b WHERE q.vec_id < $NumQueryVecs),
       |qc AS (SELECT query_id, aid, bid,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY da + db DESC, aid, bid) cn
       |  FROM qa JOIN qb USING (query_id)),
       |s AS (SELECT c.query_id, m.vec_id AS neighbor_id, list_dot_product(qn.vn, nn.vn) AS cos
       |  FROM (SELECT query_id, aid, bid FROM qc
       |        WHERE cn <= (SELECT GREATEST($ImiCellProbes, 4 * hk) FROM nc)) c
       |  JOIN mem m ON m.aid = c.aid AND m.bid = c.bid
       |  JOIN nm qn ON qn.vec_id = c.query_id JOIN nm nn ON nn.vec_id = m.vec_id)
       |SELECT query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  cos
       |FROM s
       |QUALIFY rank <= 5""".stripMargin
  }

  /** c106 = the trained inverted multi-index recomputed end to end:
    * the c24 sample/init/Lloyd chain UNROLLED TWICE — once per
    * half-slice (vn[1:32] / vn[33:64]) — then c101's cell algebra
    * (per-half argmax membership, half-dot-sum cell rank, top-P cell
    * probe, exact-cosine top-5) against the trained codebooks. Every
    * float op (slice dots, ordered member folds, normalized means,
    * da + db) is the established bit-stable idiom, so the gate is
    * hash-exact.
    */
  /** Shared trained-IMI CTE prefix (e → nm → nc → q/cand → sample →
    * two unrolled half-Lloyd chains → per-half corpus membership `mem`
    * → per-query ranked cells `qc`) — c106 appends the exact-cosine
    * probe scan, c108 appends the residual-PQ ADC chain.
    */
  private val imiTrainedPrefix: String = {
    import graft.operators.VectorOps.{C106Iters, Dim, ImiHalfKFloor, NumQueryVecs, SampleHashMod, TrainSampleN}
    val h = Dim / 2
    def lloyd(pfx: String, lo: Int, hi: Int): String = {
      val rounds = (1 to C106Iters)
        .map { i =>
          val prev = s"${pfx}cent${i - 1}"
          s"""${pfx}asg$i AS (SELECT s.neighbor_id, s.hv, c.cid,
             |  ROW_NUMBER() OVER (PARTITION BY s.neighbor_id ORDER BY list_dot_product(s.hv, c.cv) DESC, c.cid) rn
             |  FROM ${pfx}samp s CROSS JOIN $prev c),
             |${pfx}dim$i AS (SELECT cid, neighbor_id, unnest(generate_series(1, len(hv))) AS pos, unnest(hv) AS val
             |  FROM ${pfx}asg$i WHERE rn = 1),
             |${pfx}sum$i AS (SELECT cid, pos, list_reduce(list(val ORDER BY neighbor_id), (a, b) -> a + b) AS s, COUNT(*) AS n
             |  FROM ${pfx}dim$i GROUP BY cid, pos),
             |${pfx}vec$i AS (SELECT cid, list(s / n ORDER BY pos) AS mv FROM ${pfx}sum$i GROUP BY cid),
             |${pfx}cent$i AS (SELECT p.cid,
             |  CASE WHEN v.mv IS NULL OR sqrt(list_dot_product(v.mv, v.mv)) = 0 THEN p.cv
             |       ELSE list_transform(v.mv, x -> x / sqrt(list_dot_product(v.mv, v.mv))) END AS cv
             |  FROM $prev p LEFT JOIN ${pfx}vec$i v ON v.cid = p.cid)""".stripMargin
        }
        .mkString(",\n")
      s"""${pfx}samp AS (SELECT neighbor_id, vn[$lo:$hi] AS hv FROM samp),
         |${pfx}cent0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(neighbor_id AS VARCHAR))) AS INT) - 1 AS cid, hv AS cv
         |  FROM ${pfx}samp QUALIFY cid < (SELECT hk FROM nc)),
         |$rounds""".stripMargin
    }
    val (af, bf) = (s"acent$C106Iters", s"bcent$C106Iters")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |nc AS (SELECT GREATEST($ImiHalfKFloor, CAST(ROUND(SQRT(SQRT(COUNT(*)))) AS BIGINT)) AS hk FROM embeddings),
       |q AS (SELECT vec_id AS query_id, vn AS qv FROM nm WHERE vec_id < $NumQueryVecs),
       |cand AS (SELECT vec_id AS neighbor_id, vn FROM nm WHERE vec_id >= $NumQueryVecs),
       |samp AS (SELECT neighbor_id, vn FROM cand, (SELECT COUNT(*) AS n FROM cand)
       |  WHERE CAST(concat('0x', substr(md5(CAST(neighbor_id AS VARCHAR)), 1, 8)) AS BIGINT) % $SampleHashMod
       |        < GREATEST(1, CAST(CEIL($SampleHashMod.0 * $TrainSampleN / n) AS BIGINT))),
       |${lloyd("a", 1, h)},
       |${lloyd("b", h + 1, 2 * h)},
       |mar AS (SELECT n.neighbor_id, a.cid AS aid,
       |  ROW_NUMBER() OVER (PARTITION BY n.neighbor_id ORDER BY list_dot_product(n.vn[1:$h], a.cv) DESC, a.cid) rn
       |  FROM cand n CROSS JOIN $af a),
       |mbr AS (SELECT n.neighbor_id, b.cid AS bid,
       |  ROW_NUMBER() OVER (PARTITION BY n.neighbor_id ORDER BY list_dot_product(n.vn[${h + 1}:${2 * h}], b.cv) DESC, b.cid) rn
       |  FROM cand n CROSS JOIN $bf b),
       |mem AS (SELECT a.neighbor_id, a.aid, b.bid FROM (SELECT neighbor_id, aid FROM mar WHERE rn = 1) a
       |  JOIN (SELECT neighbor_id, bid FROM mbr WHERE rn = 1) b USING (neighbor_id)),
       |qa AS (SELECT q.query_id, a.cid AS aid, list_dot_product(q.qv[1:$h], a.cv) AS da
       |  FROM q CROSS JOIN $af a),
       |qb AS (SELECT q.query_id, b.cid AS bid, list_dot_product(q.qv[${h + 1}:${2 * h}], b.cv) AS db
       |  FROM q CROSS JOIN $bf b),
       |qc AS (SELECT query_id, aid, bid,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY da + db DESC, aid, bid) cn
       |  FROM qa JOIN qb USING (query_id))""".stripMargin
  }

  val c106AnnImiTrained: String = {
    import graft.operators.VectorOps.ImiCellProbes
    s"""$imiTrainedPrefix,
       |s AS (SELECT c.query_id, m.neighbor_id, list_dot_product(qn.qv, nn.vn) AS cos
       |  FROM (SELECT query_id, aid, bid FROM qc
       |        WHERE cn <= (SELECT GREATEST($ImiCellProbes, 4 * hk) FROM nc)) c
       |  JOIN mem m ON m.aid = c.aid AND m.bid = c.bid
       |  JOIN q qn ON qn.query_id = c.query_id JOIN cand nn ON nn.neighbor_id = m.neighbor_id)
       |SELECT query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  cos
       |FROM s
       |QUALIFY rank <= 5""".stripMargin
  }

  /** c108 = Multi-D-ADC recomputed structurally on the shared
    * trained-IMI prefix: per-half seed assignment against the final
    * half-codebooks → seed residuals vs the CONCATENATED cell centroid
    * → per-subspace residual codebooks → corpus residual encoding
    * (min-L2 codeword, ties low j) → probed-cell ADC as
    * (da + db) + ((d0 + d1) + … + d7) — exactly the Spark side's
    * `cellDot + adcScore(...)` association — → exact re-rank of the
    * shortlist. Identical float ops in identical order throughout.
    */
  val c108AnnImiAdc: String = {
    import graft.operators.VectorOps.{C106Iters, Dim, ImiCellProbes, NumQueryVecs, PqKs, PqM, PqReRank, PqSubDim}
    val h = Dim / 2
    val (af, bf) = (s"acent$C106Iters", s"bcent$C106Iters")
    val dPivot = (0 until PqM).map(m => s"MAX(CASE WHEN m = $m THEN d END) AS d$m").mkString(", ")
    val dSum = (0 until PqM).map(m => s"d$m").reduce((a, b) => s"($a + $b)")
    s"""$imiTrainedPrefix,
       |cells AS (SELECT query_id, aid, bid FROM qc
       |  WHERE cn <= (SELECT GREATEST($ImiCellProbes, 4 * hk) FROM nc)),
       |ms AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS m),
       |seeds AS (SELECT vec_id - $NumQueryVecs AS sj, vn FROM nm
       |  WHERE vec_id >= $NumQueryVecs AND vec_id < ${NumQueryVecs + PqKs}),
       |sa AS (SELECT s.sj, a.cv AS acv,
       |  ROW_NUMBER() OVER (PARTITION BY s.sj ORDER BY list_dot_product(s.vn[1:$h], a.cv) DESC, a.cid) rn
       |  FROM seeds s CROSS JOIN $af a),
       |sb AS (SELECT s.sj, b.cv AS bcv,
       |  ROW_NUMBER() OVER (PARTITION BY s.sj ORDER BY list_dot_product(s.vn[${h + 1}:${2 * h}], b.cv) DESC, b.cid) rn
       |  FROM seeds s CROSS JOIN $bf b),
       |sres AS (SELECT s.sj,
       |  list_transform(generate_series(1, len(s.vn)), i -> s.vn[i] - (sa.acv || sb.bcv)[i]) AS rv
       |  FROM seeds s JOIN sa ON sa.sj = s.sj AND sa.rn = 1 JOIN sb ON sb.sj = s.sj AND sb.rn = 1),
       |cbr AS (SELECT ms.m, r.sj AS j,
       |  list_slice(r.rv, ms.m * $PqSubDim + 1, ms.m * $PqSubDim + $PqSubDim) AS cw
       |  FROM sres r CROSS JOIN ms),
       |cres AS (SELECT m.neighbor_id, m.aid, m.bid,
       |  list_transform(generate_series(1, len(nn.vn)), i -> nn.vn[i] - (ca.cv || cb2.cv)[i]) AS rv
       |  FROM mem m JOIN cand nn ON nn.neighbor_id = m.neighbor_id
       |  JOIN $af ca ON ca.cid = m.aid JOIN $bf cb2 ON cb2.cid = m.bid),
       |encr AS (SELECT n.neighbor_id, n.aid, n.bid, c.m, c.j,
       |  ROW_NUMBER() OVER (PARTITION BY n.neighbor_id, c.m
       |    ORDER BY (list_dot_product(list_slice(n.rv, c.m * $PqSubDim + 1, c.m * $PqSubDim + $PqSubDim), c.cw)
       |              - 0.5 * list_dot_product(c.cw, c.cw)) DESC, c.j) AS rn
       |  FROM cres n CROSS JOIN cbr c),
       |enc AS (SELECT neighbor_id, aid, bid, m, j AS code FROM encr WHERE rn = 1),
       |perm AS (SELECT p.query_id, enc.neighbor_id, enc.aid, enc.bid, enc.m,
       |  list_dot_product(list_slice(q.qv, enc.m * $PqSubDim + 1, enc.m * $PqSubDim + $PqSubDim), c.cw) AS d
       |  FROM cells p JOIN enc ON enc.aid = p.aid AND enc.bid = p.bid
       |  JOIN q ON q.query_id = p.query_id
       |  JOIN cbr c ON c.m = enc.m AND c.j = enc.code),
       |adcp AS (SELECT query_id, neighbor_id, aid, bid, $dPivot FROM perm GROUP BY 1, 2, 3, 4),
       |adcv AS (SELECT a.query_id, a.neighbor_id,
       |  (list_dot_product(q.qv[1:$h], ca.cv) + list_dot_product(q.qv[${h + 1}:${2 * h}], cb2.cv) + $dSum) AS adc
       |  FROM adcp a JOIN q ON q.query_id = a.query_id
       |  JOIN $af ca ON ca.cid = a.aid JOIN $bf cb2 ON cb2.cid = a.bid),
       |sl AS (SELECT query_id, neighbor_id FROM adcv
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) <= $PqReRank),
       |s AS (SELECT sl.query_id, sl.neighbor_id, list_dot_product(q.qv, nn.vn) AS cos
       |  FROM sl JOIN q ON q.query_id = sl.query_id JOIN cand nn ON nn.neighbor_id = sl.neighbor_id)
       |SELECT query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  cos
       |FROM s
       |QUALIFY rank <= 5""".stripMargin
  }

  /** c24 = the TRAINED-quantizer IVF pipeline recomputed end to end:
    * md5-threshold training sample, init = first k sample vectors in
    * md5-of-id order, the Lloyd iterations UNROLLED (one CTE chain per
    * round: argmax assignment → per-(list, dim) strict sequential fold
    * over members in ascending neighbor_id order via
    * `list_reduce(list(val ORDER BY neighbor_id))` → normalized means,
    * empty lists keep the previous centroid), then the c18-shaped
    * assignment / probe / top-k plus the recall@5 instrumentation
    * column vs the exact brute-force top-5. Bit-exact against the Spark
    * side because trainCentroids folds the identical adds in the
    * identical order (see its scaladoc); every other float op is the
    * established list_dot_product / division idiom.
    */
  /** Shared trained-IVF CTE prefix (e → nm → q/cand → sample → init →
    * unrolled Lloyd rounds → final assignment `corpus` → per-query
    * `probe` lists) — c24 appends the exact-cosine scan + recall
    * instrumentation, c104 appends the residual-PQ ADC chain.
    */
  private val ivfTrainedPrefix: String = {
    import graft.operators.VectorOps.{C24Iters, C24Lists, C24Probes, NumQueryVecs, SampleHashMod, TrainSampleN}
    val iterCtes = (1 to C24Iters)
      .map { i =>
        val prev = s"cent${i - 1}"
        s"""asg$i AS (SELECT s.neighbor_id, s.vn, c.cid,
           |  ROW_NUMBER() OVER (PARTITION BY s.neighbor_id ORDER BY list_dot_product(s.vn, c.cv) DESC, c.cid) rn
           |  FROM samp s CROSS JOIN $prev c),
           |dim$i AS (SELECT cid, neighbor_id, unnest(generate_series(1, len(vn))) AS pos, unnest(vn) AS val
           |  FROM asg$i WHERE rn = 1),
           |sum$i AS (SELECT cid, pos, list_reduce(list(val ORDER BY neighbor_id), (a, b) -> a + b) AS s, COUNT(*) AS n
           |  FROM dim$i GROUP BY cid, pos),
           |vec$i AS (SELECT cid, list(s / n ORDER BY pos) AS mv FROM sum$i GROUP BY cid),
           |cent$i AS (SELECT p.cid,
           |  CASE WHEN v.mv IS NULL OR sqrt(list_dot_product(v.mv, v.mv)) = 0 THEN p.cv
           |       ELSE list_transform(v.mv, x -> x / sqrt(list_dot_product(v.mv, v.mv))) END AS cv
           |  FROM $prev p LEFT JOIN vec$i v ON v.cid = p.cid)""".stripMargin
      }
      .mkString(",\n")
    val centF = s"cent$C24Iters"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |q AS (SELECT vec_id AS query_id, vn AS qv FROM nm WHERE vec_id < $NumQueryVecs),
       |cand AS (SELECT vec_id AS neighbor_id, vn FROM nm WHERE vec_id >= $NumQueryVecs),
       |samp AS (SELECT neighbor_id, vn FROM cand, (SELECT COUNT(*) AS n FROM cand)
       |  WHERE CAST(concat('0x', substr(md5(CAST(neighbor_id AS VARCHAR)), 1, 8)) AS BIGINT) % $SampleHashMod
       |        < GREATEST(1, CAST(CEIL($SampleHashMod.0 * $TrainSampleN / n) AS BIGINT))),
       |cent0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(neighbor_id AS VARCHAR))) AS INT) - 1 AS cid, vn AS cv
       |  FROM samp QUALIFY cid < $C24Lists),
       |$iterCtes,
       |asgF AS (SELECT cand.neighbor_id, cand.vn, c.cid AS list_id,
       |  ROW_NUMBER() OVER (PARTITION BY cand.neighbor_id ORDER BY list_dot_product(cand.vn, c.cv) DESC, c.cid) rn
       |  FROM cand CROSS JOIN $centF c),
       |corpus AS (SELECT neighbor_id, vn, list_id FROM asgF WHERE rn = 1),
       |probe AS (SELECT query_id, qv, cid AS list_id FROM (
       |  SELECT q.query_id, q.qv, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY list_dot_product(q.qv, c.cv) DESC, c.cid) pn
       |  FROM q CROSS JOIN $centF c) WHERE pn <= $C24Probes)""".stripMargin
  }

  val c24AnnIvfTrained: String = {
    s"""$ivfTrainedPrefix,
       |s AS (SELECT p.query_id, corpus.neighbor_id, list_dot_product(p.qv, corpus.vn) AS cos
       |  FROM probe p JOIN corpus ON corpus.list_id = p.list_id),
       |ivf AS (SELECT query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank, cos
       |  FROM s QUALIFY rank <= 5),
       |ex AS (SELECT query_id, neighbor_id FROM (
       |  SELECT q.query_id, cand.neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY list_dot_product(q.qv, cand.vn) DESC, cand.neighbor_id) rn
       |  FROM q CROSS JOIN cand) WHERE rn <= 5),
       |hits AS (SELECT i.query_id, COUNT(*) AS n_hits
       |  FROM ivf i JOIN ex ON ex.query_id = i.query_id AND ex.neighbor_id = i.neighbor_id
       |  GROUP BY i.query_id)
       |SELECT i.query_id, i.neighbor_id, i.rank, i.cos,
       |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 5.0 AS recall_at_5
       |FROM ivf i LEFT JOIN hits h ON h.query_id = i.query_id""".stripMargin
  }

  /** c104 = IVFADC recomputed structurally on the shared trained-IVF
    * prefix: seed residuals against each seed's own argmax centroid →
    * per-subspace residual codebooks → corpus residual encoding
    * (min-L2 codeword via argmax dot − ‖cw‖²/2, ties low j) →
    * probed-list ADC as
    * centDot + ((d0 + d1) + … + d7) — the Spark side's
    * `centDot + adcScore(...)` association, exactly →
    * exact re-rank of the shortlist. Every float op sees identical
    * inputs in identical order, so the gate is hash-exact.
    */
  val c104AnnIvfAdc: String = {
    import graft.operators.VectorOps.{C24Iters, NumQueryVecs, PqKs, PqM, PqReRank, PqSubDim}
    val centF = s"cent$C24Iters"
    val dPivot = (0 until PqM).map(m => s"MAX(CASE WHEN m = $m THEN d END) AS d$m").mkString(", ")
    val dSum = (0 until PqM).map(m => s"d$m").reduce((a, b) => s"($a + $b)")
    s"""$ivfTrainedPrefix,
       |ms AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS m),
       |seeds AS (SELECT vec_id - $NumQueryVecs AS sj, vn FROM nm
       |  WHERE vec_id >= $NumQueryVecs AND vec_id < ${NumQueryVecs + PqKs}),
       |sasg AS (SELECT s.sj, s.vn, c.cv,
       |  ROW_NUMBER() OVER (PARTITION BY s.sj ORDER BY list_dot_product(s.vn, c.cv) DESC, c.cid) rn
       |  FROM seeds s CROSS JOIN $centF c),
       |sres AS (SELECT sj, list_transform(generate_series(1, len(vn)), i -> vn[i] - cv[i]) AS rv
       |  FROM sasg WHERE rn = 1),
       |cbr AS (SELECT ms.m, r.sj AS j,
       |  list_slice(r.rv, ms.m * $PqSubDim + 1, ms.m * $PqSubDim + $PqSubDim) AS cw
       |  FROM sres r CROSS JOIN ms),
       |cres AS (SELECT co.neighbor_id, co.list_id,
       |  list_transform(generate_series(1, len(co.vn)), i -> co.vn[i] - c.cv[i]) AS rv
       |  FROM corpus co JOIN $centF c ON c.cid = co.list_id),
       |encr AS (SELECT n.neighbor_id, n.list_id, c.m, c.j,
       |  ROW_NUMBER() OVER (PARTITION BY n.neighbor_id, c.m
       |    ORDER BY (list_dot_product(list_slice(n.rv, c.m * $PqSubDim + 1, c.m * $PqSubDim + $PqSubDim), c.cw)
       |              - 0.5 * list_dot_product(c.cw, c.cw)) DESC, c.j) AS rn
       |  FROM cres n CROSS JOIN cbr c),
       |enc AS (SELECT neighbor_id, list_id, m, j AS code FROM encr WHERE rn = 1),
       |perm AS (SELECT p.query_id, enc.neighbor_id, enc.list_id, enc.m,
       |  list_dot_product(list_slice(p.qv, enc.m * $PqSubDim + 1, enc.m * $PqSubDim + $PqSubDim), c.cw) AS d
       |  FROM probe p JOIN enc ON enc.list_id = p.list_id
       |  JOIN cbr c ON c.m = enc.m AND c.j = enc.code),
       |adcp AS (SELECT query_id, neighbor_id, list_id, $dPivot FROM perm GROUP BY 1, 2, 3),
       |adcv AS (SELECT a.query_id, a.neighbor_id,
       |  (list_dot_product(q.qv, c.cv) + $dSum) AS adc
       |  FROM adcp a JOIN q ON q.query_id = a.query_id JOIN $centF c ON c.cid = a.list_id),
       |sl AS (SELECT query_id, neighbor_id FROM adcv
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) <= $PqReRank),
       |s AS (SELECT sl.query_id, sl.neighbor_id, list_dot_product(q.qv, nn.vn) AS cos
       |  FROM sl JOIN q ON q.query_id = sl.query_id JOIN cand nn ON nn.neighbor_id = sl.neighbor_id)
       |SELECT query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  cos
       |FROM s
       |QUALIFY rank <= 5""".stripMargin
  }

  /** c61 = the IVF-bucketed kNN graph recomputed exactly: seeded
    * centroid assignment over ALL vectors, top-P probe lists per
    * vector, exact cosine rank within the probed lists, self excluded.
    */
  val c61KnnGraph: String = {
    import graft.operators.VectorOps.{KnnGraphLists, KnnGraphProbes, KnnGraphK}
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |cent AS (SELECT vec_id AS cid, vn AS cv FROM nm
       |  WHERE vec_id < (SELECT GREATEST($KnnGraphLists, CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) FROM embeddings)),
       |asgr AS (SELECT n.vec_id, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.vn, c.cv) DESC, c.cid) rn
       |  FROM nm n CROSS JOIN cent c),
       |asg AS (SELECT vec_id, cid AS list_id FROM asgr WHERE rn = 1),
       |pr AS (SELECT n.vec_id AS query_id, c.cid AS list_id,
       |  ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.vn, c.cv) DESC, c.cid) pn
       |  FROM nm n CROSS JOIN cent c),
       |s AS (SELECT p.query_id, a.vec_id AS neighbor_id, list_dot_product(qn.vn, nn.vn) AS cos
       |  FROM (SELECT query_id, list_id FROM pr WHERE pn <= $KnnGraphProbes) p
       |  JOIN asg a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
       |  JOIN nm qn ON qn.vec_id = p.query_id JOIN nm nn ON nn.vec_id = a.vec_id)
       |SELECT query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  cos
       |FROM s
       |QUALIFY rank <= $KnnGraphK""".stripMargin
  }

  /** c65 = the chunk-pooled doc embedding reconstructed relationally:
    * same chunk grid, same md5 stub dims, exact BIGINT dim sums, one
    * division, one normalize; emitted as per-dim columns (e0..e7) so
    * the driver's scalar compare applies.
    */
  val c65DocEmbedding: String = {
    import graft.operators.TextAnalysis.{ChunkSize, ChunkStride}
    import graft.operators.VectorOps.RagDims
    val dims = (0 until RagDims)
      .map(j => s"list_transform(mv, x -> x / sqrt(list_dot_product(mv, mv)))[${j + 1}] AS e$j")
      .mkString(",\n  ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |n AS (SELECT doc_id, w, greatest(CAST(ceil(CAST(len(w) - $ChunkSize AS DOUBLE) / $ChunkStride) AS INT), 0) + 1 AS nc FROM d),
       |c AS (SELECT doc_id, nc, w, unnest(generate_series(0, nc - 1)) AS ci FROM n),
       |h AS (SELECT doc_id, nc, md5(array_to_string(list_slice(w, ci * $ChunkStride + 1, ci * $ChunkStride + $ChunkSize), ' ')) AS h FROM c),
       |e AS (SELECT doc_id, nc, t.j,
       |  CAST(concat('0x', substr(h, CAST(t.j * 4 + 1 AS INT), 4)) AS BIGINT) - 32768 AS v
       |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, ${RagDims - 1})) AS j) t),
       |s AS (SELECT doc_id, nc, j, CAST(SUM(v) AS BIGINT) AS sv FROM e GROUP BY 1, 2, 3),
       |m AS (SELECT doc_id, nc, list(CAST(sv AS DOUBLE) / nc ORDER BY j) AS mv FROM s GROUP BY 1, 2)
       |SELECT doc_id, CAST(nc AS BIGINT) AS n_chunks,
       |  $dims
       |FROM m""".stripMargin
  }

  /** c35 = the seeded-quantizer SemDeDup verdict: c18's assignment CTE
    * (argmax cos, ties to lowest cid) over ALL vectors, intra-cluster
    * keep-min-id pruning at the threshold. Output is integer/boolean
    * only — no float column reaches the hash compare.
    */
  val c35SemDedup: String = {
    import graft.operators.VectorOps.{SemLists, SemDedupThreshold}
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |cent AS (SELECT vec_id AS cid, vn AS cv FROM nm WHERE vec_id < $SemLists),
       |asgr AS (SELECT n.vec_id, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.vn, c.cv) DESC, c.cid) rn
       |  FROM nm n CROSS JOIN cent c),
       |asg AS (SELECT vec_id, cid AS list_id FROM asgr WHERE rn = 1),
       |rm AS (SELECT DISTINCT b.vec_id
       |  FROM asg a JOIN asg b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
       |  JOIN nm na ON na.vec_id = a.vec_id JOIN nm nb ON nb.vec_id = b.vec_id
       |  WHERE list_dot_product(na.vn, nb.vn) >= $SemDedupThreshold)
       |SELECT a.vec_id, a.list_id, (rm.vec_id IS NULL) AS kept
       |FROM asg a LEFT JOIN rm ON rm.vec_id = a.vec_id""".stripMargin
  }

  /** c39 = the best-centroid cosine per vector (c35's assignment CTE
    * keeping the winning cos) + the outlier flag.
    */
  /** c73 = the split coin applied to the shared shingle CTEs, train
    * side joined to test side on the 8-byte hash, clean test docs kept
    * at zero via the left join (c58's shape with the split as the
    * partition).
    */
  val c73SplitLeakage: String = {
    import graft.operators.Sampling.{SplitTrainPerMille, SplitValPerMille}
    val coin = "CAST(concat('0x', substr(md5('split_' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000"
    s"""WITH $shingleCtes,
       |lab AS (SELECT doc_id, h,
       |  CASE WHEN $coin < $SplitTrainPerMille THEN 'train'
       |       WHEN $coin < $SplitValPerMille THEN 'val'
       |       ELSE 'test' END AS split
       |  FROM shh),
       |tr AS (SELECT doc_id AS train_doc, h FROM lab WHERE split = 'train'),
       |te AS (SELECT doc_id AS test_doc, h FROM lab WHERE split = 'test'),
       |hits AS (SELECT test_doc, COUNT(DISTINCT train_doc) AS n_train_partners, COUNT(DISTINCT h) AS n_leaked
       |  FROM te JOIN tr USING (h) GROUP BY 1),
       |tot AS (SELECT test_doc, COUNT(*) AS n_shingles FROM te GROUP BY 1)
       |SELECT t.test_doc, COALESCE(x.n_train_partners, 0) AS n_train_partners,
       |  COALESCE(x.n_leaked, 0) AS n_leaked, t.n_shingles,
       |  CAST(COALESCE(x.n_leaked, 0) AS DOUBLE) / t.n_shingles AS leak_ratio
       |FROM tot t LEFT JOIN hits x USING (test_doc)""".stripMargin
  }

  /** c38's chunk-dedup oracle (lifted here so c76 can compose it). */
  val c38ChunkDedup: String = {
    import graft.operators.TextAnalysis.{ChunkSize, ChunkStride}
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
      |n AS (SELECT doc_id, w, greatest(CAST(ceil(CAST(len(w) - $ChunkSize AS DOUBLE) / $ChunkStride) AS INT), 0) + 1 AS nc FROM d),
      |c AS (SELECT doc_id, w, unnest(generate_series(0, nc - 1)) AS ci FROM n),
      |s AS (SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
      |  md5(array_to_string(list_slice(w, ci * $ChunkStride + 1, ci * $ChunkStride + $ChunkSize), ' ')) AS chunk_md5
      |FROM c),
      |cr AS (SELECT chunk_md5, doc_id AS c_doc, chunk_idx AS c_idx,
      |  ROW_NUMBER() OVER (PARTITION BY chunk_md5 ORDER BY doc_id, chunk_idx) AS rn FROM s),
      |canon AS (SELECT chunk_md5, c_doc, c_idx FROM cr WHERE rn = 1)
      |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(count(*) FILTER (WHERE NOT (k.c_doc = s.doc_id AND k.c_idx = s.chunk_idx)) AS BIGINT) AS n_dup_chunks,
      |  CAST(count(*) FILTER (WHERE NOT (k.c_doc = s.doc_id AND k.c_idx = s.chunk_idx)) AS DOUBLE) / count(*) AS dup_chunk_ratio
      |FROM s JOIN canon k USING (chunk_md5)
      |GROUP BY s.doc_id""".stripMargin
  }

  /** c68's prefix-dedup oracle (lifted here so c76 can compose it). */
  val c68PrefixDedup: String = {
    import graft.operators.TextDedup.HeadTokens
    s"""WITH d AS (SELECT doc_id, md5(text) AS full_md5,
      |  md5(array_to_string(list_slice(string_split(text, ' '), 1, $HeadTokens), ' ')) AS head_md5
      |FROM documents)
      |SELECT head_md5, COUNT(*) AS n_docs, COUNT(DISTINCT full_md5) AS n_variants, MIN(doc_id) AS keep_doc_id
      |FROM d GROUP BY head_md5
      |HAVING COUNT(*) >= 2 AND COUNT(DISTINCT full_md5) >= 2""".stripMargin
  }

  /** c76 = the one-row dedup card recomputed by composing the member
    * oracles (each already proven alone): exact, near-dup pairs,
    * clusters, prefix families, chunk dups.
    */
  lazy val c76DedupCard: String =
    s"""WITH ex AS (SELECT COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_distinct_texts FROM documents),
       |pr AS (SELECT COUNT(*) AS n_neardup_pairs FROM ($c3MinHashLsh)),
       |cl AS (SELECT COUNT(*) AS n_clustered_docs, COUNT(DISTINCT cluster_id) AS n_clusters FROM ($c16Clusters)),
       |pf AS (SELECT COUNT(*) AS n_prefix_families FROM ($c68PrefixDedup)),
       |ch AS (SELECT CAST(SUM(n_chunks) AS BIGINT) AS n_chunks_total, CAST(SUM(n_dup_chunks) AS BIGINT) AS n_dup_chunks FROM ($c38ChunkDedup))
       |SELECT ex.n_docs, ex.n_distinct_texts, ex.n_docs - ex.n_distinct_texts AS n_exact_dup_docs,
       |  pr.n_neardup_pairs, cl.n_clustered_docs, cl.n_clusters, pf.n_prefix_families,
       |  ch.n_chunks_total, ch.n_dup_chunks,
       |  CAST(ch.n_dup_chunks AS DOUBLE) / ch.n_chunks_total AS dup_chunk_ratio
       |FROM ex, pr, cl, pf, ch""".stripMargin

  /** c77 = per-source stub-embedding drift: exact HUGEINT dim sums per
    * source (cosine is scale-invariant, so the un-divided sums stand in
    * for the centroids), pairwise cosine with one double cast per
    * factor — every operation single-rounded in the same order.
    */
  val c77SourceDrift: String = {
    import graft.operators.TextAnalysis.{ChunkSize, ChunkStride}
    import graft.operators.VectorOps.RagDims
    val dimSums = (0 until RagDims)
      .map(j => s"CAST(SUM(CAST(concat('0x', substr(h, ${j * 4 + 1}, 4)) AS BIGINT) - 32768) AS HUGEINT) AS d$j")
      .mkString(",\n  ")
    val dot = (0 until RagDims).map(j => s"a.d$j * b.d$j").mkString(" + ")
    val na = (0 until RagDims).map(j => s"a.d$j * a.d$j").mkString(" + ")
    val nb = (0 until RagDims).map(j => s"b.d$j * b.d$j").mkString(" + ")
    s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') w FROM documents),
       |n AS (SELECT doc_id, source, w, greatest(CAST(ceil(CAST(len(w) - $ChunkSize AS DOUBLE) / $ChunkStride) AS INT), 0) + 1 AS nc FROM d),
       |c AS (SELECT doc_id, source, w, unnest(generate_series(0, nc - 1)) AS ci FROM n),
       |h AS (SELECT source, md5(array_to_string(list_slice(w, ci * $ChunkStride + 1, ci * $ChunkStride + $ChunkSize), ' ')) AS h FROM c),
       |s AS (SELECT source, COUNT(*) AS n_chunks,
       |  $dimSums
       |FROM h GROUP BY source)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  a.n_chunks AS n_chunks_a, b.n_chunks AS n_chunks_b,
       |  CAST(CAST($dot AS HUGEINT) AS DOUBLE)
       |    / (sqrt(CAST(CAST($na AS HUGEINT) AS DOUBLE)) * sqrt(CAST(CAST($nb AS HUGEINT) AS DOUBLE))) AS cos_drift
       |FROM s a JOIN s b ON a.source < b.source""".stripMargin
  }

  /** c74 = recall@5 of both approximate indexes recomputed from the
    * three member oracles (each deterministic, so the report is
    * hash-exact); hits by equi-join against the exact top-5.
    */
  lazy val c74AnnRecall: String =
    s"""WITH ex AS (SELECT query_id, neighbor_id FROM ($c6AnnBruteforce) WHERE rank <= 5),
       |lshm AS (SELECT query_id, neighbor_id FROM ($c7AnnLsh)),
       |ivfm AS (SELECT query_id, neighbor_id FROM ($c18AnnIvf)),
       |legs AS (SELECT 'lsh' AS method, query_id, neighbor_id FROM lshm
       |  UNION ALL SELECT 'ivf', query_id, neighbor_id FROM ivfm),
       |j AS (SELECT l.method, CASE WHEN e.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM legs l LEFT JOIN ex e ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id)
       |SELECT method, COUNT(*) AS n_returned, CAST(SUM(hit) AS BIGINT) AS n_hits,
       |  CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS recall_at_5
       |FROM j GROUP BY method""".stripMargin

  /** c69 = the seeded assignment (c35's CTE, labels carried through)
    * re-aggregated to per-list label purity; the majority vote breaks
    * count ties to the LOWEST label, mirrored in both engines.
    */
  val c69ClusterPurity: String = {
    import graft.operators.VectorOps.SemLists
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v, label FROM embeddings),
       |nm AS (SELECT vec_id, label, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |cent AS (SELECT vec_id AS cid, vn AS cv FROM nm WHERE vec_id < $SemLists),
       |asgr AS (SELECT n.vec_id, n.label, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.vn, c.cv) DESC, c.cid) rn
       |  FROM nm n CROSS JOIN cent c),
       |asg AS (SELECT vec_id, label, cid AS list_id FROM asgr WHERE rn = 1),
       |cl AS (SELECT list_id, label, COUNT(*) AS c FROM asg GROUP BY 1, 2),
       |sel AS (SELECT list_id, label, c, ROW_NUMBER() OVER (PARTITION BY list_id ORDER BY c DESC, label) rn FROM cl),
       |t AS (SELECT list_id, CAST(SUM(c) AS BIGINT) AS n_vectors FROM cl GROUP BY 1)
       |SELECT CAST(t.list_id AS BIGINT) AS list_id, t.n_vectors,
       |  CAST(s.label AS BIGINT) AS majority_label, CAST(s.c AS BIGINT) AS n_majority,
       |  CAST(s.c AS DOUBLE) / t.n_vectors AS purity
       |FROM t JOIN (SELECT * FROM sel WHERE rn = 1) s USING (list_id)""".stripMargin
  }

  /** c70 = the int8 max-abs quantization recomputed per vector: both
    * `x * 127` and the division are single correctly-rounded IEEE ops
    * in the same association both engines, so floor() agrees exactly.
    */
  val c70EmbeddingQuant: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
      |q AS (SELECT vec_id, maxabs,
      |  CASE WHEN maxabs = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
      |       ELSE list_transform(v, x -> CAST(floor(x * 127 / maxabs) AS BIGINT)) END AS codes
      |FROM m)
      |SELECT vec_id, maxabs,
      |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
      |  CAST(list_min(codes) AS BIGINT) AS code_min,
      |  CAST(list_max(codes) AS BIGINT) AS code_max,
      |  CAST(len(list_filter(codes, c -> c = 0)) AS BIGINT) AS n_zero_codes
      |FROM q""".stripMargin

  val c39EmbeddingOutliers: String = {
    import graft.operators.VectorOps.{SemLists, OutlierCosFloor}
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |cent AS (SELECT vec_id AS cid, vn AS cv FROM nm WHERE vec_id < $SemLists),
       |asgr AS (SELECT n.vec_id, c.cid, list_dot_product(n.vn, c.cv) AS cosc,
       |  ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.vn, c.cv) DESC, c.cid) rn
       |  FROM nm n CROSS JOIN cent c)
       |SELECT vec_id, cid AS list_id, cosc AS cos_centroid,
       |  (cosc < $OutlierCosFloor) AS is_outlier
       |FROM asgr WHERE rn = 1""".stripMargin
  }

  val c21Decontamination: String = {
    import graft.operators.Sampling.EvalEvery
    s"""WITH $shingleCtes,
       |ev AS (SELECT DISTINCT h FROM shh WHERE doc_id % $EvalEvery = 0),
       |corpus AS (SELECT doc_id, h FROM shh WHERE doc_id % $EvalEvery <> 0),
       |ovl AS (SELECT doc_id, count(*) AS n_overlap FROM corpus JOIN ev USING (h) GROUP BY doc_id),
       |tot AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id)
       |SELECT t.doc_id, o.n_overlap, t.n_shingles,
       |  CAST(o.n_overlap AS DOUBLE) / t.n_shingles AS contamination_ratio
       |FROM tot t JOIN ovl o USING (doc_id)""".stripMargin
  }

  /** C58 = c21's join with the aggregation flipped to the eval axis;
    * clean eval items kept at zero via the left join.
    */
  val c58DecontamReport: String = {
    import graft.operators.Sampling.EvalEvery
    s"""WITH $shingleCtes,
       |ev AS (SELECT doc_id AS eval_doc, h FROM shh WHERE doc_id % $EvalEvery = 0),
       |corpus AS (SELECT doc_id AS corpus_doc, h FROM shh WHERE doc_id % $EvalEvery <> 0),
       |hits AS (SELECT eval_doc, count(DISTINCT corpus_doc) AS n_corpus_docs, count(DISTINCT h) AS n_leaked
       |  FROM ev JOIN corpus USING (h) GROUP BY eval_doc),
       |tot AS (SELECT eval_doc, count(*) AS n_eval_shingles FROM ev GROUP BY eval_doc)
       |SELECT t.eval_doc, COALESCE(h.n_corpus_docs, 0) AS n_corpus_docs,
       |  COALESCE(h.n_leaked, 0) AS n_leaked, t.n_eval_shingles,
       |  CAST(COALESCE(h.n_leaked, 0) AS DOUBLE) / t.n_eval_shingles AS leak_ratio
       |FROM tot t LEFT JOIN hits h USING (eval_doc)""".stripMargin
  }

  /** c25's oracle recomputes the packing from the GLOBAL definition (one
    * window over everything) — DuckDB runs at test SF where that is
    * fine; the Spark side must reproduce it from the two-phase
    * distributed prefix sum exactly.
    */
  val c25SequencePacking: String = {
    import graft.operators.Sampling.PackBinTokens
    s"""WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) n FROM documents),
       |c AS (SELECT doc_id, n,
       |  COALESCE(SUM(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |FROM t)
       |SELECT CAST(off // $PackBinTokens AS BIGINT) AS bin_id,
       |  count(*) AS n_docs,
       |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
       |  MIN(doc_id) AS first_doc,
       |  MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1""".stripMargin
  }

  /** c40 = c25's flat packing definition in the salted-hash shuffle
    * order instead of doc_id order.
    */
  val c40ShuffledPacking: String = {
    import graft.operators.Sampling.PackBinTokens
    s"""WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) n,
       |  CAST(concat('0x', substr(md5('shuf_' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) h FROM documents),
       |c AS (SELECT doc_id, n,
       |  COALESCE(SUM(n) OVER (ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |FROM t)
       |SELECT CAST(off // $PackBinTokens AS BIGINT) AS bin_id,
       |  count(*) AS n_docs,
       |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
       |  MIN(doc_id) AS first_doc,
       |  MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1""".stripMargin
  }

  /** c41 = plain exact heavy hitters; the Spark side's sketch pass only
    * prunes candidates, the output contract is the full groupBy count.
    */
  val c41HeavyHitters: String =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      |g AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token)
      |SELECT token, cnt FROM g WHERE cnt * 100 >= (SELECT count(*) FROM tok)""".stripMargin

  /** c42 = the same floor(e) + hash-coin fractional copy definition,
    * expanded with generate_series; thresholds are exact integers
    * because the epoch fractions are quarters.
    */
  val c42EpochMix: String = {
    val cases = graft.operators.Sampling.EpochsByLang
      .map { case (l, e) =>
        val k = math.floor(e).toInt
        val t = ((e - math.floor(e)) * 4294967296.0).toLong
        s"WHEN '$l' THEN $k + CASE WHEN h < $t THEN 1 ELSE 0 END"
      }
      .mkString(" ")
    s"""WITH d AS (SELECT doc_id, lang,
       |  CAST(concat('0x', substr(md5('epoch_' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) h
       |FROM documents),
       |n AS (SELECT doc_id, lang, CASE lang $cases ELSE 0 END AS n_copies FROM d)
       |SELECT doc_id, lang, CAST(unnest(generate_series(0, n_copies - 1)) AS BIGINT) AS copy_idx
       |FROM n WHERE n_copies > 0""".stripMargin
  }

  /** c43 = the non-overlapping chunk grid; an instance survives iff its
    * ROW_NUMBER over (h ORDER BY doc_id, ci) is 1 (the same
    * lexicographic-min rule as Spark's min(struct)); cleaned text is
    * the ci-ordered reassembly of survivors.
    */
  val c43ChunkDedupRewrite: String = {
    val cs = graft.operators.TextAnalysis.ChunkSize
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |n AS (SELECT doc_id, w, CAST(ceil(CAST(len(w) AS DOUBLE) / $cs) AS INT) nc FROM d),
       |c AS (SELECT doc_id, w, nc, unnest(generate_series(0, nc - 1)) ci FROM n),
       |s AS (SELECT doc_id, nc, ci, list_slice(w, ci * $cs + 1, ci * $cs + $cs) cw,
       |  md5(array_to_string(list_slice(w, ci * $cs + 1, ci * $cs + $cs), ' ')) h FROM c),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, ci) rn FROM s)
       |SELECT doc_id, CAST(max(nc) AS BIGINT) AS n_chunks,
       |  CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_removed,
       |  md5(COALESCE(string_agg(array_to_string(cw, ' '), ' ' ORDER BY ci) FILTER (WHERE rn = 1), '')) AS cleaned_md5,
       |  CAST(COALESCE(SUM(len(cw)) FILTER (WHERE rn = 1), 0) AS BIGINT) AS cleaned_n_tokens
       |FROM r GROUP BY doc_id""".stripMargin
  }

  /** c44 = c26's admission verdict at doc granularity: the Bloom filter
    * is invisible to the oracle (it changes which rows pay for a join,
    * never which rows are admitted), so the SQL is the plain anti-join.
    */
  val c44BloomDedup: String = {
    import graft.operators.Sampling.IncrEvery
    s"""WITH d AS (SELECT doc_id, lang, md5(text) h FROM documents),
       |hist AS (SELECT DISTINCT h FROM d WHERE doc_id % $IncrEvery <> 0),
       |batch AS (SELECT * FROM d WHERE doc_id % $IncrEvery = 0),
       |canon AS (SELECT h, min(doc_id) doc_id FROM batch GROUP BY h)
       |SELECT b.doc_id, b.lang, b.h FROM batch b
       |  JOIN canon c ON b.doc_id = c.doc_id AND b.h = c.h
       |  WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.h = b.h)""".stripMargin
  }

  val c26DedupIncremental: String = {
    import graft.operators.Sampling.IncrEvery
    s"""WITH d AS (SELECT doc_id, lang, md5(text) h FROM documents),
       |hist AS (SELECT DISTINCT h FROM d WHERE doc_id % $IncrEvery <> 0),
       |batch AS (SELECT * FROM d WHERE doc_id % $IncrEvery = 0),
       |canon AS (SELECT h, min(doc_id) doc_id FROM batch GROUP BY h),
       |adm AS (SELECT b.doc_id, b.lang FROM batch b
       |  JOIN canon c ON b.doc_id = c.doc_id
       |  WHERE b.h NOT IN (SELECT h FROM hist))
       |SELECT lang, count(*) AS n_admitted, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM adm GROUP BY lang""".stripMargin
  }

  val c22PiiRedact: String = {
    import graft.operators.Sampling.{DigitRunPattern, EmailPattern}
    s"""WITH r AS (SELECT doc_id, text,
       |  regexp_replace(regexp_replace(text, '$EmailPattern', '<EMAIL>', 'g'), '$DigitRunPattern', '<NUM>', 'g') AS red
       |FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$EmailPattern')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$DigitRunPattern')) AS BIGINT) AS n_digit_runs,
       |  md5(red) AS redacted_md5,
       |  CAST(length(red) AS BIGINT) AS redacted_len
       |FROM r""".stripMargin
  }

  val c11Fingerprint: String =
    s"""WITH $shingleCtes
       |SELECT doc_id, min(h) AS fp_min, CAST(SUM(h) % ${MinHashParams.P} AS BIGINT) AS fp_sum
       |FROM shh GROUP BY doc_id""".stripMargin

  /** c88: ORDERED rolling hashes (no DISTINCT — winnowing needs the
    * positional sequence), per-window list_min, distinct fold —
    * integer-exact mirror of the row-local Spark pipeline.
    */
  /** Shared winnowing CTEs (docs → ordered rolling hashes →
    * per-window-min distinct selection) for c88's summary and c89's
    * match detection.
    */
  private val winnowCtes: String = {
    import graft.functions.TextFunctions.{rollCoeffs, RollP}
    import graft.operators.TextAnalysis.WinnowW
    val n = ShingleSize
    val terms = rollCoeffs(n).zipWithIndex
      .map { case (k, j) => s"ht[i + $j] * $k" }
      .mkString(" + ")
    s"""docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |toks AS (SELECT doc_id, list_transform(w, t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)) AS ht FROM docs),
       |whs AS (SELECT doc_id, list_transform(
       |  generate_series(1, greatest(len(ht) - ${n - 1}, 0)),
       |  i -> ($terms) % $RollP) AS hs FROM toks),
       |win AS (SELECT doc_id, greatest(len(hs) - $WinnowW + 1, 0) AS nw,
       |  CASE WHEN len(hs) >= $WinnowW THEN list_distinct(list_transform(
       |    generate_series(1, len(hs) - $WinnowW + 1),
       |    i -> list_min(list_slice(hs, i, i + ${WinnowW - 1}))))
       |  ELSE [] END AS sel FROM whs)""".stripMargin
  }

  val c88Winnowing: String =
    s"""WITH $winnowCtes
       |SELECT doc_id, CAST(nw AS BIGINT) AS n_windows,
       |  CAST(len(sel) AS BIGINT) AS n_fingerprints,
       |  list_min(sel) AS fp_min,
       |  CASE WHEN len(sel) > 0 THEN CAST(list_sum(sel) % ${MinHashParams.P} AS BIGINT) END AS fp_sum
       |FROM win""".stripMargin

  /** c89 = the c88 selection exploded into a df-capped inverted index,
    * pairs kept at the MOSS match floor — all integer counts.
    */
  val c89MossPairs: String = {
    import graft.operators.TextAnalysis.MossMinShared
    import graft.operators.TextDedup.MaxShingleDf
    s"""WITH $winnowCtes,
       |fps AS (SELECT doc_id, unnest(sel) AS h FROM win WHERE len(sel) > 0),
       |hot AS (SELECT h FROM fps GROUP BY h HAVING count(*) > $MaxShingleDf),
       |kept AS (SELECT doc_id, h FROM fps WHERE h NOT IN (SELECT h FROM hot))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
       |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING COUNT(*) >= $MossMinShared""".stripMargin
  }

  /** c80 recomputes the c15 score, then the declarative NTILE(3) the
    * two-phase Spark plan is provably equal to (b43's equivalence,
    * same tie-break ORDER BY lm_score, doc_id).
    */
  val c80CcnetBuckets: String = {
    import graft.operators.Sampling.CcnetTiles
    val scoreSql = c15BigramLm
    s"""WITH sc AS ($scoreSql),
       |j AS (SELECT sc.doc_id, d2.lang, sc.lm_score FROM sc JOIN documents d2 ON sc.doc_id = d2.doc_id),
       |t AS (SELECT doc_id, lang, lm_score,
       |  NTILE($CcnetTiles) OVER (PARTITION BY lang ORDER BY lm_score, doc_id) AS tl FROM j)
       |SELECT doc_id, lang, lm_score,
       |  CASE tl WHEN 1 THEN 'tail' WHEN 2 THEN 'middle' ELSE 'head' END AS ppl_bucket
       |FROM t""".stripMargin
  }

  /** c79 re-derives the md5 weight vector bucket-for-bucket (token →
    * hash32 mod QcDim → bucket-id weight), sums the integer weights
    * exactly inside the list (order-free), and mirrors the two final
    * float ops in the same order.
    */
  val c79LinearQuality: String = {
    import graft.operators.TextAnalysis.{QcDim, QcScale}
    val h = "CAST(concat('0x', substr(md5(%s), 1, 8)) AS BIGINT)"
    val bucket = h.format("t") + s" % $QcDim"
    val weight = h.format(s"concat('qw#', CAST($bucket AS VARCHAR))") + s" % ${2 * QcScale + 1} - $QcScale"
    s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') w FROM documents),
       |sc AS (SELECT doc_id, lang, CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(list_sum(list_transform(w, t -> $weight)) AS BIGINT) AS w_sum
       |FROM d)
       |SELECT doc_id, lang, n_tokens, w_sum,
       |  CAST(w_sum AS DOUBLE) / (${QcScale.toDouble} * n_tokens) AS qc_score,
       |  CAST(CAST(w_sum AS DOUBLE) / (${QcScale.toDouble} * n_tokens) > 0.0 AS INT) AS admit
       |FROM sc""".stripMargin
  }

  /** c82: per corpus vector the max/argmax over the eval set, same
    * normalize + dot as c6, tie on the lower eval id.
    */
  val c82SemanticDecontam: String = {
    import graft.operators.VectorOps.{NumQueryVecs, SemanticLeakThreshold}
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |ev AS (SELECT vec_id AS eval_id, vn AS evv FROM nm WHERE vec_id < $NumQueryVecs),
       |c AS (SELECT vec_id, vn AS cv FROM nm WHERE vec_id >= $NumQueryVecs),
       |s AS (SELECT vec_id, eval_id, list_dot_product(cv, evv) AS cos FROM c, ev),
       |r AS (SELECT vec_id, eval_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, eval_id) AS rn FROM s)
       |SELECT vec_id, eval_id AS nearest_eval, cos AS max_cos,
       |  CAST(cos >= $SemanticLeakThreshold AS INT) AS leaked
       |FROM r WHERE rn = 1""".stripMargin
  }

  /** c86: the same JVM-generated ±1 sign literals, the same
    * strict-sequential dot (list_dot_product ≡ ArrayDotProduct), the
    * same single scale multiply — bit-identical sketches.
    */
  val c86JlProjection: String = {
    import graft.operators.VectorOps.{jlSigns, JlDim}
    val scale = 1.0 / math.sqrt(JlDim.toDouble)
    val projs = jlSigns.zipWithIndex
      .map { case (row, j) =>
        s"list_dot_product(v, [${row.mkString(", ")}]) * $scale AS p$j"
      }
      .mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)
       |SELECT vec_id,
       |  $projs
       |FROM e""".stripMargin
  }

  /** c87: the full sketch-then-rerank composition mirrored stage by
    * stage — same sign literals, same 16-dim sketch dot, same
    * 50-deep shortlist cut, same exact re-rank — so the oracle gates
    * the algorithm, shortlist included.
    */
  val c87AnnJl: String = {
    import graft.operators.VectorOps.{jlSigns, JlDim, JlShortlist, NumQueryVecs, TopK}
    val scale = 1.0 / math.sqrt(JlDim.toDouble)
    val projList = jlSigns
      .map(row => s"list_dot_product(vn, [${row.mkString(", ")}]) * $scale")
      .mkString("[", ",\n    ", "]")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |pr AS (SELECT vec_id, vn,
       |  $projList AS p
       |FROM nm),
       |q AS (SELECT vec_id AS query_id, vn AS qv, p AS qp FROM pr WHERE vec_id < $NumQueryVecs),
       |c AS (SELECT vec_id AS neighbor_id, vn AS cv, p AS cp FROM pr WHERE vec_id >= $NumQueryVecs),
       |s AS (SELECT query_id, neighbor_id, qv, cv, list_dot_product(qp, cp) AS sketch_cos FROM c, q),
       |sl AS (SELECT query_id, neighbor_id, qv, cv,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sketch_cos DESC, neighbor_id) AS srn FROM s),
       |x AS (SELECT query_id, neighbor_id, list_dot_product(qv, cv) AS cos FROM sl WHERE srn <= $JlShortlist)
       |SELECT query_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
       |  cos
       |FROM x
       |QUALIFY rank <= $TopK""".stripMargin
  }

  /** c78 mirrors the Spark side slot-for-slot: top-k neighborhood
    * cosines extracted by rank into columns and folded with the SAME
    * explicit association (((c1+c2)+c3)+c4)/k, margin division written
    * in the same order — every float op correctly rounded once, so the
    * margins and the best-margin ordering are bit-identical.
    */
  val c78BitextMargin: String = {
    import graft.operators.VectorOps.{BitextSrcLabels, BitextMarginK, BitextMarginThreshold}
    // slots coalesced to 0.0 and divided by the ACTUAL neighborhood size
    // (COUNT(*) of the ≤ k survivors) — mirrors the Spark side exactly,
    // so a side with < k counterparts still yields a finite denominator
    def slots(alias: String) =
      (1 to BitextMarginK)
        .map(j => s"coalesce(max(CASE WHEN r = $j THEN cos END), 0.0)")
        .reduceLeft((a, b) => s"($a + $b)") +
        s" / CAST(COUNT(*) AS DOUBLE) AS $alias"
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, label, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |s AS (SELECT vec_id AS src_id, vn AS sv FROM nm WHERE label < $BitextSrcLabels),
       |t AS (SELECT vec_id AS tgt_id, vn AS tv FROM nm WHERE label >= $BitextSrcLabels),
       |p AS (SELECT src_id, tgt_id, list_dot_product(sv, tv) AS cos FROM s, t),
       |sr AS (SELECT src_id, cos, ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id) AS r FROM p),
       |sd AS (SELECT src_id, ${slots("denom_src")} FROM sr WHERE r <= $BitextMarginK GROUP BY src_id),
       |tr AS (SELECT tgt_id, cos, ROW_NUMBER() OVER (PARTITION BY tgt_id ORDER BY cos DESC, src_id) AS r FROM p),
       |td AS (SELECT tgt_id, ${slots("denom_tgt")} FROM tr WHERE r <= $BitextMarginK GROUP BY tgt_id),
       |m AS (SELECT p.src_id, p.tgt_id, p.cos,
       |  p.cos / ((sd.denom_src + td.denom_tgt) / 2.0) AS margin
       |  FROM p JOIN sd ON p.src_id = sd.src_id JOIN td ON p.tgt_id = td.tgt_id),
       |b AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rr FROM m)
       |SELECT src_id, tgt_id, cos, margin, CAST(margin >= $BitextMarginThreshold AS INT) AS aligned
       |FROM b WHERE rr = 1""".stripMargin
  }

  /** c90 = the IVF-candidate bitext miner recomputed exactly: one
    * centroid ranking per vector serves both the residency lists
    * (rn ≤ memberR — the round-11 multi-assignment geometry) and the
    * probe lists (rn ≤ nprobe, itself GREATEST(floor, ROUND(floor ·
    * SQRT(lists/L0))) — the probe fan scales with the √n list count,
    * mirroring VectorOps.scaledProbes), candidates are the forward ∪
    * backward list meets deduped on the pair, and the margin tail is
    * c78's slot-for-slot (coalesced slots over COUNT(*) — candidate
    * neighborhoods can run short of k by construction).
    */
  val c90BitextMarginIvf: String = {
    import graft.operators.VectorOps.{BitextIvfLists, BitextIvfProbes, BitextIvfMemberR, BitextMarginK, BitextMarginThreshold, BitextSrcLabels}
    def slots(alias: String) =
      (1 to BitextMarginK)
        .map(j => s"coalesce(max(CASE WHEN r = $j THEN cos END), 0.0)")
        .reduceLeft((a, b) => s"($a + $b)") +
        s" / CAST(COUNT(*) AS DOUBLE) AS $alias"
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       |nm AS (SELECT vec_id, label, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
       |cent AS (SELECT vec_id AS cid, vn AS cv FROM nm
       |  WHERE vec_id < (SELECT GREATEST($BitextIvfLists, CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) FROM embeddings)),
       |asgr AS (SELECT n.vec_id, n.label, c.cid,
       |  ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY list_dot_product(n.vn, c.cv) DESC, c.cid) rn
       |  FROM nm n CROSS JOIN cent c),
       |nl AS (SELECT GREATEST($BitextIvfLists, CAST(ROUND(SQRT(COUNT(*))) AS BIGINT)) AS lists FROM embeddings),
       |np AS (SELECT GREATEST($BitextIvfProbes,
       |  CAST(ROUND($BitextIvfProbes * SQRT(lists / ${BitextIvfLists}.0)) AS BIGINT)) AS probes FROM nl),
       |asg AS (SELECT vec_id, label, cid AS list_id FROM asgr WHERE rn <= $BitextIvfMemberR),
       |pr AS (SELECT vec_id, label, cid AS list_id FROM asgr WHERE rn <= (SELECT probes FROM np)),
       |fwd AS (SELECT pp.vec_id AS src_id, a.vec_id AS tgt_id FROM pr pp JOIN asg a ON a.list_id = pp.list_id
       |  WHERE pp.label < $BitextSrcLabels AND a.label >= $BitextSrcLabels),
       |bwd AS (SELECT a.vec_id AS src_id, pp.vec_id AS tgt_id FROM pr pp JOIN asg a ON a.list_id = pp.list_id
       |  WHERE pp.label >= $BitextSrcLabels AND a.label < $BitextSrcLabels),
       |pd AS (SELECT DISTINCT src_id, tgt_id FROM (SELECT * FROM fwd UNION ALL SELECT * FROM bwd)),
       |p AS (SELECT pd.src_id, pd.tgt_id, list_dot_product(s.vn, t.vn) AS cos
       |  FROM pd JOIN nm s ON s.vec_id = pd.src_id JOIN nm t ON t.vec_id = pd.tgt_id),
       |sr AS (SELECT src_id, cos, ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id) AS r FROM p),
       |sd AS (SELECT src_id, ${slots("denom_src")} FROM sr WHERE r <= $BitextMarginK GROUP BY src_id),
       |tr AS (SELECT tgt_id, cos, ROW_NUMBER() OVER (PARTITION BY tgt_id ORDER BY cos DESC, src_id) AS r FROM p),
       |td AS (SELECT tgt_id, ${slots("denom_tgt")} FROM tr WHERE r <= $BitextMarginK GROUP BY tgt_id),
       |m AS (SELECT p.src_id, p.tgt_id, p.cos,
       |  p.cos / ((sd.denom_src + td.denom_tgt) / 2.0) AS margin
       |  FROM p JOIN sd ON p.src_id = sd.src_id JOIN td ON p.tgt_id = td.tgt_id),
       |b AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rr FROM m)
       |SELECT src_id, tgt_id, cos, margin, CAST(margin >= $BitextMarginThreshold AS INT) AS aligned
       |FROM b WHERE rr = 1""".stripMargin
  }

  /** c91 = BM25 recomputed with the IDENTICAL parse tree: rational idf
    * (N − df + 0.5)/(df + 0.5) on exact BIGINT corpus stats, the same
    * (1.2 + 1.0) / (1.0 − 0.75) constant arithmetic the JVM ran, tf as
    * a list_filter length, per-query term sums folded left-to-right in
    * the same fixed term order. Every op is a single correctly-rounded
    * double op on identical inputs, so scores gate hash-exact.
    */
  val c91Bm25: String = {
    import graft.operators.TextAnalysis.{Bm25K1, Bm25B, Bm25TopK, Bm25Queries}
    val terms = Bm25Queries.flatMap(_._2.split(" ")).distinct
    val dfCols = terms
      .map(t => s"CAST(count(*) FILTER (WHERE list_contains(w, '$t')) AS BIGINT) AS df_$t")
      .mkString(",\n       |  ")
    val norm = s"($Bm25K1 * ((1.0 - $Bm25B) + ($Bm25B * (CAST(dl AS DOUBLE) / avgdl))))"
    def tf(t: String) = s"CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE)"
    def termScore(t: String) =
      s"(((n - df_$t + 0.5) / (df_$t + 0.5)) * ((${tf(t)} * ($Bm25K1 + 1.0)) / (${tf(t)} + $norm)))"
    val qSelects = Bm25Queries
      .map { case (qid, text) =>
        val score = text.split(" ").map(termScore).reduceLeft((a, b) => s"($a + $b)")
        s"SELECT CAST($qid AS BIGINT) AS query_id, doc_id, $score AS score FROM dd, st"
      }
      .mkString("\n       |  UNION ALL ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |dd AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS dl FROM d),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(CAST(SUM(CAST(len(w) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(count(*) AS BIGINT) AS avgdl,
       |  $dfCols
       |  FROM d),
       |sc AS (
       |  $qSelects),
       |b AS (SELECT query_id, doc_id, score,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
       |  FROM sc WHERE score > 0.0)
       |SELECT query_id, doc_id, CAST(rk AS BIGINT) AS rank, score FROM b WHERE rk <= $Bm25TopK""".stripMargin
  }

  /** c98 = both retrieval stages recomputed (c57's chunk/md5-embed
    * pipeline collapsed to best-chunk doc ranks; c91's BM25 parse tree
    * restricted to the shared battery) then fused: each RRF term is one
    * correctly-rounded 1.0/(60 + rank) division, summed dense-first —
    * the identical two float ops the Spark side runs.
    */
  val c98HybridRrf: String = {
    import graft.operators.TextAnalysis.{Bm25K1, Bm25B, Bm25TopK, Bm25Queries, ChunkSize, ChunkStride}
    import graft.operators.VectorOps.{RagDims, RagTopK, RagQueryTexts, RrfK}
    // the shared battery by text identity — same source as the Spark
    // side (VectorOps.rrfSharedBattery), so reordering either battery
    // remaps in BOTH engines identically
    val battery = graft.operators.VectorOps.rrfSharedBattery
    val batteryIn = battery.map(_._1).sorted.mkString(", ")
    val batteryCase = battery
      .sortBy(_._1)
      .map { case (bm, dense) => s"WHEN query_id = $bm THEN CAST($dense AS BIGINT)" }
      .mkString(" ")
    val embed =
      s"""list_transform(generate_series(0, ${RagDims - 1}),
         |  j -> CAST(CAST(concat('0x', substr(h, CAST(j * 4 + 1 AS INT), 4)) AS BIGINT) AS DOUBLE) - 32768.0)""".stripMargin
    val values = RagQueryTexts.zipWithIndex
      .map { case (t, i) => s"($i, '$t')" }
      .mkString(", ")
    // BM25 leg (c91's CTE chain, b-prefixed to avoid name clashes)
    val terms = Bm25Queries.flatMap(_._2.split(" ")).distinct
    val dfCols = terms
      .map(t => s"CAST(count(*) FILTER (WHERE list_contains(w, '$t')) AS BIGINT) AS df_$t")
      .mkString(",\n       |  ")
    val norm = s"($Bm25K1 * ((1.0 - $Bm25B) + ($Bm25B * (CAST(dl AS DOUBLE) / avgdl))))"
    def tf(t: String) = s"CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE)"
    def termScore(t: String) =
      s"(((n - df_$t + 0.5) / (df_$t + 0.5)) * ((${tf(t)} * ($Bm25K1 + 1.0)) / (${tf(t)} + $norm)))"
    val qSelects = Bm25Queries
      .map { case (qid, text) =>
        val score = text.split(" ").map(termScore).reduceLeft((a, b) => s"($a + $b)")
        s"SELECT CAST($qid AS BIGINT) AS query_id, doc_id, $score AS score FROM bdd, bst"
      }
      .mkString("\n       |  UNION ALL ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |n AS (SELECT doc_id, w, greatest(CAST(ceil(CAST(len(w) - $ChunkSize AS DOUBLE) / $ChunkStride) AS INT), 0) + 1 AS nc FROM d),
       |c AS (SELECT doc_id, w, unnest(generate_series(0, nc - 1)) AS ci FROM n),
       |s AS (SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       |  md5(array_to_string(list_slice(w, ci * $ChunkStride + 1, ci * $ChunkStride + $ChunkSize), ' ')) AS h FROM c),
       |ce AS (SELECT doc_id, chunk_idx, $embed AS v FROM s),
       |cn AS (SELECT doc_id, chunk_idx, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv FROM ce),
       |q AS (SELECT CAST(query_id AS BIGINT) AS query_id, md5(qtext) AS h FROM (VALUES $values) AS t(query_id, qtext)),
       |qe AS (SELECT query_id, $embed AS v FROM q),
       |qn AS (SELECT query_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS qv FROM qe),
       |sc AS (SELECT query_id, doc_id, chunk_idx, list_dot_product(qv, cv) AS cos FROM qn, cn),
       |dtop AS (SELECT query_id, doc_id, chunk_idx,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id, chunk_idx) AS BIGINT) AS rank
       |  FROM sc QUALIFY rank <= $RagTopK),
       |ddoc AS (SELECT query_id, doc_id, min(rank) AS mr FROM dtop GROUP BY query_id, doc_id),
       |dr AS (SELECT query_id, doc_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY mr, doc_id) AS BIGINT) AS dense_rank FROM ddoc),
       |bd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |bdd AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS dl FROM bd),
       |bst AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(CAST(SUM(CAST(len(w) AS BIGINT)) AS BIGINT) AS DOUBLE) / CAST(count(*) AS BIGINT) AS avgdl,
       |  $dfCols
       |  FROM bd),
       |bsc AS (
       |  $qSelects),
       |bb AS (SELECT query_id, doc_id, score,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
       |  FROM bsc WHERE score > 0.0),
       |sp AS (SELECT CASE $batteryCase END AS query_id, doc_id, CAST(rk AS BIGINT) AS bm25_rank FROM bb
       |  WHERE rk <= $Bm25TopK AND query_id IN ($batteryIn)),
       |f AS (SELECT COALESCE(dr.query_id, sp.query_id) AS query_id,
       |  COALESCE(dr.doc_id, sp.doc_id) AS doc_id, dr.dense_rank, sp.bm25_rank,
       |  (COALESCE(1.0 / ($RrfK + dr.dense_rank), 0.0) + COALESCE(1.0 / ($RrfK + sp.bm25_rank), 0.0)) AS rrf_score
       |  FROM dr FULL JOIN sp ON sp.query_id = dr.query_id AND sp.doc_id = dr.doc_id)
       |SELECT query_id, doc_id, dense_rank, bm25_rank, rrf_score,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS fused_rank
       |FROM f""".stripMargin
  }

  /** c102 = the content-defined chunker recomputed with the identical
    * list algebra: token 32-bit md5 hashes → the same overflow-proof
    * polynomial window hash (rollCoeffs, shared constants) → boundary
    * positions by residue → per-chunk md5 over the sliced tokens.
    * generate_series(a, b) is empty for b < a in DuckDB, so the short-
    * doc guards are implicit; every hash input string is identical on
    * both sides, so the gate is hash-exact.
    */
  val c102CdcChunkDedup: String = {
    import graft.functions.TextFunctions.{rollCoeffs, RollP}
    import graft.operators.TextAnalysis.{CdcWindow, CdcDivisor}
    val w = CdcWindow
    val terms = rollCoeffs(w).zipWithIndex
      .map { case (k, j) => s"ht[i + $j] * $k" }
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |h AS (SELECT doc_id, toks, len(toks) AS n,
       |  list_transform(toks, t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)) AS ht FROM d),
       |r AS (SELECT doc_id, toks, n,
       |  list_transform(generate_series(1, n - ${w - 1}), i -> ($terms) % $RollP) AS rh FROM h),
       |b AS (SELECT doc_id, toks, n,
       |  list_filter(generate_series($w, n - 1), p -> rh[p - ${w - 1}] % $CdcDivisor = 0) AS bpos FROM r),
       |se AS (SELECT doc_id, toks,
       |  list_prepend(1, list_transform(bpos, p -> p + 1)) AS starts,
       |  list_append(bpos, n) AS ends FROM b),
       |c AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(starts)),
       |  i -> struct_pack(m := md5(array_to_string(toks[starts[i]:ends[i]], ' ')),
       |                   l := ends[i] - starts[i] + 1))) AS ch FROM se)
       |SELECT ch.m AS chunk_md5,
       |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  MIN(doc_id) AS keep_doc_id,
       |  CAST(MIN(ch.l) AS BIGINT) AS tok_len
       |FROM c GROUP BY ch.m HAVING COUNT(*) >= 2""".stripMargin
  }

  /** c99 = the BPE merge loop UNROLLED, one CTE triple per round
    * (c24's iterative-training idiom): y{i} re-splits the padded
    * segmentation on the double-space separator, t{i} takes the argmax
    * adjacent pair (count DESC, lhs, rhs — the Spark tie order), and
    * seg{i} applies the merge with the same left-to-right
    * non-overlapping `replace` the Spark side uses, so every round is
    * bit-exact string algebra over integer counts. seg{i} and t{i} are
    * each referenced twice (by the next round and by the final union),
    * so they carry an explicit MATERIALIZED hint — inlined, the chain
    * re-evaluates the whole prefix per reference (2^rounds blowup:
    * minutes; materialized: <1 s at sf0.01). seg{i} joins t{i} with
    * LEFT JOIN ON TRUE + COALESCE, not a plain cross join: if pair
    * counts exhaust before BpeTrainRounds (a degenerate corpus of
    * single-char words), t{i} is empty and a cross join would collapse
    * the segmentation to ZERO rows while the Spark loop (guarded by
    * `exhausted`) keeps the last one — the left join leaves an empty
    * round's segmentation unchanged, matching the Spark semantics on
    * every corpus, not just the gate's.
    */
  /** The shared BPE CTE chain (words → word counts → seg0 → one
    * y/p/t/seg quadruple per merge round), composed by both c99 (merge
    * table) and c100 (segmentation aggregate).
    */
  private def bpeCtes: String = {
    import graft.operators.TextAnalysis.{BpeEndOfWord, BpeTrainRounds}
    val rounds = (1 to BpeTrainRounds)
      .map { i =>
        val prev = s"seg${i - 1}"
        s"""y$i AS (SELECT cnt, s, string_split(trim(s), '  ') AS syms FROM $prev),
           |p$i AS (SELECT unnest(list_transform(
           |    generate_series(1, greatest(len(syms) - 1, 0)),
           |    j -> struct_pack(l := syms[j], r := syms[j + 1]))) AS pr, cnt FROM y$i),
           |t$i AS MATERIALIZED (SELECT pr.l AS lhs, pr.r AS rhs, CAST(SUM(cnt) AS BIGINT) AS n
           |  FROM p$i GROUP BY pr.l, pr.r
           |  QUALIFY ROW_NUMBER() OVER (ORDER BY n DESC, lhs, rhs) = 1),
           |seg$i AS MATERIALIZED (SELECT cnt,
           |  COALESCE(replace(s, ' ' || t.lhs || '  ' || t.rhs || ' ', ' ' || t.lhs || t.rhs || ' '), s) AS s
           |  FROM $prev LEFT JOIN t$i t ON TRUE)""".stripMargin
      }
      .mkString(",\n")
    s"""words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |wc AS (SELECT w, COUNT(*) AS cnt FROM words WHERE length(w) >= 1 GROUP BY w),
       |seg0 AS (SELECT cnt,
       |  ' ' || array_to_string(list_append(list_transform(
       |    generate_series(1, length(w)), i -> substr(w, CAST(i AS INT), 1)), '$BpeEndOfWord'), '  ') || ' ' AS s
       |  FROM wc),
       |$rounds""".stripMargin
  }

  val c99BpeTrain: String = {
    import graft.operators.TextAnalysis.BpeTrainRounds
    val out = (1 to BpeTrainRounds)
      .map(i => s"SELECT CAST($i AS BIGINT) AS round, lhs, rhs, lhs || rhs AS merged, n FROM t$i")
      .mkString("\nUNION ALL\n")
    s"""WITH $bpeCtes,
       |f AS ($out)
       |SELECT round, lhs, rhs, merged, n FROM f ORDER BY round""".stripMargin
  }

  /** c100 = c99's chain plus the apply stage: re-split the final
    * segmentation and aggregate per-symbol corpus token counts.
    */
  val c100BpeSegment: String = {
    import graft.operators.TextAnalysis.BpeTrainRounds
    s"""WITH $bpeCtes,
       |fin AS (SELECT cnt, string_split(trim(s), '  ') AS syms FROM seg$BpeTrainRounds),
       |tok AS (SELECT unnest(syms) AS symbol, cnt FROM fin)
       |SELECT symbol, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       |  CAST(COUNT(*) AS BIGINT) AS n_vocab_occurrences
       |FROM tok GROUP BY symbol""".stripMargin
  }
}
