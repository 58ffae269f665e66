package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash32
import graft.sources.Tables

/** Training-data selection operators (SURVEY.md §2 C-series):
  * deterministic stratified sampling and the end-to-end corpus
  * curation pipeline that composes the quality / language / dedup /
  * sampling stages.
  *
  * Sampling is hash-Bernoulli — a document is kept iff
  * md5-hash("sample_" + doc_id) mod 1000 falls under its stratum's
  * rate. No RNG state, no seed plumbing: the same document set is
  * selected on any cluster size, any partitioning, any engine (the
  * oracle recomputes the identical md5 arithmetic), and adding data
  * never changes the verdict on existing rows — the properties that
  * make a 100 TB sample reproducible and incrementally extensible.
  */
object Sampling {

  /** Per-mille keep rate per language stratum: downsample the dominant
    * language (en ≈ 44% of the corpus), keep most of the tail — the
    * standard corpus-rebalancing shape.
    */
  val EnRatePerMille = 300
  val DefaultRatePerMille = 800
  val QualityThreshold = 0.42

  private def sampleBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hash32(concat(lit("sample_"), id.cast("string"))) % 1000

  /** C19: stratified deterministic sample over `documents` — per-lang
    * Bernoulli rates keyed on md5(doc_id). Pure narrow scan + filter:
    * no shuffle, no state, fully pushdown-friendly.
    */
  def c19StratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .documents(spark, sfDir)
      .withColumn("bucket", sampleBucket(col("doc_id")))
      .filter(
        col("bucket") <
          when(col("lang") === "en", lit(EnRatePerMille)).otherwise(lit(DefaultRatePerMille))
      )
      .select(col("doc_id"), col("lang"), col("bucket"))

  /** C20: the full training-data curation pipeline, composed from the
    * already-verified stages: quality scoring (c9) → threshold filter →
    * exact dedup keep-min (c1's contract) → language ID (c8) →
    * stratified deterministic sample (c19's mechanism, keyed on
    * pred_lang) → per-language corpus stats.
    *
    * Scale: quality and langid are narrow per-row column expressions;
    * dedup is the one text-keyed shuffle (on md5(text), text itself
    * never shuffles); the sample filter is row-local; the final stats
    * agg is map-side combinable. Min/max (not avg) of the double score
    * are reported so every reduction is order-independent and
    * engine-exact.
    */
  def c20TrainingPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val quality = TextAnalysis
      .c9TextQuality(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val lang = TextAnalysis.c8TextLangid(spark, sfDir).select(col("doc_id"), col("pred_lang"))

    val kept = docs
      .join(quality, "doc_id")
      .filter(col("quality_score") >= QualityThreshold)
    val canonical = kept
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))

    kept
      .join(canonical, "doc_id")
      .join(lang, "doc_id")
      .filter(
        sampleBucket(col("doc_id")) <
          when(col("pred_lang") === "en", lit(EnRatePerMille)).otherwise(lit(DefaultRatePerMille))
      )
      .groupBy(col("pred_lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("quality_score")).as("min_quality"),
        max(col("quality_score")).as("max_quality")
      )
  }
}
