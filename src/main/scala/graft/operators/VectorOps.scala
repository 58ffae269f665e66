package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Embedding similarity operators over the `embeddings` table
  * (SURVEY.md §2 C-series): cosine near-dup pairs, brute-force ANN
  * baseline, and the LSH-bucketed scale path.
  *
  * Vector math uses higher-order array functions (`zip_with` +
  * `aggregate`) on doubles — a strict left-to-right fold, bit-identical
  * to the DuckDB oracle's `list_dot_product`, so raw cosine values can
  * be compared exactly across engines.
  */
object VectorOps {

  val NearDupThreshold = 0.45
  val TopK = 10
  val NumQueryVecs = 10

  /** embeddings with the float vector cast to double. */
  private def vecs(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** C5: embedding-cosine near-dup pairs (cos ≥ threshold).
    * This is the exact definition; at 100 TB the LSH bucketing of C7
    * generates the candidates instead of the self-join. Locally the
    * self-join is the correctness baseline the oracle mirrors.
    */
  def c5EmbeddingDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= NearDupThreshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** C6: brute-force cosine top-k — the ANN correctness baseline.
    * Queries (vec_id < 10) are broadcast against the candidate set, so
    * the big side streams once with no shuffle; ranking happens per
    * query partition.
    */
  def c6AnnBruteforce(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val queries = e
      .filter(col("vec_id") < NumQueryVecs)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cands = e
      .filter(col("vec_id") >= NumQueryVecs)
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cands
      .crossJoin(broadcast(queries))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Deterministic ±1 random hyperplanes derived from MD5 — public,
    * engine-independent math (no RNG state). planes(j)(d) ∈ {-1, 1}.
    */
  def hyperplanes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dim) { (j, d) =>
      val h = md.digest(s"plane_${j}_$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    }
  }

  val NumPlanes = 4 // 16 buckets — sized so sf0.01's 500 vectors give ~30 per bucket

  /** C7: LSH-bucketed ANN — the scale path. Sign-of-projection onto
    * fixed random hyperplanes buckets each vector; search only meets
    * vectors sharing a bucket (candidates per query ≈ n/2^planes, and
    * the bucket join is a keyed shuffle, never a cross join). Top-5 per
    * query by exact cosine within the bucket.
    */
  def c7AnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val planes = hyperplanes(NumPlanes, 64)
    val e = vecs(spark, sfDir)
    val bucket: Column = (0 until NumPlanes)
      .map { j =>
        val plane = array(planes(j).map(lit): _*)
        when(dot(col("v"), plane) >= 0, lit(1 << j)).otherwise(lit(0))
      }
      .reduce(_ + _)
    val bucketed = e.withColumn("bucket", bucket)

    val queries = bucketed
      .filter(col("vec_id") < NumQueryVecs)
      .select(col("bucket"), col("vec_id").as("query_id"), col("v").as("qv"))
    val cands = bucketed
      .filter(col("vec_id") >= NumQueryVecs)
      .select(col("bucket"), col("vec_id").as("neighbor_id"), col("v").as("cv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    queries
      .join(cands, "bucket")
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
