package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.ArrayDotProduct.arrayDot
import graft.plans.ArrayNormalize.arrayNormalize
import graft.sources.Tables

/** Embedding similarity operators over the `embeddings` table
  * (SURVEY.md §2 C-series): cosine near-dup pairs, brute-force ANN
  * baseline, and the LSH-bucketed scale path.
  *
  * Vectors are L2-normalized ONCE per row, so each candidate pair costs
  * a single dot product — computed by the custom codegen'd
  * [[graft.plans.ArrayDotProduct]] expression (strict sequential IEEE
  * sum, bit-identical to DuckDB's `list_dot_product`, ~10x the
  * interpreted higher-order-function fold it replaced).
  */
object VectorOps {

  val NearDupThreshold = 0.45
  val TopK = 10
  val NumQueryVecs = 10

  /** embeddings with the vector cast to double and L2-normalized
    * (single-pass codegen'd normalize — see [[graft.plans.ArrayNormalize]]).
    */
  private def vecs(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        arrayNormalize(transform(col("embedding"), _.cast("double"))).as("vn")
      )

  /** C5: embedding-cosine near-dup pairs (cos ≥ threshold).
    * This is the exact definition; at 100 TB the LSH bucketing of C7
    * generates the candidates instead of the self-join. Locally the
    * self-join is the correctness baseline the oracle mirrors.
    */
  def c5EmbeddingDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vecs(spark, sfDir)
    val a = e.select(col("vec_id").as("vec_a"), col("vn").as("va"))
    val b = e.select(col("vec_id").as("vec_b"), col("vn").as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", arrayDot(col("va"), col("vb")))
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
      .select(col("vec_id").as("query_id"), col("vn").as("qv"))
    val cands = e
      .filter(col("vec_id") >= NumQueryVecs)
      .select(col("vec_id").as("neighbor_id"), col("vn").as("cv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cands
      .crossJoin(broadcast(queries))
      .withColumn("cos", arrayDot(col("qv"), col("cv")))
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
        val plane = array(planes(j).toIndexedSeq.map(lit): _*)
        when(arrayDot(col("vn"), plane) >= 0, lit(1 << j)).otherwise(lit(0))
      }
      .reduce(_ + _)
    val bucketed = e.withColumn("bucket", bucket)

    val queries = bucketed
      .filter(col("vec_id") < NumQueryVecs)
      .select(col("bucket"), col("vec_id").as("query_id"), col("vn").as("qv"))
    val cands = bucketed
      .filter(col("vec_id") >= NumQueryVecs)
      .select(col("bucket"), col("vec_id").as("neighbor_id"), col("vn").as("cv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    queries
      .join(cands, "bucket")
      .withColumn("cos", arrayDot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
