package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.ArrayDotProduct.arrayDot
import graft.plans.ArrayNormalize.arrayNormalize

/** Scratch measurement harness (test scope, not shipped): the
  * broadcast-query-battery crossover. Every ANN/retrieval gate
  * (c6/c54/c57/c97/c98) broadcasts a ≤10-query battery against the
  * corpus stream; a production retrieval eval runs 1k–100k queries.
  * This measures, on one corpus, where the brute-force broadcast
  * plan (nq·n dot products) loses to the indexed keyed shape
  * (assignment scan + per-list meets), and how far the broadcast
  * itself (nq·dim·8 B) stays trivial. Feeds the SURVEY §5 rule.
  */
object QueryScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sfgen/sf10"
    val spark = SparkSession.builder
      .master("local[32]")
      .appName("query-scale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), arrayNormalize(transform(col("embedding"), _.cast("double"))).as("vn"))
      .localCheckpoint()
    val maxQ = 10000L
    val cand = e.filter(col("vec_id") >= maxQ).select(col("vec_id").as("neighbor_id"), col("vn"))
    val n = cand.count()
    // indexed side built ONCE (amortized across the battery, like any
    // served index): sqrt(n) lists, seeded centroids, kernel assignment
    val lists = math.max(10, math.round(math.sqrt(n.toDouble)).toInt)
    val cents = cand
      .filter(col("neighbor_id") < maxQ + lists)
      .collect()
      .map(r => (r.getLong(0).toInt - maxQ.toInt, r.getSeq[Double](1).toArray))
      .sortBy(_._1)
      .toSeq
    val asg = cand
      .select(
        col("neighbor_id"),
        element_at(graft.plans.CentroidTopK.centroidTopK(col("vn"), cents, 1), 1).as("list_id"),
        col("vn")
      )
      .localCheckpoint()
    println(s"corpus n=$n lists=$lists")

    def topk(scored: DataFrame): Long =
      graft.plans.TopKPerKey
        .topKPerKey(
          scored.select(col("query_id"), col("neighbor_id"), col("cos")),
          keyCols = Seq("query_id"),
          orderBy = Seq(("cos", false), ("neighbor_id", true)),
          k = 5
        )
        .count()

    for (nq <- Seq(10, 100, 1000, 10000)) {
      val q = e
        .filter(col("vec_id") < nq)
        .select(col("vec_id").as("query_id"), col("vn").as("qv"))
        .localCheckpoint()
      // A: brute-force broadcast battery (the gate shape)
      val tA0 = System.nanoTime()
      val rA = topk(cand.crossJoin(broadcast(q)).withColumn("cos", arrayDot(col("qv"), col("vn"))))
      val tA = (System.nanoTime() - tA0) / 1e9
      // B: indexed keyed shape — probes from the same row-local kernel,
      // met via the list_id join (Catalyst picks the probe-join side)
      val tB0 = System.nanoTime()
      val probes = q
        .select(
          col("query_id"),
          col("qv"),
          explode(graft.plans.CentroidTopK.centroidTopK(col("qv"), cents, 4)).as("list_id")
        )
      val rB = topk(
        asg.join(probes, "list_id").withColumn("cos", arrayDot(col("qv"), col("vn")))
      )
      val tB = (System.nanoTime() - tB0) / 1e9
      println(
        f"nq=$nq%6d broadcast_bruteforce=$tA%8.2fs rows=$rA%8d | keyed_ivf=$tB%8.2fs rows=$rB%8d | battery=${nq * 64 * 8 / 1024}%6d KiB"
      )
    }
    spark.stop()
  }
}
