package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** Scratch sweep (test scope): trained vs seeded IMI half-codebooks on
  * the clustered fixture across probe budgets.
  */
object ImiTrainedProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val (nClusters, perCluster, dim) = (20, 200, 64)
    def hashUnit(seed: String, d: Int): Array[Double] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val v = Array.tabulate(d) { i =>
        val h = md.digest(s"${seed}_$i".getBytes("UTF-8"))
        (((h(0) & 0xffL) << 8 | (h(1) & 0xffL)).toDouble / 65535.0) * 2 - 1
      }
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val rows = for { c <- 0 until nClusters; i <- 0 until perCluster } yield {
      val center = hashUnit(s"center_$c", dim)
      val noise = hashUnit(s"noise_${c}_$i", dim)
      val v = center.zip(noise).map { case (a, b) => a + 0.35 * b }
      val n = math.sqrt(v.map(x => x * x).sum)
      (c.toLong * perCluster + i, v.map(_ / n).toSeq)
    }
    val all = rows.toDF("vec_id", "vn").repartition(8).cache()
    val queryIds = (0 until 5).map(q => q.toLong * 2 * perCluster).toSet
    val queries = all.filter($"vec_id".isInCollection(queryIds)).select($"vec_id".as("query_id"), $"vn".as("qv"))
    val cands = all.filter(!$"vec_id".isInCollection(queryIds)).select($"vec_id".as("neighbor_id"), $"vn")
    val exact = VectorOps.annBruteforce(cands, queries, 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hk = VectorOps.ImiHalfKFloor
    val half = 32
    val centsA = VectorOps.trainCentroids(cands.select(col("neighbor_id"), slice(col("vn"), 1, half).as("vn")), hk, VectorOps.C106Iters)
    val centsB = VectorOps.trainCentroids(cands.select(col("neighbor_id"), slice(col("vn"), half + 1, half).as("vn")), hk, VectorOps.C106Iters)
    val seeds = cands.orderBy(xxhash64(col("neighbor_id"))).limit(2 * hk).collect().map(_.getSeq[Double](1).toArray)
    val (sA, sB) = (seeds.take(hk).map(_.take(half)), seeds.drop(hk).map(_.drop(half)))
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    for (p <- Seq(1, 2, 4, 8, 16, 32)) {
      val t = recall(VectorOps.imiSearchTrained(cands, queries, centsA, centsB, p, 5))
      val s = recall(VectorOps.imiSearchTrained(cands, queries, sA, sB, p, 5))
      println(f"P=$p%2d trained=$t%.3f seeded=$s%.3f")
    }
    spark.stop()
  }
}
