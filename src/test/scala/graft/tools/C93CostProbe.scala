package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Scratch census: where does c93's candidate volume live? Per-bucket
  * flat cost n² vs refined cost Σ sub² under the current adaptive
  * threshold, bucketed by size band.
  */
object C93CostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_nat/sf10"
    val spark = SparkSession.builder
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sig = TextDedup.simHashSignaturesWide(spark, sfDir).localCheckpoint()
    val n = sig.count()
    val hotT = TextDedup.hotBucketT(n)
    val nb = 2 * TextDedup.WideBlocksPerHalf
    val blockCols = (0 until nb).map { idx =>
      val half = if (idx < TextDedup.WideBlocksPerHalf) col("s1") else col("s2")
      struct(
        lit(idx).as("bi"),
        shiftright(half, (idx % TextDedup.WideBlocksPerHalf) * TextDedup.WideBlockBits)
          .bitwiseAND((1L << TextDedup.WideBlockBits) - 1)
          .as("bv")
      )
    }
    val blocks = sig
      .select(col("doc_id"), explode(array(blockCols: _*)).as("b"))
      .select(col("doc_id"), col("b.bi").as("bi"), col("b.bv").as("bv"))
      .localCheckpoint()
    val sizes = blocks.groupBy(col("bi"), col("bv")).agg(count(lit(1)).as("nn")).localCheckpoint()
    // flat candidate volume by size band
    println(s"n=$n hotT=$hotT")
    sizes
      .withColumn("band", when(col("nn") <= 32, "a:<=32")
        .when(col("nn") <= 128, "b:33-128")
        .when(col("nn") <= 512, "c:129-512")
        .when(col("nn") <= hotT, "d:513-hotT")
        .otherwise("e:>hotT(refined)"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("buckets"), sum(col("nn")).as("members"), sum(col("nn") * col("nn")).as("flat_sq"))
      .orderBy(col("band"))
      .collect()
      .foreach(r => println(f"${r.getString(0)}%-18s buckets=${r.getLong(1)}%8d members=${r.getLong(2)}%10d flat_sq=${r.getLong(3)}%14d"))
    // refined cost for the warm band (> 32): sub-bucket squares
    val warmKeys = sizes.filter(col("nn") > 32).select(col("bi"), col("bv"))
    val warm = blocks
      .join(broadcast(warmKeys), Seq("bi", "bv"))
      .join(blocks.select(col("doc_id"), col("bi").as("sbi"), col("bv").as("sbv")), Seq("doc_id"))
      .filter(col("sbi") =!= col("bi"))
    val sub = warm.groupBy(col("bi"), col("bv"), col("sbi"), col("sbv")).agg(count(lit(1)).as("sn"))
    val agg = sub
      .groupBy(col("bi"), col("bv"))
      .agg(sum(col("sn") * col("sn")).as("sub_sq"), sum(col("sn")).as("rekey_rows"))
      .join(sizes, Seq("bi", "bv"))
      .agg(
        sum(col("nn") * col("nn")).as("flat_sq_warm"),
        sum(col("sub_sq")).as("refined_sq_warm"),
        sum(col("rekey_rows")).as("rekey_rows"),
        sum(when(col("sub_sq") + lit(9L) * col("nn") < col("nn") * col("nn"), lit(1L)).otherwise(lit(0L))).as("buckets_where_refine_wins"),
        count(lit(1)).as("warm_buckets")
      )
      .head()
    println(s"warm(>32): flat_sq=${agg.getLong(0)} refined_sq=${agg.getLong(1)} rekey_rows=${agg.getLong(2)} refine_wins=${agg.getLong(3)}/${agg.getLong(4)}")
    spark.stop()
  }
}
