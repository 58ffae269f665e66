package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Scratch census (test scope): does c93's LEVEL-2 (doubly-hot) path
  * engage at a given SF/geometry? Prints bucket and sub-bucket counts
  * over the adaptive threshold.
  */
object Hot2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
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
    val hotKeys = blocks.groupBy(col("bi"), col("bv")).count().filter(col("count") > hotT).drop("count")
    val hotDocs = blocks.join(broadcast(hotKeys), Seq("bi", "bv"))
    val sub = hotDocs
      .join(blocks.select(col("doc_id"), col("bi").as("sbi"), col("bv").as("sbv")), Seq("doc_id"))
      .filter(col("sbi") =!= col("bi"))
    val hot2 = sub.groupBy(col("bi"), col("bv"), col("sbi"), col("sbv")).count().filter(col("count") > hotT)
    val nHot = hotKeys.count()
    val nHot2 = hot2.count()
    val maxSub = sub.groupBy(col("bi"), col("bv"), col("sbi"), col("sbv")).count()
      .agg(max(col("count"))).head().getLong(0)
    println(s"n=$n hotT=$hotT hotBuckets=$nHot hot2SubBuckets=$nHot2 maxSubBucket=$maxSub")
    spark.stop()
  }
}
