package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Scratch: inspect refinePlan's decision internals at a given SF. */
object RefinePlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sig = TextDedup.simHashSignaturesWide(spark, sfDir).localCheckpoint()
    val blocks = TextDedup.wideBlocks(sig).localCheckpoint()
    val (warm, refine, hot2) = TextDedup.refinePlan(blocks)
    println(s"warm=${warm.count()} refined=${refine.count()} hot2=${hot2.count()}")
    val sizes = blocks.groupBy(col("bi"), col("bv")).agg(count(lit(1)).as("nn"))
    val coldFan = sizes.join(refine.withColumn("r", lit(true)), Seq("bi", "bv"), "left")
      .filter(col("r").isNull).agg(sum(col("nn") * col("nn"))).head().getLong(0)
    val subs = warm.join(broadcast(refine), Seq("bi", "bv"))
      .groupBy(col("bi"), col("bv"), col("sbi"), col("sbv")).agg(count(lit(1)).as("sn"))
    val hcFan = subs.join(hot2.withColumn("h", lit(true)), Seq("bi", "bv", "sbi", "sbv"), "left")
      .filter(col("h").isNull).agg(sum(col("sn") * col("sn"))).head().getLong(0)
    println(s"coldFan=$coldFan hotColdFan=$hcFan")
    // big sub-buckets and their costs
    val subSizes = warm
      .groupBy(col("bi"), col("bv"), col("sbi"), col("sbv"))
      .agg(count(lit(1)).as("sn"))
      .filter(col("sn") > TextDedup.HotBucketFloor)
      .orderBy(col("sn").desc)
      .limit(10)
      .collect()
    subSizes.foreach(r => println(s"bigSub sn=${r.getLong(4)} key=(${r.getInt(0)},${r.getLong(1)},${r.getInt(2)},${r.getLong(3)})"))
    spark.stop()
  }
}
