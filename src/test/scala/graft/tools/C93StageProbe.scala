package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Scratch stage timer: materialize each internal stage of c93's
  * cost-based pipeline separately and report wall time per stage.
  */
object C93StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_nat/sf10"
    val spark = SparkSession.builder
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", true)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var t0 = System.nanoTime()
    def lap(name: String, n: Long = -1): Unit = {
      val t1 = System.nanoTime()
      println(f"STAGE $name%-22s ${(t1 - t0) / 1e9}%8.1fs rows=$n")
      t0 = t1
    }
    val sig = TextDedup.simHashSignaturesWide(spark, sfDir).localCheckpoint()
    lap("sig_checkpoint", sig.count())
    val blocks = TextDedup.wideBlocks(sig).localCheckpoint()
    lap("blocks_checkpoint", blocks.count())
    val hotKeys = TextDedup.refineBucketKeys(blocks).withColumn("is_hot", lit(true)).localCheckpoint()
    lap("refine_census", hotKeys.count())
    val sized = blocks.join(broadcast(hotKeys), Seq("bi", "bv"), "left")
    val cold = sized.filter(col("is_hot").isNull).drop("is_hot")
    val nBlocks = 2 * TextDedup.WideBlocksPerHalf
    val blockCols = (0 until nBlocks).map { idx =>
      val half = if (idx < TextDedup.WideBlocksPerHalf) col("s1") else col("s2")
      struct(
        lit(idx).as("block_idx"),
        shiftright(half, (idx % TextDedup.WideBlocksPerHalf) * TextDedup.WideBlockBits)
          .bitwiseAND((1L << TextDedup.WideBlockBits) - 1)
          .as("bval")
      )
    }
    val hot = sized
      .filter(col("is_hot").isNotNull)
      .drop("is_hot")
      .select(col("doc_id"), col("s1"), col("s2"), col("bi"), col("bv"), explode(array(blockCols: _*)).as("sb"))
      .select(col("doc_id"), col("s1"), col("s2"), col("bi"), col("bv"),
        col("sb.block_idx").as("sbi"), col("sb.bval").as("sbv"))
      .filter(col("sbi") > col("bi"))
      .localCheckpoint()
    lap("hot_checkpoint", hot.count())
    def sides(df: DataFrame, keys: Seq[String]): (DataFrame, DataFrame) = (
      df.select((keys.map(col) :+ col("doc_id").as("doc_a") :+ col("s1").as("s1a") :+ col("s2").as("s2a")): _*),
      df.select((keys.map(col) :+ col("doc_id").as("doc_b") :+ col("s1").as("s1b") :+ col("s2").as("s2b")): _*)
    )
    val (ca, cb) = sides(cold, Seq("bi", "bv"))
    val coldJoin = ca.join(cb, Seq("bi", "bv")).filter(col("doc_a") < col("doc_b"))
    lap("cold_join_fan", coldJoin.count())
    val (ha, hb) = sides(hot, Seq("bi", "bv", "sbi", "sbv"))
    val hotJoin = ha.join(hb, Seq("bi", "bv", "sbi", "sbv")).filter(col("doc_a") < col("doc_b"))
    lap("hot_join_fan", hotJoin.count())
    val full = TextDedup.c93DedupSimhashRefined(spark, sfDir)
    lap("full_pipeline", full.count())
    spark.stop()
  }
}
