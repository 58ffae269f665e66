package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.ArrayDotProduct.arrayDot
import graft.plans.ArrayNormalize.arrayNormalize
import graft.sources.Tables

/** Round-15 scratch: isolate why c78 slowed when bitextVecs switched
  * from transform(_.cast) to cast(array<double>). Times the all-pairs
  * cross+dot (c78's checkpointed frame) under both ingest spellings,
  * plus variants with an explicit localCheckpoint of the vecs frame.
  */
object C78Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def vecsCast: DataFrame = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), arrayNormalize(col("embedding").cast("array<double>")).as("vn"))
    def vecsTransform: DataFrame = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), arrayNormalize(transform(col("embedding"), _.cast("double"))).as("vn"))
    def allPairs(e: DataFrame): DataFrame = {
      val src = e.filter(col("label") < graft.operators.VectorOps.BitextSrcLabels)
        .select(col("vec_id").as("src_id"), col("vn").as("sv"))
      val tgt = e.filter(col("label") >= graft.operators.VectorOps.BitextSrcLabels)
        .select(col("vec_id").as("tgt_id"), col("vn").as("tv"))
      tgt.crossJoin(broadcast(src))
        .select(col("src_id"), col("tgt_id"), arrayDot(col("sv"), col("tv")).as("cos"))
    }
    def time(tag: String)(fn: => DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        fn.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[c78probe] $tag%-28s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    time("pairs_cast")(allPairs(vecsCast))
    time("pairs_transform")(allPairs(vecsTransform))
    time("pairs_cast_ckpt")(allPairs(vecsCast.localCheckpoint()))
    time("vecs_cast_only")(vecsCast)
    time("vecs_transform_only")(vecsTransform)
    spark.stop()
  }
}
