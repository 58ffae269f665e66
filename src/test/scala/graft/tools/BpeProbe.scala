package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch measurement harness (test scope, not shipped): per-round
  * wall time of a LONG BPE training run — the evidence that the
  * checkpointed merge loop is O(R·vocab), i.e. per-round cost stays
  * flat instead of growing with the replace-chain depth (the R = 32k
  * production ceiling question; the gate only ever runs R = 12).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder
      .master("local[32]")
      .appName("bpe-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val times = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t0 = System.nanoTime()
    val (merges, seg) =
      graft.operators.TextAnalysis.bpeTrainUncached(spark, sfDir, rounds, times)
    val total = (System.nanoTime() - t0) / 1e9
    println(s"rounds_completed=${merges.size} total=${f"$total%.1f"}s segRows=${seg.count()}")
    // decile means: flat deciles == flat per-round cost
    val d = math.max(1, times.size / 10)
    times.grouped(d).zipWithIndex.foreach { case (g, i) =>
      println(f"decile ${i + 1}%2d: mean=${g.sum / g.size}%.3fs n=${g.size}")
    }
    spark.stop()
  }
}
