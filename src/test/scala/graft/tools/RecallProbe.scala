package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.VectorOps

/** Scratch measurement harness (test scope, not shipped): the
  * recall-vs-(lists, probes) curve for c90's bitext IVF geometry at a
  * given SF — the data behind the served probe-scaling decision.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val mode = if (args.length > 1) args(1) else "bitext"
    val spark = SparkSession.builder
      .master("local[32]")
      .appName("recall-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "ivfadc") {
      val exactTop5 = VectorOps
        .c6AnnBruteforce(spark, sfDir)
        .filter("rank <= 5")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      def recall(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (exactTop5 & got).size.toDouble / exactTop5.size
      }
      val t24 = System.nanoTime()
      val r24 = recall(VectorOps.c24AnnIvfTrained(spark, sfDir))
      val t104 = System.nanoTime()
      val r104 = recall(VectorOps.c104AnnIvfAdc(spark, sfDir))
      val t29 = System.nanoTime()
      val r29 = recall(VectorOps.c29AnnPq(spark, sfDir))
      val tEnd = System.nanoTime()
      println(
        f"c24(ivf exact-scan)=$r24%.3f t=${(t104 - t24) / 1e9}%.2fs  " +
          f"c104(ivfadc)=$r104%.3f t=${(t29 - t104) / 1e9}%.2fs  " +
          f"c29(pq flat)=$r29%.3f t=${(tEnd - t29) / 1e9}%.2fs"
      )
      spark.stop()
      return
    }
    if (mode == "imi") {
      val exactTop5 = VectorOps
        .c6AnnBruteforce(spark, sfDir)
        .filter("rank <= 5")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      for (p <- Seq(8, 12, 16, 24, 32, 48)) {
        val t0 = System.nanoTime()
        val got = VectorOps
          .c101AnnImi(spark, sfDir, cellProbes = p)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .toSet
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"P=$p%3d recall@5=${(exactTop5 & got).size.toDouble / exactTop5.size}%.3f t=$dt%.2fs")
      }
      spark.stop()
      return
    }
    val exact = VectorOps
      .c78BitextMargin(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val n = graft.sources.Tables.embeddings(spark, sfDir).count()
    println(s"n=$n exactSrcs=${exact.size} autoLists=${VectorOps.scaledLists(n, VectorOps.BitextIvfLists)}")
    for {
      lists <- Seq(10, 22, 45)
      (probes, memberR) <- Seq((2, 1), (4, 1), (6, 1), (8, 1), (2, 2), (4, 2), (6, 2), (4, 3), (2, 4), (4, 4))
      if probes <= lists
    } {
      val t0 = System.nanoTime()
      val cands = VectorOps.bitextIvfCandidates(spark, sfDir, lists, probes, memberR).localCheckpoint()
      val nCand = cands.count()
      val served = VectorOps
        .bitextBest(VectorOps.bitextMargins(cands))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      val dt = (System.nanoTime() - t0) / 1e9
      val agree = exact.count { case (s, t) => served.get(s).contains(t) }
      println(
        f"lists=$lists%3d probes=$probes%3d R=$memberR recall@1=${agree.toDouble / exact.size}%.3f cands=$nCand%6d t=$dt%.2fs"
      )
    }
    spark.stop()
  }
}
