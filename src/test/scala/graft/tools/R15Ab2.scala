package graft.tools

import org.apache.spark.sql.DataFrame

import graft.operators.VectorOps // c44/c73 variants reference Sampling inline

/** Round-15 A/B probe #2 (test scope, b23's protocol): time the
  * streaming vs materialize-once forms of the vector-family self-join
  * queries (c17/c7/c96/c35) in ONE session — warmup pass, then 5
  * interleaved passes per variant, noop sink, per-variant medians — so
  * machine contention hits both sides equally. Keep the winner, record
  * both numbers.
  */
object R15Ab2 {

  private def time(fn: => DataFrame): Double = {
    val t0 = System.nanoTime()
    fn.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("c17_stream", () => VectorOps.c17EmbeddingDedupLsh(spark, sfDir, materializeOnce = false)),
      ("c17_ckpt", () => VectorOps.c17EmbeddingDedupLsh(spark, sfDir, materializeOnce = true)),
      ("c7_stream", () => VectorOps.c7AnnLsh(spark, sfDir, materializeOnce = false)),
      ("c7_ckpt", () => VectorOps.c7AnnLsh(spark, sfDir, materializeOnce = true)),
      ("c96_stream", () => VectorOps.c96DedupEmbeddingIvf(spark, sfDir, materializeOnce = false)),
      ("c96_narrow", () => VectorOps.c96DedupEmbeddingIvf(spark, sfDir, materializeOnce = true)),
      ("c35_stream", () => VectorOps.c35SemDedup(spark, sfDir, materializeOnce = false)),
      ("c35_ckpt", () => VectorOps.c35SemDedup(spark, sfDir, materializeOnce = true)),
      ("c29_stream", () => VectorOps.c29AnnPq(spark, sfDir, materializeOnce = false)),
      ("c29_ckpt", () => VectorOps.c29AnnPq(spark, sfDir, materializeOnce = true)),
      ("c104_stream", () => VectorOps.c104AnnIvfAdc(spark, sfDir, materializeOnce = false)),
      ("c104_ckpt", () => VectorOps.c104AnnIvfAdc(spark, sfDir, materializeOnce = true)),
      ("c108_stream", () => VectorOps.c108AnnImiAdc(spark, sfDir, materializeOnce = false)),
      ("c108_ckpt", () => VectorOps.c108AnnImiAdc(spark, sfDir, materializeOnce = true)),
      ("c106_stream", () => VectorOps.c106AnnImiTrained(spark, sfDir, materializeOnce = false)),
      ("c106_ckpt", () => VectorOps.c106AnnImiTrained(spark, sfDir, materializeOnce = true)),
      ("c24_stream", () => VectorOps.c24AnnIvfTrained(spark, sfDir, materializeOnce = false)),
      ("c24_ckpt", () => VectorOps.c24AnnIvfTrained(spark, sfDir, materializeOnce = true)),
      ("c44_stream", () => graft.operators.Sampling.c44BloomDedup(spark, sfDir, materializeOnce = false)),
      ("c44_ckpt", () => graft.operators.Sampling.c44BloomDedup(spark, sfDir, materializeOnce = true)),
      ("c73_stream", () => graft.operators.Sampling.c73SplitLeakage(spark, sfDir, materializeOnce = false)),
      ("c73_ckpt", () => graft.operators.Sampling.c73SplitLeakage(spark, sfDir, materializeOnce = true))
    ).filter { case (name, _) =>
      // optional 2nd arg: comma-separated name prefixes to run a subset
      args.length < 2 || args(1).split(",").exists(name.startsWith)
    }
    // warmup (codegen/JIT/caches) then timed passes, interleaved per
    // pass so drift hits all variants alike
    variants.foreach { case (_, fn) => time(fn()) }
    val acc = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector.empty)
    (1 to 5).foreach { _ =>
      variants.foreach { case (name, fn) => acc(name) = acc(name) :+ time(fn()) }
    }
    variants.foreach { case (name, _) =>
      val ts = acc(name).sorted
      println(
        f"[r15ab2] $name%-12s median=${ts(ts.size / 2)}%.3f  all=${acc(name).map(t => f"$t%.3f").mkString(",")}"
      )
    }
    spark.stop()
  }
}
