package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.VectorOps

/** Row-multiset identity check for the round-15 materialize-once
  * sweep: for every touched operator, the streaming and checkpointed
  * forms must produce EXACTLY the same rows (exceptAll both ways is
  * empty) — localCheckpoint of deterministic row-local projections can
  * change no value, and this proves it on data, covering c7 at
  * sf0.001 where the oracle mirror cannot (the inherited LSH-recall
  * condition documented in OPTIMIZATION_r15.md).
  */
object R15AbIdentity {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ops: Seq[(String, (SparkSession, String, Boolean) => DataFrame)] = Seq(
      ("c17", (s, d, m) => VectorOps.c17EmbeddingDedupLsh(s, d, materializeOnce = m)),
      ("c7", (s, d, m) => VectorOps.c7AnnLsh(s, d, materializeOnce = m)),
      ("c96", (s, d, m) => VectorOps.c96DedupEmbeddingIvf(s, d, materializeOnce = m)),
      ("c35", (s, d, m) => VectorOps.c35SemDedup(s, d, m)),
      ("c29", (s, d, m) => VectorOps.c29AnnPq(s, d, m)),
      ("c104", (s, d, m) => VectorOps.c104AnnIvfAdc(s, d, m)),
      ("c108", (s, d, m) => VectorOps.c108AnnImiAdc(s, d, m)),
      ("c106", (s, d, m) => VectorOps.c106AnnImiTrained(s, d, m)),
      ("c24", (s, d, m) => VectorOps.c24AnnIvfTrained(s, d, materializeOnce = m))
    )
    var bad = 0
    sfDirs.foreach { sf =>
      ops.foreach { case (name, fn) =>
        val a = fn(spark, sf, false)
        val b = fn(spark, sf, true)
        val extraA = a.exceptAll(b).count()
        val extraB = b.exceptAll(a).count()
        val n = b.count()
        val ok = extraA == 0 && extraB == 0
        if (!ok) bad += 1
        println(s"[identity] $name @ $sf rows=$n stream-only=$extraA ckpt-only=$extraB ${if (ok) "OK" else "MISMATCH"}")
      }
    }
    require(bad == 0, s"$bad identity mismatches")
    println("[identity] ALL OK")
    spark.stop()
  }
}
