package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: count the output rows of one or more gate queries at an
  * arbitrary sfDir — the adjudication aid for scale-exponent readings
  * (a near-dup query whose PAIR SET itself grows superlinearly is
  * output-bound: no candidate-generation scheme can beat the size of
  * its own answer, and the exponent must be read against the output
  * curve, not assumed to be wasted candidate work).
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.CountQuery <sfDir> q1[,q2,...]
  */
object CountQuery {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: CountQuery <sfDir> <query[,query...]>")
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = names.map { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      s""""$n":{"rows":$c,"sec":${f"$sec%.3f"}}"""
    }
    println(s"""{"metric":"query_counts","sf":"$sfDir","counts":${counts.mkString("{", ",", "}")}}""")
  }
}
