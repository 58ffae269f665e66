package graft

/** Plan-audit utility: print the executed plan of any gate query
  * (`runMain graft.Explain <query> [<query> ...] [--sf <dir>]`), or of
  * every query with `--all`. The 100 TB posture is a property of the
  * PLAN (broadcasts, pushed filters, exchange count, codegen spans) —
  * this makes it one command to inspect, the same loop PlanSpec
  * automates for the asserted subset.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.sliding(2).collectFirst { case Array("--sf", d) => d }
      .getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.contains("--all")) SparkEntry.queries.keys.toSeq.sorted
      else args.filterNot(_.startsWith("--")).filterNot(a => args.sliding(2).exists {
        case Array("--sf", d) => d == a
        case _ => false
      }).toSeq
    require(names.nonEmpty, "usage: Explain <query> [<query> ...] [--sf <dir>] | --all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // --final: execute first, so AQE's final plan (ReusedExchange,
    // coalesced partitions, runtime join demotions) is what prints —
    // the initial plan can both under- and over-state reuse
    val runFirst = args.contains("--final")
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n"))
      println(s"===== $n =====")
      val df = fn(spark, sfDir)
      if (runFirst) df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
