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
        case Array(flag, d) if Set("--sf", "--out", "--suffix").contains(flag) => d == a
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
    // --formatted: explain("formatted") text (numbered operators +
    // details: PushedFilters, ReadSchema, join build side) — the shape
    // the round-over-round plan artifacts under plans/ record
    val formatted = args.contains("--formatted")
    // --out <dir>: write each query's plan to <dir>/<query>_<suffix>.txt
    // instead of stdout (suffix from --suffix, default "plan")
    val outDir = args.sliding(2).collectFirst { case Array("--out", d) => d }
    val suffix = args.sliding(2).collectFirst { case Array("--suffix", s) => s }
      .getOrElse("plan")
    outDir.foreach(d => new java.io.File(d).mkdirs())
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n"))
      val df = fn(spark, sfDir)
      if (runFirst) df.write.format("noop").mode("overwrite").save()
      val plan =
        if (formatted)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
          )
        else df.queryExecution.executedPlan.toString
      outDir match {
        case Some(d) =>
          java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/${n}_$suffix.txt"), plan)
          println(s"[explain] wrote $d/${n}_$suffix.txt")
        case None =>
          println(s"===== $n =====")
          println(plan)
      }
    }
    spark.stop()
  }
}
