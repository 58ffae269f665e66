package graft.tools
object ExplainC93 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.operators.TextDedup.c93DedupSimhashRefined(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
