package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSql

/** Round-15 A/B probe (test scope, b23's protocol): time competing
  * formulations of b36 and b46 in ONE session — 5 passes each after a
  * warmup pass, noop sink, per-variant medians — so machine contention
  * hits both sides equally. Keep the winner, record both numbers.
  */
object R15Ab {

  private def time(fn: => DataFrame, passes: Int): Seq[Double] =
    (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      fn.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

  /** b46 split posture: checkpoint the joined narrow frame once, then
    * per-distinct dedup aggregates + a base aggregate, joined on the
    * tiny year key (s19's split applied to b46) — vs the single
    * Expand-based multi-distinct aggregate.
    */
  def b46Split(spark: SparkSession, sfDir: String): DataFrame = {
    val j = GraftSql
      .sql(
        spark,
        sfDir,
        """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
          |  o_custkey, l_suppkey, l_partkey,
          |  unscaled_long(CAST(l_extendedprice AS DECIMAL(18,2)))
          |    * (100 - unscaled_long(CAST(l_discount AS DECIMAL(3,2)))) AS u
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin
      )
      .localCheckpoint()
    val base = j
      .groupBy(col("order_year"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(expr("u div 100000")).as("hi"),
        sum(expr("u % 100000")).as("lo")
      )
    def dcount(c: String, as: String) =
      j.select(col("order_year"), col(c)).distinct()
        .groupBy(col("order_year")).agg(count(lit(1)).as(as))
    base
      .join(dcount("o_custkey", "n_customers"), Seq("order_year"))
      .join(dcount("l_suppkey", "n_suppliers"), Seq("order_year"))
      .join(dcount("l_partkey", "n_parts"), Seq("order_year"))
      .select(
        col("order_year"), col("n_lines"), col("n_customers"), col("n_suppliers"), col("n_parts"),
        expr("CAST((CAST(hi AS DECIMAL(38,0)) * 100000 + lo) / 10000 AS DOUBLE)").as("revenue")
      )
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("b36_bridge_distinct", () => GraftSql.sql(spark, sfDir, GraftSql.Q16Sql)),
      ("b36_join_first", () => GraftSql.sql(spark, sfDir, GraftSql.Q16EngineSql)),
      ("b46_expand", () => GraftSql.sql(spark, sfDir, GraftSql.MultiDistinctEngineSql)),
      ("b46_split", () => b46Split(spark, sfDir))
    )
    // warmup (codegen/JIT) then timed passes, interleaved per pass so
    // drift hits all variants alike
    variants.foreach { case (_, fn) => time(fn(), 1) }
    val acc = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector.empty)
    (1 to 5).foreach { _ =>
      variants.foreach { case (name, fn) => acc(name) = acc(name) :+ time(fn(), 1).head }
    }
    variants.foreach { case (name, _) =>
      val ts = acc(name).sorted
      println(f"[r15ab] $name%-22s median=${ts(ts.size / 2)}%.3f  all=${acc(name).map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
