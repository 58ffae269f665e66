package graft

import org.apache.spark.sql.functions._

import graft.plans.{ArrayDotProduct, ArrayNormalize}

/** Property tests for the native expressions: the codegen'd fast path
  * must equal a reference Scala fold exactly (not approximately — the
  * engine contract is bit-equality with any strict sequential sum).
  */
class ExpressionsSpec extends SparkSpec {

  private def refDot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }

  test("array_dot equals strict sequential fold, bit-exact (100 seeded cases)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cases = (1 to 100).map { _ =>
      val n = 1 + rnd.nextInt(96)
      (Array.fill(n)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)),
       Array.fill(n)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)))
    }
    val df = cases.toDF("a", "b")
    val got = df.select(ArrayDotProduct.arrayDot(col("a"), col("b"))).collect().map(_.getDouble(0))
    got.zip(cases).foreach { case (g, (a, b)) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(refDot(a.toSeq, b.toSeq)))
    }
  }

  test("array_l2_normalize: unit norm and direction preserved") {
    import spark.implicits._
    val v = Array(3.0, 4.0, 0.0)
    val got = Seq(Tuple1(v)).toDF("v")
      .select(ArrayNormalize.arrayNormalize(col("v")))
      .head.getSeq[Double](0)
    assert(got == Seq(0.6, 0.8, 0.0))
  }

  test("SQL surface: array_dot and array_l2_normalize callable from spark.sql") {
    GraftSql.register(spark, sf0001)
    val r = spark
      .sql("SELECT array_dot(array_l2_normalize(array(3.0d, 4.0d)), array_l2_normalize(array(3.0d, 4.0d))) AS c")
      .head
      .getDouble(0)
    assert(math.abs(r - 1.0) < 1e-15)
  }

  test("s2 partition pruning reaches the file source") {
    graft.sources.Formats.s2PartitionedWrite(spark, sf0001).count() // materialize layout
    val pruned = spark.read
      .parquet("/tmp/graft_part_orders")
      .filter(col("o_year") === 1997)
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("o_year"))
  }
}
