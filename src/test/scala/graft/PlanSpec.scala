package graft

import org.apache.spark.sql.DataFrame

import graft.operators._

/** Physical-plan audit: the properties that decide whether these
  * operators survive a 100x scale-up — dims broadcast, filters reach
  * the parquet scan, columns prune, and nothing degenerates into a
  * cartesian product (except c5's intentional brute-force baseline).
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("b1: filter and projection pushed to the parquet scan") {
    val p = plan(Relational.b1AggPricing(spark, sf0001))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema") && !p.contains("l_orderkey")) // unused columns pruned
  }

  test("b2/b3: dimension joins broadcast, no cartesian") {
    Seq(Relational.b2JoinTopn _, Relational.b3MultiJoin _).foreach { q =>
      val p = plan(q(spark, sf0001))
      assert(p.contains("BroadcastHashJoin"))
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("b4: semi/anti joins planned as LeftSemi/LeftAnti (no row blowup)") {
    val p = plan(Relational.b4SemiAntiJoin(spark, sf0001))
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
  }

  test("a7: stream-dim enrichment broadcasts the dim, events never shuffle pre-agg") {
    val p = plan(EventStreamOps.a7StreamEnrichDim(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("whole-stage codegen active on the scan+agg pipeline") {
    val df = Relational.b1AggPricing(spark, sf0001)
    df.collect() // AQE only annotates codegen stages in the final executed plan
    val p = plan(df)
    // codegen stages print as "*(n)" in the executed plan
    assert(p.contains("*("))
    // and aggregation is partial (map-side) before the exchange
    assert(p.contains("partial_sum"))
  }

  test("dedup family: no cartesian products anywhere") {
    Seq(
      TextDedup.c1DedupExact _,
      TextDedup.c2NgramJaccard _,
      TextDedup.c3MinHashLsh _,
      TextDedup.c4SimHash _
    ).foreach { q =>
      val p = plan(q(spark, sf0001))
      assert(!p.contains("CartesianProduct"), p.linesIterator.take(5).mkString("\n"))
    }
  }

  test("c6: queries broadcast against candidates (stream side never shuffles)") {
    val p = plan(VectorOps.c6AnnBruteforce(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("c7: LSH bucket join is a hash join on the bucket key, not a cross join") {
    val p = plan(VectorOps.c7AnnLsh(spark, sf0001))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Join") )
  }
}
