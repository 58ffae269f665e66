package graft

/** Bench's BASELINE.md parsing — the denominator of the vs-baseline
  * ratios the driver gates on.
  */
class BaselineSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("readBaseline parses the frozen per-query medians") {
    val b = Bench.readBaseline("BASELINE.md")
    assert(b.size >= 58, s"expected the 58 frozen r3 queries, got ${b.size}")
    assert(b("b1_agg_pricing") > 0.1 && b("b1_agg_pricing") < 10.0)
    assert(b.values.forall(v => v > 0 && v < 60), "implausible baseline second values")
  }
  test("readBaseline returns empty for a missing file (Bench still runs)") {
    assert(Bench.readBaseline("/nonexistent/BASELINE.md").isEmpty)
  }
}

/** Registration-cache contract for the SQL entry point: cached per
  * (session, sfDir), rebuilt on a directory switch, and recoverable via
  * invalidate() after a caller mutates the catalog behind the cache.
  */
class GraftSqlSpec extends SparkSpec {

  test("every oracle key matches a queries entry; the only rows-only gate is the documented one") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // a typo'd oracle key would silently downgrade its gate to the
    // weaker rows-only check — fail loudly instead
    assert((o -- q).isEmpty, s"oracle entries with no matching query: ${(o -- q).toSeq.sorted}")
    assert(
      // b12's HLL sketch registers are genuinely not SQL-expressible;
      // c24 joined the hash-exact set in round 10 (ordered-fold Lloyd)
      (q -- o) == Set("b12_approx_sketch"),
      s"unexpected rows-only gates: ${(q -- o).toSeq.sorted} — every new operator needs BOTH entries"
    )
  }

  test("every gate query has a BASELINE.md row (no query ships unbaselined)") {
    // a query absent from BASELINE.md reports no vs-baseline ratio and
    // never trips the 2x regression flag — it is effectively
    // unmonitored (c58 shipped that way for most of a round before
    // this guard existed). Bench.readBaseline is the same parser the
    // benchmark uses, so this asserts exactly what the artifact sees.
    val baseline = Bench.readBaseline()
    assume(baseline.nonEmpty, "BASELINE.md not present (running outside the repo root)")
    val missing = SparkEntry.queries.keySet -- baseline.keySet
    assert(missing.isEmpty, s"queries with no baseline row: ${missing.toSeq.sorted}")
  }

  test("sql() runs against the registered sfDir and re-registers on a dir switch") {
    val n1 = GraftSql.sql(spark, sf0001, "SELECT count(*) AS n FROM orders").collect()(0).getLong(0)
    val n2 = GraftSql.sql(spark, sf001, "SELECT count(*) AS n FROM orders").collect()(0).getLong(0)
    assert(n1 > 0 && n2 > n1, s"sf0.01 must register more orders than sf0.001 (got $n1, $n2)")
  }

  test("SQL row_number()<=k top-k plans the native TopKPerKeyExec and matches the window plan") {
    val q =
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin
    val rewritten = GraftSql.sql(spark, sf0001, q)
    val planStr = rewritten.queryExecution.executedPlan.toString
    // physical nodes print without the Exec suffix
    assert(planStr.contains("TopKPerKey"), s"native operator missing from SQL plan:\n$planStr")
    // Spark's own sort-based WindowGroupLimit (inserted before the
    // late-batch rewrite runs) must be stripped, not stacked under TopK
    assert(!planStr.contains("WindowGroupLimit"), s"redundant group limit left in plan:\n$planStr")

    // semantics: identical rows to the declarative window formulation
    // (total order via the orderkey tiebreak), rewrite disabled via conf
    val key = graft.plans.TopKPerKey.SqlRewriteMaxKKey
    spark.conf.set(key, "0")
    try {
      val plain = GraftSql.sql(spark, sf0001, q)
      assert(!plain.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(rewritten.collect().toSet == plain.collect().toSet)
    } finally spark.conf.unset(key)
  }

  test("SQL rewrite keeps a selective rn predicate: rn = 2 returns exactly the runner-up") {
    val q =
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 2""".stripMargin
    val df = GraftSql.sql(spark, sf0001, q)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("TopKPerKey"), s"native operator missing:\n$planStr")
    val key = graft.plans.TopKPerKey.SqlRewriteMaxKKey
    spark.conf.set(key, "0")
    try assert(df.collect().toSet == GraftSql.sql(spark, sf0001, q).collect().toSet)
    finally spark.conf.unset(key)
  }

  test("SQL RANK()<=k rewrites to the ties-aware native prune and matches the window plan") {
    // rank() admits ties past k — RankMode buffers retain them
    val rank =
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin
    val df = GraftSql.sql(spark, sf0001, rank)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("TopKPerKey"), s"rank rewrite missed:\n$planStr")
    assert(planStr.contains("RankMode"), s"wrong mode:\n$planStr")
    val key = graft.plans.TopKPerKey.SqlRewriteMaxKKey
    spark.conf.set(key, "0")
    try {
      val plain = GraftSql.sql(spark, sf0001, rank)
      assert(!plain.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(df.collect().toSet == plain.collect().toSet)
    } finally spark.conf.unset(key)
  }

  test("SQL rewrite stays out of shapes it cannot prove: percent_rank(), no PARTITION BY, OR-bounds") {
    // percent_rank needs the whole partition's cardinality — not prunable
    val pct =
      """SELECT o_custkey FROM (
        |  SELECT o_custkey, percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
        |  FROM orders) WHERE rn <= 0.5""".stripMargin
    assert(!GraftSql.sql(spark, sf0001, pct).queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // a global top-k has no key to cluster on
    val global =
      """SELECT o_orderkey FROM (
        |  SELECT o_orderkey, row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin
    assert(!GraftSql.sql(spark, sf0001, global).queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // a disjunctive bound does not bound rn at all
    val disjunct =
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 OR o_orderkey = 1""".stripMargin
    assert(!GraftSql.sql(spark, sf0001, disjunct).queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("rank-limit rewrite equivalence on randomized data (10 seeded trials)") {
    import spark.implicits._
    val key = graft.plans.TopKPerKey.SqlRewriteMaxKKey
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 200 + rnd.nextInt(800)
      val nKeys = 1 + rnd.nextInt(12)
      val k = 1 + rnd.nextInt(6)
      val rows = (0 until n).map(i => (i.toLong, rnd.nextInt(nKeys), rnd.nextInt(50)))
      rows.toDF("id", "grp", "v").createOrReplaceTempView("rlt_t")
      // vary the comparison shape across trials: <=, <, =, and the
      // reversed literal-first form
      val cond = seed % 4 match {
        case 0 => s"rn <= $k"
        case 1 => s"rn < ${k + 1}"
        case 2 => s"rn = $k"
        case 3 => s"$k >= rn"
      }
      val q =
        s"""SELECT grp, id, v, rn FROM (
           |  SELECT grp, id, v, row_number() OVER (PARTITION BY grp ORDER BY v DESC, id) AS rn
           |  FROM rlt_t) WHERE $cond""".stripMargin
      val rewritten = GraftSql.sql(spark, sf0001, q)
      assert(rewritten.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        s"seed=$seed: rewrite did not fire for '$cond'")
      val got = rewritten.collect().map(_.toSeq).toSet
      spark.conf.set(key, "0")
      val expected =
        try GraftSql.sql(spark, sf0001, q).collect().map(_.toSeq).toSet
        finally spark.conf.unset(key)
      assert(got == expected,
        s"seed=$seed cond='$cond': missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    }
  }

  test("a GraftExtensions-built session plans the rank rewrite with no lazy injection") {
    import org.apache.spark.sql.SparkSession
    // a session CREATED with the extensions (the spark.sql.extensions /
    // withExtensions deployment path) must plan the native operator
    // without GraftSql.register's experimental.* fallback injection.
    // getOrCreate returns the existing session unless the
    // active/default slots are cleared first — restore them after.
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession
        .builder()
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      assert(ext ne old, "builder returned the old session — extensions were not applied")
      graft.sources.Tables.table(ext, sf0001, "orders").createOrReplaceTempView("orders_ext")
      val df = ext.sql(
        """SELECT o_custkey, o_orderkey FROM (
          |  SELECT o_custkey, o_orderkey,
          |         rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
          |  FROM orders_ext) WHERE rn <= 2""".stripMargin)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKey"), s"extensions path missed the rank rewrite:\n$p")
      assert(df.collect().nonEmpty)
    } finally {
      SparkSession.setActiveSession(old)
      SparkSession.setDefaultSession(old)
    }
  }

  test("invalidate() restores sql() after a caller drops a temp view behind the cache") {
    GraftSql.sql(spark, sf0001, "SELECT 1").collect()
    spark.catalog.dropTempView("nation")
    // cache still thinks the session is registered — the view is gone
    intercept[Exception] {
      GraftSql.sql(spark, sf0001, "SELECT count(*) FROM nation").collect()
    }
    GraftSql.invalidate(spark)
    val n = GraftSql.sql(spark, sf0001, "SELECT count(*) AS n FROM nation").collect()(0).getLong(0)
    assert(n > 0)
  }
}
