package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Physical join strategies for the 100 TB posture (SURVEY.md §5):
  * bucketed co-located joins (the shuffle you pay once at write time
  * instead of on every query) and salted joins (the skew escape hatch
  * when one key holds a disproportionate share of rows).
  */
object ScaleJoins {

  val Buckets = 8
  val SaltBuckets = 8

  /** S3: bucketed co-located join. Both fact tables are written
    * bucketed on the join key; Spark then joins bucket-to-bucket with
    * NO Exchange in the plan (asserted in PlanSpec). At 100 TB this is
    * the difference between shuffling terabytes per query and never
    * shuffling them again.
    */
  /** Drop a managed table AND its orphaned warehouse location (the
    * in-memory catalog forgets tables across sessions; the filesystem
    * does not). Hadoop FS API, so the cleanup works when the warehouse
    * is an object store — same posture as Formats/StreamingSink.
    */
  private def dropManaged(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val dir = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"), name)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(dir)) fs.delete(dir, true): Unit
  }

  // sfDir whose bucketed layout a catalog already holds — bucketing is
  // the shuffle you pay ONCE at write time; repeat calls (every bench
  // pass, every query in a session) must pay only the exchange-free
  // join, exactly as a production warehouse amortizes table maintenance.
  // Keyed on the SparkContext (the shared-catalog owner), NOT the
  // session: sibling sessions from newSession() share the managed
  // tables, and a session-keyed cache would let one session's rebuild
  // silently serve another session's different sfDir
  private val bucketedFor =
    java.util.Collections.synchronizedMap(new java.util.WeakHashMap[AnyRef, String]())
  private val rebuildLocks =
    java.util.Collections.synchronizedMap(new java.util.WeakHashMap[AnyRef, Object]())

  def s3BucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val catalogKey: AnyRef = spark.sparkContext
    // check-then-rebuild must serialize per catalog: two concurrent
    // callers (newSession() siblings, parallel threads) otherwise race
    // the drop/overwrite of the SAME managed tables — one drop deletes
    // the warehouse dir mid-write of the other
    val lock = rebuildLocks.computeIfAbsent(catalogKey, _ => new Object)
    lock.synchronized {
      val fresh = bucketedFor.get(catalogKey) != sfDir ||
        !spark.catalog.tableExists("graft_orders_bucketed") ||
        !spark.catalog.tableExists("graft_lineitem_bucketed")
      if (fresh) {
        dropManaged(spark, "graft_orders_bucketed")
        dropManaged(spark, "graft_lineitem_bucketed")
        Tables
          .orders(spark, sfDir)
          .write
          .format("parquet")
          .bucketBy(Buckets, "o_orderkey")
          .sortBy("o_orderkey")
          .mode("overwrite")
          .saveAsTable("graft_orders_bucketed")
        Tables
          .lineitem(spark, sfDir)
          .write
          .format("parquet")
          .bucketBy(Buckets, "l_orderkey")
          .sortBy("l_orderkey")
          .mode("overwrite")
          .saveAsTable("graft_lineitem_bucketed")
        bucketedFor.put(catalogKey, sfDir): Unit
      }
    }

    spark
      .table("graft_lineitem_bucketed")
      .join(spark.table("graft_orders_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        graft.functions.ExactAgg.moneySum(col("l_extendedprice")).as("sum_price")
      )
  }

  /** S4: salted join. The fact side gets a deterministic salt; the dim
    * side is exploded across all salt values; the join key becomes
    * (key, salt), spreading any hot key over `SaltBuckets` reducers.
    * Result is semantically identical to the unsalted join (the oracle
    * computes the plain join), only the partitioning differs.
    */
  def s4SaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    // null-safe salt: pmod(NULL) is NULL and the salt equi-predicate
    // would silently DROP a null-id row the unsalted join (and the
    // oracle) keeps
    val fact = Tables
      .events(spark, sfDir)
      .withColumn("salt", pmod(coalesce(col("event_id"), lit(0L)), lit(SaltBuckets)).cast("int"))
    val dim = Tables
      .customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(array((0 until SaltBuckets).map(lit): _*)))

    fact
      .join(dim, fact("user_id") === dim("c_custkey") && fact("salt") === dim("salt"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).as("n"),
        graft.functions.ExactAgg.moneySum(col("value")).as("sum_value")
      )
  }
}
