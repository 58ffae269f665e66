package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Table loaders over the driver-generated parquet star schema.
  *
  * Each loader is a plain parquet scan: column pruning and predicate
  * pushdown happen in Catalyst, so callers `select`/`filter` freely and
  * the scan reads only what the query needs. At 100 TB these would be
  * partitioned/bucketed tables behind a catalog; the API is the same.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has shipped in two physical layouts: parquet
    * TIMESTAMP(NANOS) (no native Spark type — read as long nanos via the
    * `nanosAsLong` conf in [[graft.core.GraftSession]] and truncated to
    * microseconds, the same truncation DuckDB applies casting
    * TIMESTAMP_NS→TIMESTAMP) and plain TIMESTAMP(MICROS) (read as
    * TIMESTAMP_NTZ). Adapt on the observed type so both layouts surface
    * the identical TIMESTAMP column — the session timezone is pinned to
    * UTC, so the NTZ→LTZ cast is value-preserving.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", expr("cast(ts as timestamp)"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
