package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka source/sink wiring — the `Kafka.scala` surface of the
  * reference (topics, serde, consumer/producer config), expressed as
  * Structured Streaming `format("kafka")` readers/writers.
  *
  * Reference: /root/reference/src/main/scala/example/Kafka.scala:59-93
  * (producer/consumer props) and the `addSource`/`addSink` calls in
  * both topologies.
  *
  * Not runnable in this container (no Kafka broker, and the Kafka
  * connector jar ships separately from Spark core), but this is the
  * complete production configuration: a user of the reference points
  * `bootstrapServers` at their cluster and gets the same
  * at-least-once, key-partitioned topology. JSON stands in for the
  * reference's Kryo serde — schema-explicit and engine-neutral.
  */
object KafkaIO {

  final case class KafkaConfig(
      bootstrapServers: String = "localhost:9092",
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None
  )

  /** `readStream.format("kafka")` for a topic, with the value parsed
    * from JSON into `schema` columns and the event time extracted —
    * the analogue of the reference's serde + FailOnInvalidTimestamp
    * timestamp extractor.
    */
  def source(
      spark: SparkSession,
      topic: String,
      schemaDdl: String,
      cfg: KafkaConfig = KafkaConfig()
  ): DataFrame = {
    val base = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", cfg.startingOffsets)
    val withRate = cfg.maxOffsetsPerTrigger.fold(base)(n => base.option("maxOffsetsPerTrigger", n.toString))
    withRate
      .load()
      .select(
        col("key").cast("string").as("key"),
        from_json(col("value").cast("string"), schemaDdl, Map.empty[String, String]).as("v"),
        col("timestamp").as("kafka_ts")
      )
      .select(col("key"), col("v.*"), col("kafka_ts"))
  }

  /** `writeStream.format("kafka")` — key by `keyCol`, serialize the
    * payload to JSON (the reference's sink serde).
    */
  def sink(
      df: DataFrame,
      topic: String,
      keyCol: String,
      checkpointDir: String,
      cfg: KafkaConfig = KafkaConfig()
  ): DataStreamWriter[Row] =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value")
    ).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
}
