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
  * The serde itself — [[decodeJson]]/[[encodeJson]] — is a pure
  * DataFrame→DataFrame projection shared by batch and streaming, and
  * is round-trip-tested in KafkaSerdeSpec without a broker. JSON
  * stands in for the reference's Kryo serde — schema-explicit and
  * engine-neutral; the timestampFormat carries microseconds so event
  * times survive the round trip bit-exact.
  *
  * The broker wiring is config-only in this container (no Kafka
  * broker, and the Kafka connector jar ships separately from Spark
  * core): a user points `bootstrapServers` at their cluster and gets
  * the same at-least-once, key-partitioned topology as the reference.
  */
object KafkaIO {

  final case class KafkaConfig(
      bootstrapServers: String = "localhost:9092",
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None
  )

  /** Default Spark JSON timestamp format is millisecond-precision;
    * event times are microseconds — serialize all six digits. NOTE:
    * this makes encode/decode a SELF-CONSISTENT pair (the sink always
    * writes 6 fraction digits). A topic populated by a producer using a
    * different timestamp layout needs its format passed via `options` —
    * with an explicit format Spark disables the lenient fallback, so a
    * mismatched layout nulls the record rather than mis-parsing it.
    */
  val SerdeOptions: Map[String, String] =
    Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  /** Kafka wire record (key/value/timestamp) → typed columns: value
    * parsed from JSON into `schemaDdl` columns, key cast to string,
    * broker timestamp kept as `kafka_ts` — the analogue of the
    * reference's consumer serde + FailOnInvalidTimestamp extractor.
    * Pure projection: works identically on batch and streaming frames.
    */
  def decodeJson(
      records: DataFrame,
      schemaDdl: String,
      options: Map[String, String] = SerdeOptions
  ): DataFrame =
    records
      .select(
        col("key").cast("string").as("key"),
        from_json(col("value").cast("string"), schemaDdl, options).as("v"),
        col("timestamp").as("kafka_ts")
      )
      .select(col("key"), col("v.*"), col("kafka_ts"))

  /** Typed columns → Kafka wire record: key from `keyCol`, value as the
    * JSON of every column — the reference's producer serde. Pure
    * projection, inverse of [[decodeJson]] (KafkaSerdeSpec asserts the
    * round trip is lossless, timestamps included).
    */
  def encodeJson(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*), SerdeOptions).as("value")
    )

  /** `readStream.format("kafka")` for a topic, decoded via [[decodeJson]]. */
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
    decodeJson(withRate.load(), schemaDdl)
  }

  /** `writeStream.format("kafka")` — encoded via [[encodeJson]]. */
  def sink(
      df: DataFrame,
      topic: String,
      keyCol: String,
      checkpointDir: String,
      cfg: KafkaConfig = KafkaConfig()
  ): DataStreamWriter[Row] =
    encodeJson(df, keyCol).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)

  // --------------------------------------------------------------------
  // Exactly-once-shaped sink. Kafka offers no file-marker idempotence
  // (StreamingSink's trick), and Spark's kafka writer does not manage
  // producer transactions — so the achievable contract, the SAME one the
  // reference runs on, is at-least-once transport + keyed dedup at the
  // consumer (EvJoinProcessor's EvPvKey store,
  // ClickstreamJoinExample.scala:314-365). The sink's job is to make
  // that dedup DETERMINISTIC: a replayed micro-batch (same checkpoint,
  // same batchId — Structured Streaming's restart contract) must
  // re-send byte-identical records carrying stable replay identifiers,
  // so any consumer keyed on (graft_ckpt, graft_batch, key) collapses
  // duplicates exactly. Producer-side, the config surface defaults to
  // enable.idempotence + acks=all, removing broker-side duplication
  // from retries within a producer session.
  // --------------------------------------------------------------------

  /** Producer hardening defaults for the exactly-once-shaped sink. */
  val IdempotentProducerOptions: Map[String, String] = Map(
    "kafka.enable.idempotence" -> "true",
    "kafka.acks" -> "all"
  )

  /** The per-micro-batch wire payload as a PURE function — (key, value,
    * headers) where headers carry the checkpoint location and batchId.
    * Deterministic: replaying the same batch under the same batchId
    * yields identical rows (KafkaSerdeSpec asserts this, plus that a
    * different batchId changes ONLY the header). The headers column
    * follows the kafka sink's contract: array<struct<key,value>> with
    * `includeHeaders`.
    */
  def batchPayload(batch: DataFrame, keyCol: String, checkpointDir: String, batchId: Long): DataFrame =
    encodeJson(batch, keyCol).select(
      col("key"),
      col("value"),
      array(
        struct(lit("graft_ckpt").as("key"), lit(checkpointDir.getBytes("UTF-8")).as("value")),
        struct(lit("graft_batch").as("key"), lit(batchId.toString.getBytes("UTF-8")).as("value"))
      ).as("headers")
    )

  /** foreachBatch Kafka sink with the exactly-once shape: each
    * micro-batch is written as a BATCH kafka write of
    * [[batchPayload]] rows under the idempotent-producer options.
    * Broker-untested in this container (no broker and no kafka
    * connector jar) — the payload determinism half, the part that makes
    * consumer dedup exact, is spec-verified in KafkaSerdeSpec; the
    * `.write.format("kafka")` call is config-only like [[sink]].
    */
  def exactlyOnceSink(
      df: DataFrame,
      topic: String,
      keyCol: String,
      checkpointDir: String,
      cfg: KafkaConfig = KafkaConfig(),
      trigger: org.apache.spark.sql.streaming.Trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()
  ): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val writer = batchPayload(batch, keyCol, checkpointDir, batchId).write
          .format("kafka")
          .option("kafka.bootstrap.servers", cfg.bootstrapServers)
          .option("topic", topic)
          .option("includeHeaders", "true")
        IdempotentProducerOptions.foldLeft(writer) { case (w, (k, v)) => w.option(k, v) }.save()
      }
      .trigger(trigger)
}
