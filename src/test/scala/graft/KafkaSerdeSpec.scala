package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.KafkaIO

/** Round-trips the Kafka serde without a broker: [[KafkaIO.encodeJson]]
  * produces the wire record (key, value) the producer would send;
  * [[KafkaIO.decodeJson]] parses the consumer side back into typed
  * columns. Both are pure DataFrame projections shared verbatim by the
  * streaming source/sink, so a batch round trip exercises the exact
  * production serde (reference surface: Kafka.scala:59-93 — Kryo
  * encode/decode both directions).
  */
object KafkaSerdeSpec {
  case class Payload(client_id: Long, event_id: Long, ts: Timestamp, event_type: String, value: Double)
}

class KafkaSerdeSpec extends SparkSpec {
  import KafkaSerdeSpec.Payload

  private val schemaDdl = "client_id BIGINT, event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE"

  test("encodeJson -> decodeJson is lossless, microsecond timestamps included") {
    import spark.implicits._
    val rows = Seq(
      // 123456 micros — would truncate under the default millis format
      Payload(1L, 10L, Timestamp.valueOf("2026-01-15 10:30:00.123456"), "view", 1.5),
      Payload(1L, 11L, Timestamp.valueOf("2026-01-15 10:30:01.000001"), "click", -0.25),
      Payload(2L, 12L, Timestamp.valueOf("2026-01-15 10:30:02.999999"), "purchase", 0.0)
    )
    val src = rows.toDF()

    val wire = KafkaIO.encodeJson(src, "client_id")
    assert(wire.columns.toSeq == Seq("key", "value"))

    // simulate the broker leg: key/value arrive as binary plus a broker timestamp
    val consumed = wire.select(
      col("key").cast("binary").as("key"),
      col("value").cast("binary").as("value"),
      lit(Timestamp.valueOf("2026-01-15 10:30:05")).as("timestamp")
    )

    val decoded = KafkaIO.decodeJson(consumed, schemaDdl)
    assert(decoded.columns.toSeq == Seq("key", "client_id", "event_id", "ts", "event_type", "value", "kafka_ts"))

    val back = decoded
      .select(col("client_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[Payload]
      .collect()
      .sortBy(_.event_id)
    assert(back.toSeq == rows, "payload columns must survive the round trip bit-exact")

    // key carries the partitioning column as a string (Kafka key-partitioned topology)
    val keys = decoded.select(col("key"), col("client_id")).collect()
    keys.foreach(r => assert(r.getString(0) == r.getLong(1).toString))
  }

  test("exactly-once sink payload: replay-deterministic records with stable replay headers") {
    import spark.implicits._
    val rows = Seq(
      Payload(1L, 10L, Timestamp.valueOf("2026-01-15 10:30:00.123456"), "view", 1.5),
      Payload(2L, 11L, Timestamp.valueOf("2026-01-15 10:30:01.000001"), "click", -0.25)
    )
    val batch = rows.toDF()

    def materialize(df: org.apache.spark.sql.DataFrame) = df
      .select(
        col("key"),
        col("value"),
        expr("transform(headers, h -> struct(h.key as key, cast(h.value as string) as value))").as("hs")
      )
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[org.apache.spark.sql.Row](2).map(h => (h.getString(0), h.getString(1))).toList))
      .sortBy(_._2)
      .toList

    val p1 = materialize(KafkaIO.batchPayload(batch, "client_id", "/ckpt/a", 42L))
    // Structured Streaming replays a failed batch under the SAME
    // (checkpoint, batchId) — the resent records must be byte-identical
    // so a consumer keyed on (graft_ckpt, graft_batch, key) dedups exactly
    val p2 = materialize(KafkaIO.batchPayload(batch, "client_id", "/ckpt/a", 42L))
    assert(p1 == p2, "replayed batch produced different wire records")
    // headers carry the replay identity…
    p1.foreach { case (_, _, hs) =>
      assert(hs == List("graft_ckpt" -> "/ckpt/a", "graft_batch" -> "42"))
    }
    // …and a different batchId changes ONLY the header, never the payload
    val p3 = materialize(KafkaIO.batchPayload(batch, "client_id", "/ckpt/a", 43L))
    assert(p1.map(t => (t._1, t._2)) == p3.map(t => (t._1, t._2)))
    assert(p3.head._3.contains("graft_batch" -> "43"))

    // the value leg still round-trips through the consumer serde
    val decoded = KafkaIO.decodeJson(
      KafkaIO.batchPayload(batch, "client_id", "/ckpt/a", 42L)
        .select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value"),
          lit(Timestamp.valueOf("2026-01-15 11:00:00")).as("timestamp")),
      schemaDdl
    )
    val back = decoded
      .select(col("client_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[Payload].collect().sortBy(_.event_id)
    assert(back.toSeq == rows)

    // producer hardening surface
    assert(KafkaIO.IdempotentProducerOptions("kafka.enable.idempotence") == "true")
    assert(KafkaIO.IdempotentProducerOptions("kafka.acks") == "all")
  }

  test("decodeJson keeps the broker timestamp as kafka_ts, separate from event time") {
    import spark.implicits._
    val src = Seq(Payload(7L, 70L, Timestamp.valueOf("2026-02-01 00:00:00.5"), "view", 2.0)).toDF()
    val brokerTs = Timestamp.valueOf("2026-02-01 00:00:09")
    val consumed = KafkaIO
      .encodeJson(src, "client_id")
      .withColumn("timestamp", lit(brokerTs))
    val out = KafkaIO.decodeJson(consumed, schemaDdl).collect().head
    assert(out.getAs[Timestamp]("kafka_ts") == brokerTs)
    assert(out.getAs[Timestamp]("ts") == Timestamp.valueOf("2026-02-01 00:00:00.5"))
  }
}
