package graft

import graft.core.Serdes

/** Serde coverage: the reference Kryo-serializes every Kafka payload
  * (KryoSerde.scala); Spark's equivalent is the Encoder. Case classes
  * roundtrip through the schema-aware product encoder; arbitrary
  * classes through the Kryo encoder.
  */
case class SerdeTyped(id: Long, name: String, score: Double)

// deliberately NOT a case class — forces the Kryo path
class SerdeBlob(val id: Int, val payload: Array[Byte]) extends Serializable

class SerdesSpec extends SparkSpec {

  test("product encoder roundtrips case classes with a real schema") {
    import spark.implicits._
    val in = Seq(SerdeTyped(1, "a", 0.5), SerdeTyped(2, "b", 1.5))
    val ds = in.toDS()
    assert(ds.schema.fieldNames.toSeq == Seq("id", "name", "score")) // prunable columns, not a blob
    assert(ds.collect().toSeq == in)
  }

  test("kryo encoder roundtrips arbitrary classes as a binary column") {
    implicit val enc = Serdes.kryo[SerdeBlob]
    val ds = spark.createDataset(Seq(new SerdeBlob(7, Array[Byte](1, 2, 3))))
    assert(ds.schema.fields.head.dataType.typeName == "binary") // opaque, like the reference serde
    val out = ds.collect().head
    assert(out.id == 7 && out.payload.toSeq == Seq[Byte](1, 2, 3))
  }
}
