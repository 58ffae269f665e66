package graft.core

import scala.reflect.ClassTag

import org.apache.spark.sql.{Encoder, Encoders}

/** Serialization surface — the analogue of the reference's
  * `KryoSerde` (/root/reference/src/main/scala/example/KryoSerde.scala),
  * which Kryo-serializes every Kafka key/value.
  *
  * In Spark the serde lives in the `Encoder`: case classes get the
  * schema-aware product encoder via `import spark.implicits._`
  * (columnar, codegen'd, far better than byte-blob serde at scale —
  * fields remain individually prunable and filterable); arbitrary
  * classes fall back to Kryo exactly like the reference, stored as a
  * single binary column.
  */
object Serdes {

  /** Kryo fallback for classes without a product structure — the
    * direct `KryoSerde` equivalent. Payload becomes one opaque binary
    * column: no pruning, no pushdown — use only when the type cannot
    * be a case class.
    */
  def kryo[T](implicit ct: ClassTag[T]): Encoder[T] = Encoders.kryo[T](ct)

  /** Java-serialization fallback (slowest; API completeness). */
  def javaSerialization[T](implicit ct: ClassTag[T]): Encoder[T] = Encoders.javaSerialization[T](ct)
}
