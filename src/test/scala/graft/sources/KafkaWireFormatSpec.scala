package graft.sources

import graft.SparkSpec
import graft.queries.OrderSynth
import graft.streaming.OrdersPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Wire-format end-to-end for the Kafka ingest path, as far as a
 * broker-less sandbox allows: a frame shaped EXACTLY like the Kafka
 * source's fixed output schema (key/value binary, topic, partition,
 * offset, timestamp, timestampType, headers — the schema spark-sql-kafka
 * binds, in that order) carrying payloads serialized the way Kafka's
 * `StringSerializer` puts them on the wire (UTF-8 bytes — that serializer
 * IS `String.getBytes(UTF_8)`, so the encoding is reproduced exactly even
 * without kafka-clients on this classpath), driven through the SAME
 * decode→curate stages as the q03 catalog query. Remaining untested gap:
 * only the network hop itself.
 */
class KafkaWireFormatSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def kafkaShaped = {
    val raw = OrderSynth.rawJson(spark, sfDir)
    raw.select(
      // keyed the way the reference producer would key order events
      encode(substring(col("value"), 1, 12), "UTF-8").as("key"),
      encode(col("value"), "UTF-8").as("value"),
      lit("bexley_orders").as("topic"),
      pmod(xxhash64(col("value")), lit(3)).cast("int").as("partition"),
      monotonically_increasing_id().as("offset"),
      to_timestamp(lit("2024-06-01 12:00:00")).as("timestamp"),
      lit(0).as("timestampType"), // CreateTime
      array(struct(
        lit("source").as("key"),
        encode(lit("graft-test"), "UTF-8").as("value")))
        .cast("array<struct<key:string,value:binary>>").as("headers"))
  }

  test("frame matches the Kafka source's fixed schema field for field") {
    // nullability intentionally ignored (the connector marks everything
    // nullable; what must line up is names, order, and types)
    val got = kafkaShaped.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq
    assert(got === Seq(
      "key" -> BinaryType.sql,
      "value" -> BinaryType.sql,
      "topic" -> StringType.sql,
      "partition" -> IntegerType.sql,
      "offset" -> LongType.sql,
      "timestamp" -> TimestampType.sql,
      "timestampType" -> IntegerType.sql,
      "headers" -> ArrayType(StructType(Seq(
        StructField("key", StringType),
        StructField("value", BinaryType)))).sql))
  }

  test("binary wire payload → curated equals the string-raw q03 path row for row") {
    val fromWire = OrdersPipeline.curatedOrders(kafkaShaped)
    val fromString = OrdersPipeline.curatedOrders(OrderSynth.rawJson(spark, sfDir))
    assert(fromWire.schema === fromString.schema)
    val a = fromWire.collect().map(_.toSeq).toSet
    val b = fromString.collect().map(_.toSeq).toSet
    assert(b.nonEmpty)
    assert(fromWire.count() === fromString.count())
    assert(a === b)
  }

  test("non-UTF-8 garbage on the wire degrades PERMISSIVEly, never fails the stream") {
    val s = spark
    import s.implicits._
    val garbage = Seq(Array[Byte](-1, -2, 0x42, -100)).toDF("value")
    val out = OrdersPipeline.curatedOrders(garbage)
    // PERMISSIVE from_json: malformed payload -> all-null struct -> the
    // curation stage drops/nulls it, but the query itself must not throw
    assert(out.count() >= 0L)
  }
}
