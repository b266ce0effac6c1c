package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Kafka streaming source builder.
 *
 * Capability re-derivation of the reference's
 * `extract_json_from_kafka_stream`
 * (`/root/reference/bexley_spark_stream_msk_es.py:191-221`): subscribe to a
 * topic with SASL auth, choose starting offsets, include headers, and
 * optionally cap records per micro-batch (`maxOffsetsPerTrigger`, declared at
 * reference :101 and wired at :212).
 *
 * Config is injected via a plain case class — secrets/env plumbing stays out
 * of the dataflow core (the reference's Secrets Manager loader,
 * bexley_load_auth_from_secrets_manager_v01.py, is environment wiring, not an
 * operator).
 */
final case class KafkaSourceConfig(
    bootstrapServers: String,
    topic: String,
    saslUsername: Option[String] = None,
    saslPassword: Option[String] = None,
    saslMechanism: String = "SCRAM-SHA-512",
    securityProtocol: String = "SASL_SSL",
    startingOffsets: String = "latest",
    includeHeaders: Boolean = true,
    maxOffsetsPerTrigger: Option[Long] = None)

object KafkaSource {

  /** Lazily builds the streaming source node; nothing connects until start(). */
  def readStream(spark: SparkSession, cfg: KafkaSourceConfig): DataFrame = {
    var r = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("subscribe", cfg.topic)
      .option("startingOffsets", cfg.startingOffsets)
      .option("includeHeaders", cfg.includeHeaders.toString)
    for (u <- cfg.saslUsername; p <- cfg.saslPassword) {
      r = r
        .option("kafka.security.protocol", cfg.securityProtocol)
        .option("kafka.sasl.mechanism", cfg.saslMechanism)
        .option(
          "kafka.sasl.jaas.config",
          s"""org.apache.kafka.common.security.scram.ScramLoginModule required username="$u" password="$p";""")
    }
    for (m <- cfg.maxOffsetsPerTrigger) r = r.option("maxOffsetsPerTrigger", m.toString)
    r.load()
  }
}
