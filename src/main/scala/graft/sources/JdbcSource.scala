package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * JDBC batch source with full-query pushdown.
 *
 * Capability re-derivation of the reference's
 * `extract_ship_cities_from_mysql`
 * (`/root/reference/bexley_spark_stream_msk_es.py:254-285`): the `query`
 * option ships the entire SELECT to the RDBMS — stronger than rule-based
 * pushdown, the database runs the whole query and Spark receives only the
 * result rows. Schema is provider-supplied from database metadata.
 */
final case class JdbcSourceConfig(
    url: String,
    query: String,
    user: String,
    password: String,
    driver: String = "com.mysql.cj.jdbc.Driver",
    fetchSize: Int = 1000)

object JdbcSource {

  def read(spark: SparkSession, cfg: JdbcSourceConfig): DataFrame =
    spark.read
      .format("jdbc")
      .option("url", cfg.url)
      .option("query", cfg.query)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .option("fetchsize", cfg.fetchSize.toString)
      .load()
}
