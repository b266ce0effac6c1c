package graft.sources

import graft.SparkSpec

/** Live-driver proof for the JDBC source (SURVEY.md §2.1 S3).
  *
  * The reference reads ship cities from MySQL with a full-query pushdown
  * (`/root/reference/bexley_spark_stream_msk_es.py:254-285`); no MySQL
  * exists in this sandbox, but Derby ships with Spark's jars, so the
  * ACTUAL `format("jdbc")` resolve path — driver class loading, provider
  * metadata schema, the `query` option's ship-the-whole-SELECT contract —
  * runs for real against an embedded in-JVM database. Only the wire
  * dialect differs from MySQL; every Spark-side moving part is the same.
  */
class JdbcSourceSpec extends SparkSpec {

  private val dbName = "graftjdbc"
  private val bootUrl = s"jdbc:derby:memory:$dbName;create=true"

  private def seed(): Unit = {
    val conn = java.sql.DriverManager.getConnection(bootUrl)
    try {
      val st = conn.createStatement()
      // idempotent across tests in the suite: drop if an earlier test made it
      try st.execute("DROP TABLE ship_city") catch { case _: java.sql.SQLException => () }
      st.execute(
        """CREATE TABLE ship_city (
          |  city_id INT NOT NULL,
          |  city_name VARCHAR(64) NOT NULL,
          |  population BIGINT
          |)""".stripMargin)
      val ins = conn.prepareStatement("INSERT INTO ship_city VALUES (?, ?, ?)")
      Seq((1, "lagos", 15000000L), (2, "accra", 2500000L),
        (3, "abuja", 3800000L), (4, "tamale", 950000L))
        .foreach { case (id, name, pop) =>
          ins.setInt(1, id); ins.setString(2, name); ins.setLong(3, pop)
          ins.executeUpdate()
        }
      st.close(); ins.close()
    } finally conn.close()
  }

  test("format(\"jdbc\") resolves a real driver: query pushdown + provider-supplied schema") {
    seed()
    val cfg = JdbcSourceConfig(
      url = s"jdbc:derby:memory:$dbName",
      // the WHERE and projection run INSIDE the database — Spark receives
      // only the result rows (the reference's full-query pushdown posture)
      query = "SELECT city_id, city_name FROM ship_city WHERE population > 1000000",
      user = "app", password = "app",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
    val df = JdbcSource.read(spark, cfg)
    // schema came from DATABASE metadata, not inference: Derby reports its
    // canonical upper-cased identifiers and exact JDBC types
    assert(df.schema.fieldNames.toSeq === Seq("CITY_ID", "CITY_NAME"))
    assert(df.schema("CITY_ID").dataType === org.apache.spark.sql.types.IntegerType)
    assert(df.schema("CITY_NAME").dataType === org.apache.spark.sql.types.StringType)
    val rows = df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows === Map(1 -> "lagos", 2 -> "accra", 3 -> "abuja"),
      "the database-side WHERE must have filtered tamale out before Spark saw rows")
  }

  test("a Spark-side filter composes on top of the pushed-down query") {
    seed()
    val cfg = JdbcSourceConfig(
      url = s"jdbc:derby:memory:$dbName",
      query = "SELECT city_id, city_name, population FROM ship_city",
      user = "app", password = "app",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
    val df = JdbcSource.read(spark, cfg)
      .filter(org.apache.spark.sql.functions.col("POPULATION") > 3000000L)
    assert(df.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 3))
  }
}
