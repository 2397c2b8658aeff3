package graft

import graft.ops.{Sinks, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end JDBC source/sink coverage (SURVEY §2 S1/S2/K1 — the
  * reference's ONLY real I/O is a JDBC read + JDBC append, reference
  * MENT/functions/mentoringFunction.scala:18-26 and
  * mentoringFunction2.scala:269-278). The sandbox has no network database,
  * so the round trip runs against embedded Apache Derby, which ships with
  * Spark itself (/opt/spark/jars, already on the unmanaged classpath — no
  * new dependency).
  *
  * What this pins that the parquet-leg CORRECTNESS rows cannot:
  *  - `Sinks.jdbcAppend` really appends (mode semantics, connection
  *    bounding via coalesce) through Spark's JDBC relation provider;
  *  - `Tables.jdbc` pushes the query INTO the database (dbtable subquery)
  *    and a partitioned read splits into `numPartitions` bounded scans —
  *    the exact fix for the reference's single-partition JDBC bug.
  */
class JdbcRoundTripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:target/derby-jdbc-spec;create=true"

  private def sourceRows = Seq(
    (1L, "north", 10.5), (2L, "south", 20.0), (3L, "east", -3.25),
    (4L, "west", 0.0), (5L, "north", 7.75), (6L, "south", 99.0))

  test("jdbcAppend → partitioned Tables.jdbc read-back round-trips exactly") {
    val df = sourceRows.toDF("id", "zone", "score").repartition(3)
    // fresh table per run: Derby has no DROP IF EXISTS; swallow first-run noise
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE metrics")
      catch { case _: java.sql.SQLException => () }
      st.executeUpdate(
        "CREATE TABLE metrics (id BIGINT, zone VARCHAR(16), score DOUBLE)")
      st.close()
    } finally conn.close()

    Sinks.jdbcAppend(df, url, "metrics", maxConnections = 2)
    // append twice: K1 is an APPEND sink, so rows must accumulate
    Sinks.jdbcAppend(df.where(col("id") <= 2), url, "metrics")

    val back = Tables.jdbc(spark, url,
      "SELECT id, zone, score FROM metrics",
      partitioning = Some(("id", 1L, 6L, 3)))
    assert(back.rdd.getNumPartitions == 3,
      "partitioned JDBC read must split into numPartitions scans")
    val got = back.as[(Long, String, Double)].collect().sorted.toSeq
    val want = (sourceRows ++ sourceRows.filter(_._1 <= 2)).sorted
    assert(got == want)
  }

  test("Tables.jdbc pushes the full query into the database (S2 config-table shape)") {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE report_config")
      catch { case _: java.sql.SQLException => () }
      st.executeUpdate(
        "CREATE TABLE report_config (id INT, query_text VARCHAR(256))")
      st.executeUpdate(
        "INSERT INTO report_config VALUES (1, 'select-a'), (2, 'select-b')")
      st.close()
    } finally conn.close()

    // aggregate INSIDE the pushed query: the DB computes it, Spark sees 1 row
    val one = Tables.jdbc(spark, url,
      "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM report_config")
    assert(one.collect().map(_.getLong(0)).toSeq == Seq(2L))

    val cfg = Tables.jdbc(spark, url,
      "SELECT id, query_text FROM report_config WHERE id = 1")
      .as[(Int, String)].collect().toSeq
    assert(cfg == Seq((1, "select-a")))
  }
}
