package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Routes a spec task query to the database its entry names.
  *
  * The reference builds a JDBC URL per task from the spec's `database_name`
  * field (reference: MENT/generic_script.scala:117-118,273-276), so one
  * pipeline can read from several databases. The compiler is source-agnostic:
  * it hands every (database_name, sql) pair to a router and works on the
  * returned DataFrame — the decorrelated plan is the same whether the scan
  * is a temp view, a pushed-down JDBC subquery, or a mix.
  */
trait SourceRouter {
  def run(spark: SparkSession, databaseName: String, sql: String): DataFrame
}

/** Single-namespace deployment (the default): every database name resolves
  * to the session catalog, where [[Tables.registerAll]] (or Main's JDBC
  * view registration) has already published each input relation as a temp
  * view. This is exactly the pre-router behavior.
  */
object ViewRouter extends SourceRouter {
  override def run(spark: SparkSession, databaseName: String,
                   sql: String): DataFrame = spark.sql(sql)
}

/** Multi-database deployment: `database_name` → JDBC URL. The query text
  * executes IN the named database (dbtable-subquery pushdown via
  * [[Tables.jdbc]]), matching the reference's per-task connection — minus
  * its per-ID reconnect loop, since the compiler has already decorrelated.
  *
  * Names absent from the map fall through to `fallback` (typically
  * [[ViewRouter]] for the session's registered default namespace); with no
  * fallback they fail loudly rather than silently querying the wrong
  * database.
  */
final case class JdbcRouter(urls: Map[String, String],
                            options: Map[String, String] = Map.empty,
                            fallback: Option[SourceRouter] = None)
    extends SourceRouter {
  override def run(spark: SparkSession, databaseName: String,
                   sql: String): DataFrame =
    urls.get(databaseName) match {
      case Some(url) => Tables.jdbc(spark, url, sql, None, options)
      case None => fallback match {
        case Some(r) => r.run(spark, databaseName, sql)
        case None => throw new IllegalArgumentException(
          s"no JDBC url registered for database '$databaseName' " +
            s"(known: ${urls.keys.toSeq.sorted.mkString(", ")}) and no fallback router")
      }
    }
}
