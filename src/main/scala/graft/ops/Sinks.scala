package graft.ops

import org.apache.spark.sql.DataFrame

/** Sink registry (SURVEY.md §2.2).
  *
  * The reference's only real sink is a JDBC append into Postgres report
  * tables (reference: MENT/generic_script.scala:252-257;
  * MENT/functions/mentoringFunction2.scala:269-278). We keep that surface
  * and add the engine-native parquet sink the harness uses (Verify dumps).
  *
  * Scale notes: `jdbcAppend` writes one connection per partition — callers
  * repartition to the connection budget the target DB tolerates (the
  * reference writes with whatever partitioning it inherited, which at
  * cluster scale would open thousands of connections). Parquet writes
  * inherit the upstream partitioning; `partitionBy` columns turn into
  * directory-level partition pruning for downstream readers.
  */
object Sinks {

  /** Append into a JDBC table (reference K1 parity). */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 options: Map[String, String] = Map.empty,
                 maxConnections: Int = 8): Unit = {
    val bounded =
      if (df.rdd.getNumPartitions > maxConnections) df.coalesce(maxConnections)
      else df
    bounded.write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).save()
  }

  /** Parquet sink, optionally hive-style partitioned for pruning. */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Seq.empty,
              mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed managed table: rows are hash-clustered into `nBuckets` files
    * per partition on `bucketCols`, and the layout is recorded in the
    * catalog. Joins/aggregations keyed on the bucket columns between
    * co-bucketed tables then run with NO shuffle exchange at all — at
    * 100 TB this converts every recurring fact⋈fact join on the same key
    * into a map-side zip of bucket files. (Bucketing requires the table
    * catalog, hence saveAsTable rather than a bare path.)
    */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
