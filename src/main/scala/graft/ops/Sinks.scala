package graft.ops

import org.apache.spark.sql.DataFrame

/** Sink registry (SURVEY.md §2.2).
  *
  * The reference's only real sink is a JDBC append into Postgres report
  * tables (reference: MENT/generic_script.scala:252-257;
  * MENT/functions/mentoringFunction2.scala:269-278). We keep that surface
  * and add the engine-native parquet sink the harness uses (Verify dumps).
  *
  * Scale notes: `jdbcAppend` writes one connection per partition and
  * bounds them itself with a final coalesce (the reference writes with
  * whatever partitioning it inherited, which at cluster scale would open
  * thousands of connections). Parquet writes inherit the upstream
  * partitioning; `partitionBy` columns turn into directory-level
  * partition pruning for downstream readers.
  */
object Sinks {

  /** Append into a JDBC table (reference K1 parity).
    *
    * Connection bounding is an UNCONDITIONAL `coalesce(maxConnections)`:
    * coalesce never increases a partition count, so a small frame keeps
    * its single connection with zero added exchange, and a wide frame is
    * capped — without reading `df.rdd.getNumPartitions` first, which
    * would force an extra physical planning of the frame. (A
    * `repartition(n)` here would be strictly worse: user-numbered
    * repartitions are exempt from AQE partition coalescing, so every
    * write — however tiny — would pay a full shuffle AND open exactly n
    * connections.) The known tradeoff stays the old one: when the cap
    * binds, coalesce narrows the final stage's parallelism; writers with
    * heavy upstream work in that stage should repartition explicitly
    * before calling this.
    */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 options: Map[String, String] = Map.empty,
                 maxConnections: Int = 8): Unit =
    df.coalesce(maxConnections).write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).save()

  /** Console/debug sink (reference K2): the reference scatters ~50 bare
    * `show()` calls through its pipeline (e.g. generic_script.scala:50,98)
    * — this is that surface as ONE explicit, bounded sink. `show` brings
    * only the displayed rows to the driver, never the frame; anything
    * beyond eyeballing belongs in [[parquet]]/[[jdbcAppend]].
    */
  def console(df: DataFrame, numRows: Int = 20, truncate: Boolean = true): Unit =
    df.show(numRows, truncate)

  /** Streaming → JDBC: appends each micro-batch through [[jdbcAppend]]
    * inside `foreachBatch` — the canonical recipe, since Spark's JDBC
    * relation provider has no native streaming sink. Returns the running
    * query; the caller owns its lifecycle.
    *
    * Delivery is at-least-once: a batch retried after a sink-side failure
    * appends again (plain INSERTs carry no transactional batch id).
    * Exactly-once needs an idempotent target — a unique key the database
    * enforces, or a staging table merged by batchId — which is
    * target-schema-specific and out of scope here.
    */
  def streamJdbcAppend(stream: DataFrame, url: String, table: String,
                       options: Map[String, String] = Map.empty,
                       maxConnections: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        jdbcAppend(batch, url, table, options, maxConnections)
      }
      .start()

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
