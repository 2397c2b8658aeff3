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

  /** Streaming → JDBC with EXACTLY-ONCE delivery: each micro-batch is
    * staged into `<table>_staging` tagged with its `batchId`, then
    * published to the target in ONE database transaction that also records
    * the batchId in `<table>_ledger` and clears the staging rows. A batch
    * replayed after any failure either (a) finds its batchId in the ledger
    * — fully published, skip — or (b) wipes its partial staging rows and
    * re-runs; the publish transaction is the only step that makes rows
    * visible, so no failure window duplicates target rows. This closes
    * [[streamJdbcAppend]]'s documented at-least-once gap.
    *
    * Contract: the target table must already exist with columns in the
    * stream's column ORDER (the publish insert is positional, so the
    * target's own identifier casing never matters). Staging/ledger tables
    * are created on first use. Staging-side identifiers are double-quoted
    * to match how Spark's JDBC writer creates them (ANSI quoting — Derby,
    * Postgres).
    *
    * Scale: staging adds one extra database write per row, the classic
    * price of transactional publish into a store with no idempotent
    * upsert; the ledger stays one row per batch and the staging table
    * empties itself on every successful publish.
    */
  def streamJdbcExactlyOnce(stream: DataFrame, url: String, table: String,
                            options: Map[String, String] = Map.empty,
                            maxConnections: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        jdbcIdempotentBatch(batch, batchId, url, table, options, maxConnections)
      }
      .start()

  /** One idempotent micro-batch publish (see [[streamJdbcExactlyOnce]]);
    * package-visible so the replay guarantee is directly testable.
    */
  private[graft] def jdbcIdempotentBatch(batch: DataFrame, batchId: Long,
      url: String, table: String, options: Map[String, String],
      maxConnections: Int): Unit = {
    val staging = table + "_staging"
    val ledger = table + "_ledger"
    val props = new java.util.Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    def withConn[T](f: java.sql.Connection => T): T = {
      val c = java.sql.DriverManager.getConnection(url, props)
      try f(c) finally c.close()
    }
    // quoted per ANSI, matching how Spark's JDBC writer created the column
    def q(name: String) = "\"" + name + "\""
    val batchCol = "_graft_batch_id"
    require(!batch.columns.contains(batchCol),
      s"column name $batchCol is reserved by the exactly-once sink")

    val alreadyPublished = withConn { conn =>
      val st = conn.createStatement()
      try {
        // first use: create the ledger; an "already exists" error is the
        // normal steady state (a real DDL failure resurfaces on the SELECT)
        try st.executeUpdate(
          s"CREATE TABLE $ledger (batch_id BIGINT PRIMARY KEY)")
        catch { case _: java.sql.SQLException => () }
        val rs = st.executeQuery(
          s"SELECT batch_id FROM $ledger WHERE batch_id = $batchId")
        try rs.next() finally rs.close()
      } finally st.close()
    }
    if (!alreadyPublished) {
      // wipe partial staging rows a failed earlier attempt may have left
      withConn { conn =>
        val st = conn.createStatement()
        try st.executeUpdate(
          s"DELETE FROM $staging WHERE ${q(batchCol)} = $batchId")
        catch { case _: java.sql.SQLException => () } // staging not created yet
        finally st.close()
      }
      // distributed staging write (Spark creates the table on first append)
      jdbcAppend(batch.withColumn(batchCol,
          org.apache.spark.sql.functions.lit(batchId)),
        url, staging, options, maxConnections)
      // atomic publish: target insert + ledger mark + staging clear, one txn
      val cols = batch.columns.map(q).mkString(", ")
      withConn { conn =>
        conn.setAutoCommit(false)
        val st = conn.createStatement()
        try {
          st.executeUpdate(
            s"INSERT INTO $table SELECT $cols FROM $staging WHERE ${q(batchCol)} = $batchId")
          st.executeUpdate(s"INSERT INTO $ledger VALUES ($batchId)")
          st.executeUpdate(
            s"DELETE FROM $staging WHERE ${q(batchCol)} = $batchId")
          conn.commit()
        } catch { case e: Throwable => conn.rollback(); throw e }
        finally st.close()
      }
    }
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
