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
    * visible, so no failure window duplicates target rows. Staging itself
    * is idempotent under Spark TASK retry: each partition writes its rows
    * and a (batchId, partitionId) marker in one database transaction, and
    * a retried task that finds its marker skips — a partition can never
    * stage twice. This closes [[streamJdbcAppend]]'s documented
    * at-least-once gap.
    *
    * `checkpointDir` is REQUIRED and must be durable: batch ids are only
    * meaningful relative to one checkpoint lineage, and the ledger
    * persists in the database — a restart under a fresh (or temporary)
    * checkpoint restarts batch ids at 0, which the ledger would treat as
    * already published and silently drop.
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
                            checkpointDir: String,
                            options: Map[String, String] = Map.empty,
                            maxConnections: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        jdbcIdempotentBatch(batch, batchId, url, table, options, maxConnections)
      }
      .start()

  /** SQLStates meaning "table does not exist" across the engines we
    * target (Derby 42X05, Postgres 42P01, MySQL 42S02) — the ONLY error a
    * best-effort DELETE/SELECT on a maybe-not-yet-created table may
    * swallow. Anything else (lock timeout, dropped connection) must
    * surface: swallowing it would let stale staging rows survive into the
    * publish and double-deliver.
    */
  private val missingTableStates = Set("42X05", "42P01", "42S02")
  private def isMissingTable(e: java.sql.SQLException): Boolean =
    missingTableStates.contains(e.getSQLState)

  /** One idempotent micro-batch publish (see [[streamJdbcExactlyOnce]]);
    * package-visible so the replay guarantee is directly testable.
    */
  private[graft] def jdbcIdempotentBatch(batch: DataFrame, batchId: Long,
      url: String, table: String, options: Map[String, String],
      maxConnections: Int): Unit = {
    val staging = table + "_staging"
    val ledger = table + "_ledger"
    val parts = table + "_staging_parts"
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
        // first use: create the ledger + the per-partition staging marker
        // table; an "already exists" error is the normal steady state (a
        // real DDL failure resurfaces on the SELECT)
        try st.executeUpdate(
          s"CREATE TABLE $ledger (batch_id BIGINT PRIMARY KEY)")
        catch { case _: java.sql.SQLException => () }
        try st.executeUpdate(
          s"CREATE TABLE $parts (batch_id BIGINT, part_id INT, " +
            "PRIMARY KEY (batch_id, part_id))")
        catch { case _: java.sql.SQLException => () }
        val rs = st.executeQuery(
          s"SELECT batch_id FROM $ledger WHERE batch_id = $batchId")
        try rs.next() finally rs.close()
      } finally st.close()
    }
    if (!alreadyPublished) {
      // wipe rows + markers a failed earlier BATCH attempt may have left
      // (a re-attempt may partition differently, invalidating old markers)
      withConn { conn =>
        val st = conn.createStatement()
        try {
          try st.executeUpdate(
            s"DELETE FROM $staging WHERE ${q(batchCol)} = $batchId")
          catch { case e: java.sql.SQLException if isMissingTable(e) => () }
          st.executeUpdate(s"DELETE FROM $parts WHERE batch_id = $batchId")
        } finally st.close()
      }
      stageBatch(batch, batchId, url, staging, parts, options, maxConnections)
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
          st.executeUpdate(s"DELETE FROM $parts WHERE batch_id = $batchId")
          conn.commit()
        } catch { case e: Throwable => conn.rollback(); throw e }
        finally st.close()
      }
    }
  }

  /** Stage one micro-batch, idempotent under TASK retry: each partition
    * inserts its rows AND a (batchId, partitionId) marker in ONE database
    * transaction; a retried task that finds its marker skips cleanly, so
    * a partition's rows can never land twice even when an executor dies
    * after its insert committed but before Spark saw the task succeed.
    * (Spark's own JDBC append has exactly that hole — per-partition
    * INSERTs with no attempt dedup.) Package-visible so the retry
    * idempotency is directly testable by staging the same batch twice.
    */
  private[graft] def stageBatch(batch: DataFrame, batchId: Long, url: String,
      staging: String, parts: String, options: Map[String, String],
      maxConnections: Int): Unit = {
    val batchCol = "_graft_batch_id"
    val tagged = batch.withColumn(batchCol,
      org.apache.spark.sql.functions.lit(batchId))
    // empty append first: creates the staging table from the schema when
    // absent (Spark DDL), writes nothing — deterministic, retry-free
    jdbcAppend(tagged.limit(0), url, staging, options, maxConnections)
    val insertSql = {
      val cols = tagged.columns.map(c => "\"" + c + "\"").mkString(", ")
      val ph = tagged.columns.map(_ => "?").mkString(", ")
      s"INSERT INTO $staging ($cols) VALUES ($ph)"
    }
    val nCols = tagged.columns.length
    tagged.coalesce(maxConnections).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val pid = org.apache.spark.TaskContext.get().partitionId()
          val props = new java.util.Properties()
          options.foreach { case (k, v) => props.setProperty(k, v) }
          val conn = java.sql.DriverManager.getConnection(url, props)
          try {
            conn.setAutoCommit(false)
            val check = conn.prepareStatement(
              s"SELECT 1 FROM $parts WHERE batch_id = ? AND part_id = ?")
            val staged = try {
              check.setLong(1, batchId); check.setInt(2, pid)
              val rs = check.executeQuery()
              try rs.next() finally rs.close()
            } finally check.close()
            if (!staged) {
              val ins = conn.prepareStatement(insertSql)
              try {
                rows.foreach { r =>
                  var i = 0
                  while (i < nCols) { ins.setObject(i + 1, r.get(i)); i += 1 }
                  ins.addBatch()
                }
                ins.executeBatch()
              } finally ins.close()
              val mark = conn.prepareStatement(
                s"INSERT INTO $parts VALUES (?, ?)")
              try {
                mark.setLong(1, batchId); mark.setInt(2, pid)
                mark.executeUpdate()
              } finally mark.close()
              conn.commit()
            } else conn.rollback() // end the marker-check SELECT's txn
          } catch { case e: Throwable => conn.rollback(); throw e }
          finally conn.close()
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
