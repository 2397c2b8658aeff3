package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source registry.
  *
  * The reference reads every relation over JDBC with full query pushdown
  * (`readFromPostgres`, reference MENT/functions/mentoringFunction.scala:18-26).
  * Our engine keeps the same pluggable-source idea but defaults to parquet
  * (the harness testdata); a JDBC source produces the identical downstream
  * plan, so switching is a config change, not a code change.
  *
  * At 100 TB the parquet reader is the scale path: Spark splits files into
  * `spark.sql.files.maxPartitionBytes` tasks, pushes filters/projection into
  * the scan, and prunes partitions. A JDBC source should always set
  * `partitionColumn`/`numPartitions` (the reference's single-partition JDBC
  * scans are its main scalability bug — SURVEY.md §3).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one testdata table from a scale-factor directory.
    *
    * `events.ts` has shipped in two encodings across driver testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark 4 rejects unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` turns it into a LONG —
    * and parquet timestamp[us] (isAdjustedToUTC=false, read as
    * TIMESTAMP_NTZ). Branch on the footer's actual type and normalize both
    * to a session-TZ TimestampType column, keeping the declared schema
    * stable for downstream operators. Entry points set the session TZ to
    * UTC, so the NTZ→LTZ cast is value-preserving. Mutating session conf
    * per read call would surprise concurrent users of a shared session,
    * hence the build-time nanosAsLong requirement documented here.
    */
  /** Filesystem-safe tag from a dataset directory's name — the suffix the
    * persisted-index fixture paths use so concurrent scale-factor runs
    * don't collide. Sanitized in ONE place: a dataset dir with unusual
    * characters must not yield malformed target paths for some queries
    * and valid ones for others.
    */
  def sfTag(sfDir: String): String =
    new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9_]", "_")

  /** Spread an EXPLODE-AMPLIFIED stage across the configured shuffle
    * width when the scan under-partitioned its input. Scan partitioning
    * is BYTES-sized (`spark.sql.files.maxPartitionBytes`), but gram/
    * window/token/encoder builders do work proportional to EXPLODED
    * rows — a compact parquet (one 5 MiB file = one scan partition)
    * funnels an entire corpus's window argmins into ONE task. Measured
    * at sf1 by the round-17 straggler probes: a single 56 s task
    * carried a 66 s winnow-spans wall (30× the task mean), and the
    * campaign build showed the same shape (28 s vs 0.7 s mean) — with
    * ZERO data skew (the largest window group was 42 rows; the probe
    * checked). One input-sized hash shuffle on `key` bounds the stage's
    * max task at corpus/width. It is paid ONLY when the scan's
    * parallelism is under half the configured width, so at real scale —
    * where inputs arrive already split into many files/row groups — the
    * plan is untouched and no shuffle is added. Callers should pass a
    * PROJECTED frame (id + payload) so the shuffle carries only what
    * the amplified stage reads.
    */
  def spreadAmplified(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    // streaming frames have no scan-partition count to probe (and their
    // micro-batches arrive through foreachBatch as batch frames anyway)
    if (df.isStreaming) return df
    val width = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    if (df.rdd.getNumPartitions * 2 >= width) df
    else df.repartition(width, key)
  }

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      val ts = raw.schema("ts").dataType match {
        // integer div: ns → µs (double division loses precision at 1e18)
        case org.apache.spark.sql.types.LongType =>
          timestamp_micros(expr("ts div 1000"))
        case _ =>
          requireUtc(spark)
          col("ts").cast(org.apache.spark.sql.types.TimestampType)
      }
      raw.withColumn("ts", ts)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** The NTZ→session-TZ timestamp cast is only VALUE-preserving when the
    * session TZ is UTC; on any other setting every event silently shifts.
    * Asserted wherever the cast happens (here and in
    * EventStreams.toNanos) instead of trusting that every caller-built
    * session copied the entry points' UTC pin.
    */
  private[graft] def requireUtc(spark: SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    // compare the RESOLVED zone, not the literal id: "Etc/UTC", "GMT",
    // "UT", "Z", "+00:00" are all value-preserving for the NTZ cast
    val utc =
      try java.time.ZoneId.of(tz, java.time.ZoneId.SHORT_IDS).normalized() ==
        java.time.ZoneOffset.UTC
      catch { case _: java.time.DateTimeException => false }
    require(utc,
      s"events.ts NTZ normalization requires a UTC-equivalent " +
        s"spark.sql.session.timeZone (got '$tz') — set UTC in the " +
        s"SparkSession builder")
  }

  /** Register every table as a temp view so spec SQL / spark.sql can see them. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))

  /** JDBC variant (reference parity, S1/S2): same relation, different source.
    * Unlike the reference's single-partition scans, callers must provide
    * partition bounds for any large table — a lone JDBC connection is the
    * reference's main scalability bug (SURVEY.md §3).
    */
  def jdbc(spark: SparkSession, url: String, query: String,
           partitioning: Option[(String, Long, Long, Int)] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"($query) subq")
      .options(options)
    partitioning match {
      case Some((col, lower, upper, n)) =>
        base.option("partitionColumn", col)
          .option("lowerBound", lower.toString)
          .option("upperBound", upper.toString)
          .option("numPartitions", n.toString)
          .load()
      case None => base.load()
    }
  }

  /** Partitioned JDBC read with bounds derived by the engine: one pushed
    * `MIN/MAX(partitionColumn)` probe (a single-row scan the database
    * aggregates itself), then a [[jdbc]] read split into `numPartitions`
    * bounded scans. Spark's JDBC bounds only steer the STRIDE — the first
    * and last partition predicates are open-ended — so probe-derived
    * bounds never drop rows, even racing concurrent inserts. An empty
    * relation (NULL min) degrades to the unpartitioned single scan.
    */
  def jdbcPartitioned(spark: SparkSession, url: String, query: String,
                      partitionColumn: String, numPartitions: Int,
                      options: Map[String, String] = Map.empty): DataFrame = {
    val probe = jdbc(spark, url,
      s"SELECT MIN($partitionColumn) AS lo, MAX($partitionColumn) AS hi " +
        s"FROM ($query) bounds_probe",
      None, options).collect().head
    if (probe.isNullAt(0)) jdbc(spark, url, query, None, options)
    else {
      val lo = probe.getAs[Number](0).longValue
      val hi = probe.getAs[Number](1).longValue
      // lo == hi gives Spark a zero-width stride → single partition anyway;
      // keep the read unpartitioned rather than warn-and-degrade
      if (lo == hi) jdbc(spark, url, query, None, options)
      else jdbc(spark, url, query,
        Some((partitionColumn, lo, hi, numPartitions)), options)
    }
  }
}
