package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: the batch operators'
  * streaming duals (SURVEY.md §2.9 — the reference is batch-only, so this
  * whole module is an extension).
  *
  * The parquet file source + memory sink + `processAllAvailable` lets a
  * finite directory drive the streaming query synchronously for tests and
  * the correctness harness; in production the same plan reads Kafka/files
  * with a real trigger, and the watermark bounds state size.
  */
object EventStreams {

  /** events.parquet carries TIMESTAMP(NANOS); streaming schemas are
    * explicit, so read ts as LONG nanos and rebuild µs timestamps.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Hourly tumbling-window counts/sums per event type, computed by a real
    * streaming query and returned as the finished in-memory table.
    * Aggregates use the exact decimal path so results match the batch dual
    * bit-for-bit.
    */
  def hourlyWindowed(spark: SparkSession, sfDir: String,
                     queryName: String = "graft_stream_hourly"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file source wants a directory/glob, not a bare file path
    val events = spark.readStream.schema(rawSchema)
      .parquet(s"$sfDir/events.*")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))
    val q = agg.writeStream
      .outputMode("complete") // finite input: every window emits
      .format("memory").queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }

  /** Gap-based sessionization as a stateful streaming shape is expressed in
    * batch via window functions (see EventQueries.q44); the streaming dual
    * would be flatMapGroupsWithState keyed by user with a session-gap
    * timeout. Kept batch-side until the harness can drive stateful output.
    */
}
