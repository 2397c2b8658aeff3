package graft

import graft.ops.Sinks
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming duals must equal their batch counterparts on finite input —
  * the whole point of reusing one oracle for both.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("stateful streaming sessionize == batch window-function sessionize") {
    val streamed = EventStreams.sessionizeStateful(spark, sf)
      .select("user_id", "session_id", "n_events", "start_us", "end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val batch = graft.queries.EventQueries.queries("q42_sessionize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming hourly window == batch hourly window") {
    val streamed = EventStreams.hourlyWindowed(spark, sf, "spec_hourly")
      .select(unix_micros(col("hour_start")).as("h"), col("event_type"),
        col("n_events"), col("total_value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val batch = graft.ops.Tables.t(spark, sf, "events")
      .groupBy(unix_micros(date_trunc("HOUR", col("ts"))).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.ops.Num.moneySum(col("value")).as("tv"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(streamed == batch)
  }

  test("co-bucketed tables join and aggregate with zero shuffle exchanges") {
    import spark.implicits._
    // the in-memory catalog forgets tables across JVMs but their warehouse
    // dirs persist: drop both layers before re-creating
    Seq("b_facts", "b_dims").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"target/spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val facts = (1 to 1000).map(i => (i % 100, i, i * 2.0)).toDF("k", "id", "v")
    val dims = (0 until 100).map(i => (i, s"dim_$i")).toDF("k", "name")
    Sinks.bucketedTable(facts, "b_facts", Seq("k"), nBuckets = 8)
    Sinks.bucketedTable(dims, "b_dims", Seq("k"), nBuckets = 8)
    // disable auto-broadcast so the join must rely on co-bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_facts").join(spark.table("b_dims"), Seq("k"))
        .groupBy("k").agg(sum("v").as("total"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free plan, got:\n$plan")
      assert(plan.contains("Bucketed: true"))
      assert(joined.count() == 100)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("parquet sink round-trips with partition pruning directories") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "graft-sink-").toString
    val df = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)).toDF("id", "k", "v")
    Sinks.parquet(df, dir, partitionBy = Seq("k"))
    val back = spark.read.parquet(dir)
    assert(back.where(col("k") === "a").select(sum("v")).as[Double].head() == 40.0)
    assert(new java.io.File(dir).listFiles().exists(_.getName == "k=a"))
  }
}
