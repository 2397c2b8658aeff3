package graft.queries

import graft.ops.{Num, Tables}
import graft.ops.Tables.t
import graft.streaming.EventStreams
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-table queries: time windows, JSON extraction, sessionization,
  * ranking/running windows — plus the Structured Streaming dual of the
  * hourly window, whose finished memory table is compared against the same
  * DuckDB oracle as the batch version.
  */
object EventQueries {
  import ParityQueries.Q

  val queries: Map[String, Q] = Map(
    "q40_window_hourly" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_format(date_trunc("HOUR", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour_start"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), Num.moneySum(col("value")).as("total_value"))
        .orderBy("hour_start", "event_type")),

    "q213_retention_cohorts" -> ((s, d) => {
      // the retention cohort matrix (product-analytics staple next to
      // q42 sessionize / q113 funnel): users grouped by first-activity
      // week, counted per week offset — two linear aggregates and one
      // equi-join, no window over the event stream
      val ev = t(s, d, "events")
        .select(col("user_id"), date_trunc("WEEK", col("ts")).as("wk"))
      val firstWk = ev.groupBy("user_id").agg(min(col("wk")).as("cwk"))
      ev.distinct().join(firstWk, Seq("user_id"))
        .groupBy(
          date_format(col("cwk"), "yyyy-MM-dd").as("cohort_week"),
          (datediff(col("wk").cast("date"), col("cwk").cast("date")) / 7)
            .cast("int").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    "q41_json_extract" -> ((s, d) =>
      // data-plane JSON (SURVEY §2.8: the reference parses JSON only on the
      // driver; from_json/get_json_object moves it into the plan)
      t(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          count(when(col("k") > 50, 1)).as("n_high"))
        .orderBy("event_type")),

    "q42_sessionize" -> ((s, d) => {
      // gap-based sessionization: session starts where the per-user gap
      // exceeds 30 min; session id = running count of starts (all integer
      // µs arithmetic — deterministic)
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = t(s, d, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("is_start",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("is_start")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      ev.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("start_us"),
          max(unix_micros(col("ts"))).as("end_us"))
        .orderBy("user_id", "session_id")
    }),

    "q43_window_rank" -> ((s, d) => {
      // extension beyond the reference (§2.7: none there): top-3 orders per
      // customer by value
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy("o_custkey", "rn")
    }),

    "q44_running_sum" -> ((s, d) => {
      // running total per customer in exact decimal (order-insensitive
      // money math → identical at any partitioning)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(Num.dec2(col("o_totalprice"))).over(w).cast(DoubleType).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q67_range_join" -> ((s, d) => {
      // interval join via time-bucketed equi-keys (see ext.Intervals):
      // clicks within one hour after each purchase by the same user —
      // attribution-window shape. All integer-µs arithmetic.
      val e = t(s, d, "events").select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("us").as("start_us"), (col("us") + 3600000000L).as("end_us"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("us"))
      val hits = graft.ext.Intervals.rangeJoinBucketed(purchases, clicks,
        Seq("user_id"), "start_us", "end_us", "us", bucketUs = 3600000000L)
        .groupBy(col("purchase_id")).agg(count(lit(1)).as("cnt"))
      // left join back: purchases with zero in-window clicks still report
      purchases.join(hits, Seq("purchase_id"), "left")
        .select(col("purchase_id"), col("user_id"), col("start_us"),
          coalesce(col("cnt"), lit(0L)).as("n_clicks"))
        .orderBy("purchase_id")
    }),

    "q68_stream_stream_join" -> ((s, d) =>
      // REAL two-stream interval join (watermarks both sides, time-bounded
      // state) — q67's attribution window at pair granularity
      EventStreams.purchaseClickJoin(s, d)
        .orderBy("purchase_id", "click_id")),

    "q45_stream_window_hourly" -> ((s, d) =>
      // REAL Structured Streaming query (parquet source → windowed agg →
      // memory sink), result identical to q40's batch plan
      EventStreams.hourlyWindowed(s, d)
        .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy("hour_start", "event_type")),

    "q46_stream_sessionize" -> ((s, d) =>
      // stateful streaming (flatMapGroupsWithState) dual of q42 — identical
      // result set, same oracle
      EventStreams.sessionizeStateful(s, d)
        .orderBy("user_id", "session_id")),

    "q48_stream_window_append" -> ((s, d) =>
      // append-mode watermark lifecycle (windows emit on close), same
      // result set as the batch hourly window -> same oracle
      EventStreams.hourlyWindowedAppend(s, d)
        .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy("hour_start", "event_type")),

    "q47_asof_join" -> ((s, d) => {
      // as-of join (absent from the reference, SURVEY §2.5): each purchase
      // matched to the user's latest click at-or-before it. Implemented as
      // union + LOCF window (last ignoreNulls over preceding rows) — one
      // sort-based pass, NO per-pair join explosion: an equi-join on user
      // plus ts<=ts filter would materialize |purchases|x|clicks| rows per
      // user before picking the max. Ties: a click at the same microsecond
      // counts as prior; among equal-ts clicks the highest event_id wins.
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("us"), col("event_id"), lit(0).as("is_probe"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("us"), col("event_id"), lit(1).as("is_probe"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("is_probe"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      clicks.unionByName(purchases)
        .withColumn("last_click_id",
          last(when(col("is_probe") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("last_click_us",
          last(when(col("is_probe") === 0, col("us")), ignoreNulls = true).over(w))
        .where(col("is_probe") === 1)
        .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
          coalesce(col("last_click_id"), lit(-1L)).as("last_click_id"),
          coalesce(col("last_click_us"), lit(-1L)).as("last_click_us"))
        .orderBy("event_id")
    })
  )

  private val hourlyOracle =
    """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start, event_type,
              count(*) AS n_events,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""

  private val sessionizeOracle =
    """WITH ev AS (
           SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                  lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                    (PARTITION BY user_id
                     ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_us
           FROM events),
         marked AS (
           SELECT user_id, event_id, us,
                  CASE WHEN prev_us IS NULL OR us - prev_us > 30*60*1000000
                       THEN 1 ELSE 0 END AS is_start
           FROM ev),
         sess AS (
           SELECT user_id, us,
                  CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM marked)
         SELECT user_id, session_id, count(*) AS n_events,
                min(us) AS start_us, max(us) AS end_us
         FROM sess GROUP BY user_id, session_id
         ORDER BY user_id, session_id"""

  val oracles: Map[String, String] = Map(
    "q40_window_hourly" -> hourlyOracle,
    "q45_stream_window_hourly" -> hourlyOracle,
    "q48_stream_window_append" -> hourlyOracle,
    "q42_sessionize" -> sessionizeOracle,
    "q46_stream_sessionize" -> sessionizeOracle,

    // q213: both engines truncate to ISO weeks (Monday start), so the
    // day difference between week starts is an exact multiple of 7
    "q213_retention_cohorts" ->
      """WITH ev AS (SELECT user_id,
                            date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
                     FROM events),
         fw AS (SELECT user_id, min(wk) AS cwk FROM ev GROUP BY user_id),
         act AS (SELECT DISTINCT user_id, wk FROM ev)
         SELECT strftime(CAST(cwk AS DATE), '%Y-%m-%d') AS cohort_week,
                CAST(date_diff('day', CAST(cwk AS DATE), CAST(wk AS DATE))
                     // 7 AS INTEGER) AS week_offset,
                count(DISTINCT user_id) AS n_users
         FROM act JOIN fw USING (user_id)
         GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",

    "q41_json_extract" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                           THEN 1 END) AS n_high
         FROM events GROUP BY event_type ORDER BY event_type""",

    // pair-granularity dual of q67's oracle: every (purchase, click)
    // match within the hour window
    "q68_stream_stream_join" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                  event_type FROM events),
         p AS (SELECT event_id AS purchase_id, user_id, us AS p_us
               FROM e WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS click_id, user_id, us AS c_us
               FROM e WHERE event_type = 'click')
         SELECT p.purchase_id, p.user_id, c.click_id, c.c_us AS click_us
         FROM p JOIN c ON c.user_id = p.user_id
                      AND c.c_us BETWEEN p.p_us AND p.p_us + 3600000000
         ORDER BY p.purchase_id, c.click_id""",

    // plain BETWEEN range join: the time-bucketing in the engine plan is
    // invisible to the result contract
    "q67_range_join" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                  event_type FROM events),
         p AS (SELECT event_id AS purchase_id, user_id, us AS start_us,
                      us + 3600000000 AS end_us
               FROM e WHERE event_type = 'purchase'),
         c AS (SELECT user_id, us FROM e WHERE event_type = 'click'),
         hits AS (
           SELECT p.purchase_id, count(*) AS cnt
           FROM p JOIN c ON c.user_id = p.user_id
                        AND c.us BETWEEN p.start_us AND p.end_us
           GROUP BY p.purchase_id)
         SELECT p.purchase_id, p.user_id, p.start_us,
                coalesce(hits.cnt, 0) AS n_clicks
         FROM p LEFT JOIN hits USING (purchase_id)
         ORDER BY p.purchase_id""",

    "q47_asof_join" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                  event_type FROM events),
         p AS (SELECT * FROM e WHERE event_type = 'purchase'),
         c AS (SELECT * FROM e WHERE event_type = 'click')
         SELECT p.event_id, p.user_id, p.us AS purchase_us,
                COALESCE((SELECT c.event_id FROM c
                          WHERE c.user_id = p.user_id AND c.us <= p.us
                          ORDER BY c.us DESC, c.event_id DESC LIMIT 1), -1)
                  AS last_click_id,
                COALESCE((SELECT max(c.us) FROM c
                          WHERE c.user_id = p.user_id AND c.us <= p.us), -1)
                  AS last_click_us
         FROM p ORDER BY p.event_id""",

    "q43_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_custkey, rn""",

    "q44_running_sum" ->
      """SELECT o_custkey, o_orderkey,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey"""
  )
}
