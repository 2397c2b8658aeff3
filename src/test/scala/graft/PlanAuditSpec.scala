package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the properties that decide 100 TB behavior are
  * asserted here so a refactor can't silently regress them —
  * filter/projection pushdown to the parquet scan, broadcast of dimension
  * legs, top-k as TakeOrderedAndProject (never a global sort), and
  * whole-stage codegen over the expression-only text operators.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q01: filter and projection are pushed into the parquet scan") {
    val plan = planOf("q01_scan_filter_project")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    // at least one real predicate reached the scan (not an empty list)
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined, plan.take(2000))
    // column pruning: the wide lineitem scan reads only the 5 used columns
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
      "l_shipdate").forall(readSchema.contains), readSchema)
    assert(!readSchema.contains("l_comment"), readSchema)
  }

  test("flagship pipeline broadcasts its dimension legs") {
    val plan = planOf("q06_flagship_pipeline")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      plan.take(3000))
  }

  test("q17 top-k plans as TakeOrderedAndProject, not a global sort+limit") {
    val plan = planOf("q17_topk_limit")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q64 vocab top-k: partial-agged groupBy feeding TakeOrderedAndProject") {
    val plan = planOf("q64_vocab_top_ngrams")
    // never a global sort of the gram table...
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // ...and the count partial-aggregates map-side before the exchange
    assert(plan.contains("partial_count"), plan.take(2000))
  }

  test("q63 bloom incremental: sketch probe prefilters the anti-join") {
    val plan = planOf("q63_dedup_bloom_incremental")
    // the membership probe is in the plan as a filter predicate, and the
    // confirm join is an anti-join (only over the sketch-positive branch)
    assert(plan.contains("might_contain"), plan.take(3000))
    assert(plan.contains("LeftAnti"), plan.take(3000))
  }

  test("q66 chunk dedup: ownership via groupBy+join, never a window") {
    // a window over partitionBy(chunk hash) would funnel a mega-duplicated
    // chunk into one task; the skew-safe form is groupBy-min + join-back
    val plan = planOf("q66_dedup_chunk")
    assert(!plan.contains("Window"), plan.take(3000))
    assert(plan.contains("HashAggregate"), plan.take(3000))
  }

  test("q67 range join: bucketed equi-join, never a nested-loop product") {
    val plan = planOf("q67_range_join")
    assert(plan.contains("_bucket"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("text operators stay inside whole-stage codegen") {
    // AQE finalizes stages lazily — run the query, then audit the final
    // adaptive plan for codegen'd stages
    for (q <- Seq("q20_text_tokens", "q21_text_quality", "q22_text_langid")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // codegen'd stages render as a `*(n)` operator prefix
      assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
        s"$q: ${plan.take(2000)}")
    }
  }

  test("q62 stratified sample gets a map-side WindowGroupLimit before the exchange") {
    // the rank <= k filter must be pushed into a partial group-limit so the
    // shuffle carries O(k · strata) rows per input partition, not the corpus
    val plan = planOf("q62_stratified_sample")
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("q31 banded self-join spreads candidates across the shuffle width") {
    // the explicit repartition on (band, band_key) must survive planning —
    // without it every bucket's quadratic collision work lands in the
    // scan's task count
    val plan = planOf("q31_dedup_minhash_lsh")
    assert(plan.contains("hashpartitioning(band"), plan.take(3000))
  }
}
