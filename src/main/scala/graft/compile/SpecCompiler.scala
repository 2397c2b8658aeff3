package graft.compile

import graft.ops.{SourceRouter, ViewRouter}
import graft.spec._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.Try

/** Compiles a [[PipelineSpec]] into ONE declarative DataFrame plan.
  *
  * The reference interprets the same spec as a driver-side loop: collect the
  * fetchId column, then re-issue every task query once per ID with the ID
  * spliced into the SQL text (reference: MENT/generic_script.scala:91-100,
  * 275; MENT/functions/mentoringFunction2.scala:41-55,158). That is O(|ids|)
  * JDBC round-trips and O(|ids| × |sub-ids|) for the nested subtree — it
  * cannot scale past a few thousand IDs.
  *
  * We decorrelate (SURVEY.md §7): the ID fetch stays a DataFrame, each
  * correlated task query becomes scan-once + join-on-the-correlation-column,
  * and the reference's empty-result fallback row (generic_script.scala:
  * 305-310 — substitute `[(0)]` so a missing group still yields a zero)
  * becomes a left join from the ID relation + `coalesce(agg, 0)`. Catalyst
  * then gets one plan it can push filters into, prune columns of, and pick
  * join strategies for — at 100 TB the ID relation is just another table and
  * every "loop iteration" is a partition of one shuffle-join.
  */
object SpecCompiler {

  /** Aggregate-name allowlist: the reference splices config strings straight
    * into `expr()` (generic_script.scala:170-174), an injection surface we
    * keep but validate.
    */
  val allowedAggs: Set[String] = Set(
    "sum", "count", "avg", "mean", "min", "max",
    "collect_list", "collect_set", "first", "approx_count_distinct")

  // the negative lookahead rejects `col = ${id} + 1`-style arithmetic and
  // `|| 'x'` concatenation: a trailing operator means the conjunct is NOT
  // plain equality, so the match fails and the residual ${id} throws below
  private val corrEqPattern =
    """([A-Za-z_][A-Za-z0-9_]*)\s*=\s*\$\{id\}(?!\s*[-+*/%|&^.,0-9'"(])""".r
  private val corrInPattern =
    """([A-Za-z_][A-Za-z0-9_]*)\s+[Ii][Nn]\s*\(\s*\$\{id\}\s*\)""".r

  /** Split a task query into (decorrelated SQL, correlation column).
    *
    * The reference does a raw string replace of `${id}` anywhere in the
    * query text (generic_script.scala:275, mentoringFunction2.scala:158),
    * so a config author may write the correlation as `col = ${id}` or
    * `col IN (${id})` — both mean per-iteration equality and both become a
    * join once decorrelated (each conjunct is replaced by a tautology so
    * the scan reads all IDs at once). `col = ${id}` is the only form in
    * shipped configs (FIXTURES.md §3); `IN` is accepted for compatibility.
    *
    * Any OTHER placement (arithmetic on the id, `IN (${id}, ...)` lists,
    * string concatenation) has no join equivalent, and several correlation
    * conjuncts naming DIFFERENT columns would need a multi-column join
    * this compiler doesn't emit — both fail loudly here instead of leaving
    * `${id}` in the SQL for the parser to trip over (or worse, silently
    * widening the result the way a dropped conjunct would).
    */
  def decorrelate(query: String): (String, Option[String]) = {
    val corrCols = (corrEqPattern.findAllMatchIn(query).map(_.group(1)) ++
      corrInPattern.findAllMatchIn(query).map(_.group(1))).toSeq.distinct
    val stripped = corrInPattern.replaceAllIn(
      corrEqPattern.replaceAllIn(query, "1=1"), "1=1")
    if (stripped.contains("${id}"))
      throw new IllegalArgumentException(
        "unsupported ${id} placement: only `col = ${id}` and " +
          s"`col IN ($${id})` conjuncts decorrelate to a join; query: $query")
    corrCols match {
      case Seq() => (query, None)
      case Seq(one) => (stripped, Some(one))
      case many => throw new IllegalArgumentException(
        s"ambiguous correlation: $${id} constrains several columns " +
          s"${many.mkString("(", ", ", ")")} — one correlation column per " +
          s"task query is supported; query: $query")
    }
  }

  /** Compile one spec against tables pre-registered as temp views
    * (see [[graft.ops.Tables.registerAll]]). Returns the final projected
    * DataFrame; entries are unioned if there are several (requires
    * union-compatible entry schemas — for heterogeneous entries use
    * [[compileEntries]], the reference's actual per-entry sink shape).
    */
  def compile(spark: SparkSession, spec: PipelineSpec,
              router: SourceRouter = ViewRouter): DataFrame =
    compileEntries(spark, spec, router).reduce(_ union _)

  /** One fully-mapped, contract-projected frame PER entry — the reference
    * appends each `input_data_schema` entry independently
    * (generic_script.scala:75-78 `dataArray.foreach` → transform → write),
    * so entries with different schemas are legal and must not be unioned.
    * Mapping/contract are row-wise, so for union-compatible entries
    * `compileEntries(...).reduce(union)` ≡ the union-then-map order.
    */
  def compileEntries(spark: SparkSession, spec: PipelineSpec,
                     router: SourceRouter = ViewRouter): Seq[DataFrame] =
    spec.entries.map { e =>
      val mapped = applyDataMapping(compileEntry(spark, e, router), spec.dataMapping)
      applyOutputContract(mapped, spec.outputSchema)
    }

  /** fetchId → ID relation; tasks → left-deep join fold keyed on the spec's
    * join_on columns (reference join fold: generic_script.scala:149-193).
    */
  private def compileEntry(spark: SparkSession, entry: ScriptEntry,
                           router: SourceRouter): DataFrame = {
    val ids = router.run(spark, entry.fetchId.databaseName, entry.fetchId.query)
      .select(col(entry.fetchId.id)).distinct()
    val tasks = entry.tasks.map(compileTask(spark, ids, entry.fetchId.id, _, router))
    tasks.tail.foldLeft(tasks.head.df) { (acc, t) =>
      acc.join(t.df, Seq(t.joinOn), normalizeJoinType(t.joinType))
    }
  }

  private case class CompiledTask(df: DataFrame, joinOn: String, joinType: String)

  /** The three-branch join decision of the reference
    * (mentoringFunction1.scala:124-135) degenerates to a fold once empty
    * results are handled declaratively.
    */
  private def normalizeJoinType(t: String): String = t match {
    case "none" | "" => "inner"
    case other => other
  }

  private def compileTask(spark: SparkSession, ids: DataFrame, idCol: String,
                          task: Task, router: SourceRouter): CompiledTask = task match {
    case sp: SingleProcess =>
      CompiledTask(compileSingle(spark, ids, idCol, sp, router), sp.joinOn, sp.joinType)
    case mp: MultiProcess =>
      CompiledTask(compileMulti(spark, ids, idCol, mp, router), mp.joinOn, mp.joinType)
  }

  /** single_process: scan once (decorrelated), fill nulls on the agg input
    * (reference blanket na.fill(0): generic_script.scala:291), aggregate if
    * requested, and zero-fill missing groups via left join from the ID
    * relation (≡ the reference's fallback-row mechanism, observable-result
    * equivalence tested in SpecCompilerSpec).
    */
  private def compileSingle(spark: SparkSession, ids: DataFrame, idCol: String,
                            sp: SingleProcess, router: SourceRouter): DataFrame = {
    val (sql, corr) = decorrelate(sp.query)
    val scan = router.run(spark, sp.databaseName, sql)
    // the correlation predicate names a SOURCE column which the task query
    // may alias away; the spec's `input` field names the surviving column
    def corrKey: String =
      (corr.toSeq :+ sp.input).find(scan.columns.contains).getOrElse(
        throw new IllegalArgumentException(
          s"correlated task selects neither '${corr.getOrElse("")}' nor input '${sp.input}'"))
    if (sp.agg == "none") {
      // raw passthrough: correlation (if any) enforced with a semi-join so
      // rows for IDs outside the fetched set are excluded, as in the loop
      corr match {
        case Some(_) =>
          scan.join(ids.withColumnRenamed(idCol, corrKey), Seq(corrKey), "left_semi")
        case None => scan
      }
    } else {
      require(allowedAggs.contains(sp.agg), s"agg '${sp.agg}' not in allowlist $allowedAggs")
      val filled = scan.na.fill(0, Seq(sp.aggOn).filter(scan.columns.contains))
      val key = if (corr.isDefined) corrKey else sp.groupby
      // RUNTIME PRUNING of the decorrelated scan: the reference's loop
      // pushed `col = ${id}` into the source per query
      // (generic_script.scala:275), so only matching rows ever left it; the
      // decorrelated scan reads every key and would drop non-fetched ones
      // only AFTER aggregating them. This semi-join restores the pruning
      // BEFORE the aggregation's exchange — semantics-free (the post-agg
      // left join from `ids` discards those keys anyway), and when the ID
      // relation is selective it is the difference between shuffling the
      // matching slice and shuffling the whole fact table. Spark plans the
      // tiny ID side as a broadcast, so the filter executes scan-side; with
      // `spark.sql.optimizer.runtime.bloomFilter.enabled` (default on) the
      // same shape feeds Catalyst's own runtime-filter injection.
      val pruned = if (key != "none" && filled.columns.contains(key))
        filled.join(ids.withColumnRenamed(idCol, key), Seq(key), "left_semi")
      else filled
      val groupCols = (Seq(sp.groupby) ++ Seq(key)).distinct.filter(_ != "none")
      val agged = pruned.groupBy(groupCols.map(col): _*)
        .agg(expr(s"${sp.agg}(${sp.aggOn})").alias(sp.rename))
      // zero-fill: every fetched ID yields a row even with no matching facts
      // (≡ the reference's 1-row fallback relation, generic_script.scala:305-310)
      val zeroable = Set("sum", "count", "avg", "mean", "min", "max",
        "approx_count_distinct").contains(sp.agg)
      val joined = ids.withColumnRenamed(idCol, key).join(agged, Seq(key), "left")
      if (zeroable) joined.withColumn(sp.rename, coalesce(col(sp.rename), lit(0)))
      else joined
    }
  }

  /** multiple_process subtree: second-level fetch gives (outer_id, sub_id);
    * each child is a per-sub-ID scan. The reference unions N per-sub-ID
    * reads then groups (generic_script.scala:402-443); we scan each child
    * once, join through the sub-ID relation, and aggregate per outer ID.
    */
  private def compileMulti(spark: SparkSession, ids: DataFrame, idCol: String,
                           mp: MultiProcess, router: SourceRouter): DataFrame = {
    val (fetchSql, fetchCorr) = decorrelate(mp.fetch.query)
    // relation (outer correlation col?, sub_id): keeps ALL columns the fetch
    // query selected so the outer key survives alongside the sub-ID
    val subRel0 = router.run(spark, mp.fetch.databaseName, fetchSql)
    val subRel = fetchCorr match {
      case Some(c) => subRel0.join(ids.withColumnRenamed(idCol, c), Seq(c), "left_semi")
      case None => subRel0
    }
    val outerKey = fetchCorr.getOrElse(idCol)
    val subId = mp.fetch.id

    val idRel = ids.withColumnRenamed(idCol, outerKey)
    val zeroable = Set("sum", "count", "avg", "mean", "min", "max",
      "approx_count_distinct")
    val perChild = mp.children.map { ch =>
      require(allowedAggs.contains(ch.agg), s"agg '${ch.agg}' not in allowlist")
      val (sql, corr) = decorrelate(ch.query)
      val childCorr = corr.getOrElse(subId)
      val scan = router.run(spark, ch.databaseName, sql).na.fill(0, Seq(ch.aggOn))
      // child facts → attach outer key through the sub-ID relation
      val agged = scan
        .join(subRel.select(col(outerKey), col(subId).as(childCorr)).distinct(),
          Seq(childCorr), "inner")
        .groupBy(col(outerKey))
        .agg(expr(s"${ch.agg}(${ch.aggOn})").alias(ch.rename))
      // zero-fill PER CHILD from the ID relation — the declarative dual of
      // the reference's per-ID fallback row (generic_script.scala:425-431:
      // an empty per-ID read contributes Row(0), so every fetched ID yields
      // one row per child BEFORE the fold). With both fold inputs total on
      // the same key set, every join type below computes the same relation.
      val zeroed = idRel.join(agged, Seq(outerKey), "left")
      if (zeroable(ch.agg)) zeroed.withColumn(ch.rename, coalesce(col(ch.rename), lit(0)))
      else zeroed
    }
    // fold honoring each child's DECLARED join_type (reference:
    // generic_script.scala:376-378 joins child j's frame with the running
    // fold using child j's join_on/join_type; the first child seeds it)
    val folded = perChild.zip(mp.children).tail
      .foldLeft(perChild.head) { case (acc, (df, ch)) =>
        acc.join(df, Seq(outerKey), normalizeJoinType(ch.joinType))
      }
    // the spec's join_on names the column the fold joins back on
    if (mp.joinOn != outerKey) folded.withColumnRenamed(outerKey, mp.joinOn) else folded
  }

  /** data_mapping pass (reference: generic_script.scala:200-218): derived
    * columns; `average` is row-wise arithmetic, not a grouped aggregate.
    *
    * The reference computes `round((a + b) / 2, 2)` in double arithmetic
    * (generic_script.scala:213), which is nondeterministic at `.xx5`
    * rounding boundaries (the double nearest x.xx5 rounds differently
    * depending on which side of the boundary it falls, and engines disagree).
    * We stay in exact decimal: cast to DECIMAL(18,2) (lossless for money
    * columns), multiply by 0.5 (decimal multiply is exact; decimal division
    * is not available exactly in all engines), round half-up, cast double.
    */
  def deriveAverage(df: DataFrame, name: String, a: String, b: String): DataFrame = {
    val half = lit(new java.math.BigDecimal("0.5"))
    df.withColumn(name,
      round((col(a).cast(DecimalType(18, 2)) + col(b).cast(DecimalType(18, 2))) * half, 2)
        .cast(DoubleType))
  }

  /** ratio kind (extension slot): a / b per row, 0 when the denominator is
    * 0 (the zero-fill convention every other derived value follows), double
    * division — a single deterministic IEEE op on exact inputs.
    */
  def deriveRatio(df: DataFrame, name: String, a: String, b: String): DataFrame =
    df.withColumn(name,
      when(col(b).cast(DoubleType) === 0.0, lit(0.0))
        .otherwise(col(a).cast(DoubleType) / col(b).cast(DoubleType)))

  /** Derivations whose inputs an entry doesn't carry are skipped for that
    * entry — the mapping document is spec-global but entries may have
    * heterogeneous schemas when sunk per-entry (the reference reaches the
    * same outcome through its blanket per-entry Try/Failure fallback,
    * generic_script.scala:444-449).
    */
  def applyDataMapping(df: DataFrame, mapping: Seq[(String, DerivedCol)]): DataFrame = {
    val has = df.columns.toSet
    mapping.foldLeft(df) {
      case (d, (_, NoDerivation)) => d
      case (d, (name, AverageOf(a, b))) if has(a) && has(b) => deriveAverage(d, name, a, b)
      case (d, (name, RatioOf(a, b))) if has(a) && has(b) => deriveRatio(d, name, a, b)
      case (d, _) => d
    }
  }

  /** Parse a declared type: the reference's `"IntegerType"`-style Scala
    * `toString` spellings (generic_script.scala:240), plus DDL spellings
    * ("bigint", "decimal(18,2)") as a convenience.
    */
  def parseDeclaredType(s: String): Option[DataType] = s match {
    case "IntegerType" => Some(IntegerType)
    case "LongType" => Some(LongType)
    case "DoubleType" => Some(DoubleType)
    case "FloatType" => Some(FloatType)
    case "StringType" => Some(StringType)
    case "BooleanType" => Some(BooleanType)
    case "DateType" => Some(DateType)
    case "TimestampType" => Some(TimestampType)
    case "ArrayType(StringType,true)" => Some(ArrayType(StringType, true))
    case other => Try(DataType.fromDDL(other)).toOption
  }

  /** Output contract (reference: generic_script.scala:225-250): project to
    * contract columns; rename when the declared type matches the actual type
    * (the reference's skip-rename-on-mismatch rule, keyed on `DataType`
    * equality rather than `toString` equality); ArrayType(StringType)
    * flattens via concat_ws (generic_script.scala:241-242).
    *
    * Extension over the reference: when the actual type differs but is
    * safely castable to the declared one (e.g. an exact DECIMAL aggregate
    * into a declared DoubleType), we cast+rename instead of skipping — the
    * declared schema is a target, not just an assertion. Configs whose
    * types already match behave exactly as in the reference.
    */
  def applyOutputContract(df: DataFrame, contract: Seq[(String, OutputColumn)]): DataFrame = {
    if (contract.isEmpty) return df // no contract declared -> identity
    val cols = contract.collect { case (name, oc) if df.columns.contains(name) =>
      val actual = df.schema(name).dataType
      val declared = parseDeclaredType(oc.inputDataType)
      if (declared.contains(actual) || actual.toString == oc.inputDataType) {
        actual match {
          case ArrayType(StringType, _) => concat_ws(", ", col(name)).as(oc.rename)
          case _ => col(name).as(oc.rename)
        }
      } else declared match {
        case Some(d) if canSafelyCast(actual, d) => col(name).cast(d).as(oc.rename)
        case _ => col(name) // mismatch → keep column, skip rename
      }
    }
    df.select(cols: _*)
  }

  /** Lossless-ish cast targets only: numeric↔numeric widening and
    * numeric→string. String→numeric parses (nulls on failure) — NOT safe,
    * so a wrongly-declared IntegerType on a string column still triggers
    * the reference's skip-rename rule.
    */
  private def canSafelyCast(from: DataType, to: DataType): Boolean = (from, to) match {
    case (_: NumericType, _: NumericType) => true
    case (_: NumericType, StringType) => true
    case _ => false
  }
}
