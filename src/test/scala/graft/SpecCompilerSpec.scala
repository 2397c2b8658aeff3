package graft

import graft.compile.SpecCompiler
import graft.spec._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Spec-DSL compiler semantics, pinned against the reference interpreter's
  * observable behavior (SURVEY.md §2.11, §7.3): decorrelation, zero-fill,
  * join-fold, allowlist validation, data-mapping, and the output contract's
  * skip-rename-on-mismatch + array-flatten rules.
  */
class SpecCompilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def specJson(aggA: String = "sum"): String =
    s"""{
       |"input_data_schema": [
       |  {"fetchId": {"query": "SELECT id FROM drivers", "database_name": "db", "id": "id"},
       |   "tasks": [
       |     {"single_process": {"input": "driver_id",
       |        "query": "SELECT driver_id, amount FROM facts WHERE driver_id = $${id}",
       |        "database_name": "db", "agg": "$aggA", "agg_on": "amount",
       |        "groupby": "none", "rename": "total",
       |        "join_on": "driver_id", "join_type": "none"}},
       |     {"single_process": {"input": "driver_id",
       |        "query": "SELECT driver_id, amount FROM facts WHERE driver_id = $${id}",
       |        "database_name": "db", "agg": "count", "agg_on": "amount",
       |        "groupby": "none", "rename": "n",
       |        "join_on": "driver_id", "join_type": "inner"}}
       |   ]}
       |],
       |"data_mapping": {"avg_col": {"aggregation":
       |    {"agg_type": "average", "column_name": ["total", "n"]}}},
       |"output_data_schema": {
       |  "driver_id": {"Input_data_type": "IntegerType", "rename": "driver"},
       |  "total": {"Input_data_type": "DoubleType", "rename": "total_amount"},
       |  "n": {"Input_data_type": "LongType", "rename": "n_rows"},
       |  "avg_col": {"Input_data_type": "DoubleType", "rename": "avg_val"}}
       |}""".stripMargin

  private def register(ids: Seq[Int], facts: Seq[(Int, Double)]): Unit = {
    ids.toDF("id").createOrReplaceTempView("drivers")
    facts.toDF("driver_id", "amount").createOrReplaceTempView("facts")
  }

  test("decorrelate splits the ${id} conjunct and names the correlation column") {
    val (sql, corr) = SpecCompiler.decorrelate(
      "SELECT a, b FROM t WHERE user_id = ${id} AND b > 3")
    assert(sql == "SELECT a, b FROM t WHERE 1=1 AND b > 3")
    assert(corr.contains("user_id"))
    assert(SpecCompiler.decorrelate("SELECT 1") == (("SELECT 1", None)))
  }

  test("decorrelate accepts IN (${id}) as per-iteration equality") {
    val (sql, corr) = SpecCompiler.decorrelate(
      "SELECT a FROM t WHERE user_id IN (${id}) AND b > 3")
    assert(sql == "SELECT a FROM t WHERE 1=1 AND b > 3")
    assert(corr.contains("user_id"))
    // case-insensitive keyword, whitespace tolerated
    val (sql2, corr2) = SpecCompiler.decorrelate(
      "SELECT a FROM t WHERE user_id in ( ${id} )")
    assert(sql2 == "SELECT a FROM t WHERE 1=1")
    assert(corr2.contains("user_id"))
    // repeated conjuncts on the SAME column collapse to one correlation
    val (sql3, corr3) = SpecCompiler.decorrelate(
      "SELECT a FROM t WHERE user_id = ${id} OR user_id IN (${id})")
    assert(sql3 == "SELECT a FROM t WHERE 1=1 OR 1=1")
    assert(corr3.contains("user_id"))
  }

  test("decorrelate fails loudly on unsupported ${id} placements") {
    // arithmetic / concatenation / IN-list placements have no join
    // equivalent; the reference's raw string-replace would accept them,
    // so the compiler must reject them instead of leaving ${id} in the SQL
    for (q <- Seq(
      "SELECT a FROM t WHERE user_id = ${id} + 1",
      "SELECT a FROM t WHERE user_id IN (${id}, 5)",
      "SELECT concat('u', ${id}) FROM t",
      "SELECT a FROM t WHERE ${id} = user_id")) {
      val ex = intercept[IllegalArgumentException](SpecCompiler.decorrelate(q))
      assert(ex.getMessage.contains("unsupported ${id} placement"), q)
    }
  }

  test("decorrelate rejects ${id} constraining two different columns") {
    // `a = ${id} AND b = ${id}` would need a two-column join; dropping one
    // conjunct silently widens the result, so it must throw
    val ex = intercept[IllegalArgumentException](SpecCompiler.decorrelate(
      "SELECT a FROM t WHERE a = ${id} AND b = ${id}"))
    assert(ex.getMessage.contains("ambiguous correlation"))
  }

  test("spec JSON round-trips through the typed ADT (v3 spelling)") {
    val spec = PipelineSpec.fromJson(specJson())
    assert(spec.entries.size == 1)
    assert(spec.entries.head.fetchId == Fetch("SELECT id FROM drivers", "db", "id"))
    assert(spec.entries.head.tasks.size == 2)
    assert(spec.dataMapping == Seq("avg_col" -> AverageOf("total", "n")))
    assert(spec.outputSchema.toMap.apply("total") == OutputColumn("DoubleType", "total_amount"))
  }

  test("config-table bootstrap: three JSON cells selected by script_type") {
    val cfg = Seq(
      ("mentor_report", """[{"fetchId": {"query": "SELECT id FROM drivers",
         "database_name": "db", "id": "id"}, "tasks": []}]""", "{}", "{}"),
      ("other", "[]", "{}", "{}"))
      .toDF("script_type", "input_data_schema", "data_mapping", "output_data_schema")
    val spec = PipelineSpec.fromConfigTable(cfg, "mentor_report")
    assert(spec.entries.size == 1 && spec.entries.head.fetchId.id == "id")
    val ex = intercept[IllegalArgumentException](
      PipelineSpec.fromConfigTable(cfg, "missing"))
    assert(ex.getMessage.contains("script_type"))
  }

  test("registered SQL functions: graft_dot and graft_sorted_set_jaccard") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                graft_sorted_set_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j""")
      .collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 0.5)
  }

  test("registered SQL functions: graft_fingerprint and graft_char_fold") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_fingerprint('alpha beta') AS fp,
                graft_char_fold('ab', 31L, 1000000007L) AS cf""").collect().head
    // fp: fold of (97*100+5, 98*100+4) = ((0*31+9705)%p)*31+9804 = 310659
    assert(r.getLong(0) == 310659L)
    // cf: (0*31+97)*31+98 = 3105
    assert(r.getLong(1) == 3105L)
    val ex = intercept[Exception](
      spark.sql("SELECT graft_char_fold('x', id, 7L) FROM range(1)").collect())
    assert(ex.getMessage.contains("literal"))
  }

  test("v0 spelling (fetchID/child) parses to the same structure") {
    val v0 = """[{"fetchID": {"query": "SELECT id FROM drivers",
                "database_name": "db", "id": "id"}, "child": []}]"""
    val spec = PipelineSpec.fromJson(v0, "{}", "{}")
    assert(spec.entries.head.fetchId.id == "id")
  }

  test("compiled plan == reference loop semantics, including zero-fill for idle IDs") {
    register(ids = Seq(1, 2, 3, 4, 5),
      facts = Seq((1, 10.0), (1, 5.0), (2, 7.5), (3, 2.5), (7, 99.0)))
    val out = SpecCompiler.compile(spark, PipelineSpec.fromJson(specJson()))
    assert(out.columns.toSeq == Seq("driver", "total_amount", "n_rows", "avg_val"))
    val got = out.collect().map(r => r.getInt(0) ->
      ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    // reference loop: per fetched ID run the query, empty result -> zero row
    // (generic_script.scala:305-310); id 7 is NOT fetched -> absent
    val expected = Map(
      1 -> ((15.0, 2L, 8.5)), // avg_col = round((15+2)/2, 2)
      2 -> ((7.5, 1L, 4.25)),
      3 -> ((2.5, 1L, 1.75)),
      4 -> ((0.0, 0L, 0.0)),
      5 -> ((0.0, 0L, 0.0)))
    assert(got == expected)
  }

  test("loop ≡ decorrelated-join equivalence on randomized relations") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val ids = (0 until 12).filter(_ => rnd.nextBoolean())
      val facts = Seq.fill(40)((rnd.nextInt(15), (rnd.nextInt(400) / 4.0)))
      if (ids.nonEmpty) {
        register(ids, facts)
        val out = SpecCompiler.compile(spark, PipelineSpec.fromJson(specJson()))
        val got = out.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        // driver-loop truth computed with plain collections
        val expected = ids.map { id =>
          val rows = facts.filter(_._1 == id).map(_._2)
          id -> (if (rows.isEmpty) 0.0 else rows.sum)
        }.toMap
        assert(got == expected, s"trial $trial ids=$ids")
      }
    }
  }

  test("agg strings outside the allowlist are rejected") {
    register(Seq(1), Seq((1, 1.0)))
    val hostile = specJson(aggA = "java_method")
    val ex = intercept[IllegalArgumentException] {
      SpecCompiler.compile(spark, PipelineSpec.fromJson(hostile)).collect()
    }
    assert(ex.getMessage.contains("allowlist"))
  }

  test("multi-process subtree: per-sub-ID scans aggregate to the outer ID with zero-fill") {
    Seq(1, 2, 3).toDF("id").createOrReplaceTempView("drivers")
    // sub-relation: outer driver -> sessions (driver 3 has none)
    Seq((1, 100), (1, 101), (2, 102)).toDF("driver_id", "session_id")
      .createOrReplaceTempView("sessions")
    Seq((100, 4.0), (100, 6.0), (101, 1.0), (102, 9.0), (999, 50.0))
      .toDF("session_id", "score").createOrReplaceTempView("scores")
    val spec = PipelineSpec(
      entries = Seq(ScriptEntry(
        Fetch("SELECT id FROM drivers", "db", "id"),
        Seq(MultiProcess(
          Fetch("SELECT driver_id, session_id FROM sessions WHERE driver_id = ${id}", "db", "session_id"),
          joinOn = "driver_id", joinType = "left",
          children = Seq(SubProcess("session_id",
            "SELECT session_id, score FROM scores WHERE session_id = ${id}",
            "db", "sum", "score", "session_id", "left", "total_score")))))),
      dataMapping = Seq.empty, outputSchema = Seq.empty)
    val out = SpecCompiler.compile(spark, spec)
    val scores = out.select(col("driver_id"), col("total_score")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // driver 1: sessions 100,101 -> 4+6+1 = 11; driver 2: session 102 -> 9;
    // driver 3: no sessions -> zero-filled 0; score row 999 has no session -> excluded
    assert(scores == Map(1 -> 11.0, 2 -> 9.0, 3 -> 0.0))
  }

  test("multi-process fold honors per-child join_type; all types agree on total key sets") {
    // Reference semantics (generic_script.scala:376-378,425-431): every
    // fetched ID contributes one row per child (empty reads fall back to a
    // zero row), then children fold with each child's declared join_type.
    // Because each fold input is total on the same key set, every join type
    // must produce the same relation — verified here against a plain
    // collections loop across randomized relations, join types, and aggs.
    val rnd = new scala.util.Random(11)
    val joinTypes = Seq("inner", "left", "right", "full", "left_outer", "none")
    for (trial <- 1 to 5) {
      val ids = (0 until 8).filter(_ => rnd.nextBoolean())
      if (ids.nonEmpty) {
        val sessions = Seq.fill(12)((rnd.nextInt(10), 100 + rnd.nextInt(8)))
        val scoreRows = Seq.fill(20)((100 + rnd.nextInt(10), rnd.nextInt(40) / 2.0))
        val agg2 = Seq("count", "max", "sum")(rnd.nextInt(3))
        ids.toDF("id").createOrReplaceTempView("drivers")
        sessions.toDF("driver_id", "session_id").createOrReplaceTempView("sessions")
        scoreRows.toDF("session_id", "score").createOrReplaceTempView("scores")
        val children = Seq(
          SubProcess("session_id",
            "SELECT session_id, score FROM scores WHERE session_id = ${id}",
            "db", "sum", "score", "driver_id", joinTypes(rnd.nextInt(joinTypes.size)), "total"),
          SubProcess("session_id",
            "SELECT session_id, score FROM scores WHERE session_id = ${id}",
            "db", agg2, "score", "driver_id", joinTypes(rnd.nextInt(joinTypes.size)), "m2"))
        val spec = PipelineSpec(
          entries = Seq(ScriptEntry(
            Fetch("SELECT id FROM drivers", "db", "id"),
            Seq(MultiProcess(
              Fetch("SELECT driver_id, session_id FROM sessions WHERE driver_id = ${id}", "db", "session_id"),
              joinOn = "driver_id", joinType = "left", children = children)))),
          dataMapping = Seq.empty, outputSchema = Seq.empty)
        def num(v: Any): Double = v match {
          case l: Long => l.toDouble
          case i: Int => i.toDouble
          case d: Double => d
        }
        val out = SpecCompiler.compile(spark, spec).collect()
          .map(r => r.getInt(0) -> ((num(r.get(1)), num(r.get(2))))).toMap
        // collections truth: per driver, scores of its DISTINCT sessions
        val truth = ids.map { id =>
          val subIds = sessions.filter(_._1 == id).map(_._2).distinct
          val vals = scoreRows.filter(r => subIds.contains(r._1)).map(_._2)
          val total = vals.sum
          val m2 = agg2 match {
            case "count" => vals.size.toDouble
            case "max" => if (vals.isEmpty) 0.0 else vals.max
            case "sum" => vals.sum
          }
          id -> ((total, m2))
        }.toMap
        assert(out == truth, s"trial $trial agg2=$agg2 ids=$ids")
      }
    }
  }

  test("deriveAverage rounds half-up in exact decimal like the reference's round()") {
    val df = Seq((1.05, 2.00), (0.10, 0.11), (2.0, 4.0)).toDF("a", "b")
    val got = SpecCompiler.deriveAverage(df, "avg", "a", "b")
      .select("avg").as[Double].collect().toSeq
    // (1.05+2.00)/2 = 1.525 -> 1.53 (exact decimal half-up); 0.105 -> 0.11
    assert(got == Seq(1.53, 0.11, 3.0))
  }

  test("data_mapping ratio kind: parses, divides, zero-fills div-by-zero") {
    val spec = PipelineSpec.fromJson(
      """[]""",
      """{"rate": {"aggregation":
           {"agg_type": "ratio", "column_name": ["hits", "tries"]}}}""",
      """{}""")
    assert(spec.dataMapping == Seq("rate" -> RatioOf("hits", "tries")))
    val df = Seq((3.0, 4.0), (1.0, 0.0)).toDF("hits", "tries")
    val got = SpecCompiler.applyDataMapping(df, spec.dataMapping)
      .select("rate").as[Double].collect().toSeq
    assert(got == Seq(0.75, 0.0))
  }

  test("output contract: match renames, array flattens, hard mismatch keeps name") {
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1, "x", Seq("p", "q"), 2.5)),
      StructType(Seq(
        StructField("i", IntegerType), StructField("s", StringType),
        StructField("arr", ArrayType(StringType, true)), StructField("d", DoubleType))))
    val contract = Seq(
      "i" -> OutputColumn("IntegerType", "i_renamed"),          // exact match
      "s" -> OutputColumn("IntegerType", "s_renamed"),          // string!=int: skip rename
      "arr" -> OutputColumn("ArrayType(StringType,true)", "arr_flat"), // flatten
      "d" -> OutputColumn("IntegerType", "d_int"),              // numeric widening: cast+rename
      "missing" -> OutputColumn("IntegerType", "never"))        // absent: dropped
    val out = SpecCompiler.applyOutputContract(df, contract)
    assert(out.columns.toSeq == Seq("i_renamed", "s", "arr_flat", "d_int"))
    val row = out.collect().head
    assert(row.getString(out.columns.indexOf("arr_flat")) == "p, q")
    assert(row.getInt(out.columns.indexOf("d_int")) == 2)
  }
}
