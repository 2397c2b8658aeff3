package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Typed model of the reference's JSON pipeline DSL.
  *
  * Grammar reconstructed in SURVEY.md §2.11 from the reference interpreter
  * (reference: MENT/generic_script.scala:83-116,152-189,266-271,386-394;
  * MENT/functions/mentoringFunction2.scala:32-58). The reference walks the
  * raw ujson tree inline; we decode once into this ADT so the compiler works
  * on typed structure and bad specs fail at load, not mid-pipeline.
  */
final case class Fetch(query: String, databaseName: String, id: String)

sealed trait Task

/** `single_process` task (SURVEY §2.11 SP). `agg == "none"` means a raw
  * passthrough relation; otherwise `agg` is a validated aggregate-function
  * name applied to `aggOn`, grouped by `groupby`, aliased `rename`.
  */
final case class SingleProcess(
    input: String, query: String, databaseName: String,
    agg: String, aggOn: String, groupby: String, rename: String,
    joinOn: String, joinType: String) extends Task

/** `fetchID_with_InputID` + `multiple_process` children (SURVEY §2.11 MP):
  * a second-level ID fetch correlated to the outer ID, whose children are
  * per-sub-ID scans that are unioned and summed per outer ID.
  */
final case class MultiProcess(
    fetch: Fetch, joinOn: String, joinType: String,
    children: Seq[SubProcess]) extends Task

final case class SubProcess(
    input: String, query: String, databaseName: String,
    agg: String, aggOn: String, joinOn: String, joinType: String,
    rename: String)

final case class ScriptEntry(fetchId: Fetch, tasks: Seq[Task])

/** `data_mapping` entry: either no-op or a derived column
  * (reference: MENT/generic_script.scala:200-218 — `"average"` is the only
  * implemented kind; the registry here is where new kinds slot in).
  */
sealed trait DerivedCol
case object NoDerivation extends DerivedCol
final case class AverageOf(a: String, b: String) extends DerivedCol

/** Extension kind proving the registry slot: a / b (0 when b = 0), the
  * per-row ratio the reference's report configs compute downstream today.
  */
final case class RatioOf(a: String, b: String) extends DerivedCol

/** `output_data_schema` entry: declared input type + output name
  * (reference: MENT/generic_script.scala:236-248).
  */
final case class OutputColumn(inputDataType: String, rename: String)

final case class PipelineSpec(
    entries: Seq[ScriptEntry],
    dataMapping: Seq[(String, DerivedCol)],
    outputSchema: Seq[(String, OutputColumn)])

object PipelineSpec {
  private val mapper = new ObjectMapper()

  /** Reference-parity bootstrap (E1 lifecycle steps 2-3, SURVEY.md §3):
    * select the config row for `scriptType` and pull its three JSON cells
    * — `input_data_schema`, `output_data_schema`, `data_mapping` — to the
    * driver (reference: MENT/task/mentoringExecution.scala:21-38, which
    * does the same with a `WHERE script_type=` JDBC scan and three
    * `.first()` actions). The config DataFrame can come from any source
    * (JDBC config table via [[graft.ops.Tables.jdbc]], a parquet/json
    * file); only one driver round-trip is made for all three cells.
    */
  def fromConfigTable(config: org.apache.spark.sql.DataFrame,
                      scriptType: String): PipelineSpec = {
    import org.apache.spark.sql.functions.col
    val rows = config.where(col("script_type") === scriptType)
      .select("input_data_schema", "data_mapping", "output_data_schema")
      .limit(1).collect()
    require(rows.nonEmpty, s"no config row with script_type='$scriptType'")
    val r = rows.head
    fromJson(r.getString(0), r.getString(1), r.getString(2))
  }

  /** Decode the three JSON documents of a config row. Accepts both the v0
    * spelling (`fetchID`/`child`) and the v3 spelling (`fetchId`/`tasks`)
    * (reference: generic_script.scala:83,90 vs mentoringFunction2.scala:32,40).
    */
  def fromJson(inputDataSchema: String, dataMapping: String,
               outputDataSchema: String): PipelineSpec = {
    val entries = mapper.readTree(inputDataSchema).elements().asScala.map(parseEntry).toSeq
    val dm = parseDataMapping(mapper.readTree(dataMapping))
    val out = parseOutputSchema(mapper.readTree(outputDataSchema))
    PipelineSpec(entries, dm, out)
  }

  /** Convenience: one JSON document holding all three sections (our native
    * spec file format; same payloads, no config-table round-trip needed).
    */
  def fromJson(doc: String): PipelineSpec = {
    val root = mapper.readTree(doc)
    PipelineSpec(
      root.get("input_data_schema").elements().asScala.map(parseEntry).toSeq,
      parseDataMapping(root.get("data_mapping")),
      parseOutputSchema(root.get("output_data_schema")))
  }

  private def str(n: JsonNode, field: String): String = {
    val v = n.get(field)
    require(v != null && v.isTextual, s"spec: missing/non-text field '$field' in $n")
    v.asText()
  }

  private def parseFetch(n: JsonNode): Fetch =
    Fetch(str(n, "query"), str(n, "database_name"), str(n, "id"))

  private def parseEntry(n: JsonNode): ScriptEntry = {
    val fetch = Option(n.get("fetchId")).orElse(Option(n.get("fetchID")))
      .map(parseFetch)
      .getOrElse(throw new IllegalArgumentException(s"spec: entry without fetchId: $n"))
    val tasksNode = Option(n.get("tasks")).orElse(Option(n.get("child")))
      .getOrElse(throw new IllegalArgumentException(s"spec: entry without tasks: $n"))
    ScriptEntry(fetch, tasksNode.elements().asScala.map(parseTask).toSeq)
  }

  private def parseTask(n: JsonNode): Task =
    if (n.has("single_process")) {
      val sp = n.get("single_process")
      SingleProcess(
        str(sp, "input"), str(sp, "query"), str(sp, "database_name"),
        str(sp, "agg"), str(sp, "agg_on"), str(sp, "groupby"),
        str(sp, "rename"), str(sp, "join_on"), str(sp, "join_type"))
    } else if (n.has("fetchID_with_InputID")) {
      val f = n.get("fetchID_with_InputID")
      val children = Option(n.get("child")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        .map { c =>
          val mp = c.get("multiple_process")
          require(mp != null, s"spec: multi-process child without multiple_process: $c")
          SubProcess(
            str(mp, "input"), str(mp, "query"), str(mp, "database_name"),
            str(mp, "agg"), str(mp, "agg_on"),
            str(mp, "join_on"), str(mp, "join_type"), str(mp, "rename"))
        }
      MultiProcess(parseFetch(f), str(f, "join_on"), str(f, "join_type"), children)
    } else throw new IllegalArgumentException(s"spec: unknown task shape: $n")

  private def parseDataMapping(n: JsonNode): Seq[(String, DerivedCol)] =
    n.properties().asScala.toSeq.map { e =>
      val agg = e.getValue.get("aggregation")
      val derived: DerivedCol =
        if (agg == null || agg.isTextual) NoDerivation // "none"
        else agg.get("agg_type").asText() match {
          case "average" =>
            val cols = agg.get("column_name").elements().asScala.map(_.asText()).toSeq
            require(cols.size == 2, s"spec: average needs 2 columns, got $cols")
            AverageOf(cols.head, cols(1))
          case "ratio" =>
            val cols = agg.get("column_name").elements().asScala.map(_.asText()).toSeq
            require(cols.size == 2, s"spec: ratio needs 2 columns, got $cols")
            RatioOf(cols.head, cols(1))
          case other => throw new IllegalArgumentException(s"spec: unknown agg_type '$other'")
        }
      e.getKey -> derived
    }

  private def parseOutputSchema(n: JsonNode): Seq[(String, OutputColumn)] =
    n.properties().asScala.toSeq.map { e =>
      e.getKey -> OutputColumn(str(e.getValue, "Input_data_type"), str(e.getValue, "rename"))
    }
}
