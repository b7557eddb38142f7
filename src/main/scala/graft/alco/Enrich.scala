package graft.alco

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Enrich stage (SURVEY.md O16): broadcast-hash-join lookup of role/tool
  * dimension metadata. Reference analog: alco resolving each message against
  * its LoggerIndex/LoggerColumn config — an in-process dict lookup, i.e. a
  * degenerate broadcast join of stream × tiny dim [PK collector.py].
  *
  * `broadcast()` is hinted explicitly to pin `BroadcastHashJoinExec` (no
  * shuffle of the fact side) regardless of stats — the dims are O(10) rows
  * while the fact side is 10^12 at target scale. Unmatched keys keep nulls
  * and raise `enrich_missing` for the audit/quarantine metrics (never
  * dropped).
  */
object Enrich {

  final case class RoleDim(role: String, role_group: String, is_agent: Boolean)
  final case class ToolDim(tool: String, tool_family: String, is_side_effecting: Boolean)

  /** FIXTURES.md §3: 4 roles; tool dim deliberately misses one live key
    * ("browser") to exercise the left-join null path.
    */
  val roleDims: Seq[RoleDim] = Seq(
    RoleDim("user", "human", is_agent = false),
    RoleDim("assistant", "agent", is_agent = true),
    RoleDim("system", "control", is_agent = false),
    RoleDim("tool", "agent", is_agent = true))

  val toolDims: Seq[ToolDim] = Seq(
    ToolDim("", "none", is_side_effecting = false),
    ToolDim("bash", "shell", is_side_effecting = true),
    ToolDim("search", "retrieval", is_side_effecting = false),
    ToolDim("edit", "fs", is_side_effecting = true),
    ToolDim("read", "fs", is_side_effecting = false))

  def roleDimDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    roleDims.toDF()
  }

  def toolDimDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    toolDims.toDF()
  }

  def stage(spark: SparkSession)(df: DataFrame): DataFrame =
    df.join(broadcast(roleDimDf(spark)), Seq("role"), "left")
      .join(broadcast(toolDimDf(spark)), Seq("tool"), "left")
      .withColumn("enrich_missing",
        col("role_group").isNull || col("tool_family").isNull)
}
