package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Window => WindowNode}

/** SQL pass-through with plan-shape guards (SURVEY §3.1).
  *
  * Reference: `DBAnalysis` (gofast/query.py:23) — pandas→SQLite with
  * regex "validation" (`aggregate` checks for COUNT|SUM|AVG substrings,
  * query.py:320; `joinTables` for JOIN, :378; `windowFunctions` for
  * OVER, :691). Here the same intents are verified on the ANALYZED
  * Catalyst plan — strictly stronger than substring matching (a query
  * mentioning 'JOIN' in a string literal passes the reference's guard;
  * it does not pass a plan check).
  */
class SqlGuards(spark: SparkSession) {

  /** `DBAnalysis.fit`: register a frame as a queryable table. */
  def fit(df: DataFrame, table: String): SqlGuards = {
    df.createOrReplaceTempView(table)
    this
  }

  private def analyzed(sql: String): LogicalPlan =
    spark.sql(sql).queryExecution.analyzed

  private def hasNode(plan: LogicalPlan, pred: LogicalPlan => Boolean): Boolean =
    plan.collectFirst { case p if pred(p) => p }.isDefined

  /** Plain pass-through (`DBAnalysis.query`, query.py:212). */
  def query(sql: String): DataFrame = spark.sql(sql)

  /** Aggregate intent (query.py:267): plan must contain an Aggregate. */
  def aggregate(sql: String): DataFrame = {
    require(hasNode(analyzed(sql), _.isInstanceOf[Aggregate]),
      "query has no aggregation in its plan")
    spark.sql(sql)
  }

  /** Join intent (query.py:327): plan must contain a Join. */
  def joinTables(sql: String): DataFrame = {
    require(hasNode(analyzed(sql), _.isInstanceOf[Join]),
      "query has no join in its plan")
    spark.sql(sql)
  }

  /** Window intent (query.py:639): plan must contain a Window node. */
  def windowFunctions(sql: String): DataFrame = {
    require(hasNode(analyzed(sql), _.isInstanceOf[WindowNode]),
      "query has no window function in its plan")
    spark.sql(sql)
  }

  /** Subquery/CTE intent (query.py:429 checks for WITH/nested SELECT
    * with a regex): the PARSED tree must contain a CTE (UnresolvedWith)
    * or a subquery expression (scalar/IN/EXISTS) — checked before
    * analysis, since the analyzer inlines CTEs. */
  def subqueries(sql: String): DataFrame = {
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    val hasCte = parsed.collectFirst {
      case p if p.getClass.getSimpleName == "UnresolvedWith" => p
    }.isDefined
    val hasSubqueryExpr = parsed.exists(_.expressions.exists(_.exists {
      case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => true
      case _ => false
    }))
    require(hasCte || hasSubqueryExpr,
      "query has no CTE or subquery expression")
    spark.sql(sql)
  }

  /** The reference's DML surface (`manipulate`, query.py:488 —
    * UPDATE/DELETE against SQLite). Spark tables are immutable; the
    * documented mapping (SURVEY §7.4) is view REDEFINITION: the "update"
    * is a SELECT producing the new state, registered under the same
    * name. Returns the new view. */
  def redefineView(table: String, selectSql: String): DataFrame = {
    val df = spark.sql(selectSql)
    df.createOrReplaceTempView(table)
    df
  }
}
