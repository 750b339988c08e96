package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per SURVEY §2
  * operator); `oracleSql` holds the DuckDB-equivalent SQL for every
  * oracle-checkable entry.
  */
object SparkEntry {

  /** All registered query groups. */
  def allQs: Seq[Q] =
    Relational.queries ++ GeoQueries.queries ++ PipelineQueries.queries ++
      OpsQueries.queries ++ EventQueries.queries ++ CoverageQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQs.find(_.name == "q3_join_agg").get.run(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
