package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation + (optionally) the
  * equivalent SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between the two sides (the
  * driver sorts columns by name before hashing).
  *
  * Determinism contract: every query that returns rows (not a single
  * aggregate) carries a total-order ORDER BY on both sides, and
  * float-returning aggregates go through exact decimal arithmetic
  * before a single final cast to double so DuckDB and Spark produce
  * bit-identical values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** A query whose Spark side is also SQL text (runs through our
    * registered views + functions) and whose oracle is the same or a
    * DuckDB-dialect equivalent.
    */
  def sql(name: String, sparkSql: String, duckSql: String): Q =
    Q(name, (s, dir) => { graft.core.Tables.registerAll(s, dir); s.sql(sparkSql) }, Some(duckSql))
}
