package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One addressable engine query: a name, the Spark implementation
  * `(session, sfDir) => DataFrame`, and — when the semantics are
  * ANSI-SQL-expressible — an equivalent DuckDB SQL oracle over the same
  * parquet tables. Column names/aliases MUST match between the two (the
  * driver's comparator sorts columns by name before hashing values).
  * Queries without an oracle get a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
