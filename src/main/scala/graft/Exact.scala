package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact aggregation idioms (COVERAGE.md playbook),
  * single-sourced so the Spark expression and the oracle SQL cannot
  * drift by a character: a double money column is summed as
  * DECIMAL(28,10) (exact, order-free), bridged to cents as BIGINT, and
  * divided once in IEEE — a direct DECIMAL→DOUBLE cast is 1 ulp off
  * between engines.
  */
object Exact {

  /** Spark side: exact 2-decimal money sum of `c`. */
  def moneySum(c: Column): Column =
    round(sum(c.cast("decimal(28,10)")) * 100, 0).cast("long") / lit(100.0)

  /** SQL side (valid in BOTH Spark SQL and DuckDB): same derivation
    * over a SQL expression string.
    */
  def moneySumSql(expr: String): String =
    s"CAST(ROUND(SUM(CAST($expr AS DECIMAL(28,10))) * 100, 0) AS BIGINT) / 100.0"
}
