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
    * over a SQL expression string. The divisor is cast to DOUBLE
    * explicitly — a bare `/ 100.0` is DOUBLE division in DuckDB but
    * exact DECIMAL division in Spark SQL (Spark parses the literal as
    * DECIMAL(4,1)), which is precisely the dialect split that made
    * g4_grouping_sets diverge in round 2.
    */
  def moneySumSql(expr: String): String =
    s"CAST(ROUND(SUM(CAST($expr AS DECIMAL(28,10))) * 100, 0) AS BIGINT) / CAST(100.0 AS DOUBLE)"
}
