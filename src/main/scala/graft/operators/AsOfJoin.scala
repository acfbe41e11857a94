package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables

/** As-of (most-recent-prior) join — the canonical time-series operator
  * Spark lacks as a primitive. Per the engine's preference order this is
  * COMPOSED from built-ins (SURVEY.md §7 stance: custom plans only when
  * composition can't express the semantics): tag both sides, union,
  * and carry the last right-side payload forward with a
  * `last(..., ignoreNulls)` running window per key.
  *
  * Scale shape: ONE shuffle on the join key (the window partition), no
  * range-condition join explosion, no per-key driver loop — at 100 TB
  * this is a sort within each key partition, and skewed keys split via
  * AQE. Strictness: right rows at time == left time are ordered AFTER
  * the left row, so the match is strictly earlier (`r.t < l.t`).
  * Right side must be unique per (key, time) — pre-aggregate if not.
  */
object AsOfJoin {

  /** Left-as-of join: every left row + the payload of the nearest right
    * row with the same key and strictly earlier time (or strictly later
    * with `forward = true` — only the time sort direction flips; the
    * left-before-right tie rule keeps both directions strict).
    *
    * @param right unique per (key, time); payload columns = all except key/time
    */
  def asofStrict(left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      forward: Boolean = false): DataFrame = {
    val payloadCols = right.columns.filter(c => c != key && c != rightTime).toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(col(rightTime).as("t") +: payloadCols.map(col): _*).schema.fields)))
    val r = right
      .select(col(key), col(rightTime).as("__t"),
        struct(col(rightTime).as("t") +: payloadCols.map(col): _*).as("__payload"))
      .withColumn("__is_left", lit(0))
    val unioned = l.select((col(key) +: left.columns.filterNot(_ == key).map(col)
        :+ col("__t") :+ col("__is_left") :+ col("__payload")).toIndexedSeq: _*)
      .unionByName(r.select((col(key) +: left.columns.filterNot(_ == key)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("__t") :+ col("__is_left") :+ col("__payload")).toIndexedSeq: _*))
    // left rows sort BEFORE right rows at equal time => strict match only
    val tOrd = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(key).orderBy(tOrd, desc("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__t", "__is_left", "__payload")
  }

  val defs: Seq[QueryDef] = Seq(
    // AJ1: per order, the customer's most recent PRIOR order day and its
    // stats. Right side pre-aggregated to unique (custkey, orderdate) so
    // the as-of match is well-defined in both engines.
    QueryDef.sql("aj1_prev_order_asof",
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, COUNT(*) AS n_that_day,
        |         MAX(o_totalprice) AS max_that_day
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT l.o_orderkey, l.o_custkey, l.o_orderdate,
        |       r.o_orderdate AS prev_date, r.n_that_day AS prev_n,
        |       r.max_that_day AS prev_max_price
        |FROM orders l ASOF LEFT JOIN r
        |  ON l.o_custkey = r.o_custkey AND l.o_orderdate > r.o_orderdate
        |ORDER BY l.o_orderkey""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      val right = orders.groupBy("o_custkey", "o_orderdate")
        .agg(count(lit(1)).as("n_that_day"),
          max(col("o_totalprice")).as("max_that_day"))
      val joined = asofStrict(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        right, "o_custkey", "o_orderdate", "o_orderdate")
      joined.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("__match.t").as("prev_date"),
          col("__match.n_that_day").as("prev_n"),
          col("__match.max_that_day").as("prev_max_price"))
        .orderBy("o_orderkey")
    },

    // AJ2: the forward direction — nearest strictly-LATER order day per
    // customer (lead-time analysis shape). Same one-shuffle plan.
    QueryDef.sql("aj2_next_order_asof",
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, COUNT(*) AS n_that_day
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT l.o_orderkey, l.o_custkey, l.o_orderdate,
        |       r.o_orderdate AS next_date, r.n_that_day AS next_n
        |FROM orders l ASOF LEFT JOIN r
        |  ON l.o_custkey = r.o_custkey AND l.o_orderdate < r.o_orderdate
        |ORDER BY l.o_orderkey""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      val right = orders.groupBy("o_custkey", "o_orderdate")
        .agg(count(lit(1)).as("n_that_day"))
      val joined = asofStrict(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        right, "o_custkey", "o_orderdate", "o_orderdate", forward = true)
      joined.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("__match.t").as("next_date"),
          col("__match.n_that_day").as("next_n"))
        .orderBy("o_orderkey")
    }
  )
}
