package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual complement to AQE's
  * runtime skew-split (spark.sql.adaptive.skewJoin, on by default in
  * [[graft.Sessions]]). Use when a known hot key would otherwise pin one
  * reducer at 100 TB: the left (skewed) side gets a random salt in
  * [0, factor), the right side is replicated `factor` times, and the
  * join key becomes (key, salt) — spreading each hot key over `factor`
  * reducers at the cost of `factor`× the right side's shuffle volume
  * (so keep the replicated side the smaller one).
  */
object SkewJoin {

  /** Inner equi-join of `left` (skewed) with `right` (small enough to
    * replicate `factor`×) on `key`. Deterministic salting via a hash of
    * a unique left column would also work; random salt is fine because
    * the salt never affects results, only placement.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt", (rand(42) * factor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  val defs: Seq[graft.QueryDef] = Seq(
    // SKEW1: the salted join inside the oracle gate — results must be
    // identical to the plain join the oracle computes (the salt spreads
    // placement, never changes the relation).
    graft.QueryDef.sql("skew1_salted_join",
      s"""SELECT o_orderstatus, COUNT(*) AS n_items,
        |       ${graft.Exact.moneySumSql("l_extendedprice")} AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      val li = graft.sources.Tables.lineitem(s, d)
      // project BEFORE replicating: saltedJoin shuffles the right side
      // factor× — every column dropped here is paid for 4× less
      val o = graft.sources.Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      // The final aggregate is algebraic (count + exact decimal sum), so
      // push a partial aggregate below the join: lineitem collapses to
      // one row per l_orderkey BEFORE being salted and joined against the
      // factor×-replicated orders — ~4× less join input and shuffle
      // volume, and the per-key partials re-combine exactly (decimal
      // addition is order-free). Same pattern as j5 (TpchOps).
      val liAgg = li.groupBy("l_orderkey")
        .agg(count(lit(1)).as("__cnt"),
          sum(col("l_extendedprice").cast("decimal(28,10)")).as("__price"))
      saltedJoin(liAgg, o, "l_orderkey", factor = 4)
        .groupBy("o_orderstatus")
        .agg(sum(col("__cnt")).as("n_items"),
          (round(sum(col("__price")) * 100, 0).cast("long") / lit(100.0))
            .as("revenue"))
        .orderBy("o_orderstatus")
    }
  )
}
