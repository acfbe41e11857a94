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
}
