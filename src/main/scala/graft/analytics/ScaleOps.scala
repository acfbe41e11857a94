package graft.analytics

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Scale-path variants of exact operators: the approximate sketches a
  * 100 TB deployment reaches for when exact answers stop being worth a
  * full shuffle. Estimates are engine-specific, so these are rows-only
  * checked (the exact twins a2/a8 are the oracled anchors); the tests
  * bound their error against the exact values.
  */
object ScaleOps {
  val defs: Seq[QueryDef] = Seq(

    // HLL++ distinct: one pass, no shuffle of distinct values, mergeable
    // partials — the 100 TB form of a2_count_distinct.
    QueryDef.rowsOnly("scale_approx_distinct") { (s, d) =>
      Tables.events(s, d).agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        approx_count_distinct(col("event_type")).as("approx_types"))
    },

    // t-digest quantiles: mergeable sketch vs a8's exact per-group sort.
    QueryDef.rowsOnly("scale_approx_quantiles") { (s, d) =>
      Tables.events(s, d).groupBy("event_type")
        .agg(percentile_approx(col("value"), array(lit(0.25), lit(0.5), lit(0.75)),
          lit(10000)).as("quartiles"))
        .orderBy("event_type")
    }
  )
}
