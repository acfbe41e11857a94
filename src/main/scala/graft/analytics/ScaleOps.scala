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
    // Projected to scalar columns (not array<double>) so the driver's
    // rows-only comparator can sort/load the output.
    QueryDef.rowsOnly("scale_approx_quantiles") { (s, d) =>
      Tables.events(s, d).groupBy("event_type")
        .agg(percentile_approx(col("value"), array(lit(0.25), lit(0.5), lit(0.75)),
          lit(10000)).as("quartiles"))
        .select(col("event_type"),
          element_at(col("quartiles"), 1).as("q1"),
          element_at(col("quartiles"), 2).as("median"),
          element_at(col("quartiles"), 3).as("q3"))
        .orderBy("event_type")
    },

    // Partition pruning: day-partitioned layout + day filter => the
    // scan reads exactly one partition (asserted in OpsSpec). The
    // result equals a filtered scan of the unpartitioned table, which
    // is what the oracle computes.
    QueryDef.sql("scale_partition_pruning",
      """SELECT event_type, COUNT(*) AS n
        |FROM events
        |WHERE CAST(ts AS DATE) = DATE '2024-01-05'
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      partitionedEventsScan(s, d)
    },

    // Bucketed co-located join: orders and lineitem bucketed on the join
    // key at write time => the join plans with ZERO shuffle exchanges
    // (asserted in OpsSpec). At 100 TB this is the difference between
    // re-shuffling 100 TB per join and none at all for the fact-fact
    // join every pipeline repeats. Result-identical to the plain join,
    // which is what the oracle computes.
    QueryDef.sql("scale_bucketed_join",
      s"""SELECT o_orderpriority, COUNT(*) AS n_items,
        |       ${graft.Exact.moneySumSql("l_extendedprice")} AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      bucketedOrdersLineitem(s, d)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          graft.Exact.moneySum(col("l_extendedprice")).as("total_price"))
        .orderBy("o_orderpriority")
    }
  )

  /** Day-partitioned events + a one-day filter: the scan must prune to
    * a single partition (PartitionFilters in the plan; OpsSpec asserts
    * partitions-read == 1). The write side is hive-style
    * `partitionBy(day)` — the layout every 100 TB event store uses so
    * time-ranged queries touch only their slice.
    */
  def partitionedEventsScan(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    // sf-keyed base + source fingerprint: an artifact from one scale
    // factor (or a regenerated source at the same path) must never be
    // served for another. VersionedStore publishes via immutable
    // version dir + atomic single-object pointer flip — object-store-
    // safe (no directory rename), and readers never see a half-written
    // layout: the pointer only ever names a completed write.
    graft.sinks.VersionedStore.corpusArtifact(s, d, "events_by_day",
      srcTable = "events") { out =>
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .write.partitionBy("day").parquet(out)
    }
      .filter(col("day") === "2024-01-05")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Write orders+lineitem bucketed by orderkey (once per JVM/warehouse)
    * and return the co-located join — no Exchange in the plan.
    */
  def bucketedOrdersLineitem(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val buckets = 16
    // Table names are sf-keyed so one session (or a reused warehouse)
    // can never serve another scale factor's buckets.
    val sf = new java.io.File(d).getName.replace('.', '_')
    val ordersT = s"orders_b_$sf"
    val lineitemT = s"lineitem_b_$sf"
    // In-memory catalog: a fresh session doesn't know tables written by
    // a previous one, and saveAsTable refuses a stale managed location —
    // drop the leftover directory before (re)creating.
    def ensure(table: String, write: => Unit): Unit =
      if (!s.catalog.tableExists(table)) {
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        write
      }
    ensure(ordersT, Tables.orders(s, d)
      .write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable(ordersT))
    ensure(lineitemT, Tables.lineitem(s, d)
      .write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable(lineitemT))
    s.table(lineitemT).join(s.table(ordersT),
      col("l_orderkey") === col("o_orderkey"))
  }
}
