package graft.analytics

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Scale-path variants of exact operators: the approximate sketches a
  * 100 TB deployment reaches for when exact answers stop being worth a
  * full shuffle. Estimates are engine-specific, so the DRIVER-visible
  * contract is a bound VERDICT row: each query reports the exact value
  * (oracled — a2/a8's SQL) plus a boolean asserting the sketch landed
  * inside its published error bound, computed Spark-side and oracled as
  * the constant TRUE. A sketch that drifts out of bound flips the
  * boolean and fails the hash compare — the ledger sees sketch quality,
  * not just "rows came back". OpsSpec additionally bounds the raw
  * estimates against the exact twins.
  */
object ScaleOps {
  val defs: Seq[QueryDef] = Seq(

    // HLL++ distinct: one pass, no shuffle of distinct values, mergeable
    // partials — the 100 TB form of a2_count_distinct. Bound: HLL++'s
    // published relative standard deviation (rsd) is the configured
    // 0.02 / default 0.05; the verdict gates at 3·rsd (a >3σ estimate
    // is a broken sketch, not noise). Exact and estimate ride ONE agg
    // pass — at 100 TB the exact side is the optional cost, but the
    // verdict row's job is to certify the sketch against it.
    // CAVEAT (applies to every bound-verdict row here): rsd is a
    // standard deviation over datasets, not a per-dataset guarantee —
    // the estimate is DETERMINISTIC for a given dataset, so a specific
    // corpus can sit past 3σ permanently, flipping the oracled TRUE
    // into a hash-compare failure that no rerun clears and that reads
    // as "broken sketch" when it's "unlucky dataset". If a bound
    // verdict fails on a NEW corpus, first check the raw error margin:
    // retune the multiplier (3→4-5·rsd — still a meaningful gate,
    // since a genuinely broken sketch is off by far more) before
    // suspecting the sketch. (The GK-quantile row below is different:
    // rank error ≤ n/accuracy is a hard worst-case guarantee, so its
    // gate never needs retuning.) Documented in BENCH_NOTES.md too.
    QueryDef.sql("scale_approx_distinct",
      """SELECT COUNT(DISTINCT event_type) AS n_types,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       TRUE AS types_within_bound,
        |       TRUE AS users_within_bound
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).agg(
          countDistinct(col("event_type")).as("n_types"),
          countDistinct(col("user_id")).as("n_users"),
          approx_count_distinct(col("event_type"), 0.05).as("est_types"),
          approx_count_distinct(col("user_id"), 0.02).as("est_users"))
        .select(col("n_types"), col("n_users"),
          (abs(col("est_types") - col("n_types")).cast("double")
            / col("n_types") <= 0.15).as("types_within_bound"),
          (abs(col("est_users") - col("n_users")).cast("double")
            / col("n_users") <= 0.06).as("users_within_bound"))
    },

    // GK-sketch quantiles (percentile_approx, accuracy 10000) vs a8's
    // exact per-group quantiles. The verdict checks the sketch's ACTUAL
    // guarantee — rank error ≤ n/accuracy — directly: count how many
    // values fall strictly below / at-or-below each estimate and gate
    // |rank − p·n| ≤ n·ε + 2 (the +2 absorbs the discrete-rank edge at
    // small groups, so the verdict is valid at every SF). Values ride
    // as xi = ROUND(value·1000) BIGINT so the exact quantiles
    // interpolate identically in both engines (a8's int-input trick).
    // 100 TB shape: sketch pass is mergeable partials (no sort); the
    // verdict's rank counts join the 5-row estimate table back
    // BROADCAST — the corpus never shuffles for the check.
    QueryDef.sql("scale_approx_quantiles",
      """WITH x AS (SELECT event_type,
        |                  CAST(ROUND(value * 1000, 0) AS BIGINT) AS xi
        |           FROM events)
        |SELECT event_type,
        |       quantile_cont(xi, 0.25) AS q1,
        |       quantile_cont(xi, 0.50) AS median,
        |       quantile_cont(xi, 0.75) AS q3,
        |       TRUE AS within_bound
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("CAST(ROUND(value * 1000, 0) AS BIGINT)").as("xi"))
      val est = ev.groupBy("event_type")
        .agg(percentile_approx(col("xi"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("e"))
        .select(col("event_type"), element_at(col("e"), 1).as("e1"),
          element_at(col("e"), 2).as("e2"), element_at(col("e"), 3).as("e3"))
      def lt(e: String) = sum((col("xi") < col(e)).cast("long"))
      def le(e: String) = sum((col("xi") <= col(e)).cast("long"))
      val v = ev.join(broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          percentile(col("xi"), lit(0.25)).as("q1"),
          percentile(col("xi"), lit(0.50)).as("median"),
          percentile(col("xi"), lit(0.75)).as("q3"),
          lt("e1").as("lt1"), le("e1").as("le1"),
          lt("e2").as("lt2"), le("e2").as("le2"),
          lt("e3").as("lt3"), le("e3").as("le3"))
      val eps = col("n").cast("double") / 10000.0 + 2.0
      def ok(ltC: String, leC: String, p: Double) =
        (col(ltC).cast("double") <= lit(p) * col("n") + eps) &&
          (col(leC).cast("double") >= lit(p) * col("n") - eps)
      v.select(col("event_type"), col("q1"), col("median"), col("q3"),
          (ok("lt1", "le1", 0.25) && ok("lt2", "le2", 0.50) &&
            ok("lt3", "le3", 0.75)).as("within_bound"))
        .orderBy("event_type")
    },

    // Corpus vocabulary size — the distinct-terms HLL dial a tokenizer
    // budget actually consumes (vocab-size estimation at 100 TB is an
    // HLL merge, never a COUNT(DISTINCT) shuffle of the term
    // dictionary; under ScaleBench's junked-copy blowup the vocabulary
    // is the known ~25× stress case). Fourth bound-verdict row: exact
    // n_terms (oracled) + the sketch gated at 3·rsd.
    QueryDef.sql("scale_approx_vocab",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT COUNT(DISTINCT term) AS n_terms,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       TRUE AS within_bound
        |FROM w""".stripMargin) { (s, d) =>
      graft.sources.Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .agg(countDistinct(col("term")).as("n_terms"),
          count(lit(1)).as("n_tokens"),
          approx_count_distinct(col("term"), 0.02).as("est"))
        .select(col("n_terms"), col("n_tokens"),
          (abs(col("est") - col("n_terms")).cast("double")
            / col("n_terms") <= 0.06).as("within_bound"))
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
