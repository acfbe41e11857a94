package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every module's [[QueryDef]]s into the flat `queries` /
  * `oracleSql` maps the driver consumes.
  */
object SparkEntry {

  /** All registered engine queries, module by module. */
  def allDefs: Seq[QueryDef] =
    analytics.EventWeather.defs ++ analytics.Dashboard.defs ++
      analytics.TpchOps.defs ++ operators.TextOps.defs ++
      operators.MinHash.defs ++ operators.DedupCluster.defs ++
      operators.IncrementalDedup.defs ++ operators.Chunking.defs ++
      operators.SortedNeighborhood.defs ++ operators.ZOrder.defs ++
      operators.CorpusPrep.defs ++ operators.Retrieval.defs ++
      operators.SnapshotDiff.defs ++
      operators.Audit.defs ++
      operators.VectorOps.defs ++
      operators.Multimodal.defs ++ operators.AsOfJoin.defs ++
      operators.SkewJoin.defs ++ operators.Rollup.defs ++
      operators.CompactionPlan.defs ++
      analytics.ScaleOps.defs ++ analytics.BatchSessionOps.defs ++
      analytics.FuncOps.defs ++ analytics.FuncOps2.defs ++
      analytics.ProductAnalytics.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.EventWeather.enriched(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val names = allDefs.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    allDefs.map(q => q.name -> q.fn).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
