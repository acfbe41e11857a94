package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the testbed's parquet tables (TESTDATA.md). All reads go
  * through here so scan options (and, on a real cluster, catalog/bucket
  * metadata) live in one place. Parquet scans are columnar + pushdown-
  * capable: Catalyst pushes filters and prunes columns into the scan, so
  * callers should never pre-materialize.
  */
object Tables {
  /** Per-process schema catalog: the parquet footer schema per table
    * path. Every bare `spark.read.parquet` call pays a 1-task
    * schema-inference job BEFORE the actual scan, and the bench
    * re-builds each query's frame 4 times — r18 profiles showed these
    * footer jobs (~25-45 ms + driver gap each) on virtually every
    * query. The testbed tables are immutable input for the life of a
    * process, so the schema is catalog METADATA (what a production
    * deployment keeps in its metastore/manifest, and the same class
    * as Spark's own filesourcePartitionFileCache) — cached per path,
    * inferred once. Row data is still read from parquet on every
    * scan; nothing derived from row content is stored. Bounded driver
    * state: one StructType per distinct table path touched.
    */
  private val schemaCatalog = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.sql.types.StructType]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema =
      schemaCatalog.getOrElseUpdate(path, spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** Normalize an events-shaped frame's `ts` to TimestampType across the
    * testbed generations: TIMESTAMP(NANOS) parquet reads as a nanos long
    * (via spark.sql.legacy.parquet.nanosAsLong — µs-precision data, so
    * `div 1000` is exact), TIMESTAMP(MICROS, isAdjustedToUTC=false) reads
    * as TIMESTAMP_NTZ (cast is exact under the pinned UTC session zone),
    * and an already-TimestampType column passes through.
    */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every testbed table as a temp view, so the engine's full
    * surface is reachable from plain `spark.sql` (with the native
    * functions injected by GraftExtensions) without any Scala loader
    * calls — the catalog a SQL-only user expects. `events` goes through
    * its nanos→µs timestamp conversion.
    */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(n => table(s, d, n).createOrReplaceTempView(n))
    events(s, d).createOrReplaceTempView("events")
  }
}
