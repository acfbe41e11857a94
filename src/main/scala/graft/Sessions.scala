package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-aware defaults: AQE on (runtime
  * coalescing + skew-join splitting), shuffle partitions sized to the
  * local core count (on a real cluster this becomes cores×executors; AQE
  * coalesces down), UTC pinned for oracle parity.
  */
object Sessions {
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      // engine-native SQL functions (cosine_sim/_q) injected at session
      // build — the path a production deployment configures
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
      // reader rejects; read as long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Reference semantics are Spark 3.5 pre-ANSI: invalid cast => null.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-query progress + batch-action metrics (the reference's
    // Prometheus/JMX signal, engine-side) — idempotent per session
    graft.observe.Metrics.register(spark)
    spark
  }
}
