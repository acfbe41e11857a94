package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming throughput bench — the one BASELINE.md dimension the batch
  * bench ignores: the reference's only published perf anchors are its
  * micro-batch cadence (18.6 s/batch at a 2 records/minute source,
  * reference spark-output/_spark_metadata/0-1). This main drives the
  * same enrich DAG ([[graft.streaming.WeatherPipeline.enriched]])
  * through a MemoryStream into a real checkpointed parquet file sink —
  * the reference's sink shape — for N batches of M synthetic Schema-A
  * records, then reports rows/s and trigger latency straight from
  * [[graft.observe.Metrics.streamSnapshot]] (the same numbers a
  * Prometheus scrape of [[graft.observe.Prometheus]] would graph).
  *
  * Prints ONE short JSON line last (driver tail-window contract, same
  * as [[Bench]]); the full per-dimension line goes first and to
  * BENCH_STREAM.json.
  */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "20000").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "10").toInt
    val spark = Sessions.local(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), appName = "graft-bench-stream")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-bench-stream").toString
    val in = MemoryStream[String]
    val q = graft.streaming.WeatherPipeline.enriched(in.toDF())
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/cp")
      .queryName("bench_enriched")
      .start()

    // Schema-A JSON, one record per (city, minute) — enough key/time
    // variance that enrichment CASE branches and casts all execute.
    def batch(b: Int): Seq[String] = (0 until rowsPerBatch).map { i =>
      val epoch = 1700000000L + b * 3600L + i
      val temp = (i % 55) - 10 + (b % 3) * 0.5
      s"""{"date":"d","weather_description":"clear","latitude":"${i % 90}","pression":"${990 + i % 40}",""" +
        s""""humidité":"${30 + i % 60}","feels_like":"${temp - 1}","city_name":"c${i % 997}","local_time":"t",""" +
        s""""min_temp":"${temp - 2}","wind_speed":"${i % 30 / 2.0}","température":"$temp","max_temp":"${temp + 2}",""" +
        s""""timestamp":"$epoch","longitude":"${i % 180}"}"""
    }

    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      in.addData(batch(b))
      q.processAllAvailable()
    }
    val wallSec = (System.nanoTime() - t0) / 1e9
    q.stop()

    val prog = graft.observe.Metrics.streamSnapshot
      .filter(p => p.queryName == "bench_enriched" && p.numInputRows > 0)
    val rows = prog.map(_.numInputRows).sum
    val activeMs = prog.map(_.triggerDurationMs).sum
    val meanTriggerMs = if (prog.isEmpty) -1.0 else activeMs.toDouble / prog.size
    val maxTriggerMs = if (prog.isEmpty) -1L else prog.map(_.triggerDurationMs).max
    val rpsWall = rows / wallSec
    val rpsActive = if (activeMs > 0) rows * 1000.0 / activeMs else -1.0
    val full =
      s"""{"metric":"stream_rows_per_sec","value":$rpsWall,"unit":"rows/sec",""" +
        s""""rows":$rows,"batches":${prog.size},"wall_sec":$wallSec,""" +
        s""""rows_per_sec_active":$rpsActive,"mean_trigger_ms":$meanTriggerMs,""" +
        s""""max_trigger_ms":$maxTriggerMs}"""
    println(full)
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_STREAM.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
    println(s"""{"metric":"stream_rows_per_sec","value":$rpsWall,"unit":"rows/sec"}""")
  }
}
