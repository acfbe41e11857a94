package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Sessions
import graft.sources.Tables

/** Runnable end-to-end streaming demo (no Kafka needed): file-streams
  * the `events` table, wraps each row as a Schema-A JSON `value` (the
  * exact Kafka wire shape, French field names included), and runs the
  * 3-sink pipeline with Trigger.AvailableNow — process everything,
  * checkpoint, exit.
  *
  * Usage: runMain graft.streaming.StreamDemo [sfDir] [outDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // Namespace everything (staging, sinks, checkpoints) by sf: rerun of
    // the same sf = exactly-once resume; a different sf = an independent
    // clean pipeline rather than a checkpoint/source mismatch.
    val outDir = s"${args.lift(1).getOrElse("target/stream_demo")}/" +
      new java.io.File(sfDir).getName
    val spark = Sessions.local(appName = "graft-stream-demo")

    // File source needs a declared schema: reuse the batch loader's.
    val batchEvents = Tables.events(spark, sfDir)
    // File-stream source needs a directory: stage the events table into
    // one (a real deployment would point at the landing directory).
    val srcDir = s"$outDir/source_events"
    // Stage once, gated on the _SUCCESS marker: a bare exists/"ignore"
    // check would trust a partial directory left by a crashed prior run
    // and silently stream a truncated source. Overwriting an INTACT dir
    // is also wrong — new part filenames read as NEW data to the file
    // stream, so a rerun would re-append. Complete ⇒ reuse (rerun =
    // checkpoint resume = no-op); incomplete ⇒ delete + restage.
    val srcPath = new org.apache.hadoop.fs.Path(srcDir)
    val srcFs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!srcFs.exists(new org.apache.hadoop.fs.Path(srcPath, "_SUCCESS"))) {
      if (srcFs.exists(srcPath)) srcFs.delete(srcPath, true)
      spark.read.parquet(s"$sfDir/events.parquet").write.parquet(srcDir)
    }
    val stream = Tables.normalizeTs(spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir))
    // events -> Schema-A wire JSON (the adapter the NiFi flow plays in
    // the reference): every value a flat all-string JSON object.
    val raw = stream.select(to_json(struct(
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("date"),
      lit("overcast clouds").as("weather_description"),
      lit("33.59").as("latitude"),
      (lit(960) + col("user_id") % 100).cast("string").as("pression"),
      get_json_object(col("props"), "$.k").as("humidité"),
      lit("0").as("feels_like"),
      col("event_type").as("city_name"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("local_time"),
      lit("0").as("min_temp"),
      (col("value") % 60.0).cast("string").as("wind_speed"),
      (col("value") % 50.0).cast("string").as("température"),
      lit("0").as("max_temp"),
      unix_timestamp(col("ts")).cast("string").as("timestamp"),
      lit("-7.61").as("longitude"))).as("value"))

    val queries = WeatherPipeline.start(raw, outDir, s"$outDir/checkpoints",
      Trigger.AvailableNow())
    queries.foreach(_.awaitTermination())
    val n = spark.read.parquet(s"$outDir/weather_enriched").count()
    val alerts = spark.read.parquet(s"$outDir/weather_alerts").count()
    println(s"""{"streamed_rows":$n,"alerts":$alerts,"batch_rows":${batchEvents.count()}}""")
    spark.stop()
  }
}
