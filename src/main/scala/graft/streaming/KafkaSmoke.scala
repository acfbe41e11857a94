package graft.streaming

import org.apache.spark.sql.streaming.Trigger

/** Real-broker smoke run, gated OFF by default — closes the one
  * environment-bound gap in the S1 story (the sandbox has no broker and
  * no kafka connector jar, so WeatherPipeline's production path is
  * otherwise exercised through ServiceLoader resolution with a test
  * double; see FakeKafkaProvider in the test tree). The day an
  * environment provides a broker, this main is the zero-code-change
  * proof: it runs the reference's full 3-sink topology (console +
  * checkpointed enriched parquet + filtered alerts parquet; reference
  * spark-apps/weather_streaming.py:48-177) against the real connector
  * for a bounded window, then reports what landed.
  *
  * Usage (NEVER run by CI — it exits immediately unless the env is set):
  *   SPARK_GRAFT_KAFKA=host:9092 [SPARK_GRAFT_KAFKA_TOPIC=weather-data]
  *   [SPARK_GRAFT_KAFKA_SECONDS=30] sbt "runMain graft.streaming.KafkaSmoke <outDir>"
  *
  * Requires the spark-sql-kafka connector jar on the classpath (not in
  * this sandbox's /opt/spark/jars) — `.load()` is the first point that
  * needs it, and the failure is a clean ClassNotFound naming the jar.
  */
object KafkaSmoke {
  def main(args: Array[String]): Unit = {
    val broker = sys.env.getOrElse("SPARK_GRAFT_KAFKA", "")
    if (broker.isEmpty) {
      println("[kafka-smoke] SPARK_GRAFT_KAFKA not set — skipping (this is the default)")
      return
    }
    val topic = sys.env.getOrElse("SPARK_GRAFT_KAFKA_TOPIC", "weather-data")
    val seconds = sys.env.getOrElse("SPARK_GRAFT_KAFKA_SECONDS", "30").toInt
    val outDir = args.lift(0).getOrElse("/tmp/graft_kafka_smoke")
    val spark = graft.Sessions.local(appName = "graft-kafka-smoke")

    // earliest + a trigger cap: a smoke run must terminate even against
    // a pre-loaded topic, in bounded micro-batches (ST8 rate control)
    val raw = spark.readStream.format("kafka")
      .options(WeatherPipeline.kafkaOptions(broker, topic,
        startingOffsets = "earliest", maxOffsetsPerTrigger = Some(10000L)))
      .load()
    val queries = WeatherPipeline.start(raw, s"$outDir/out", s"$outDir/cp",
      trigger = Trigger.ProcessingTime(1000))
    Thread.sleep(seconds * 1000L)
    queries.foreach(_.stop())

    val enriched = spark.read.parquet(s"$outDir/out/weather_enriched").count()
    val alerts = spark.read.parquet(s"$outDir/out/weather_alerts").count()
    println(s"""{"metric":"kafka_smoke","broker":"$broker","topic":"$topic",""" +
      s""""enriched_rows":$enriched,"alert_rows":$alerts}""")
    require(enriched > 0, "smoke run ingested zero rows — is the topic populated?")
    spark.stop()
  }
}
