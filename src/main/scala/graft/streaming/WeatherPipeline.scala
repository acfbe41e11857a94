package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.enrich.WeatherEnrich
import graft.schema.Schemas

/** The reference's streaming topology (SURVEY.md §2.10 ST1-ST8),
  * Spark-first: one logical enrichment DAG fanned out to three sinks
  * (console debug projection, enriched store, filtered alerts), each an
  * independent checkpointed StreamingQuery in append mode — exactly-once
  * to the file sinks via the `_spark_metadata` commit protocol.
  *
  * The DAG is stateless (parse→cast→enrich→filter/project): no
  * watermark needed, no state store, map-only per micro-batch — at any
  * scale each batch is one narrow codegen stage per source partition.
  * [[windowedStats]] is the stateful extension (tumbling window +
  * watermark) and [[Sessionize]] the custom-state one.
  */
object WeatherPipeline {

  /** Kafka source option surface (S1/ST8 parity) as a pure, validated
    * map — split out so CI can fail on a typo'd or contradictory option
    * set without a broker or even the kafka connector jar on the
    * classpath (the sandbox has neither; `.load()` is the first point
    * that needs them). Keys match the Spark Kafka source contract:
    * `kafka.`-prefixed options go to the Kafka consumer, the rest to
    * the source itself.
    */
  def kafkaOptions(bootstrap: String, topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None): Map[String, String] = {
    require(bootstrap.trim.nonEmpty, "kafka.bootstrap.servers must be non-empty")
    require(topic.trim.nonEmpty, "subscribe topic must be non-empty")
    // -1 limit: a bare split drops trailing empty fields, letting
    // 'topic,' through
    require(!topic.contains(",") || topic.split(",", -1).forall(_.trim.nonEmpty),
      s"malformed topic list: '$topic'")
    // per Kafka source contract: latest, earliest, or a JSON map of
    // per-partition offsets
    require(Set("latest", "earliest")(startingOffsets) ||
      startingOffsets.trim.startsWith("{"),
      s"startingOffsets must be latest/earliest or a JSON offset map, got '$startingOffsets'")
    // rate control (ST8): caps a micro-batch after downtime, so catch-up
    // is bounded batches rather than one giant batch that OOMs
    maxOffsetsPerTrigger.foreach(n =>
      require(n > 0, s"maxOffsetsPerTrigger must be positive, got $n"))
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets) ++
      maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString)
  }

  /** Kafka source (S1 parity): value bytes carry Schema-A JSON. */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .options(kafkaOptions(bootstrap, topic))
      .load()

  /** The enrichment DAG over any raw frame bearing a `value` column
    * (binary or string JSON) — batch and streaming alike.
    */
  def enriched(raw: DataFrame): DataFrame = WeatherEnrich.pipeline(raw)

  /** Start the 3-sink fan-out. Each query re-reads the source
    * independently (the reference's topology); for a shared single read
    * use [[startForeachBatch]].
    */
  def start(raw: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): Seq[StreamingQuery] = {
    val e = enriched(raw)
    val console = WeatherEnrich.consoleProjection(e).writeStream
      .outputMode("append").format("console")
      .option("truncate", value = false)
      .option("checkpointLocation", s"$checkpointDir/console")
      .trigger(trigger).start()
    val store = e.writeStream
      .outputMode("append").format("parquet")
      .option("path", s"$outDir/weather_enriched")
      .option("checkpointLocation", s"$checkpointDir/enriched")
      .trigger(trigger).start()
    val alerts = WeatherEnrich.alerts(e).writeStream
      .outputMode("append").format("parquet")
      .option("path", s"$outDir/weather_alerts")
      .option("checkpointLocation", s"$checkpointDir/alerts")
      .trigger(trigger).start()
    Seq(console, store, alerts)
  }

  /** Single-read fan-out: one StreamingQuery, one source scan per batch,
    * three batch writes inside foreachBatch (source-read sharing the
    * reference lacks; preferable when the source is the bottleneck).
    *
    * foreachBatch is at-least-once by itself (a crash between the write
    * and the epoch commit replays the batch), so each write targets a
    * per-batch directory with overwrite — the replay overwrites the same
    * files instead of appending duplicates (idempotent ⇒ exactly-once
    * end-to-end). Readers scan the parent directory.
    */
  def startForeachBatch(raw: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    enriched(raw).writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpointDir/shared")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        b.write.mode("overwrite")
          .parquet(s"$outDir/weather_enriched/batch=$batchId")
        WeatherEnrich.alerts(b).write.mode("overwrite")
          .parquet(s"$outDir/weather_alerts/batch=$batchId")
        b.unpersist()
        ()
      }
      .start()

  /** Keyed UPSERT sink (latest-wins materialized view) via foreachBatch:
    * each micro-batch merges into a parquet store keeping only the
    * newest row per key, published through [[graft.sinks.VersionedStore]]
    * — a fresh immutable version dir plus a single-object pointer flip,
    * the same commit shape an Iceberg/Delta MERGE uses, and safe on
    * object stores where directory renames are non-atomic. Replays
    * (foreachBatch is at-least-once) converge to the same store instead
    * of appending duplicates: merge is idempotent by construction, and a
    * crash before the pointer flip leaves the previous version live. On
    * a real deployment the store is additionally partitioned/bucketed by
    * key so the rewrite touches only changed partitions instead of the
    * whole table. Read the store with `VersionedStore.read`.
    */
  def startUpsertLatest(enriched: DataFrame, storeDir: String, checkpointDir: String,
      key: Seq[String] = Seq("city_name"), tsCol: String = "timestamp_dt",
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    enriched.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpointDir/upsert")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(storeDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // A store written by the pre-versioned rename-swap protocol has
        // its parquet directly at the root (no pointer) — merge against
        // THOSE files rather than silently starting from empty, which
        // would publish a store containing only this batch's keys.
        def legacyFiles: Seq[org.apache.hadoop.fs.Path] =
          if (!fs.exists(new org.apache.hadoop.fs.Path(storeDir))) Seq.empty
          else fs.listStatus(new org.apache.hadoop.fs.Path(storeDir))
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
            .map(_.getPath).toSeq
        // resolve, then repair: a lost/corrupt LATEST pointer with
        // surviving version dirs must NOT read as "empty store" — that
        // would publish only this batch's keys and prune every prior
        // version (silent permanent loss of all previously upserted
        // keys). Same resolution order as Compaction.compact.
        val resolved = graft.sinks.VersionedStore.resolve(spark, storeDir)
          .orElse(graft.sinks.VersionedStore.repair(spark, storeDir))
        val legacy = if (resolved.isEmpty) legacyFiles else Seq.empty
        val existing = resolved
          .map(v => spark.read.parquet(v.toString))
          .orElse(if (legacy.nonEmpty)
            Some(spark.read.parquet(legacy.map(_.toString): _*)) else None)
          .getOrElse(batch.limit(0))
        val dataCols = batch.columns.toSeq
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(key.map(col): _*)
          // batch rows outrank store rows on ts ties => updates win;
          // the content-hash tiebreak makes same-key-same-ts rows
          // WITHIN a batch resolve identically on every replay
          // (row_number over an ambiguous order would flip-flop).
          .orderBy(col(tsCol).desc, col("__src").asc,
            xxhash64(dataCols.map(col): _*).asc)
        val merged = batch.withColumn("__src", lit(0))
          .unionByName(existing.withColumn("__src", lit(1)))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", "__src")
        // existing is consumed inside the write (before the flip prunes
        // the version it reads from)
        graft.sinks.VersionedStore.publish(spark, storeDir) { out =>
          merged.write.parquet(out)
        }
        // Sweep ALL stray root-level parquet, not just the ones merged
        // this batch: when `resolved` was defined, any root files are
        // known-merged leftovers from a crash between a previous
        // publish and its delete — left in place they'd poison a later
        // repair/migration (stale pre-merge data becoming live).
        legacyFiles.foreach(fs.delete(_, false))
        ()
      }
      .start()

  /** Streaming dedup-on-ingest (the dedup family's streaming form):
    * drop records whose content hash was already seen, with state
    * bounded by the event-time watermark — dedup WITHIN a recency
    * horizon whose state doesn't grow forever. For corpus-LIFETIME
    * dedup (no horizon), executor state is the wrong home for the seen
    * set; that is [[StreamDedup]], which keeps it in a disk store and
    * screens each batch with an anti-join.
    */
  def dedupedStream(enriched: DataFrame, watermark: String = "1 hour"): DataFrame =
    enriched
      // null-preserving hash: concat_ws would SKIP nulls, colliding
      // ("X", null, 5) with ("X", "5", null); coalesce to a sentinel
      .withColumn("content_hash",
        md5(concat(
          coalesce(col("city_name"), lit("\u0000")), lit("|"),
          coalesce(col("timestamp"), lit("\u0000")), lit("|"),
          coalesce(col("temperature").cast("string"), lit("\u0000")))))
      .withWatermark("timestamp_dt", watermark)
      // dropDuplicates without the event-time column in the key would
      // keep state FOREVER; the WithinWatermark variant evicts entries
      // once the watermark passes them
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-stream interval join (ST extension beyond the reference):
    * enriched observations joined to a second live stream of city-level
    * status updates within ±`slack` of event time. Both inputs carry
    * watermarks AND the join predicate bounds event-time distance —
    * that pair is what lets Spark evict join state; an unbounded
    * stream-stream join would buffer both streams forever, which no
    * 100 TB/day deployment survives.
    */
  def joinWithStatus(enriched: DataFrame, status: DataFrame,
      watermark: String = "10 minutes", slack: String = "5 minutes"): DataFrame = {
    val obs = enriched.withWatermark("timestamp_dt", watermark)
    val st = status.withWatermark("status_ts", watermark)
    obs.join(st,
        obs("city_name") === st("status_city") &&
          st("status_ts") >= obs("timestamp_dt") - expr(s"INTERVAL $slack") &&
          st("status_ts") <= obs("timestamp_dt") + expr(s"INTERVAL $slack"))
      .select(obs("city_name"), col("timestamp_dt"), col("temperature"),
        col("status"), col("status_ts"))
  }

  /** Stateful extension (ST3-ST4): tumbling-window per-city aggregates
    * with a watermark bounding state. Append mode — rows emit once the
    * watermark passes the window end.
    */
  def windowedStats(enriched: DataFrame,
      window: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    enriched
      .withWatermark("timestamp_dt", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("timestamp_dt"), window),
        col("city_name"))
      .agg(count(lit(1)).as("n"),
        avg(col("temperature")).as("avg_temp"),
        max(col("wind_speed_num")).as("max_wind"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("city_name"), col("n"), col("avg_temp"), col("max_wind"))
}
