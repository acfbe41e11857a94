package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.TextOps

/** d7b's threshold-overlap decontamination run AT INGEST: every
  * micro-batch of incoming documents is screened against the broadcast
  * benchmark-window fixture in the same trigger that lands it, and the
  * flagged (doc, bench item) verdicts are appended to a store — a
  * contaminated document is known BEFORE anything downstream trains on
  * it, instead of at the next batch decontamination sweep.
  *
  * The screen core is single-sourced from the oracled batch operator
  * ([[TextOps.d7bVerdicts]]): one narrow window-hash projection per
  * batch, bench windows broadcast at both joins. A document's verdict
  * depends only on that document and the fixed bench fixture, so the
  * result is batch-cut independent by construction, and StreamingSpec
  * holds the served store equal to the batch query's verdicts on the
  * same corpus.
  *
  * Store discipline is StreamRollup's: per-batch verdicts are written
  * to a batchId-keyed dir (`verdicts_b<id>`, mode overwrite) — a
  * replayed batch rewrites the SAME dir with the SAME deterministic
  * content, so at-least-once foreachBatch converges to exactly-once
  * store contents. Store rows are flagged pairs only (contamination is
  * rare by construction), orders of magnitude smaller than the stream.
  */
object StreamDecontam {

  /** Start the at-ingest screen over a stream with (doc_id, text)
    * columns. `benchWindows` is the (bench_id, h) fixture from
    * [[TextOps.d7bBenchWindows]] — bounded; callers materialize it
    * once (cache/localCheckpoint) before starting the query.
    */
  def start(source: DataFrame, benchWindows: DataFrame, storeDir: String,
      checkpointDir: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.select(col("doc_id"), split(col("text"), " ").as("ws"))
        TextOps.d7bVerdicts(sp, benchWindows)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$storeDir/verdicts_b$batchId")
        ()
      }
      .start()

  /** The stored verdicts across all ingested batches. */
  def serve(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(s"$storeDir/verdicts_b*")
}
