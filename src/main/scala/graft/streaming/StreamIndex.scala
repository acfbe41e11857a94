package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.operators.VectorOps

/** Streaming ANN index ingest — the streaming twin of
  * `VectorOps.appendCodes`: each micro-batch of `(vec_id, embedding)`
  * rows is PQ-encoded against the FROZEN codebook (map-only, no
  * shuffle) and written as a batchId-keyed `delta_b<id>` dir. This is
  * StreamDedup's idempotence discipline applied to the index: encoding
  * is a pure deterministic function of (vector, codebook), so an
  * at-least-once replay of a batch rewrites the SAME dir with the SAME
  * bytes — a vector can never be double-inserted, with no read-back
  * screen needed at all (unlike the dedup stores, nothing here depends
  * on earlier batches). A naive `foreachBatch { appendCodes }` would
  * NOT have this property: replay would union the batch into the
  * versioned table twice.
  *
  * Serving reads [[codes]] — the union of COMPLETE deltas — and plugs
  * it into `adcSearch`/`ivfServe` as their `codes0`. Small-files
  * maintenance between runs is `StreamDedup.foldDeltas(spark, store)`:
  * the fold machinery is content-agnostic (union + distinct over
  * parquet dirs under the same naming scheme), and code rows are
  * distinct by construction. Ownership: the store is claimed by its
  * checkpoint's query id (the shared epoch guard), so a NEW checkpoint
  * whose batch ids restart at 0 is refused instead of clobbering
  * `delta_b0` of an existing index.
  *
  * Codebook discipline at 100 TB: the codebook is trained once and
  * FROZEN for the life of the store (pass the same `books` to every
  * run); retraining invalidates every stored code, so it is a rebuild
  * of a fresh store dir, never an in-place append.
  */
object StreamIndex {

  private val DeltaRe = "delta_b(\\d+)".r

  private def codesSchema: StructType = StructType(
    StructField("vec_id", LongType) +:
      (0 until VectorOps.PqM).map(m => StructField(s"c$m", LongType)))

  /** The index the store currently serves: all COMPLETE (_SUCCESS)
    * delta and fold dirs. Empty-but-typed before the first commit.
    */
  def codes(spark: SparkSession, storeDir: String): DataFrame = {
    val base = new Path(storeDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(base)) Seq.empty[String]
      else fs.listStatus(base).toSeq.collect {
        case st if st.isDirectory &&
          fs.exists(new Path(st.getPath, "_SUCCESS")) &&
          (DeltaRe.pattern.matcher(st.getPath.getName).matches() ||
            st.getPath.getName.startsWith("fold_0_")) =>
          st.getPath.toString
      }
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], codesSchema)
    else
      // distinct is load-bearing, not hygiene: the store protocol's
      // crash contract is "overlap, never loss" (a fold that wrote but
      // didn't finish deleting its inputs leaves the same rows in two
      // dirs). The dedup stores read as SETS so overlap is invisible;
      // an index reader serves ROWS, and a duplicated vec_id would
      // occupy two top-k slots. Encode is deterministic, so overlap is
      // always row-identical and distinct removes exactly it.
      spark.read.parquet(dirs: _*).distinct()
  }

  /** Start the ingest over a `(vec_id, embedding)` source. The STORE is
    * the output — readers serve via [[codes]].
    */
  def start(vecs: DataFrame, books: Array[Array[Array[Long]]],
      storeDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery = {
    var ownershipVerified = false
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpointDir/index")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!ownershipVerified) {
          StreamDedup.verifyStoreOwnership(
            spark, storeDir, s"$checkpointDir/index", batchId)
          ownershipVerified = true
        }
        graft.functions.NativeFunctions.register(spark)
        VectorOps.encodeCodes(batch, books)
          .write.mode("overwrite").parquet(s"$storeDir/delta_b$batchId")
        ()
      }
      .start()
  }
}
