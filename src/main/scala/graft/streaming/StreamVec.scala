package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
import graft.operators.VectorOps

/** Streaming ANN index ingest — the vector store's full streaming twin
  * (round 12's StreamIndex plus the reissue/tombstone/drift discipline
  * the text-side stores already carry):
  *
  *  - each micro-batch of `(vec_id, embedding)` rows PQ-encodes against
  *    the FROZEN codebook (v7's encoder verbatim — map-only over
  *    centroid literals, no shuffle of embeddings) and lands as a
  *    batchId-keyed `delta_b<id>` dir. Encoding is a pure deterministic
  *    function of (vector, codebook), so an at-least-once replay
  *    rewrites the SAME dir with the SAME bytes — a vector can never be
  *    double-inserted.
  *  - a vec_id REISSUED in a later batch (re-embedded doc, upstream
  *    reprocessing) serves only its NEWEST batch's code row: every
  *    delta row carries its batch id `b` and [[codes]] keeps each
  *    vec_id's max-b row (StreamPostings' last-writer-wins, verbatim).
  *    Without it, distinct() alone would serve BOTH code rows — the
  *    stale vector occupying a top-k slot forever.
  *  - a row arriving with a NULL embedding is a TOMBSTONE (delete
  *    request): it lands as a `del = true` row that wins the max-b
  *    filter and is then dropped from serving — the streaming form of
  *    `VectorOps.deleteCodes`, and the reason max-b needs an explicit
  *    marker rather than absence (absence would leave the old batch's
  *    row max-b, exactly StreamPostings' empty-tokenizing-reissue
  *    hole).
  *  - v16's codebook-drift gate runs IN the trigger: each batch's mean
  *    integer squared residual is compared against the pinned training
  *    baseline, and the verdict (n_vecs, mean_err, drift_ppm, retrain
  *    at v16's 1.5× threshold) lands as a `drift_b<id>` sidecar row —
  *    batchId-keyed and deterministic, so replays rewrite it
  *    idempotently — plus a stderr warning when it fires. Drift flags
  *    LOUDLY instead of letting recall decay silently; data still
  *    lands (retraining invalidates every stored code, so the retrain
  *    decision is the operator's, not the ingest's). Sidecars are
  *    invisible to [[codes]] and to the fold machinery (neither
  *    matches the `drift_` prefix); [[driftLog]] reads them.
  *
  * Ownership, folds, and the crash contract are StreamDedup's: the
  * store is claimed by its checkpoint's query id (a fresh checkpoint
  * whose batch ids restart at 0 is refused), fold compaction is
  * content-agnostic union+distinct under the maintenance lease (the
  * `b`/`del` columns ride through folds, so last-writer-wins survives
  * compaction), and "overlap, never loss" is absorbed at read time:
  * replay overlap is byte-identical (distinct removes exactly it) and
  * fold overlap keeps max-b intact.
  *
  * Codebook discipline at 100 TB: the codebook is trained once and
  * FROZEN for the life of the store (pass the same `books` and
  * `baselineMeanErr` to every run); retraining is a rebuild of a fresh
  * store dir, never an in-place append. Reference analogue: the
  * continuous ingest loop (weather_streaming.py:148-216), which the
  * text side already mirrors.
  */
object StreamVec {

  private val DeltaRe = "delta_b(\\d+)".r

  /** v16's retrain threshold: batch mean residual ≥ 1.5× baseline. */
  val RetrainPpm = 1500000L

  private def codesSchema: StructType = StructType(
    (StructField("vec_id", LongType) +:
      (0 until VectorOps.PqM).map(m => StructField(s"c$m", LongType))) ++
      Seq(StructField("b", LongType), StructField("del", BooleanType)))

  private def completeDirs(spark: SparkSession, storeDir: String,
      accept: String => Boolean): Seq[String] = {
    val base = new Path(storeDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty[String]
    else fs.listStatus(base).toSeq.collect {
      case st if st.isDirectory &&
        fs.exists(new Path(st.getPath, "_SUCCESS")) &&
        accept(st.getPath.getName) =>
        st.getPath.toString
    }
  }

  /** The index the store currently serves: all COMPLETE (_SUCCESS)
    * delta and fold dirs, replay overlap collapsed by distinct(), each
    * vec_id served from its NEWEST batch only (max-b last-writer
    * filter), tombstoned vec_ids dropped. Empty-but-typed before the
    * first commit. Plugs into `adcSearch`/`ivfServe` as their `codes0`.
    */
  def codes(spark: SparkSession, storeDir: String): DataFrame = {
    val dirs = completeDirs(spark, storeDir, n =>
      DeltaRe.pattern.matcher(n).matches() || n.startsWith("fold_0_"))
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], codesSchema)
        .drop("b", "del")
    else {
      import org.apache.spark.sql.expressions.Window
      // distinct is load-bearing: the fold crash contract is "overlap,
      // never loss" — the same deterministic row can sit in two dirs,
      // and a duplicated vec_id would occupy two top-k slots.
      spark.read.parquet(dirs: _*).distinct()
        .withColumn("bmax", max("b").over(Window.partitionBy("vec_id")))
        .filter(col("b") === col("bmax"))
        .filter(!col("del"))
        .drop("bmax", "b", "del")
    }
  }

  /** Last-writer-aware compaction: StreamDedup's fold machinery with a
    * SHRINK step that keeps only each vec_id's max-b row among the
    * fold's inputs — physically dropping superseded reissue rows and,
    * for tombstoned ids, the CODE rows themselves (the erasure path:
    * send a NULL-embedding tombstone through the stream — the id stops
    * serving at that trigger — then compact; the encoded data is
    * physically gone once the tombstone's delta becomes foldable, i.e.
    * after one more batch commits). The tombstone row itself SURVIVES
    * compaction deliberately: the crash contract is "overlap, never
    * loss" — a fold whose input delete crashed can leave an old code
    * row in a leftover dir, and the committed fold's tombstone must
    * still beat it at read time (the Kafka-compaction key-tombstone
    * model; only the payload is erased, the key lingers). Plain
    * `StreamDedup.foldDeltas` remains valid for this store — it just
    * reclaims no superseded rows.
    */
  def foldCodes(spark: SparkSession, storeDir: String): Int =
    StreamDedup.foldDeltasWith(spark, storeDir) { df =>
      import org.apache.spark.sql.expressions.Window
      df.withColumn("__bmax", max("b").over(Window.partitionBy("vec_id")))
        .filter(col("b") === col("__bmax"))
        .drop("__bmax")
    }

  /** The drift gate's audit trail: one row per micro-batch
    * (b, n_vecs, mean_err, drift_ppm, retrain). The operational signal
    * a frozen-codebook deployment watches — v16's audit, continuous.
    */
  def driftLog(spark: SparkSession, storeDir: String): DataFrame = {
    val dirs = completeDirs(spark, storeDir, _.startsWith("drift_b"))
    val schema = StructType(Seq(
      StructField("b", LongType), StructField("n_vecs", LongType),
      StructField("mean_err", LongType), StructField("drift_ppm", LongType),
      StructField("retrain", BooleanType)))
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(dirs: _*).distinct().orderBy("b")
  }

  /** Start the ingest over a `(vec_id, embedding)` source (NULL
    * embedding ⇒ tombstone). `baselineMeanErr` is the pinned training
    * residual (`VectorOps.meanSqErr` over the codebook's training
    * corpus) the per-batch drift gate compares against. The STORE is
    * the output — readers serve via [[codes]].
    */
  def start(vecs: DataFrame, books: Array[Array[Array[Long]]],
      storeDir: String, checkpointDir: String, baselineMeanErr: Long,
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
        // one encode pass feeds both the delta and the drift verdict;
        // persist so the two actions don't re-run the argmin
        val ups = VectorOps.encodeCodesWithErr(
          batch.filter(col("embedding").isNotNull), books).persist()
        try {
          val live = ups.drop("sq_err")
            .withColumn("b", lit(batchId)).withColumn("del", lit(false))
          val tombs = batch.filter(col("embedding").isNull)
            .select(col("vec_id") +:
              (0 until VectorOps.PqM).map(m => lit(0L).as(s"c$m")): _*)
            .withColumn("b", lit(batchId)).withColumn("del", lit(true))
          live.unionByName(tombs)
            .write.mode("overwrite").parquet(s"$storeDir/delta_b$batchId")

          // v16's gate, per batch: deterministic (integer sums, one
          // IEEE divide+round — v16's exact ppm arithmetic), so the
          // sidecar is replay-idempotent like the delta itself.
          val st = ups.agg(sum("sq_err").cast("long").as("s"),
            count(lit(1)).as("n")).first()
          val (n, meanErr) =
            if (st.getLong(1) == 0L) (0L, 0L)
            else (st.getLong(1), st.getLong(0) / st.getLong(1))
          val ppm = math.round(
            1000000.0 * meanErr.toDouble / math.max(baselineMeanErr, 1L).toDouble)
          val retrain = n > 0 && ppm >= RetrainPpm
          import spark.implicits._
          Seq((batchId, n, meanErr, ppm, retrain))
            .toDF("b", "n_vecs", "mean_err", "drift_ppm", "retrain")
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$storeDir/drift_b$batchId")
          if (retrain) Console.err.println(
            s"[StreamVec] CODEBOOK DRIFT at batch $batchId: mean residual " +
              s"$meanErr is ${ppm}ppm of baseline $baselineMeanErr " +
              s"(threshold $RetrainPpm) — stored codes for this cohort " +
              "carry degraded recall; schedule a codebook retrain/rebuild")
        } finally { ups.unpersist(); () }
      }
      .start()
  }
}
