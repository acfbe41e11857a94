package graft

import org.apache.spark.sql.SparkSession

/** Fresh-JVM canary bench — the round-over-round regression gate the
  * full bench cannot be: BENCH_NOTES documents a JVM-state envelope
  * where the full 151-query run inflates untouched queries' medians by
  * 1.2-2.4× depending on what executed before them, wide enough to
  * hide a real single-query regression (the round-9 verdict measured a
  * near-uniform 1.27× swing on byte-identical plans). This main times
  * a PINNED 15-query subset in its own JVM — same starting state every
  * round — with one untimed warm-up and the MEDIAN OF FIVE timed runs
  * per query (the full bench's median-of-3, widened because the canary
  * exists to flag ±20% moves, not ±2× ones).
  *
  * Protocol per round:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "runMain graft.Canary"    # or scripts/canary.sh
  * writes CANARY.json; with SPARK_GRAFT_CANARY_BASELINE=<prev
  * CANARY.json> it also emits a per-query ratio against the previous
  * round and a ±20% gate verdict — a canary outside the gate means
  * either a named plan change (PlanSpec pin moved with it) or a bug,
  * never "noise" (that is what the fixed protocol buys).
  *
  * The set spans every operator family plus the queries the round-9
  * bench flagged as >1.5× movers (r4, sq1, t10, t11,
  * scale_partition_pruning, s3 — included precisely so their next
  * move is measured under a fixed protocol instead of narrated).
  */
object Canary {

  /** PINNED — do not reorder or swap members casually: comparability
    * across rounds is the whole point. Additions go at the END so
    * prior baselines still cover their prefix.
    */
  val queries: Seq[String] = Seq(
    "a3_grouped_stats",       // grouped agg anchor
    "w3_running_sum",         // window anchor
    "sq1_subqueries",         // r9 mover
    "t10_boilerplate",        // r9 mover
    "t11_vectorize",          // r9 mover
    "s3_source_mix",          // r9 mover
    "scale_partition_pruning",// r9 mover
    "d2_minhash_lsh",         // dedup family
    "d5_neardup_clusters",    // iterative clustering (suite's heaviest algorithm)
    "v9_ivf_pq",              // ANN serving
    "r1_bm25",                // retrieval from-scratch anchor
    "r2_hybrid_rrf",          // hybrid fusion (index-served keyword channel)
    "r4_retrieval_recall",    // r9 mover + shared-artifact consumer
    "r7_prf_expansion",       // two-pass PRF (index-served as of r10)
    "r9_stemmed_bm25")        // stemmed serving (index-served as of r10)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), appName = "graft-canary")
    val unknown = queries.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"canary names not registered: ${unknown.mkString(", ")}")
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val results = queries.map { name =>
      val fn = SparkEntry.queries(name)
      timeOnce(fn) // untimed warm-up: JIT + codegen + artifact builds
      val xs = Seq.fill(5)(timeOnce(fn)).sorted
      name -> xs(2)
    }
    val baseline: Map[String, Double] =
      sys.env.get("SPARK_GRAFT_CANARY_BASELINE").map { p =>
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)), "UTF-8")
        "\"([a-z0-9_]+)\":([0-9.]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }.getOrElse(Map.empty)
    val qs = results.map { case (k, v) => f""""$k":$v%.4f""" }.mkString("{", ",", "}")
    val gate = results.flatMap { case (k, v) =>
      baseline.get(k).map { b =>
        val ratio = v / b
        (k, ratio, ratio >= 0.8 && ratio <= 1.2)
      }
    }
    val gateJson =
      if (gate.isEmpty) "null"
      else {
        val per = gate.map { case (k, r, ok) =>
          f""""$k":{"ratio":$r%.3f,"pass":$ok}""" }.mkString("{", ",", "}")
        val verdict = if (gate.forall(_._3)) "pass" else "FAIL"
        s"""{"verdict":"$verdict","per_query":$per}"""
      }
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"canary","value":$total,"unit":"sec","queries":$qs,"gate":$gateJson,"sf":"$sfDir"}"""
    println(line)
    try java.nio.file.Files.write(java.nio.file.Paths.get("CANARY.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
