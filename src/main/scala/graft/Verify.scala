package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd+ args: run only the named queries (dev loop shortcut;
    // the driver always calls with exactly two args = full run).
    val only = args.drop(2).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")}") // a typo'd filter must not pass silently
    // One config stack for Verify/Bench/Explain — see Sessions.local.
    val spark = Sessions.local(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the generated coverage count COVERAGE.md's status line cites —
    // never hand-maintain these numbers
    println(s"[verify] coverage: ${SparkEntry.queries.size} registered queries, " +
      s"${SparkEntry.oracleSql.size} oracled")
    // machine-readable twin at the repo root (best-effort: only lands
    // when Verify runs from the repo, as the driver and dev loop do) —
    // scripts/update_coverage.py regenerates COVERAGE.md's status
    // counts from it, the same no-hand-typed-numbers discipline as the
    // bench line
    try Files.writeString(Paths.get("COUNTS.json"),
      s"""{"registered":${SparkEntry.queries.size},"oracled":${SparkEntry.oracleSql.size}}""" + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
