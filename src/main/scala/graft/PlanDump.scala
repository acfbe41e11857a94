package graft

/** Optimization-round tooling: write the formatted physical plan of the
  * named queries (or every registered query) to <outDir>/<name>.txt in
  * one JVM — the before/after evidence files the optimization rounds
  * commit under plans/rNN/. Usage:
  *   runMain graft.PlanDump <outDir> [suffix] [q1 q2 ...]
  * Each file is <name><suffix>.txt (suffix e.g. "_before"/"_after").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [q1 q2 ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    java.nio.file.Files.createDirectories(outDir)
    val spark = Sessions.local(appName = "graft-plandump")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"$name$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $name$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
