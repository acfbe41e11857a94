package graft.sinks

import org.apache.spark.sql.DataFrame

/** P2/P3: the dashboard's CSV / JSON export sinks (reference:
  * streamlit/app.py:450-466 — pandas `to_csv(index=False)` /
  * `to_json(orient='records')`), as distributed writers. `coalesce(1)`
  * mirrors the reference's single-file download artifact; leave
  * partitioned for big exports.
  */
object Exports {
  def toCsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode("overwrite").option("header", "true").csv(path)

  def toJson(df: DataFrame, path: String, singleFile: Boolean = true): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode("overwrite").json(path)
}
