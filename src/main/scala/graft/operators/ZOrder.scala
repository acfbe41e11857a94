package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Z-order (Morton curve) layout keys — the multi-dimensional data-
  * clustering technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`: bit-
  * interleave two dimensions into one sort key so that sorting by the
  * single key co-locates rows that are close in BOTH dimensions. At
  * 100 TB this is a LAYOUT operator, not a query: a corpus rewritten in
  * z-order gets file/row-group min-max pruning on every interleaved
  * dimension, where a single-column sort prunes only its leading column
  * (a filter on the other dimension scatters across every file). The
  * file-pruning win is pinned by a spec over two physical layouts;
  * the oracled query pins the key computation itself.
  *
  * Dimensions here: x = length bucket (`n_chars div 16`, capped at 255)
  * and y = a doc_id-derived Knuth multiplicative hash bucket —
  * deliberately independent of x, pure integer arithmetic so both
  * engines compute it bit-identically. zval interleaves 8 bits of each
  * (x even bits, y odd bits) with shift/mask arithmetic — all codegen'd
  * integer ops, map-only until the final presentation sort.
  */
object ZOrder {

  private val Bits = 8

  /** `((x >> i) & 1) << 2i  |  ((y >> i) & 1) << 2i+1`, summed — spelled
    * per dialect (Spark: shiftleft/shiftright functions; DuckDB: << >>
    * operators), structurally identical.
    */
  private val zvalSpark: String = (0 until Bits).map { i =>
    s"(shiftleft(shiftright(x, $i) & 1, ${2 * i}) + " +
      s"shiftleft(shiftright(y, $i) & 1, ${2 * i + 1}))"
  }.mkString(" + ")

  private val zvalDuck: String = (0 until Bits).map { i =>
    s"((((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1}))"
  }.mkString(" + ")

  /** (doc_id, x, y, zval) for the corpus — shared by the oracled query
    * and the layout spec.
    */
  def zframe(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr("cast(least(n_chars div 16, 255) as bigint)").as("x"),
        expr("cast((doc_id * 2654435761) % 256 as bigint)").as("y"))
      .withColumn("zval", expr(s"cast($zvalSpark as bigint)"))

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql("z1_zorder_key",
      s"""WITH dims AS (
         |  SELECT doc_id,
         |         CAST(LEAST(n_chars // 16, 255) AS BIGINT) AS x,
         |         CAST((doc_id * 2654435761) % 256 AS BIGINT) AS y
         |  FROM documents)
         |SELECT doc_id, x, y, CAST($zvalDuck AS BIGINT) AS zval
         |FROM dims ORDER BY zval, doc_id""".stripMargin) { (s, d) =>
      zframe(s, d).orderBy("zval", "doc_id")
    }
  )
}
