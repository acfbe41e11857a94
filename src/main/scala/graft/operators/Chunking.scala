package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Context-window preparation — the two transforms that sit between a
  * cleaned corpus and a training run:
  *
  *  - c1: CHUNKING — slice each doc into fixed-size token windows with
  *    overlap (sliding stride), the retrieval/embedding unit shape. A
  *    pure per-row array transform (`split` → `sequence`/`explode` →
  *    `slice`): narrow, codegen'd, no shuffle — the same machinery as
  *    d8's passage blocks, with a stride.
  *  - p11: SEQUENCE PACKING accounting — the GPT-style "concatenate the
  *    token stream, cut every L tokens" layout: for each doc, which
  *    training examples it lands in and whether it straddles a cut.
  *    Needs a GLOBAL prefix sum of token counts in doc_id order; a bare
  *    `Window.orderBy` computes that on ONE partition (the classic
  *    scale-killer), so the engine side runs the two-phase form — the
  *    heavy running sum partitioned by a doc_id range bucket, plus one
  *    tiny window over per-bucket totals to produce bucket offsets —
  *    identical output, every shuffle bounded. The oracle keeps the
  *    naive global window (DuckDB is single-node anyway).
  */
object Chunking {

  private val W = 32 // chunk window (tokens)
  private val S = 24 // stride (8-token overlap)
  private val L = 256 // packed example length (tokens)

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql("c1_chunking",
      s"""WITH sp AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws,
         |         len(string_split(text, ' ')) AS n
         |  FROM documents),
         |ch AS (
         |  SELECT doc_id, ws, n,
         |         unnest(generate_series(0,
         |           CAST(floor((GREATEST(n - $W, 0) + ${S - 1}) / $S.0) AS INT))) AS ci
         |  FROM sp)
         |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
         |       CAST(LEAST($W, n - ci * $S) AS BIGINT) AS n_tokens,
         |       md5(array_to_string(ws[ci * $S + 1 : ci * $S + $W], ' ')) AS chunk_md5
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      val sp = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .withColumn("n", size(col("ws")))
      sp.withColumn("ci", explode(sequence(lit(0),
          floor((greatest(col("n") - W, lit(0)) + lit(S - 1)) / lit(S.toDouble))
            .cast("int"))))
        .select(col("doc_id"), col("ci").cast("long").as("chunk_idx"),
          least(lit(W), col("n") - col("ci") * S).cast("long").as("n_tokens"),
          md5(concat_ws(" ", slice(col("ws"), col("ci") * S + 1, lit(W))))
            .as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },

    QueryDef.sql("p11_sequence_packing",
      s"""WITH t AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
         |c AS (
         |  SELECT doc_id, n,
         |         COALESCE(SUM(n) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM t)
         |SELECT doc_id, n AS n_tokens,
         |       CAST(cb // $L AS BIGINT) AS first_example,
         |       CAST((cb + n - 1) // $L AS BIGINT) AS last_example,
         |       CAST((cb + n - 1) // $L - cb // $L + 1 AS BIGINT) AS n_examples
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n"))
      // two-phase prefix sum: bucket the stream by doc_id range, run
      // the heavy window WITHIN buckets, and lift per-bucket totals
      // through one tiny window (rows = number of buckets) into offsets
      val bucketed = t.withColumn("rng", (col("doc_id") / 1000).cast("long"))
      val offsets = bucketed.groupBy("rng").agg(sum("n").as("rt"))
        .withColumn("off", coalesce(sum("rt").over(
          Window.orderBy("rng").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select("rng", "off")
      val cb = coalesce(sum("n").over(
        Window.partitionBy("rng").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + col("off")
      bucketed.join(broadcast(offsets), "rng")
        .withColumn("cb", cb)
        .select(col("doc_id"), col("n").as("n_tokens"),
          expr(s"cb div $L").as("first_example"),
          expr(s"(cb + n - 1) div $L").as("last_example"),
          expr(s"(cb + n - 1) div $L - cb div $L + 1").as("n_examples"))
        .orderBy("doc_id")
    },

    /* P12: padding-waste accounting — the one-row summary that
     * justifies p11's packing: how many L-token training examples the
     * corpus needs PACKED (concat stream, ceil(Σn/L)) versus PADDED
     * (one-doc-per-example, Σ ceil(n/L)), and the fraction of padded
     * example slots that would be padding. This is the number a
     * training-efficiency dashboard tracks per corpus release; at this
     * corpus's short-doc profile the padded waste is large, which is
     * exactly the motivation for the packing operator. One narrow
     * token-count pass + one global aggregate; integer arithmetic
     * until a single final IEEE division.
     */
    QueryDef.sql("p12_padding_waste",
      s"""WITH t AS (SELECT len(string_split(text, ' ')) AS n FROM documents),
         |s AS (SELECT COUNT(*) AS n_docs,
         |             CAST(SUM(n) AS BIGINT) AS total_tokens,
         |             CAST(SUM((n + ${L - 1}) // $L) AS BIGINT) AS padded_examples
         |      FROM t)
         |SELECT n_docs, total_tokens,
         |       CAST((total_tokens + ${L - 1}) // $L AS BIGINT) AS packed_examples,
         |       padded_examples,
         |       CAST(padded_examples * $L - total_tokens AS DOUBLE)
         |         / CAST(padded_examples * $L AS DOUBLE) AS padded_waste_frac
         |FROM s""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("long").as("n"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n")).as("total_tokens"),
          sum(expr(s"(n + ${L - 1}) div $L")).as("padded_examples"))
        .select(col("n_docs"), col("total_tokens"),
          expr(s"(total_tokens + ${L - 1}) div $L").as("packed_examples"),
          col("padded_examples"),
          ((col("padded_examples") * L - col("total_tokens")).cast("double") /
            (col("padded_examples") * L).cast("double")).as("padded_waste_frac"))
    }
  )
}
