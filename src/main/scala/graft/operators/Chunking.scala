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
    },

    /* P15: length-bucketed batching — the OTHER padding cure beside
     * p11's packing (fairseq/T5 bucket-by-sequence-length): group
     * docs into 8 length buckets and pad each example to its BUCKET
     * max instead of the global max. Bucketing is by PRECOMPUTED
     * quantile boundaries (the a8/t15 exact-percentile pair; at real
     * scale flip to approx_percentile, same plan shape), NOT a global
     * ntile window — the 7 cuts are a 1-row broadcast and bucket
     * assignment is a map-only comparison sum, so nothing ever
     * funnels through a single partition (the p11 lesson). Strict >
     * at each cut keeps ties deterministic in both engines. Report
     * per bucket: size, length range, slot cost at global vs bucket
     * max, and the integer-ppm saving — bucket 8 (holding the global
     * max) saves 0 by construction, the small buckets save the most.
     */
    QueryDef.sql("p15_length_buckets",
      """WITH t AS (SELECT len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT quantile_cont(n, 0.125) AS c1, quantile_cont(n, 0.250) AS c2,
        |             quantile_cont(n, 0.375) AS c3, quantile_cont(n, 0.500) AS c4,
        |             quantile_cont(n, 0.625) AS c5, quantile_cont(n, 0.750) AS c6,
        |             quantile_cont(n, 0.875) AS c7, CAST(MAX(n) AS BIGINT) AS gmax
        |      FROM t),
        |b AS (SELECT n, gmax,
        |             1 + (CASE WHEN n > c1 THEN 1 ELSE 0 END) + (CASE WHEN n > c2 THEN 1 ELSE 0 END)
        |               + (CASE WHEN n > c3 THEN 1 ELSE 0 END) + (CASE WHEN n > c4 THEN 1 ELSE 0 END)
        |               + (CASE WHEN n > c5 THEN 1 ELSE 0 END) + (CASE WHEN n > c6 THEN 1 ELSE 0 END)
        |               + (CASE WHEN n > c7 THEN 1 ELSE 0 END) AS bucket
        |      FROM t CROSS JOIN c),
        |agg AS (SELECT bucket, COUNT(*) AS n_docs,
        |               CAST(MIN(n) AS BIGINT) AS min_len, CAST(MAX(n) AS BIGINT) AS max_len,
        |               MAX(gmax) AS gmax
        |        FROM b GROUP BY 1)
        |SELECT bucket, n_docs, min_len, max_len,
        |       CAST(n_docs * gmax AS BIGINT) AS slots_global,
        |       CAST(n_docs * max_len AS BIGINT) AS slots_bucketed,
        |       CAST((1000000 * (n_docs * (gmax - max_len))) // (n_docs * gmax) AS BIGINT) AS saved_ppm
        |FROM agg ORDER BY bucket""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("long").as("n"))
      val cutCols = (1 to 7)
        .map(i => percentile(col("n"), lit(i / 8.0)).as(s"c$i")) :+
        max("n").as("gmax")
      val cuts = t.agg(cutCols.head, cutCols.tail: _*)
      val bucket = (1 to 7)
        .map(i => when(col("n") > col(s"c$i"), 1).otherwise(0))
        .foldLeft(lit(1))(_ + _)
      t.crossJoin(broadcast(cuts))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), min("n").as("min_len"),
          max("n").as("max_len"), max("gmax").as("gmax"))
        .select(col("bucket"), col("n_docs"), col("min_len"), col("max_len"),
          (col("n_docs") * col("gmax")).as("slots_global"),
          (col("n_docs") * col("max_len")).as("slots_bucketed"),
          expr("(1000000 * (n_docs * (gmax - max_len))) div (n_docs * gmax)")
            .as("saved_ppm"))
        .orderBy("bucket")
    }
  )
}
