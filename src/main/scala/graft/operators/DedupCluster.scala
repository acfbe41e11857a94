package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Near-duplicate CLUSTERING — the step after pair detection that a
  * training-data dedup pipeline actually ships: group near-dup pairs
  * into connected components and keep one representative per component
  * (min doc_id), so the keep-list drops every extra copy even when
  * duplicates form chains (A~B, B~C but A!~C).
  *
  * Algorithm: iterative min-label propagation to a fixpoint — each
  * round, every doc takes the smallest label among itself and its
  * neighbors. Rounds = component diameter (duplicate clusters are tiny,
  * so 2-3 rounds in practice); each round is one shuffle join + one
  * aggregate, all distributed. Lineage is truncated per round with
  * localCheckpoint — an iterative plan would otherwise grow by two
  * joins per round and overwhelm the optimizer long before 100 TB.
  * (At extreme diameters the same loop upgrades to the large-star/
  * small-star contraction of Kiveris et al., which converges in
  * O(log n) rounds; plain propagation is the right trade for
  * short-chain duplicate graphs.)
  *
  * The driver only sees a per-round convergence COUNT (a scalar), never
  * the data. Deterministic: min-propagation has no tie ambiguity.
  */
object DedupCluster {

  /** Fixpoint min-label propagation. `docs` must carry `doc_id`;
    * `pairs` must carry `doc1`/`doc2`. Returns (doc_id, cluster_id).
    */
  def connectedComponents(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc1").as("a"), col("doc2").as("b"))
      .union(pairs.select(col("doc2").as("a"), col("doc1").as("b")))
      .localCheckpoint() // edge list reused every round; compute the pair pipeline once
    var labels = docs.select(col("doc_id"),
      col("doc_id").as("cluster_id")).localCheckpoint()
    // Labels only ever decrease under min-propagation, so "no label
    // changed" ⟺ "sum of labels unchanged" — one cheap aggregate per
    // round instead of a self-join diff.
    def labelSum(df: DataFrame): Long =
      // coalesce: sum over zero rows is NULL (empty docs frame)
      df.agg(coalesce(sum("cluster_id"), lit(0L))).first().getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("b"), col("cluster_id").as("nbr_label")), "b")
        .groupBy(col("a").as("doc_id")).agg(min("nbr_label").as("nbr_min"))
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
    }
    labels
  }

  val defs: Seq[QueryDef] = Seq(

    // D5: cluster the MinHash near-dup pairs (same corpus + threshold as
    // d2) into components; emit cluster id, size and the keep flag per
    // doc. Oracle: recursive-CTE transitive closure over the same pairs.
    QueryDef.sql("d5_neardup_clusters",
      s"""WITH RECURSIVE ${MinHash.pairsCteSql(TextOps.withDupesSql, 0.5)},
         |edges AS (
         |  SELECT doc1 AS a, doc2 AS b FROM pairs
         |  UNION ALL
         |  SELECT doc2 AS a, doc1 AS b FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |corpus AS (${TextOps.withDupesSql}),
         |labels AS (
         |  SELECT c.doc_id,
         |         LEAST(c.doc_id, COALESCE(MIN(r.b), c.doc_id)) AS cluster_id
         |  FROM corpus c LEFT JOIN reach r ON r.a = c.doc_id
         |  GROUP BY c.doc_id)
         |SELECT doc_id, cluster_id,
         |       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |       doc_id = cluster_id AS is_rep
         |FROM labels ORDER BY doc_id""".stripMargin) { (s, d) =>
      val corpus = TextOps.withDupes(Tables.documents(s, d))
      val pairs = MinHash.nearDupPairsFromSignatures(
        MinHash.signaturesArtifact(s, d), 0.5)
        .select("doc1", "doc2")
      connectedComponents(corpus.select("doc_id"), pairs)
        .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("cluster_id")))
        .withColumn("is_rep", col("doc_id") === col("cluster_id"))
        .orderBy("doc_id")
    }
  )
}
