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
  * (At extreme diameters [[connectedComponentsStar]] — the
  * large-star/small-star contraction of Kiveris et al. — converges in
  * O(log n) rounds behind the same API. d5 goes through
  * [[connectedComponentsAuto]], which probes with plain propagation and
  * routes to star-contraction itself when the probe doesn't converge,
  * so the scale-safe path needs no caller opt-in.)
  *
  * The driver only sees a per-round convergence COUNT (a scalar), never
  * the data. Deterministic: min-propagation has no tie ambiguity.
  */
object DedupCluster {

  /** Drop a localCheckpoint'd DataFrame's cached blocks. localCheckpoint
    * stores its data as persisted RDD blocks that Dataset.unpersist does
    * NOT reach (the cache manager only tracks cached QUERIES), so an
    * iterative algorithm that checkpoints per round leaks one block set
    * per round for the life of the session unless freed explicitly.
    * ONLY safe once every dependent frame is itself checkpointed and
    * materialized — a local checkpoint's blocks ARE its data; there is
    * no lineage left to recompute from. Shared with d9's corpus staging
    * (private[operators]).
    */
  private[operators] def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
    }

  /** Fixpoint min-label propagation. `docs` must carry `doc_id`;
    * `pairs` must carry `doc1`/`doc2`. Returns (doc_id, cluster_id).
    */
  def connectedComponents(docs: DataFrame, pairs: DataFrame): DataFrame =
    propagateBounded(docs, pairs, Int.MaxValue)._1

  /** Min-label propagation capped at `maxRounds`; returns the labels as
    * of the last round plus whether the fixpoint was actually reached
    * (labels are only valid cluster ids when it was).
    */
  private[graft] def propagateBounded(docs: DataFrame, pairs: DataFrame,
      maxRounds: Int): (DataFrame, Boolean) = {
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
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("b"), col("cluster_id").as("nbr_label")), "b")
        .groupBy(col("a").as("doc_id")).agg(min("nbr_label").as("nbr_min"))
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      // labelSum materialized next's blocks; the previous round's are
      // now unreachable and can be dropped (see freeCheckpoint)
      freeCheckpoint(labels)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      rounds += 1
    }
    // the returned labels are checkpointed — they no longer read edges
    freeCheckpoint(edges)
    (labels, converged)
  }

  /** Self-selecting entry point: probe with plain propagation (the right
    * trade for the short-diameter graphs dedup pairs actually form —
    * one shuffle round per diameter step), and if the label sum is STILL
    * moving after `probeRounds` rounds, restart with the O(log n)
    * large-star/small-star contraction. The probe cost is bounded at
    * `probeRounds` joins; the pathological case it guards against —
    * a high-diameter chain, O(diameter) rounds — is unbounded. Callers
    * no longer have to know which graph shape they hold.
    */
  def connectedComponentsAuto(docs: DataFrame, pairs: DataFrame,
      probeRounds: Int = 4): DataFrame =
    autoSelect(docs, pairs, probeRounds)._1

  /** [[connectedComponentsAuto]] plus which algorithm served the result
    * ("propagation" | "star") — exposed for the routing test.
    */
  private[graft] def autoSelect(docs: DataFrame, pairs: DataFrame,
      probeRounds: Int): (DataFrame, String) = {
    val (labels, converged) = propagateBounded(docs, pairs, probeRounds)
    if (converged) (labels, "propagation")
    else {
      // the probe's labels are abandoned — drop their checkpoint blocks
      // before the restart, or repeated calls in a long-lived session
      // accumulate one dead block set per probe
      freeCheckpoint(labels)
      (connectedComponentsStar(docs, pairs), "star")
    }
  }

  /** Large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) — the long-chain
    * upgrade the plain-propagation Scaladoc names: converges in
    * O(log diameter) rounds instead of O(diameter), at the cost of two
    * shuffle rounds per iteration instead of one. Same contract as
    * [[connectedComponents]]: (doc_id, cluster_id = component min).
    *
    * Each round alternates:
    *  - large-star: every node u attaches its strictly-LARGER neighbors
    *    to m(u) = min(N(u) ∪ {u}) — long tails fold onto small ids;
    *  - small-star: every node u attaches its smaller neighbors (and
    *    itself) to their minimum — stars flatten.
    * At the fixpoint every component is a star centered at its minimum
    * node; labels read straight off the edges. Both phases are one
    * groupBy + one join over the edge list — fully distributed, driver
    * sees only a convergence checksum per round. Edge lists are
    * localCheckpoint'd per round (same lineage discipline as plain
    * propagation).
    */
  def connectedComponentsStar(docs: DataFrame, pairs: DataFrame): DataFrame =
    starContraction(docs, pairs)._1

  /** [[connectedComponentsStar]] plus the round count (for the
    * O(log n) convergence property test).
    */
  private[graft] def starContraction(docs: DataFrame,
      pairs: DataFrame): (DataFrame, Int) = {
    // canonical directed edge (a, b): a > b, no self-loops, distinct
    def canon(e: DataFrame): DataFrame = e
      .select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()

    // convergence checksum: (count, order-free content hash-sum) — two
    // scalars to the driver per round, never the data
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("a"), col("b"))), lit(0L))).first()
      (r.getLong(0), r.getLong(1))
    }

    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val mins = nbrs.groupBy("u")
        .agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // (v, m) for v > u: v > u ≥ m, so already canonical, never a loop
      canon(nbrs.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")))
    }

    def smallStar(e: DataFrame): DataFrame = {
      // e canonical ⇒ the smaller-neighborhood of a is exactly its b's
      val mins = e.groupBy("a").agg(min("b").as("m"))
      val reattach = e.join(mins, "a").filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b")) // b > m by minimality
      val center = mins.select(col("a"), col("m").as("b")) // a > m
      canon(reattach.union(center))
    }

    var edges = canon(pairs.select(col("doc1").as("a"), col("doc2").as("b")))
      .localCheckpoint()
    var prev = checksum(edges)
    var rounds = 0
    var converged = edges.isEmpty
    while (!converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val sum = checksum(next) // materializes next; previous round freeable
      freeCheckpoint(edges)
      rounds += 1
      converged = sum == prev
      prev = sum
      edges = next
    }
    // fixpoint edges are stars (v → component-min center); min(b) guards
    // the (harmless) case of a node still carrying two star edges
    val labels = docs.select(col("doc_id"))
      .join(edges.groupBy(col("a").as("doc_id")).agg(min("b").as("ctr")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ctr"), col("doc_id")).as("cluster_id"))
    (labels, rounds)
  }

  /** Greedy-by-id admission over a near-dup pair graph — the
    * lexicographically-first maximal independent set, which is exactly
    * the set an INCREMENTAL screen admits when ids arrive in increasing
    * order (StreamPrep/StreamNearDup's semantics, d10/d15's batch-order
    * semantics): a doc is admitted iff none of its smaller near-dup
    * neighbors was admitted. NOT the same as d5's component-min keep —
    * in a chain a<b<c, greedy admits {a, c} while component-min keeps
    * {a} — so the streaming twin's batch equivalent needs this, not
    * clustersArtifact.
    *
    * Returns (doc_id, admitted) for every doc IN the graph; docs with
    * no near-dup pair at all are trivially admitted and not returned
    * (callers left-join and coalesce to true).
    *
    * Shape: a round-based fixpoint like [[connectedComponentsAuto]],
    * all joins on the PAIR GRAPH only (orders of magnitude smaller
    * than the corpus — only docs with ≥1 near-dup edge appear). Each
    * round decides every node whose smaller neighbors are all decided;
    * the smallest undecided node always qualifies (its smaller
    * neighbors, being smaller, were decidable strictly earlier), so
    * every round makes progress and rounds ≤ the longest increasing
    * path in the graph ≤ the largest component's diameter. Greedy MIS
    * is P-complete — inherently sequential in the worst case — but
    * near-dup components in real corpora are shallow clusters (pairs
    * and small stars: a planted copy chains to its source, rarely
    * further), so the loop converges in single-digit rounds; the
    * driver holds two scalars per round (undecided count), never data.
    */
  private[graft] def greedyAdmit(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(least(col("doc1"), col("doc2")).as("lo"),
        greatest(col("doc1"), col("doc2")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .localCheckpoint()
    val nodes = edges.select(col("lo").as("doc_id"))
      .union(edges.select(col("hi").as("doc_id"))).distinct()
    // roots (no smaller neighbor) are admitted at round 0
    var dec = nodes
      .join(edges.select(col("hi").as("doc_id")).distinct()
        .withColumn("__dep", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__dep").isNull, lit("A")).otherwise(lit("U")).as("st"))
      .localCheckpoint()
    var undecided = dec.filter(col("st") === "U").count()
    while (undecided > 0) {
      val loSt = edges.join(
        dec.select(col("doc_id").as("lo"), col("st").as("lo_st")), Seq("lo"))
      val agg = loSt.groupBy(col("hi").as("doc_id")).agg(
        max(when(col("lo_st") === "A", 1).otherwise(0)).as("anyA"),
        min(when(col("lo_st") === "R", 1).otherwise(0)).as("allR"))
      val next = dec.join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("st") =!= "U", col("st"))
            .when(col("anyA") === 1, lit("R"))
            .when(col("allR") === 1, lit("A"))
            .otherwise(lit("U")).as("st"))
        .localCheckpoint()
      val left = next.filter(col("st") === "U").count()
      require(left < undecided,
        s"greedy admission made no progress at $left undecided nodes")
      freeCheckpoint(dec)
      dec = next
      undecided = left
    }
    freeCheckpoint(edges)
    dec.select(col("doc_id"), (col("st") === "A").as("admitted"))
  }

  /** d5's cluster labels as a fingerprint-keyed stored artifact
    * (doc_id, cluster_id): connected components run ONCE per corpus
    * version; every downstream selection policy (d16's keep-best, a
    * future keep-longest/keep-newest) reads the label table instead of
    * re-running the iterative algorithm — at 100 TB a policy change
    * must never re-cluster the corpus. Same memoization discipline as
    * the MinHash signature and PQ code artifacts.
    */
  def clustersArtifact(s: SparkSession, d: String): DataFrame =
    graft.sinks.VersionedStore.corpusArtifact(s, d, "neardup_clusters") { out =>
      val corpus = TextOps.withDupes(Tables.documents(s, d))
      val pairs = MinHash.nearDupPairsFromSignatures(
        MinHash.signaturesArtifact(s, d), 0.5)
        .select("doc1", "doc2")
      connectedComponentsAuto(corpus.select("doc_id"), pairs).write.parquet(out)
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
      connectedComponentsAuto(corpus.select("doc_id"), pairs)
        .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("cluster_id")))
        .withColumn("is_rep", col("doc_id") === col("cluster_id"))
        .orderBy("doc_id")
    },

    // D16: quality-aware representative selection — the policy upgrade
    // over d5's min-id keep flag that production dedup actually ships
    // (Dolma / FineWeb keep the BEST copy of a near-dup cluster, not
    // the lowest-id one): rank each cluster's members by t3's quality
    // score and keep the argmax. Ranking happens on a µ-quantized
    // BIGINT of the score (round(q*1e6)) so a 1-ulp double divergence
    // between engines can never flip a tie; residual ties break on
    // doc_id. One extra window shuffle on cluster_id over d5; the
    // scoring pass is map-only — same 100 TB shape as d5 itself.
    QueryDef.sql("d16_keep_best",
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
         |  GROUP BY c.doc_id),
         |scored AS (
         |  SELECT doc_id, ${TextOps.qualityFormulaSql} AS q
         |  FROM (SELECT doc_id, ${TextOps.qualityFeaturesSql} FROM corpus)),
         |ranked AS (
         |  SELECT l.doc_id, l.cluster_id, s.q,
         |         row_number() OVER (
         |           PARTITION BY l.cluster_id
         |           ORDER BY CAST(ROUND(s.q * 1000000) AS BIGINT) DESC NULLS LAST,
         |                    l.doc_id) AS rk
         |  FROM labels l JOIN scored s ON l.doc_id = s.doc_id)
         |SELECT doc_id, cluster_id, round(q, 6) AS quality, rk = 1 AS is_kept
         |FROM ranked ORDER BY doc_id""".stripMargin) { (s, d) =>
      val corpus = TextOps.withDupes(Tables.documents(s, d))
      // selection reads the STORED label table (built once per corpus
      // fingerprint) — the policy never re-runs connected components,
      // and the oracle's recursive-CTE closure now also round-trips
      // the artifact store
      val labels = clustersArtifact(s, d)
      val scored = corpus.select(col("doc_id") +: TextOps.qualityFeatureCols: _*)
        .select(col("doc_id"), TextOps.qualityCol.as("q"))
      labels.join(scored, "doc_id")
        .withColumn("rk", row_number().over(
          Window.partitionBy("cluster_id")
            .orderBy(round(col("q") * 1000000).cast("long").desc_nulls_last,
              col("doc_id").asc)))
        .select(col("doc_id"), col("cluster_id"),
          round(col("q"), 6).as("quality"), (col("rk") === 1).as("is_kept"))
        .orderBy("doc_id")
    }
  )
}
