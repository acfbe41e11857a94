package graft

/** Semantic pins for the Retrieval family beyond the DuckDB hash-match:
  * r1's ranking equals an INDEPENDENT driver-side BM25 recount (different
  * code path: plain Scala over collected token lists vs the distributed
  * integer-microunit plan), the rare term dominates its query, the OOV
  * term contributes exactly nothing, and r2's fused points decompose into
  * valid per-channel RRF contributions.
  */
class RetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // the r1 fixture, restated independently so a silent fixture edit in
  // the engine is itself a test failure
  private val fixture: Map[Long, Seq[String]] = Map(
    0L -> Seq("dup", "scan"),
    1L -> Seq("spark", "join", "shuffle"),
    2L -> Seq("window", "order", "sort"),
    3L -> Seq("customer", "table"),
    4L -> Seq("fast", "slow"))

  private lazy val corpus: Array[(Long, Vector[String])] =
    graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toVector)

  /** Driver-side BM25 in micro-units — same math, independent code. */
  private def bm25Recount(queries: Map[Long, Seq[String]],
                          excludeSelf: Boolean): Map[Long, Seq[(Long, Long)]] = {
    val n = corpus.length
    val avgdl = corpus.map(_._2.size.toLong).sum.toDouble / n
    val dfT = queries.values.flatten.toSet.iterator
      .map((t: String) => t -> corpus.count(_._2.contains(t))).toMap
    queries.map { case (qid, terms) =>
      val scored = corpus.flatMap { case (docId, toks) =>
        if (excludeSelf && docId == qid) None
        else {
          val dl = toks.size
          val micro = terms.distinct.map { t =>
            val tf = toks.count(_ == t)
            if (tf == 0 || dfT(t) == 0) 0L
            else {
              val idf = math.log(1 + (n - dfT(t) + 0.5) / (dfT(t) + 0.5))
              val tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
              math.round(idf * tfn * 1000000)
            }
          }.sum
          if (micro > 0) Some(docId -> micro) else None
        }
      }
      qid -> scored.sortBy { case (id, s) => (-s, id) }.take(10).toSeq
    }
  }

  test("r9 stemmer: every S-stemmer rule branch and guard, pinned on literals") {
    // the oracled corpus only exercises simple '%s' plurals (planted),
    // so the ies→y and es→e branches and all five guard suffixes are
    // pinned here on literals — a rule-order or guard regression fails
    // THIS test, not a distant rank diff
    import graft.operators.Retrieval
    import spark.implicits._
    val cases = Seq(
      "queries" -> "query", "flies" -> "fly", // ies → y
      "tables" -> "table", "merges" -> "merge", // es → e (drop s)
      "joins" -> "join", "scans" -> "scan", "trees" -> "tree", // s → ∅
      "bus" -> "bus", "class" -> "class", // us/ss guards
      // the lone 's' must NOT stem to '' — the empty string is the
      // streaming store's tombstone sentinel (length guard)
      "s" -> "s",
      "join" -> "join", "a" -> "a") // untouched
    import org.apache.spark.sql.functions.{col, expr}
    val got = cases.map(_._1).toDF("t")
      .select(col("t"), expr(Retrieval.stemSql("t")).as("stemmed"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((in, want) <- cases)
      assert(got(in) == want, s"stem('$in') = '${got(in)}', want '$want'")
  }

  test("r9 stemmer: the driver-side stem twin matches the engine stem on every branch") {
    // stemScala turns the literal query-term list into the literal
    // STEMMED list the indexed read path prunes by — if it drifts from
    // stemSql, serving silently prunes to the wrong buckets/terms. Pin
    // every branch, every guard, and a corpus vocabulary sample.
    import graft.operators.Retrieval
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, explode}
    val branchCases = Seq("queries", "flies", "eies", "aies", "tables",
      "merges", "aes", "ees", "oes", "shoes", "joins", "trees", "bus",
      "class", "us", "ss", "s", "join", "a", "")
    val vocab = graft.sources.Tables.documents(spark, sf)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("t"))
      .distinct().collect().map(_.getString(0)).toSeq
    val all = (branchCases ++ vocab ++ vocab.map(_ + "s")).distinct
    val engine = all.toDF("t")
      .select(col("t"), expr(Retrieval.stemSql("t")).as("stemmed"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (t <- all)
      assert(Retrieval.stemScala(t) == engine(t),
        s"stemScala('$t') = '${Retrieval.stemScala(t)}' but engine stems to '${engine(t)}'")
  }

  test("r9: stemmed-index serving reproduces the from-scratch stemmed ranking row for row") {
    // the stemmed index is derived state built with the BUILD-time
    // analyzer; queries stem at SERVE time — analyzer drift between
    // the two is the classic search-engine bug, and it would show here
    // as a row diff before it shows as a distant rank change
    val fromScratch = graft.operators.Retrieval.r9FromScratch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val served = SparkEntry.queries("r9_stemmed_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(served == fromScratch,
      s"stemmed indexed path diverged:\n served $served\n scratch $fromScratch")
  }

  test("r1: engine top-10 equals an independent driver-side BM25 recount, every query") {
    val got = SparkEntry.queries("r1_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val want = bm25Recount(fixture, excludeSelf = false)
    assert(got.keySet == fixture.keySet, s"queries seen: ${got.keySet}")
    for ((qid, rows) <- got) {
      val ordered = rows.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1 to ordered.length).toSeq,
        s"q$qid ranks not dense: ${ordered.map(_._2).mkString(",")}")
      assert(ordered.map(r => (r._3, r._4)).toSeq == want(qid),
        s"q$qid diverges from recount:\n engine ${ordered.toSeq}\n recount ${want(qid)}")
    }
  }

  test("r1: the rare term dominates — every q0 hit contains 'dup'; OOV 'shuffle' adds nothing") {
    val byDoc = corpus.toMap
    val out = SparkEntry.queries("r1_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // df('dup') ≈ 5% of docs => idf ≈ 3.0 vs ≈ 0.2 for common terms: a
    // single 'dup' occurrence outscores any all-common-term doc, so the
    // whole q0 top-10 must contain the rare term
    val q0 = out.filter(_._1 == 0L)
    assert(q0.length == 10)
    q0.foreach { case (_, docId, _) =>
      assert(byDoc(docId).contains("dup"), s"q0 hit $docId lacks 'dup'")
    }
    // q1 carries an out-of-vocabulary term: scores must equal the
    // recount of the remaining two terms alone (OOV contributes 0, not
    // a NULL that nukes the sum or a smoothed pseudo-count)
    val q1 = out.filter(_._1 == 1L).map(r => (r._2, r._3)).toSeq
    val wantQ1 = bm25Recount(Map(1L -> Seq("spark", "join")),
      excludeSelf = false)(1L)
    assert(q1 == wantQ1, s"OOV term perturbed q1:\n $q1\n vs $wantQ1")
  }

  test("r3: indexed serving reproduces the from-scratch BM25 ranking row for row") {
    // the stored inverted index is derived state — build-once serving
    // must be indistinguishable from recomputing against the corpus
    val fromScratch = SparkEntry.queries("r1_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val served = SparkEntry.queries("r3_bm25_indexed")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(served == fromScratch,
      s"indexed path diverged:\n served $served\n scratch $fromScratch")
  }

  test("r10: every snippet window is the true argmax over query-term positions") {
    // recount the whole highlighting decision driver-side: positions
    // of the query terms in each hit doc, window counts, argmax with
    // the earliest-window tie-break, and the emitted token slice
    val rows = SparkEntry.queries("r10_snippets")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == fixture.size,
      "every fixture query must produce snippets")
    val byDoc = corpus.toMap
    rows.foreach { case (qid, _, docId, st, n, snip) =>
      val toks = byDoc(docId)
      val qterms = fixture(qid).toSet
      val ps = toks.zipWithIndex.collect { case (t, i) if qterms(t) => i }
      assert(ps.nonEmpty, s"hit doc $docId has no query-term match")
      val (bestN, bestP) = ps.map(p => (ps.count(q => q >= p && q < p + 10), p))
        .maxBy { case (c, p) => (c, -p) }
      assert(n == bestN && st == bestP,
        s"q$qid doc $docId: window ($st, $n) but argmax is ($bestP, $bestN)")
      assert(snip == toks.slice(st.toInt, st.toInt + 10).mkString(" "),
        s"q$qid doc $docId: snippet text diverges from the token slice")
      assert(qterms(toks(st.toInt)), "a best window must start at a match")
    }
  }

  test("r11: suggestions recount against a driver-side edit distance and df") {
    // independent replay: java-side Levenshtein over the collected
    // vocabulary, df recounted from the corpus, the same
    // (dist, df desc, term) ranking — the engine's codegen'd
    // levenshtein and index-served df must agree with both
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val dfT = corpus.flatMap { case (id, toks) => toks.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.length.toLong }
    val got = SparkEntry.queries("r11_spell_correct")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    val mis = Map(0 -> "spak", 1 -> "joinn", 2 -> "windw", 3 -> "custmer",
      4 -> "tble", 5 -> "zzzzzzzzzz")
    // no-candidate query yields no rows
    assert(!got.exists(_._1 == 5), "the beyond-distance-2 query must be empty")
    for ((qid, m) <- mis if qid != 5) {
      val want = dfT.keys.toSeq.map(t => (lev(m, t), t))
        .filter(_._1 <= 2)
        .sortBy { case (dist, t) => (dist, -dfT(t), t) }
        .take(3).zipWithIndex
        .map { case ((dist, t), i) => (qid, i + 1, m, t, dist.toLong, dfT(t)) }
      val rows = got.filter(_._1 == qid).sortBy(_._2).toSeq
      assert(rows == want, s"q$qid diverged:\n engine $rows\n replay $want")
    }
  }

  test("r4: the severity dial is monotone — rank percentile degrades as the copy is junked") {
    val rows = SparkEntry.queries("r4_retrieval_recall")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3))
    rows.foreach { case (_, n, hit, ppm) =>
      assert(n == 10 && hit >= 0 && hit <= n && ppm >= 0 && ppm <= 1000000)
    }
    // the scale-comparable metric must degrade STRICTLY with severity
    val ppms = rows.sortBy(_._1).map(_._4)
    assert(ppms.sliding(2).forall(w => w(0) < w(1)),
      s"rank percentile not monotone across severities: ${ppms.mkString(", ")}")
    // absolute hits can only fall as severity rises
    val hits = rows.sortBy(_._1).map(_._3)
    assert(hits.sliding(2).forall(w => w(0) >= w(1)),
      s"top-10 hits increased with severity: ${hits.mkString(", ")}")
    // verbatim copies must rank in the top ~2% of candidates; fully
    // junked copies must be effectively unfindable (>50%)
    assert(ppms.head < 20000, s"verbatim copy median percentile ${ppms.head}")
    assert(ppms.last > 500000, s"junked copy median percentile ${ppms.last}")
  }

  test("r2: fused points decompose into valid per-channel RRF contributions") {
    val rows = SparkEntry.queries("r2_hybrid_rrf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).distinct.length == 10, "all 10 query ids present")
    val pts = (1 to 20).map(r => 1000000000L / (60 + r)).toSet
    val pairSums = (for (a <- pts; b <- pts) yield a + b)
    for ((qid, rn, cand, rrf, nch) <- rows) {
      assert(rn >= 1 && rn <= 10 && cand != qid, s"q$qid rn=$rn cand=$cand")
      nch match {
        case 1L => assert(pts.contains(rrf),
          s"q$qid cand=$cand: $rrf is not one top-20 RRF contribution")
        case 2L => assert(pairSums.contains(rrf),
          s"q$qid cand=$cand: $rrf is not a sum of two top-20 contributions")
        case other => fail(s"q$qid cand=$cand: n_channels=$other")
      }
    }
    // fusion is the point of the operator: both channels must actually
    // meet somewhere in the fixture (they do — deterministic testdata)
    assert(rows.exists(_._5 == 2L),
      "no candidate was surfaced by both keyword and vector channels")
  }
}
