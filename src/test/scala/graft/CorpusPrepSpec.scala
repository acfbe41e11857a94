package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the CorpusPrep family — the claims the DuckDB
  * hash-match alone can't express: planted collocations actually
  * dominate the PMI report, the BPE pair table equals a direct
  * corpus-stream recount, the curriculum schedule moves mass the way
  * annealing promises, and the training order is a deterministic
  * permutation.
  */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("tok2: the six planted collocation orderings are the top-6 rows by a wide PMI margin") {
    val rows = SparkEntry.queries("tok2_collocations")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
    val planted = Set("zx" -> "qv", "qv" -> "zx", "wq" -> "jj",
      "jj" -> "wq", "kx" -> "vz", "vz" -> "kx")
    assert(rows.take(6).map(_._1).toSet == planted,
      s"top-6 must be the plants, got ${rows.take(6).mkString(", ")}")
    val worstPlant = rows.take(6).map(_._2).min
    val bestOrganic = rows.drop(6).map(_._2).max
    assert(worstPlant - bestOrganic > 2.0,
      s"plant/organic PMI gap collapsed: $worstPlant vs $bestOrganic")
  }

  test("tok1: vocab-weighted pair counts equal a direct corpus-stream recount") {
    // The production path counts pairs on the word-frequency table (so
    // 100 TB costs vocab-sized work); this recount explodes pairs from
    // the raw token stream without the vocab rollup. Equality proves
    // the weighting is exact, not approximate.
    val direct = graft.sources.Tables.documents(spark, sf)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .filter(length(col("word")) >= 2)
      .select(explode(expr("sequence(1, length(word) - 1)")).as("i"), col("word"))
      .select(expr("substring(word, i, 2)").as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("tok1_bpe_pairs")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == 50)
    got.foreach { case (p, n) =>
      assert(direct(p) == n, s"pair $p: vocab-weighted $n != direct ${direct(p)}")
    }
    // and the report really is the top-50: nothing outside it beats the floor
    val floor = got.map(_._2).min
    val outside = direct -- got.map(_._1)
    assert(outside.values.forall(_ <= floor),
      s"a pair outside the top-50 exceeds the floor $floor")
  }

  test("d17: every source inflated, totals reconcile with the planted copies") {
    val rows = SparkEntry.queries("d17_dup_inflation")(spark, sf).collect()
    val nDocs = rows.map(_.getLong(1)).sum
    val nKept = rows.map(_.getLong(2)).sum
    val plants = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0).count()
    assert(nDocs - nKept == plants,
      s"dropped ${nDocs - nKept} copies but planted $plants")
    rows.foreach { r =>
      val ppm = r.getLong(5)
      assert(ppm >= 1000000L, s"${r.getString(0)}: inflation below 1.0? $ppm")
      assert(ppm <= 2000000L, s"${r.getString(0)}: inflation above the 2x plant ceiling: $ppm")
    }
    // the %3 plant rate means real spread across sources, not a constant
    assert(rows.map(_.getLong(5)).distinct.length > 1, "inflation is degenerate-constant")
  }

  test("p14: a deterministic permutation — every doc exactly once, dense pos per shard") {
    val out = SparkEntry.queries("p14_training_order")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val all = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect().sorted
    assert(out.map(_._1).sorted.toSeq == all.toSeq, "not a permutation of the corpus")
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq,
        s"shard $shard positions not dense")
    }
    // hash-balance: no shard more than 3x another (binomial at n=500)
    val sizes = out.groupBy(_._2).map(_._2.length)
    assert(sizes.max <= 3 * sizes.min, s"shard skew: $sizes")
    // bit-reproducible: a second run is byte-identical
    val again = SparkEntry.queries("p14_training_order")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == again.toSeq, "training order is not deterministic")
  }

  test("s6: annealing moves quota from the largest source to the smallest, epoch sums stay ppm-exact") {
    val rows = SparkEntry.queries("s6_curriculum_schedule")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(1L, 2L, 3L, 4L))
    byEpoch.foreach { case (e, rs) =>
      val total = rs.map(_._4).sum
      // floor division loses < 1 ppm per source, never gains
      assert(total <= 1000000L && total > 1000000L - rs.length,
        s"epoch $e quotas sum to $total")
    }
    val e1 = byEpoch(1L).map(r => r._2 -> r._4).toMap
    val e4 = byEpoch(4L).map(r => r._2 -> r._4).toMap
    val smallest = e1.minBy(_._2)._1
    val largest = e1.maxBy(_._2)._1
    assert(e4(smallest) > e1(smallest),
      s"flattening must raise the smallest source: $smallest ${e1(smallest)} -> ${e4(smallest)}")
    assert(e4(largest) < e1(largest),
      s"flattening must lower the largest source: $largest ${e1(largest)} -> ${e4(largest)}")
    // α-ladder is monotone for the extremes across ALL epochs, not just endpoints
    (1L to 3L).foreach { e =>
      val a = byEpoch(e).map(r => r._2 -> r._4).toMap
      val b = byEpoch(e + 1).map(r => r._2 -> r._4).toMap
      assert(b(smallest) >= a(smallest) && b(largest) <= a(largest),
        s"non-monotone annealing between epochs $e and ${e + 1}")
    }
  }

  test("tok3: the three learned merges equal a driver-side BPE replay") {
    val got = SparkEntry.queries("tok3_bpe_train")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.map(_._1) == Seq(1, 2, 3))
    // plain-Scala replay over the collected vocabulary — same greedy
    // loop, no engine machinery
    val wf = graft.sources.Tables.documents(spark, sf)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .groupBy("w").count().collect()
      .map(r => (" " + r.getString(0).mkString(" ") + " ", r.getLong(1)))
    var vocab = wf
    val replay = (1 to 3).map { _ =>
      val counts = scala.collection.mutable.Map.empty[String, Long]
      vocab.foreach { case (s, f) =>
        val a = s.trim.split(" ")
        (0 until a.length - 1).foreach { i =>
          val p = a(i) + " " + a(i + 1)
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val (pair, n) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val merged = " " + pair.replace(" ", "") + " "
      vocab = vocab.map { case (s, f) =>
        (s.replace(" " + pair + " ", merged).replace(" " + pair + " ", merged), f)
      }
      (pair, n)
    }
    assert(got.map(r => (r._2, r._3)) == replay,
      s"merge table diverged:\n engine $got\n replay $replay")
    // the merges must actually feed each other: no pair may repeat
    assert(got.map(_._2).distinct.size == 3)
  }

  test("bpe: the driver-local trainer is bit-identical to the distributed loop") {
    // tok3/tok4/tok5 now train driver-local (one corpus scan, then a
    // local merge loop over the vocab-bounded state); the distributed
    // loop stays behind the same API for a >driver-memory vocabulary.
    // The two must never diverge — picks AND final state, bit for bit.
    import graft.operators.CorpusPrep
    val init = CorpusPrep.bpeInit(spark, sf)
    val (lp, ls) = CorpusPrep.bpeTrainLocalWithState(spark, init, 3)
    val (dp, ds) = CorpusPrep.bpeTrainWithState(spark, init, 3)
    val lPicks = lp.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val dPicks = dp.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(lPicks == dPicks, s"picks diverged:\n local $lPicks\n dist $dPicks")
    def stateSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(stateSet(ls) == stateSet(ds), "final vocabulary state diverged")
  }

  test("bpe: 1000 driver-local merges train in seconds") {
    // the production-merge-count feasibility claim, measured: a 2000-
    // word synthetic vocabulary (distinct 8-symbol words, mixed freqs
    // — enough distinct merge material that 1000 rounds never exhaust)
    // through the driver-local loop. The distributed loop pays one
    // Spark job + collect per merge — O(10k) scheduler latencies at
    // production counts; this must stay wall-clock-trivial.
    import graft.operators.CorpusPrep
    def w(i: Int): String = {
      val sb = new StringBuilder
      var v = i
      (0 until 8).foreach { _ => sb.append(('a' + v % 26).toChar); v /= 26 }
      sb.toString
    }
    val init = (0 until 2000)
      .map(i => (" " + w(i).mkString(" ") + " ", (i % 7 + 1).toLong))
      .toDF("s", "freq")
    val t0 = System.nanoTime()
    val (picks, state) = CorpusPrep.bpeTrainLocalWithState(spark, init, 1000)
    val nPicks = picks.count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(nPicks == 1000, s"expected 1000 merges, got $nPicks (vocab exhausted early)")
    assert(state.count() == 2000)
    assert(elapsed < 30.0, f"1000 merges took $elapsed%.1f s — driver-local loop regressed")
  }

  test("tok6: id sequences decode back to the original text, ids are dense over the vocab") {
    // the round-trip property a tokenizer must hold: decoding every
    // doc's id sequence through the vocabulary reproduces the doc's
    // letter stream exactly (segmentation partitions each word, so the
    // concatenation of decoded subwords == the concatenation of words)
    import graft.operators.CorpusPrep
    val (_, state) = CorpusPrep.bpeTrainLocalWithState(
      spark, CorpusPrep.bpeInit(spark, sf), 3)
    val syms = state.collect().flatMap(_.getString(0).trim.split(" ")).distinct.sorted
    val idToSym = syms.zipWithIndex.map { case (s2, i) => (i + 1) -> s2 }.toMap
    val texts = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") < 200).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("tok6_bpe_ids")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    val seen = scala.collection.mutable.Set.empty[Int]
    rows.foreach { case (docId, n, seq) =>
      val ids = seq.split(",").map(_.toInt)
      assert(ids.length == n, s"doc $docId: n_tokens $n != ${ids.length} ids")
      seen ++= ids
      val decoded = ids.map(idToSym).mkString("")
      val orig = "[a-z]+".r.findAllIn(texts(docId).toLowerCase).mkString("")
      assert(decoded == orig, s"doc $docId fails the decode round-trip")
    }
    assert(seen.forall(i => i >= 1 && i <= syms.length),
      "an emitted id falls outside the dense vocabulary range")
  }

  test("s7: priority keys recount independently (java MD5), sample tilts toward heavy docs") {
    val rows = SparkEntry.queries("s7_weighted_sample")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 100)
    assert(rows.map(_._1).toSeq == (1 to 100), "ranks not dense")
    // independent Efraimidis–Spirakis key recount: portable 60-bit hash
    // rebuilt from java.security MD5, no Spark/DuckDB machinery
    def key(docId: Long, nChars: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$docId:ws".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = ((h % 1000000) + 1) / 1000001.0
      BigDecimal(1000000000.0 * math.log(u) / nChars)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    rows.foreach { case (rn, id, _, nc, k) =>
      assert(k == key(id, nc), s"rank $rn doc $id: key $k != recount ${key(id, nc)}")
    }
    // keys must actually be the global top-100 (nothing outside beats
    // the floor), and the chars-weighted draw must tilt the sample
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val floor = rows.map(_._5).min
    val picked = rows.map(_._2).toSet
    corpus.filterNot(c => picked(c._1)).foreach { case (id, nc) =>
      assert(key(id, nc) <= floor, s"doc $id outside the sample beats the floor")
    }
    val sampleMean = rows.map(_._4).sum.toDouble / rows.length
    val corpusMean = corpus.map(_._2).sum.toDouble / corpus.length
    assert(sampleMean > corpusMean,
      s"chars-weighted sample mean $sampleMean must exceed corpus mean $corpusMean")
  }

  test("tok12: every Viterbi segmentation reconstructs its word, uses only vocab pieces, and is exactly optimal") {
    import graft.operators.CorpusPrep
    val words = CorpusPrep.unigramWords(spark, sf)
    val pieces = CorpusPrep.unigramPieces(words)
    val vocab = pieces.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val segs = CorpusPrep.unigramSegment(words, pieces)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2).toList))
    assert(segs.nonEmpty)
    segs.foreach { case (w, _, seg) =>
      assert(seg.mkString == w, s"$w reconstructs as ${seg.mkString("|")}")
      seg.foreach(p => assert(vocab.contains(p), s"$w used non-vocab piece '$p'"))
    }
    // independent check: FULL enumeration of all vocab segmentations
    // (exponential, fine at len <= 12); the DP's (nseg, sumpf) must
    // equal the enumerated lexicographic optimum for every word
    def enumerate(w: String): Seq[(Int, Long)] = {
      def go(i: Int): Seq[(Int, Long)] =
        if (i == w.length) Seq((0, 0L))
        else (1 to math.min(4, w.length - i)).flatMap { k =>
          vocab.get(w.substring(i, i + k)).toSeq.flatMap(pf =>
            go(i + k).map { case (n, s) => (n + 1, s + pf) })
        }
      go(0)
    }
    segs.foreach { case (w, _, seg) =>
      val dp = (seg.length, seg.map(vocab).sum)
      val opt = enumerate(w).minBy { case (n, s) => (n, -s) }
      assert(dp == opt, s"$w: DP $dp vs enumerated optimum $opt")
    }
    // M-step conservation: at this fixture the piece table fits under
    // the top-50 cut, so the registered query exposes the WHOLE M-step
    // — its counts must equal a driver-side recount from the
    // segmentations, and total mass = sum over words of freq * nseg
    val out = SparkEntry.queries("tok12_unigram_viterbi")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.length < 50, "fixture outgrew the top-50 cut; conservation check needs a bigger cap")
    val recount = segs.flatMap { case (_, f, seg) => seg.map(_ -> f) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    assert(out.toMap == recount, "M-step table != driver recount")
    assert(out.map(_._2).sum == segs.map { case (_, f, seg) => f * seg.length }.sum,
      "EM mass not conserved")
  }

  test("tok13: prune keeps all singles + exactly the top half of USED multis; re-encode only gets coarser") {
    import graft.operators.CorpusPrep
    val words = CorpusPrep.unigramWords(spark, sf)
    val pieces = CorpusPrep.unigramPieces(words)
    val seg1 = CorpusPrep.unigramSegment(words, pieces)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2).toList))
    val usedMulti = seg1.flatMap { case (_, f, seg) => seg.filter(_.length > 1).map(_ -> f) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val rows = SparkEntry.queries("tok13_unigram_prune")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val byLen = rows.map(r => r._1 -> r).toMap
    // segmentability floor: every single char survives the prune
    assert(byLen(1)._3 == byLen(1)._2, "a single-char piece was pruned")
    // the multi-char keep count is exactly floor(|used multis| / 2)
    val multiAfter = rows.filter(_._1 > 1).map(_._3).sum
    assert(multiAfter == usedMulti.size / 2,
      s"kept $multiAfter multis, expected floor(${usedMulti.size}/2)")
    // a strictly smaller vocabulary can only segment the same or worse
    val (before, after) = (rows.head._6, rows.head._7)
    assert(after >= before, s"mean pieces/word improved after pruning: $before -> $after")
    assert(rows.map(_._7).distinct.length == 1 && rows.map(_._6).distinct.length == 1,
      "mean_nseg columns must be constant fit stats")
    // EM mass before matches tok12's segmentations exactly
    assert(rows.map(_._4).sum == seg1.map { case (_, f, seg) => f * seg.length }.sum,
      "pre-prune EM mass != tok12 recount")
  }

  test("e2e6: packed token mass equals tok12's EM mass — tokenizer and packer agree on the corpus") {
    import graft.operators.CorpusPrep
    val r = SparkEntry.queries("e2e6_unigram_packing")(spark, sf).collect().head
    // total tokens fold back out of the manifest's invariants:
    // pad = 256·pool_bins − pool_tokens and total = 256·full_bins + pool_tokens
    val packed = 256L * (r.getLong(5) + r.getLong(6)) - r.getLong(7)
    val words = CorpusPrep.unigramWords(spark, sf)
    val em = CorpusPrep.unigramSegment(words, CorpusPrep.unigramPieces(words))
      .select(col("freq"), size(col("seg")).as("nseg")).collect()
      .map(x => x.getLong(0) * x.getInt(1)).sum
    assert(packed == em, s"packed mass $packed != tok12 EM mass $em")
  }
}
