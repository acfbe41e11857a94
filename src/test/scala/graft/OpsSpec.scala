package graft

import org.apache.spark.sql.functions._
import graft.analytics.Dashboard
import graft.operators.{MinHash, Multimodal, VectorOps}

/** Operator-semantics tests for paths the sf-data oracle can't exercise
  * (empty anti-join, fully-populated pivot) plus the approximate
  * operators' planted-duplicate guarantees.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("left-anti join returns rows with no match (gap: j4 is empty on sf data)") {
    val part = Seq((1L, "B1"), (2L, "B1"), (3L, "B2")).toDF("p_partkey", "p_brand")
    val li = Seq(1L, 1L).toDF("l_partkey")
    val never = part.join(li, part("p_partkey") === li("l_partkey"), "left_anti")
    assert(never.select("p_partkey").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("pivot fills absent combinations with 0 (gap: all cells populated on sf data)") {
    val ev = Seq(("2024-01-01", "click"), ("2024-01-01", "click"), ("2024-01-02", "view"))
      .toDF("day", "event_type")
    val types = Seq("click", "view")
    val p = ev.groupBy("day").pivot("event_type", types).count()
    val filled = types.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
    val d2 = filled.filter(col("day") === "2024-01-02").first()
    assert(d2.getAs[Long]("click") == 0L && d2.getAs[Long]("view") == 1L)
  }

  test("dropAllNullColumns keeps partially-null, drops fully-null") {
    val df = Seq((1, Some("a")), (2, None)).toDF("id", "partial")
      .withColumn("empty", lit(null).cast("int"))
    val out = Dashboard.dropAllNullColumns(df)
    assert(out.columns.toSeq == Seq("id", "partial"))
  }

  test("minhash LSH finds a one-word-edit near-duplicate") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w20", "zz") // 1 of 40 words changed
    val unrelated = (1 to 40).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = MinHash.nearDupPairs(docs, 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(pairs.head.getAs[Double]("est_jaccard") >= 0.5)
  }

  test("cosine: identical vectors score 1, orthogonal score 0") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val a = df.select(col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = df.select(col("vec_id").as("v2"), col("embedding").as("e2"))
    val cos = a.crossJoin(b).filter(col("v1") < col("v2"))
      .withColumn("cos", VectorOps.cosine(col("e1"), col("e2")))
      .select("v1", "v2", "cos").as[(Long, Long, Double)].collect()
      .map { case (x, y, c) => (x, y) -> c }.toMap
    assert(math.abs(cos((1L, 2L)) - 1.0) < 1e-12)
    assert(math.abs(cos((1L, 3L))) < 1e-12)
  }

  test("identical embeddings share every LSH table code") {
    val v = Array.tabulate(64)(i => (math.sin(i) * 0.3).toFloat)
    val df = Seq((1L, v), (2L, v)).toDF("vec_id", "embedding")
      .withColumn("codes", VectorOps.lshCodes(col("embedding")))
    val codes = df.select("codes").as[Seq[Long]].collect()
    assert(codes(0) == codes(1))
    assert(codes(0).length == VectorOps.Tables_)
  }

  test("multimodal stub decode is deterministic and batch-shaped") {
    val media = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    val f1 = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    assert(f1.toSeq == f2.toSeq) // deterministic
    assert(f1.forall(f => f.width >= 64 && f.mean_level >= 0 && f.mean_level <= 1))
    assert(f1.length == media.count())
  }
}
