package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two `array<float>`
  * columns, with whole-stage-codegen support (`doGenCode` emits a tight
  * primitive loop). Preferred over the `zip_with`+`aggregate` composition
  * for hot paths: higher-order functions evaluate their lambdas
  * per-element in interpreted mode, while this stays inside the
  * generated Java of the enclosing stage (~10x on the ANN scoring path).
  *
  * Accumulation is left-to-right in doubles — the same order and
  * arithmetic as the `zip_with` formulation, so results are identical.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  /** NULL (not NaN) for degenerate inputs — mismatched lengths or a
    * zero-norm side — matching the zip_with composition's semantics
    * (Spark's Divide yields NULL on 0/0). NaN here would silently rank
    * FIRST in a desc top-k sort.
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // match zip_with's null propagation
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if ($anyNull || $na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: cosine similarity of two `array<float>`
  * columns over 1e-6-QUANTIZED integer elements — bit-identical across
  * engines (DuckDB oracle computes the same longs), unlike float
  * accumulation whose last ulp depends on the engine's sum order.
  *
  * Element quantization matches Spark's `round(x * 1e6, 0)` HALF_UP
  * semantics exactly (away-from-zero, correctly-rounded — `Math.round`
  * post-JDK-8010430, negated for the negative side). All accumulation
  * is in longs (64 dims × (4e6)² ≈ 1e15 < 2^53, so the final
  * long→double conversions are exact); one IEEE division at the end.
  */
case class CosineSimilarityQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_q expects two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = CosineSimilarityQ.quantize(x.getFloat(i))
      val yi = CosineSimilarityQ.quantize(y.getFloat(i))
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0L || nb == 0L) null
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val anyNull = ctx.freshName("anyNull")
      val q = classOf[CosineSimilarityQ].getName
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L, $na = 0L, $nb = 0L;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    long $xi = $q$$.MODULE$$.quantize($a.getFloat($i));
         |    long $yi = $q$$.MODULE$$.quantize($b.getFloat($i));
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if ($anyNull || $na == 0L || $nb == 0L) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = (double) $dot /
         |      (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityQ {
  /** `round(x * 1e6, 0)` with Spark/DuckDB HALF_UP-away-from-zero
    * semantics, exact on the binary double value.
    */
  def quantize(x: Float): Long = {
    val v = x.toDouble * 1e6
    if (v >= 0) Math.round(v) else -Math.round(-v)
  }
}

/** Native expression `dot_q(a, b)` → BIGINT: the raw integer dot
  * product of two 1e-6-quantized `array<float>` vectors. Exposed
  * separately from `cosine_sim_q` for rankings that normalize by ONE
  * side only (e.g. k-means cell assignment, where the per-vector norm
  * is constant inside the argmax): the oracle can reproduce
  * `dot / sqrt(centroid_norm)` bit-for-bit from the same integer sums,
  * which a pre-divided cosine wouldn't allow. Null on length mismatch
  * or null element, like its siblings.
  */
case class DotQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_q expects two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += CosineSimilarityQ.quantize(x.getFloat(i)) *
        CosineSimilarityQ.quantize(y.getFloat(i))
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val anyNull = ctx.freshName("anyNull")
      val q = classOf[CosineSimilarityQ].getName
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    $dot += $q$$.MODULE$$.quantize($a.getFloat($i)) *
         |      $q$$.MODULE$$.quantize($b.getFloat($i));
         |  }
         |  if ($anyNull) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NativeFunctions {
  /** Register engine-native SQL functions on a session (idempotent).
    * Usage after registration: `expr("cosine_sim(a, b)")`. Sessions
    * built with [[GraftExtensions]] get these automatically; this
    * per-session form covers ad-hoc sessions.
    */
  def register(spark: SparkSession): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
  }
}

/** Production registration path: `spark.sql.extensions=graft.functions.
  * GraftExtensions` injects the engine's native expressions into every
  * session built from that config (plain SQL users get `cosine_sim` /
  * `cosine_sim_q` with no Scala call). This is the ONLY extension point
  * the engine needs — no custom Rule/Strategy (COVERAGE.md §2.11).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, name), builder))
    }
}

object GraftExtensions {
  /** Name → expression builder for every engine-native function (shared
    * by the extensions injection and tests).
    */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1))),
    ("cosine_sim_q", exprs => CosineSimilarityQ(exprs(0), exprs(1))),
    ("lsh_codes", exprs => LshCodes(exprs(0), exprs(1))),
    ("dot_q", exprs => DotQ(exprs(0), exprs(1))),
    ("nfc_normalize", exprs => NfcNormalize(exprs(0))),
    ("md5_prefix60", exprs => Md5Prefix60(exprs(0))))

  /** Forked sanity main: proves an extensions-built session resolves
    * the native functions in plain SQL with no register() call
    * (getOrCreate in a test JVM would reuse an existing session and
    * silently skip extensions, so this check needs its own JVM).
    */
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cpus = "2", appName = "graft-ext-check")
    val c = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))," +
        " cosine_sim_q(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))," +
        " size(lsh_codes(array_repeat(CAST(1.0 AS FLOAT), 64), 7))," +
        " nfc_normalize('café')")
      .first()
    require(c.getDouble(0) == 1.0 && c.getDouble(1) == 1.0)
    require(c.getInt(2) == LshPlanes.Tables)
    require(c.getString(3) == "café")
    println("[extensions-check] OK: native functions resolved via spark.sql.extensions")
    spark.stop()
  }
}
