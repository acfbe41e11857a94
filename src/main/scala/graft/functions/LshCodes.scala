package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Fixed random-hyperplane (Rademacher) bank shared by the native LSH
  * expression, the DataFrame composition in `VectorOps`, and the
  * generated DuckDB oracle SQL — one seed, one fill order, so all three
  * views of the planes are the same bits.
  *
  * Projections run over 1e-6-quantized INTEGER elements
  * ([[CosineSimilarityQ.quantize]]): the bucket code is the sign of an
  * exact integer sum, bit-identical in any engine and any sum order —
  * which is what lets the ANN/near-dup queries carry full DuckDB
  * oracles (float projections flip sign with sum order at the
  * boundary).
  */
object LshPlanes {
  val Tables = 12 // L hash tables
  val Stride = 12 // plane rows reserved per table (= max bits, near-dup)
  val Dim = 64 // embedding dimensionality

  /** ±1 plane signs, `Tables * Stride` rows × `Dim` columns (seed 7 —
    * same stream order as round 1's `Seq.fill` original).
    */
  val signs: Array[Array[Long]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(Tables * Stride)(Array.fill(Dim)(if (rnd.nextBoolean()) 1L else -1L))
  }

  /** All `Tables` bucket codes of one embedding in one pass: quantize
    * once, then `Tables × bits` integer dot products against the plane
    * bank. Called from both interpreted eval and the generated Java of
    * [[LshCodes]] (a single static call keeps the enclosing stage in
    * whole-stage codegen with zero per-element virtual dispatch).
    *
    * STRICT input contract: a vector that is not exactly `Dim` elements
    * or has any null element yields NULL codes — the row is excluded
    * from every bucket, so a corrupt embedding can never become an
    * ANN/near-dup candidate (and `posexplode(NULL)` drops it with zero
    * rows rather than bucketing garbage). The Column-composition twin
    * in VectorOps enforces the same contract.
    */
  def codes(arr: ArrayData, bits: Int): ArrayData = {
    val n = arr.numElements()
    if (n != Dim) return null
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      xs(i) = CosineSimilarityQ.quantize(arr.getFloat(i))
      i += 1
    }
    val out = new Array[Long](Tables)
    var t = 0
    while (t < Tables) {
      var code = 0L
      var j = 0
      while (j < bits) {
        val s = signs(t * Stride + j)
        var proj = 0L
        var k = 0
        while (k < Dim) { proj += xs(k) * s(k); k += 1 }
        if (proj > 0) code |= (1L << j)
        j += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression `lsh_codes(embedding, bits)` →
  * `array<bigint>` of [[LshPlanes.Tables]] per-table bucket codes.
  *
  * This is the 100 TB LSH coding path: a pure per-row function, so
  * coding a corpus is map-only — scan → project → (posexplode to bucket
  * rows) — with ZERO shuffle. Round 2 computed the same codes by
  * posexploding every vector into 64 element rows and hash-aggregating
  * 84 projection columns (a full shuffle of n×64 rows, the bench's most
  * expensive stage); the codes are identical because both are the sign
  * of the same exact integer sums.
  *
  * `bits` must be a foldable non-null integer in [1, Stride] — it picks
  * the code length (7 for ANN recall/cost balance, 12 for near-dup).
  */
case class LshCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        if (!right.foldable || right.eval() == null)
          TypeCheckResult.TypeCheckFailure(
            "lsh_codes bits must be a non-null integer literal")
        else {
          val b = right.eval().asInstanceOf[Int]
          if (b < 1 || b > LshPlanes.Stride)
            TypeCheckResult.TypeCheckFailure(
              s"lsh_codes bits must be in [1, ${LshPlanes.Stride}], got $b")
          else TypeCheckResult.TypeCheckSuccess
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"lsh_codes expects (array<float>, int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_codes"

  override def nullSafeEval(a: Any, b: Any): Any =
    LshPlanes.codes(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val planes = classOf[LshPlanes.type].getName.stripSuffix("$")
      s"""
         |${ev.value} = $planes$$.MODULE$$.codes($a, $b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
