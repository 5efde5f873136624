package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** ARRAY<FLOAT> → ARRAY<BIGINT> fixed-point projection as ONE codegen'd
  * loop: element i becomes `round(cast(v as double) * 1e7)` on the same
  * HALF_UP BigDecimal grid as the `transform(emb, v => fixedPoint(v))`
  * composition it replaces (`java.math.BigDecimal.valueOf(d).setScale(0,
  * HALF_UP)` is exactly Spark's Round-on-double arithmetic, so every
  * oracle-checked integer downstream is bit-identical — a property spec
  * pins the equality over random vectors).
  *
  * Why a custom Expression (the SURVEY §4.2 ladder): Spark's
  * higher-order functions (`transform` lambdas) are CodegenFallback —
  * ANY projection containing one drops out of whole-stage codegen, so
  * the fixed-point prep pass of every exact-arithmetic similarity
  * pipeline ran interpreted over the full corpus (lambda dispatch + a
  * boxed intermediate per element per row). This expression keeps the
  * conversion inside the fused stage: at 100 TB the prep pass is a
  * full-corpus scan, and interpreted-vs-fused on that scan is the same
  * class of win as [[LongVecDot]] on the pair loop.
  *
  * Null elements pass through as null (the transform-composition
  * semantics: round/cast of NULL is NULL). Deviation only off the
  * corpus invariant of finite floats: a NaN/±Inf element follows Java
  * double→long cast semantics (0 / ±Long.Max) where the ANSI cast in
  * the transform form would error — same deviations-only-off-invariant
  * contract as [[VecDotBase]].
  */
case class FixedPointArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "fixed_point_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT> input, got ${t.catalogString}")
  }

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i))
        out(i) = FixedPointArray.fixed(x.getFloat(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val vals = ctx.freshName("vals")
      s"""
         |int $n = $a.numElements();
         |Object[] $vals = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $vals[$i] = (Object) graft.plans.FixedPointArray$$.MODULE$$
         |      .fixed($a.getFloat($i));
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($vals);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FixedPointArray {

  /** The per-element grid: `(long) round_half_up(f · 1e7)` — shared by
    * interpreted eval and the generated code so the two paths cannot
    * drift. `BigDecimal.valueOf` (the shortest-decimal representation)
    * + HALF_UP is Spark's own Round-on-double arithmetic.
    */
  def fixed(f: Float): Long = {
    val d = f.toDouble * 1.0e7
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d.toLong
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("fixed_point_array"),
      new ExpressionInfo(classOf[FixedPointArray].getName, "fixed_point_array"),
      (children: Seq[Expression]) => FixedPointArray(children.head))

  /** Column-API entry; registers idempotently like [[VecDot]]. */
  def fixedPointArray(c: Column): Column = {
    val spark = SparkSession.active
    spark.sessionState.functionRegistry.registerFunction(
      descriptor._1, descriptor._2, descriptor._3)
    org.apache.spark.sql.functions.call_function("fixed_point_array", c)
  }
}
