package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Nearest-centroid argmax as ONE codegen'd nested loop: position (in
  * `right`, an ARRAY<ARRAY<BIGINT>> of centroid vectors) of the
  * centroid with the maximal integer dot product against `left`
  * (ARRAY<BIGINT>), ties to the LOWEST position, −1 on an empty
  * centroid array.
  *
  * Why custom (the same CodegenFallback story as [[MinHashSig]]): the previous
  * formulation folded `when(dot > acc.score, …)` with
  * `aggregate(...)` over a literal struct array — a higher-order
  * lambda, hence CodegenFallback, hence the WHOLE cell-assignment
  * projection (the full-corpus map pass that makes IVF an index)
  * ran interpreted, allocating an intermediate struct per centroid
  * per row. This expression is the identical arithmetic — int64 dots
  * with null elements contributing 0, strict `>` so the earliest
  * maximal position wins — as one fused loop.
  */
case class ArgMaxDotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "argmax_dot_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT> and ARRAY<ARRAY<BIGINT>>, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val k = cents.numElements()
    var best = -1
    var bestScore = Long.MinValue
    var c = 0
    while (c < k) {
      if (!cents.isNullAt(c)) {
        val cv = cents.getArray(c)
        val n = math.min(v.numElements(), cv.numElements())
        var s = 0L
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i) && !cv.isNullAt(i)) s += v.getLong(i) * cv.getLong(i)
          i += 1
        }
        if (s > bestScore) { bestScore = s; best = c }
      }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      s"""
         |int $k = $b.numElements();
         |int $best = -1;
         |long $bestScore = Long.MIN_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  if (!$b.isNullAt($c)) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv = $b.getArray($c);
         |    int $n = Math.min($a.numElements(), $cv.numElements());
         |    long $s = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$a.isNullAt($i) && !$cv.isNullAt($i)) {
         |        $s += $a.getLong($i) * $cv.getLong($i);
         |      }
         |    }
         |    if ($s > $bestScore) { $bestScore = $s; $best = $c; }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArgMaxDot {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("argmax_dot_long"),
      new ExpressionInfo(classOf[ArgMaxDotLong].getName, "argmax_dot_long"),
      (children: Seq[Expression]) => ArgMaxDotLong(children(0), children(1)))

  /** Column-API entry; registers idempotently like [[VecDot]]. */
  def argMaxDotLong(v: Column, centroids: Column): Column = {
    val spark = SparkSession.active
    spark.sessionState.functionRegistry.registerFunction(
      descriptor._1, descriptor._2, descriptor._3)
    org.apache.spark.sql.functions.call_function("argmax_dot_long", v, centroids)
  }
}
