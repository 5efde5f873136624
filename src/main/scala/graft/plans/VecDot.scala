package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for the ANN hot loop: the pairwise dot
  * product folded as ONE codegen'd primitive loop per row pair.
  *
  * Why custom `Expression`s (SURVEY §4.2 decision ladder): the built-in
  * formulation `aggregate(zip_with(a, b, _*_), 0, _+_)` allocates an
  * intermediate array per evaluated PAIR and walks it with per-element
  * Catalyst eval — in a brute-force corpus×queries scan that allocation
  * happens |corpus|·|queries| times. These expressions keep the fold
  * inside whole-stage codegen with zero allocation. Semantics match the
  * zip_with fold on the corpus invariants (equal-length arrays, no null
  * elements): identical element order and arithmetic, so [[LongVecDot]]
  * is bit-identical to the fixed-point fold it replaces and stays
  * oracle-exact. Deviations only off-invariant: length mismatch folds
  * the common prefix and null elements contribute 0 (zip_with would
  * yield SQL NULL).
  */
abstract class VecDotBase extends BinaryExpression {
  protected def elemType: DataType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _)) if l == elemType && r == elemType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<${elemType.catalogString}> inputs, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression
}

/** Integer dot product over two ARRAY<BIGINT> columns (fixed-point ANN
  * scores): Σ aᵢ·bᵢ in int64 — order-free, engine-exact.
  */
case class LongVecDot(left: Expression, right: Expression) extends VecDotBase {
  override protected def elemType: DataType = LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_long"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Double dot product over two ARRAY<FLOAT> columns: Σ (double)aᵢ·bᵢ,
  * left-to-right — the same op sequence as the zip_with/aggregate fold
  * it replaces, so scores are unchanged where both appear.
  */
case class FloatVecDot(left: Expression, right: Expression) extends VecDotBase {
  override protected def elemType: DataType = FloatType
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot_float"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of an ARRAY<FLOAT> column against an ARRAY<DOUBLE>
  * column (round 11): Σ (double)aᵢ · bᵢ left-to-right — the exact
  * operation sequence of the `aggregate(zip_with(emb, plane,
  * x.cast(double) * y), 0.0, +)` fold it replaces in the sign-LSH
  * plane dots, so bucket bits are bit-identical while the projection
  * stays inside whole-stage codegen (the higher-order fold was
  * CodegenFallback and dropped the whole bucketing pass out).
  */
case class FloatDoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot_float_double"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT> and ARRAY<DOUBLE> inputs, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += (double) $a.getFloat($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two SORTED-ascending distinct
  * ARRAY<BIGINT> columns as one merge walk — the LSH verify primitive.
  * `size(array_intersect(a, b))` builds a hash set per evaluated PAIR;
  * the merge walk is allocation-free and the COUNT is
  * algorithm-independent, so swapping it in cannot move any
  * oracle-checked value. Null elements are skipped (sort_array places
  * them first; the corpus arrays are null-free).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends VecDotBase {
  override protected def elemType: DataType = LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && x.isNullAt(i)) i += 1
    while (j < m && y.isNullAt(j)) j += 1
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $a.isNullAt($i)) $i++;
         |while ($j < $m && $b.isNullAt($j)) $j++;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sparse weighted dot product over two ARRAY<STRUCT<k: BIGINT,
  * w: BIGINT>> columns, both sorted ascending by `k`: Σ wₐ·w_b over
  * matching keys, as one allocation-free merge walk — the verify
  * primitive for sparse-vector cosine joins (tf-idf near-dup). The
  * map-type alternative (`element_at` per key) is a linear scan per
  * LOOKUP in Spark's MapData — O(nₐ·n_b) per pair; the merge walk is
  * O(nₐ+n_b). Null elements are skipped wherever they appear (guarded
  * per iteration in both eval paths, so a mid-array null can never NPE
  * interpreted eval or read garbage in codegen); duplicate keys within
  * one array (only possible via a 64-bit hash collision between two
  * words of the SAME document) pair off positionally — the
  * corpus-pinned 2⁻⁶⁴ margin documented at every hashed-set kernel.
  */
case class SortedKeyWeightDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_kw_dot"

  private def isKwArray(t: DataType): Boolean = t match {
    case ArrayType(s: org.apache.spark.sql.types.StructType, _) =>
      s.fields.length == 2 && s.fields.forall(_.dataType == LongType)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isKwArray(left.dataType) && isKwArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<STRUCT<BIGINT, BIGINT>> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var s = 0L
    while (i < n && j < m) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xr = x.getStruct(i, 2)
        val yr = y.getStruct(j, 2)
        val xk = xr.getLong(0)
        val yk = yr.getLong(0)
        if (xk < yk) i += 1
        else if (xk > yk) j += 1
        else { s += xr.getLong(1) * yr.getLong(1); i += 1; j += 1 }
      }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val xr = ctx.freshName("xr")
      val yr = ctx.freshName("yr")
      val xk = ctx.freshName("xk")
      val yk = ctx.freshName("yk")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $s = 0L;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    org.apache.spark.sql.catalyst.InternalRow $xr = $a.getStruct($i, 2);
         |    org.apache.spark.sql.catalyst.InternalRow $yr = $b.getStruct($j, 2);
         |    long $xk = $xr.getLong(0);
         |    long $yk = $yr.getLong(0);
         |    if ($xk < $yk) { $i++; }
         |    else if ($xk > $yk) { $j++; }
         |    else { $s += $xr.getLong(1) * $yr.getLong(1); $i++; $j++; }
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  val longDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("vec_dot_long"),
      new ExpressionInfo(classOf[LongVecDot].getName, "vec_dot_long"),
      (children: Seq[Expression]) => LongVecDot(children(0), children(1)))

  val floatDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("vec_dot_float"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot_float"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1)))

  val intersectDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1)))

  val kwDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("sorted_kw_dot"),
      new ExpressionInfo(classOf[SortedKeyWeightDot].getName, "sorted_kw_dot"),
      (children: Seq[Expression]) => SortedKeyWeightDot(children(0), children(1)))

  val floatDoubleDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("vec_dot_float_double"),
      new ExpressionInfo(classOf[FloatDoubleVecDot].getName, "vec_dot_float_double"),
      (children: Seq[Expression]) => FloatDoubleVecDot(children(0), children(1)))

  /** Idempotent runtime registration into an existing session — the
    * umbrella registrar for EVERY custom kernel (a fresh child session
    * starts with an empty function registry; one call arms them all).
    */
  def register(spark: SparkSession): Unit =
    Seq(longDescriptor, floatDescriptor, intersectDescriptor, kwDotDescriptor,
      floatDoubleDescriptor, ArgMaxDot.descriptor,
      MinHashSig.descriptor, SortedHashedSet.descriptor,
      BpeMergePair.descriptor)
      .foreach { case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }

  /** Column-API entries. The active SparkSession must exist (any
    * DataFrame pipeline has one).
    */
  def dotLong(a: Column, b: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("vec_dot_long", a, b)
  }

  def dotFloat(a: Column, b: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("vec_dot_float", a, b)
  }

  def sortedIntersectCount(a: Column, b: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("sorted_intersect_count", a, b)
  }

  def sortedKeyWeightDot(a: Column, b: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("sorted_kw_dot", a, b)
  }

  def dotFloatDouble(a: Column, b: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("vec_dot_float_double", a, b)
  }
}
