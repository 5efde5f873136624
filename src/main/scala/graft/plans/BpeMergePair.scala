package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge pass: replace every LEFTMOST-NONOVERLAPPING adjacent
  * occurrence of the symbol pair (`left`, `right`) in the symbol array
  * with the single symbol `left || right` — the inner step of byte-pair
  * -encoding tokenizer training ([[graft.operators.TextOps.bpeFit]]).
  *
  * Implemented as a single left fold: append each input symbol; when the
  * tail equals `left` and the incoming symbol equals `right`, replace
  * the tail with the concatenation. The fold is EXACTLY the
  * leftmost-nonoverlapping scan: it can never over-merge, because a
  * just-merged tail holds `left || right`, which differs from `left`
  * whenever `right` is non-empty (symbols are never empty — they start
  * as single characters and grow by concatenation). Same-symbol runs
  * come out at the standard BPE parity — "aaaa" under (a,a) becomes
  * [aa, aa], "aaa" becomes [aa, a] — which the relational twin
  * ([[graft.operators.TextOps.bpeMergeStepRelational]]) reproduces via
  * a gaps-and-islands window parity rule, and the DuckDB oracle replays
  * identically (the cross-engine pin of the declared query).
  *
  * Why an Expression: the fold is sequential per row — built-in
  * higher-order functions could express it only as an O(n²)
  * slice-and-concat `aggregate` lambda on the interpreted
  * CodegenFallback path. One fused loop per row keeps tokenizer
  * fitting inside whole-stage codegen even at production vocabulary
  * sizes (the per-round working set of BPE training is the DISTINCT
  * WORD table, which at 100 TB is millions of rows × thousands of
  * rounds — per-row constants matter there).
  */
case class BpeMergePair(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_merge_pair"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<STRING>, STRING, STRING), got " +
          s"(${a.catalogString}, ${l.catalogString}, ${r.catalogString})")
    }

  /** The fold; public so the generated code can call it. Null elements
    * pass through unmerged (callers tokenize with `split`, which never
    * yields null elements; the pass-through keeps the expression total).
    */
  def compute(syms: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[AnyRef](n)
    val merged = UTF8String.concat(l, r)
    var m = 0
    var i = 0
    while (i < n) {
      val x = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      if (m > 0 && x != null && out(m - 1) != null &&
          out(m - 1).asInstanceOf[UTF8String].equals(l) && x.equals(r)) {
        out(m - 1) = merged
      } else {
        out(m) = x
        m += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  protected override def nullSafeEval(a: Any, l: Any, r: Any): Any =
    compute(a.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, l, r) => {
      val ref = ctx.addReferenceObj("bpeMergePair", this,
        classOf[BpeMergePair].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.compute($a, $l, $r);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeMergePair {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bpe_merge_pair"),
      new ExpressionInfo(classOf[BpeMergePair].getName, "bpe_merge_pair"),
      (children: Seq[Expression]) =>
        BpeMergePair(children(0), children(1), children(2)))

  /** Column-API entry; registers idempotently like [[SortedHashedSet]]. */
  def bpeMergePair(syms: Column, left: Column, right: Column): Column = {
    val spark = SparkSession.active
    spark.sessionState.functionRegistry.registerFunction(
      descriptor._1, descriptor._2, descriptor._3)
    org.apache.spark.sql.functions.call_function(
      "bpe_merge_pair", syms, left, right)
  }
}
