package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The sorted distinct xxhash64 word set —
  * `sort_array(array_distinct(transform(ws, w => xxhash64(w))))` fused
  * into one pass: hash every word (Spark's default-seed-42 XXH64, the
  * identical public arithmetic the built-in expression calls), sort the
  * primitive longs, deduplicate in place, emit an UnsafeArrayData. This
  * is the per-document prep of every sorted-merge-walk verify kernel
  * ([[SortedIntersectCount]] in the LSH-verified Jaccard, dense
  * Jaccard, and prefix-containment pipelines) — previously a
  * CodegenFallback `transform` lambda plus two more array passes, each
  * materializing an intermediate boxed array per document.
  *
  * Set equality with the composed form is exact: same hash per word,
  * same distinct set, same ascending order (a sorted set has one
  * representation). Null words are skipped — the composed form kept a
  * null FIRST under sort_array's nulls-first default, but every caller
  * feeds `split(text, " ")`, which never yields null elements; the
  * deviations-only-off-invariant contract as [[VecDotBase]].
  */
case class SortedHashedSet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_hashed_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<STRING> input, got ${t.catalogString}")
  }

  /** One fused pass; public so the generated code can call it. */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val hashes = new Array[Long](n)
    var m = 0
    var j = 0
    while (j < n) {
      if (!words.isNullAt(j)) {
        val w = words.getUTF8String(j)
        hashes(m) = XXH64.hashUnsafeBytes(
          w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
        m += 1
      }
      j += 1
    }
    java.util.Arrays.sort(hashes, 0, m)
    // in-place dedup over the sorted prefix
    var out = 0
    var i = 0
    while (i < m) {
      if (out == 0 || hashes(i) != hashes(out - 1)) {
        hashes(out) = hashes(i)
        out += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hashes, out))
  }

  protected override def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("sortedHashedSet", this,
        classOf[SortedHashedSet].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedHashedSet {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("sorted_hashed_set"),
      new ExpressionInfo(classOf[SortedHashedSet].getName, "sorted_hashed_set"),
      (children: Seq[Expression]) => SortedHashedSet(children.head))

  /** Column-API entry; registers idempotently like [[VecDot]]. */
  def sortedHashedSet(words: Column): Column = {
    val spark = SparkSession.active
    spark.sessionState.functionRegistry.registerFunction(
      descriptor._1, descriptor._2, descriptor._3)
    org.apache.spark.sql.functions.call_function("sorted_hashed_set", words)
  }
}
