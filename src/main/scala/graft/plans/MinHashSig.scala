package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All `numHashes` MinHash signature minima in ONE pass over the word
  * array — the fused form of
  * `(0 until k).map(i => array_min(transform(ws, w => seedHash(i, w))))`.
  *
  * Why custom: the per-seed
  * `transform` lambdas are CodegenFallback, so the signature stage of
  * EVERY MinHash pipeline (banding, verified near-dup, canonical
  * keepers, cluster capping, incremental dedup) evaluated k interpreted
  * transforms per document, each allocating an intermediate hash array
  * the `array_min` then walked. This expression hashes each word once
  * per seed inside a single fused loop with zero intermediate arrays.
  *
  * Hash parity (both forms spec-compared verbatim over the corpus):
  *  - production (`portable = false`): `xxhash64(lit(i), w)` — Spark's
  *    seed-chained XXH64: per-seed inner seed
  *    `hashLong(i, 42L)` precomputed once, then
  *    `hashUnsafeBytes(word, seedᵢ)` per word — the identical public
  *    `XXH64` arithmetic the built-in expression calls.
  *  - oracle-portable (`portable = true`):
  *    `md5Hash60(concat("<i>:", w))` — first 15 hex chars of the md5 as
  *    a 60-bit long, i.e. the big-endian first 8 digest bytes shifted
  *    right one nibble.
  *
  * `array_min` semantics preserved: null words skipped, an empty/
  * all-null word array yields null minima.
  */
case class MinHashSig(child: Expression, numHashes: Int, portable: Boolean)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<STRING> input, got ${t.catalogString}")
  }

  // the seed-chained first step of xxhash64(lit(i), w) is word-free —
  // hoisted out of the per-row loop entirely. lit(i) is an INT literal,
  // so the chain step is hashInt (hashLong would silently re-seed every
  // plane differently — caught by the parity spec)
  @transient private lazy val xxSeeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  /** One fused pass; public so the generated code can call it. */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val mins = new Array[Long](numHashes)
    val found = new Array[Boolean](numHashes)
    var j = 0
    while (j < n) {
      if (!words.isNullAt(j)) {
        val w = words.getUTF8String(j)
        var i = 0
        if (portable) {
          while (i < numHashes) {
            val h = MinHashSig.md5Top60(i + ":" + w.toString)
            if (!found(i) || h < mins(i)) { mins(i) = h; found(i) = true }
            i += 1
          }
        } else {
          while (i < numHashes) {
            val h = XXH64.hashUnsafeBytes(
              w.getBaseObject, w.getBaseOffset, w.numBytes, xxSeeds(i))
            if (!found(i) || h < mins(i)) { mins(i) = h; found(i) = true }
            i += 1
          }
        }
      }
      j += 1
    }
    // primitive fast path when every seed found a word (any non-empty
    // word array): consumers read k elements per row, and a boxed
    // GenericArrayData would unbox each — emit UnsafeArrayData instead
    var allFound = true
    var i = 0
    while (i < numHashes) { if (!found(i)) allFound = false; i += 1 }
    if (allFound)
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(mins)
    else {
      val out = new Array[Any](numHashes)
      i = 0
      while (i < numHashes) {
        if (found(i)) out(i) = mins(i)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  protected override def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // one virtual call per row into the compiled loop above — the
      // row stays inside the fused stage, the loop runs as JVM-compiled
      // Scala (the addReferenceObj pattern for loop-heavy expressions)
      val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  /** First 60 bits of md5 over the string's UTF-8 bytes — exactly
    * `conv(substring(md5(s), 1, 15), 16, 10)`: hex chars 0..14 are the
    * big-endian first 8 digest bytes shifted right one nibble.
    */
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Top60(s: String): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(children(0),
        children(1).eval().asInstanceOf[Int],
        children(2).eval().asInstanceOf[Boolean]))

  /** Column-API entry; registers idempotently like [[VecDot]]. */
  def sig(words: Column, numHashes: Int, portable: Boolean): Column = {
    val spark = SparkSession.active
    spark.sessionState.functionRegistry.registerFunction(
      descriptor._1, descriptor._2, descriptor._3)
    org.apache.spark.sql.functions.call_function("minhash_sig", words,
      org.apache.spark.sql.functions.lit(numHashes),
      org.apache.spark.sql.functions.lit(portable))
  }
}
