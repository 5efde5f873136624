package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit-packed SimHash aggregate — the A/B candidate SCALE.md flagged
  * against [[graft.operators.DedupOps.simHash]]'s 64 per-bit
  * `sum(when(...))` columns: ONE buffer of 64 int counters per group
  * instead of 64 separate long agg slots, updated in a tight loop over
  * the hash bits and sign-packed at eval. Same partial-aggregation
  * shape (update map-side, merge after the shuffle — the buffer
  * serializes to 256 bytes), same output contract (bit j = sign of the
  * per-bit ±1 sum; ties → 0, matching `sum > 0`).
  *
  * Trade-off being measured: the 64-column form stays inside
  * whole-stage codegen's HashAggregate with primitive slots; this form
  * leaves codegen (TypedImperativeAggregate is interpreted ObjectAgg)
  * but touches one object buffer. The A/B verdict lives in SCALE.md —
  * whichever loses stays out of the declared-query path.
  */
case class SimHashAgg(
    child: Expression,
    numBits: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](numBits)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < numBits) {
        if (((h >>> j) & 1L) == 1L) buffer(j) += 1 else buffer(j) -= 1
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j < numBits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buffer: Array[Int]): Any = {
    var bits = 0L
    var j = 0
    while (j < numBits) { if (buffer(j) > 0) bits |= 1L << j; j += 1 }
    bits
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numBits * 4)
    var j = 0
    while (j < numBits) { bb.putInt(buffer(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numBits)(bb.getInt())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
  override def prettyName: String = "simhash_agg"
}

object SimHashAgg {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
      // the analyzer wraps a bare AggregateFunction in its
      // AggregateExpression during function resolution; the optional
      // second arg is a literal bit width (the portable declared
      // queries hash into 60 bits, the production default is 64)
      (children: Seq[Expression]) => SimHashAgg(children.head,
        if (children.size > 1) children(1).eval(null).asInstanceOf[Int] else 64))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      descriptor._1, descriptor._2, descriptor._3)

  /** Column-API entry, same session-registration contract as VecDot.
    * (No default on numBits: the generated case-class apply already
    * carries defaults, and two overloads with defaults can't coexist.)
    */
  def apply(h: Column, numBits: Int): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("simhash_agg", h,
      org.apache.spark.sql.functions.lit(numBits))
  }
}
