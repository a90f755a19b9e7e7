package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The KMV sketch as a MERGEABLE VALUE: `kmv_sketch(hash, k)` returns the
  * k smallest DISTINCT hashes as a sorted `array<bigint>` — the full
  * sketch, not just [[KmvAgg]]'s `(n_kept, kth)` summary — so sketches
  * can be stored per partition-of-time (per day, per source) and later
  * UNIONED without revisiting the fact: `kmv_merge(sketch, k)`
  * re-aggregates already-built sketch arrays into the sketch of the
  * union of their underlying sets.
  *
  * Merge is EXACT sketch algebra, not approximation stacking: the k
  * smallest distinct values of a union are a function of each input's k
  * smallest distinct values alone, so `kmv_merge` over daily sketches
  * equals `kmv_sketch` over the concatenated raw stream — the property
  * SketchesSpec pins. Consequently the standard KMV guarantees carry
  * over unchanged: if the merged sketch holds fewer than k values, every
  * contributor was unsaturated and the sketch IS the exact distinct set;
  * otherwise the usual `(k−1)·2⁶⁰ / kth` estimator applies (same
  * arithmetic as [[KmvAgg]], ~1/√k error, Bar-Yossef et al. 2002).
  *
  * Scale shape: this is the SERVING path for sliding-window distincts
  * (q_active_users_kmv): materialize O(days × k) daily sketches once,
  * then any trailing window (7-day, 30-day, arbitrary) is a merge of
  * window-many k-arrays — O(window × k) per report row — where the exact
  * path re-joins the fact per report day. Both aggregates are map-side
  * combinable bounded buffers (≤ k longs), the same shuffle contract as
  * [[KmvAgg]].
  */
case class KmvSketchAgg(
    hash: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Buffer]
  with BinaryLike[Expression] {

  private lazy val k: Int = KmvSketchAgg.evalK(kExpr)

  override def left: Expression = hash
  override def right: Expression = kExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch hash must be BIGINT, got ${hash.dataType.simpleString}")
    else KmvSketchAgg.checkK("kmv_sketch", kExpr)

  override def createAggregationBuffer(): KmvAgg.Buffer = new KmvAgg.Buffer(k)

  override def update(buf: KmvAgg.Buffer, input: InternalRow): KmvAgg.Buffer = {
    val h = hash.eval(input)
    if (h != null) buf.offer(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvAgg.Buffer, other: KmvAgg.Buffer): KmvAgg.Buffer = {
    other.foreach(buf.offer)
    buf
  }

  /** The kept minima, ascending (TreeSet iteration order). */
  override def eval(buf: KmvAgg.Buffer): Any = KmvSketchAgg.toArrayData(buf)

  override def serialize(buf: KmvAgg.Buffer): Array[Byte] =
    KmvSketchAgg.ser(buf)
  override def deserialize(bytes: Array[Byte]): KmvAgg.Buffer =
    KmvSketchAgg.deser(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSketchAgg =
    copy(hash = newLeft, kExpr = newRight)
  override def prettyName: String = "kmv_sketch"
}

/** `kmv_merge(sketch, k)`: union already-built `kmv_sketch` arrays into
  * the sketch of the combined underlying set (see [[KmvSketchAgg]]).
  * NULL sketch rows are skipped — `kmv_merge(CASE WHEN cond THEN sk END,
  * k)` is the conditional-merge idiom (the q_kmv_overlap shape). */
case class KmvMergeAgg(
    sketch: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Buffer]
  with BinaryLike[Expression] {

  private lazy val k: Int = KmvSketchAgg.evalK(kExpr)

  override def left: Expression = sketch
  override def right: Expression = kExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case ArrayType(LongType, _) => KmvSketchAgg.checkK("kmv_merge", kExpr)
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge input must be ARRAY<BIGINT>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KmvAgg.Buffer = new KmvAgg.Buffer(k)

  override def update(buf: KmvAgg.Buffer, input: InternalRow): KmvAgg.Buffer = {
    val a = sketch.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) buf.offer(arr.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: KmvAgg.Buffer, other: KmvAgg.Buffer): KmvAgg.Buffer = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: KmvAgg.Buffer): Any = KmvSketchAgg.toArrayData(buf)

  override def serialize(buf: KmvAgg.Buffer): Array[Byte] =
    KmvSketchAgg.ser(buf)
  override def deserialize(bytes: Array[Byte]): KmvAgg.Buffer =
    KmvSketchAgg.deser(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvMergeAgg =
    copy(sketch = newLeft, kExpr = newRight)
  override def prettyName: String = "kmv_merge"
}

object KmvSketchAgg {
  private[expressions] def evalK(kExpr: Expression): Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"kmv k: $other")
  }

  private[expressions] def checkK(fn: String,
                                  kExpr: Expression): TypeCheckResult =
    if (kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$fn k must be INT, got ${kExpr.dataType.simpleString}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$fn k must be a literal")
    else if (kExpr.eval() == null || evalK(kExpr) <= 0)
      TypeCheckResult.TypeCheckFailure(s"$fn k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess

  private[expressions] def toArrayData(buf: KmvAgg.Buffer): GenericArrayData = {
    val out = new Array[Long](buf.size)
    var i = 0
    buf.foreach { h => out(i) = h; i += 1 }
    new GenericArrayData(out)
  }

  private[expressions] def ser(buf: KmvAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(h => bb.putLong(h))
    bb.array()
  }

  private[expressions] def deser(bytes: Array[Byte], k: Int): KmvAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvAgg.Buffer(k)
    var j = 0
    while (j < n) { buf.offer(bb.getLong); j += 1 }
    buf
  }
}
