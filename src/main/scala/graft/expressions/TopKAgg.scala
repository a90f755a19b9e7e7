package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: `topk(score, id, k)` keeps the k best
  * (score DESC, id ASC — a total order, so results are deterministic under
  * ties) and returns them as a sorted `array<struct<score,id>>`.
  *
  * Why a native aggregate instead of `row_number().over(...)` + filter:
  * the window plan SORTS every group's full row set and SHUFFLES every
  * input row to its group's partition before discarding all but k. This
  * aggregate is map-side combinable — each mapper reduces its share of a
  * group to ≤ k entries of (double, long) before the exchange, so the
  * shuffle moves O(groups × k × mappers) scalars instead of O(input rows)
  * full rows, and nothing is ever sorted but the final k-element heaps.
  * At 100 TB (per-group top-k over billions of rows, e.g. the ANN probe
  * ranking or "top documents per domain"), that is the difference between
  * a full-data shuffle and a metadata-sized one.
  *
  * The reference has only global ORDER BY + LIMIT shapes
  * (/root/reference/04_KPI/KPIs.sql — aggregation views); this is the
  * grouped generalization the brief's training-data pipelines need.
  * TypedImperativeAggregate is interpreted (no codegen), but the per-row
  * work is two comparisons against the heap head — the scan stays
  * whole-stage-codegen'd below the aggregate.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer]
  with TernaryLike[Expression] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"topk k: $other")
  }

  override def first: Expression = score
  override def second: Expression = id
  override def third: Expression = kExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("score", DoubleType).add("id", LongType),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    // no implicit casts (AbstractDataType is private[sql]): callers cast
    // explicitly, the narrow signature keeps the buffer a flat primitive
    // pair
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk score must be DOUBLE, got ${score.dataType.simpleString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk id must be BIGINT, got ${id.dataType.simpleString}")
    else if (kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"topk k must be INT, got ${kExpr.dataType.simpleString}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("topk k must be a literal")
    else if (kExpr.eval() == null || k <= 0)
      TypeCheckResult.TypeCheckFailure(s"topk k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: TopKAgg.Buffer): Any = {
    val arr = buf.sortedBestFirst()
    new GenericArrayData(arr.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val n = buf.size
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    buf.foreach { (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buffer(k)
    var j = 0
    while (j < n) { buf.offer(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKAgg =
    copy(score = newFirst, id = newSecond, kExpr = newThird)
  override def prettyName: String = "topk"
}

object TopKAgg {
  /** Size-bounded min-heap over (score, id): the head is the WORST kept
    * entry ("worst" = lowest score, then highest id), so an incoming entry
    * replaces the head iff it beats it. O(log k) per offer past the first
    * k, O(1) rejection for the common below-threshold row. */
  final class Buffer(k: Int) {
    // jdk PriorityQueue: head = least per comparator; comparator orders
    // "worse" entries first
    private val heap = new java.util.PriorityQueue[(Double, Long)](
      math.max(k, 1),
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      })

    def size: Int = heap.size()

    def offer(s: Double, i: Long): Unit = {
      if (heap.size() < k) heap.offer((s, i))
      else {
        // same total order as the heap comparator (Double.compare: NaN
        // greatest, -0.0 < 0.0) so kept-set and output never diverge
        val worst = heap.peek()
        val c = java.lang.Double.compare(s, worst._1)
        val better = c > 0 || (c == 0 && i < worst._2)
        if (better) { heap.poll(); heap.offer((s, i)) }
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit =
      heap.forEach(t => f(t._1, t._2))

    def sortedBestFirst(): Seq[(Double, Long)] = {
      import scala.jdk.CollectionConverters._
      heap.iterator().asScala.toSeq.sortWith { case ((s1, i1), (s2, i2)) =>
        val c = java.lang.Double.compare(s1, s2)
        if (c != 0) c > 0 else i1 < i2
      }
    }
  }
}
