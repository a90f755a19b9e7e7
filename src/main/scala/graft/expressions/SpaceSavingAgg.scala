package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Space-Saving frequent-items summary: `spacesaving(item, c)` maintains at
  * most c (item, count) entries — on overflow the minimum-count entry is
  * evicted and the newcomer inherits its count + weight (Metwally, Agrawal
  * & El Abbadi 2005, "Efficient computation of frequent and top-k elements
  * in data streams") — and returns the surviving items as a sorted
  * `array<bigint>` of CANDIDATES.
  *
  * The guarantee that makes candidates useful: every item with true
  * frequency > N/c is present in the summary, and the weighted-merge used
  * for partial aggregation preserves that bound across partitions (Agarwal
  * et al. 2013, "Mergeable summaries"). The operator contract is therefore
  * a SUPERSET, not an answer: a second, exact counting pass over only the
  * candidates turns it into exact heavy hitters (see
  * [[graft.queries.Sketches.qHeavyHitters]]) — which is also why the
  * summary's internal tie-breaking never needs to be deterministic.
  *
  * Scale shape: the buffer is O(c) per mapper and map-side combinable, so
  * finding candidate frequent items over 100 TB shuffles O(partitions × c)
  * pairs where an exact groupBy's first phase shuffles every distinct key.
  * The reference's closest shape is the grouped frequency views
  * (/root/reference/04_KPI/KPIs.sql) — exact counts that stop scaling when
  * the key domain explodes; this is the bounded-memory path to the same
  * question.
  */
case class SpaceSavingAgg(
    item: Expression,
    capExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingAgg.Buffer]
  with BinaryLike[Expression] {

  private lazy val cap: Int = capExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"spacesaving c: $other")
  }

  override def left: Expression = item
  override def right: Expression = capExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (item.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"spacesaving item must be BIGINT, got ${item.dataType.simpleString}")
    else if (capExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"spacesaving capacity must be INT, got ${capExpr.dataType.simpleString}")
    else if (!capExpr.foldable)
      TypeCheckResult.TypeCheckFailure("spacesaving capacity must be a literal")
    else if (capExpr.eval() == null || cap <= 0)
      TypeCheckResult.TypeCheckFailure("spacesaving capacity must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): SpaceSavingAgg.Buffer =
    new SpaceSavingAgg.Buffer(cap)

  override def update(buf: SpaceSavingAgg.Buffer, input: InternalRow): SpaceSavingAgg.Buffer = {
    val v = item.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: SpaceSavingAgg.Buffer, other: SpaceSavingAgg.Buffer): SpaceSavingAgg.Buffer = {
    other.foreach((it, c) => buf.offer(it, c))
    buf
  }

  /** Sorted candidate items (counts are upper bounds — deliberately not
    * exposed; the exact pass recounts). */
  override def eval(buf: SpaceSavingAgg.Buffer): Any = {
    val items = buf.items
    java.util.Arrays.sort(items)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(items)
  }

  override def serialize(buf: SpaceSavingAgg.Buffer): Array[Byte] = {
    val n = buf.size
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    buf.foreach { (it, c) => bb.putLong(it); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new SpaceSavingAgg.Buffer(cap)
    var j = 0
    while (j < n) { buf.offer(bb.getLong, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpaceSavingAgg =
    copy(item = newLeft, capExpr = newRight)
  override def prettyName: String = "spacesaving"
}

object SpaceSavingAgg {
  /** Bounded (item → count) map with O(log c) amortized eviction: a
    * lazy-deletion priority queue tracks candidate minima — stale pairs
    * (count changed since enqueue) are discarded on pop. Weighted offer
    * implements both the stream update (w=1) and the mergeable-summaries
    * combine (w = other's count). */
  final class Buffer(cap: Int) {
    private val counts = new java.util.HashMap[Long, Long]()
    private val pq = new java.util.PriorityQueue[Array[Long]](
      math.max(cap, 8), (a: Array[Long], b: Array[Long]) =>
        java.lang.Long.compare(a(1), b(1)))

    def offer(item: Long, w: Long): Unit = {
      if (counts.containsKey(item)) {
        val nc = counts.get(item) + w
        counts.put(item, nc)
        pq.add(Array(item, nc))
        if (pq.size > 4 * math.max(cap, 8)) compact()
      } else if (counts.size < cap) {
        counts.put(item, w)
        pq.add(Array(item, w))
      } else {
        // evict the true minimum: pop until the head reflects a live count
        var head = pq.poll()
        while (head != null &&
          (!counts.containsKey(head(0)) || counts.get(head(0)) != head(1))) {
          head = pq.poll()
        }
        if (head == null) { // degenerate: rebuild (cannot happen in practice)
          counts.forEach((k, v) => pq.add(Array(k, v)))
          offer(item, w)
        } else {
          counts.remove(head(0))
          val nc = head(1) + w
          counts.put(item, nc)
          pq.add(Array(item, nc))
        }
      }
    }

    /** Drop stale lazy-deletion entries so pq memory stays O(c) no matter
      * how long the partition's stream runs. */
    private def compact(): Unit = {
      pq.clear()
      counts.forEach((k, v) => pq.add(Array(k, v)))
    }

    def size: Int = counts.size
    def items: Array[Long] = {
      val out = new Array[Long](counts.size)
      var i = 0
      val it = counts.keySet.iterator()
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
    def foreach(f: (Long, Long) => Unit): Unit =
      counts.forEach((k, v) => f(k, v))
  }
}
