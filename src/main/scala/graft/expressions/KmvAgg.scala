package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** K-Minimum-Values distinct-count sketch: `kmv(hash, k)` keeps the k
  * SMALLEST distinct hash values seen and returns
  * `struct(n_kept int, kth bigint)` — enough to estimate the distinct
  * count as `(k-1) · 2⁶⁰ / kth` when the sketch is full (`n_kept = k`;
  * call sites hash into a 60-bit domain — 15 md5 hex digits),
  * and EXACTLY `n_kept` when it never filled (fewer than k distinct
  * hashes → the sketch IS the distinct set).
  *
  * Why this instead of Spark's `approx_count_distinct` (HyperLogLog++):
  * KMV is a deterministic pure function of the input hash set — the same
  * md5-derived hashes fed to the same estimator arithmetic reproduce the
  * SAME estimate on any engine, so the DuckDB oracle can replay it
  * bit-for-bit (HLL's estimate depends on Spark's internal hashing and
  * bias tables; it can never be cross-checked exactly). Accuracy is the
  * textbook ~1/√k relative error (Bar-Yossef et al. 2002, "Counting
  * distinct elements in a data stream").
  *
  * Scale shape: the buffer is a bounded TreeSet of ≤ k longs —
  * O(k log k) per partition, merged associatively (union, re-trim to k),
  * so partial aggregation collapses each mapper's stream to k scalars
  * before the exchange: a grouped distinct-count over 100 TB shuffles
  * O(groups × k) longs instead of the O(rows) shuffle an exact
  * COUNT(DISTINCT) pays. The reference's only distinct counting is exact
  * (/root/reference/04_KPI/KPIs.sql:8,22 — COUNT(DISTINCT employee_sk)
  * per day in the headcount/resignation views); this is the sketch you
  * swap in when the group count explodes.
  */
case class KmvAgg(
    hash: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Buffer]
  with BinaryLike[Expression] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"kmv k: $other")
  }

  override def left: Expression = hash
  override def right: Expression = kExpr
  override def nullable: Boolean = false
  override def dataType: DataType =
    new StructType().add("n_kept", IntegerType).add("kth", LongType)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv hash must be BIGINT, got ${hash.dataType.simpleString}")
    else if (kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv k must be INT, got ${kExpr.dataType.simpleString}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("kmv k must be a literal")
    else if (kExpr.eval() == null || k <= 0)
      TypeCheckResult.TypeCheckFailure("kmv k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess
  }

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

  /** (n_kept, kth) where kth = the largest kept hash — the k-th minimum
    * when the sketch is full, meaningless (but deterministic) otherwise. */
  override def eval(buf: KmvAgg.Buffer): Any =
    InternalRow(buf.size, buf.kth)

  override def serialize(buf: KmvAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvAgg.Buffer(k)
    var j = 0
    while (j < n) { buf.offer(bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvAgg =
    copy(hash = newLeft, kExpr = newRight)
  override def prettyName: String = "kmv"
}

object KmvAgg {
  /** Bounded sorted set of the k smallest DISTINCT hashes. TreeSet gives
    * dedup + ordered trim in one structure; k is sketch-sized (≤ a few
    * hundred), so O(log k) inserts are noise next to the scan. */
  final class Buffer(k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def offer(h: Long): Unit = {
      if (set.size < k) { set.add(h); () }
      else if (h < set.last) {
        if (set.add(h)) { set.pollLast(); () }
      }
    }

    def size: Int = set.size
    def kth: Long = if (set.isEmpty) 0L else set.last
    def foreach(f: Long => Unit): Unit = set.forEach(h => f(h))
  }
}
