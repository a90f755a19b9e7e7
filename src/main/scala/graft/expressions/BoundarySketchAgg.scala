package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Equi-depth band boundaries from a BOUNDED deterministic sample:
  * `boundary_sketch(value, hash, buckets)` keeps the values carried by
  * the [[BoundarySketchAgg.SampleK]] smallest `hash`es seen (a bottom-k
  * by hash — the hash total-orders the rows, so the kept set is a
  * uniform size-k sample of the input multiset; equal hashes tie-break
  * on VALUE, so the kept (hash, value) multiset is a pure function of
  * the input multiset, independent of insertion and merge order — r10
  * ADVICE) and returns the sample's `buckets-1` equi-depth boundaries
  * as a sorted `array<double>`.
  *
  * This replaces [[graft.core.BandedRank]]'s full-input
  * `percentile_approx` boundary pass (round-9 VERDICT item 1: the GK
  * sketch maintained per-row state over the ENTIRE input and was the
  * measured top cost of the banded family). Cost shape: after the
  * buffer saturates, a row is admitted only if its hash beats the
  * current k-th minimum — expected total insertions are k·ln(n/k), so
  * virtually every row pays ONE hash compare and nothing else; the
  * buffer is a bounded binary heap of (hash, value) pairs, merged
  * associatively (union, re-trim), the same map-side-combine contract
  * as [[KmvAgg]].
  *
  * Why bottom-k-by-hash instead of a fixed-rate `WHERE pmod(hash,100)=0`
  * sample: the rate needs no tuning against an unknown input size. Below
  * k rows the sample IS the input multiset and the boundaries are the
  * EXACT equi-depth quantiles (BandedRankSpec's fixtures and occupancy
  * pins run in this regime); above it the sample error is
  * ~1/√k ≈ 1.1% of mass per boundary at the default k=8192 — an order
  * under the 1/64 band width, so band occupancy stays ≈ n/buckets.
  * Correctness never depends on the boundaries at all: any monotone
  * value→band map yields identical final ranks (BandedRank's invariant),
  * so sampling error and merge order only move work between bands.
  *
  * The `hash` child is the caller's row fingerprint
  * (`xxhash64(value, nonce)` with a per-row nonce): hashing VALUE AND
  * NONCE keeps the sample mass-weighted — a value carried by a million
  * rows gets a million draws, so heavy duplicates pull boundaries toward
  * themselves exactly as true equi-depth requires. A value-only hash
  * would sample the distinct DOMAIN instead and starve heavy tie
  * classes of boundary mass.
  */
case class BoundarySketchAgg(
    value: Expression,
    hash: Expression,
    bucketsExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundarySketchAgg.Buffer]
  with TernaryLike[Expression] {

  private lazy val buckets: Int = bucketsExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"boundary_sketch buckets: $other")
  }

  override def first: Expression = value
  override def second: Expression = hash
  override def third: Expression = bucketsExpr
  override def nullable: Boolean = true // empty input → null, like percentile_approx
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (value.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"boundary_sketch value must be DOUBLE, got ${value.dataType.simpleString}")
    else if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"boundary_sketch hash must be BIGINT, got ${hash.dataType.simpleString}")
    else if (bucketsExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"boundary_sketch buckets must be INT, got ${bucketsExpr.dataType.simpleString}")
    else if (!bucketsExpr.foldable)
      TypeCheckResult.TypeCheckFailure("boundary_sketch buckets must be a literal")
    else if (bucketsExpr.eval() == null || buckets < 2)
      TypeCheckResult.TypeCheckFailure("boundary_sketch buckets must be ≥ 2")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): BoundarySketchAgg.Buffer =
    new BoundarySketchAgg.Buffer(BoundarySketchAgg.SampleK)

  override def update(buf: BoundarySketchAgg.Buffer,
                      input: InternalRow): BoundarySketchAgg.Buffer = {
    val v = value.eval(input)
    val h = hash.eval(input)
    // null values band to -1 in the caller (NULLS FIRST); they carry no
    // boundary mass. A null hash (null nonce) would de-randomize the
    // sample, so such rows are skipped too — boundary-neutral by the
    // monotone-map invariant.
    if (v != null && h != null)
      buf.offer(h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: BoundarySketchAgg.Buffer,
                     other: BoundarySketchAgg.Buffer): BoundarySketchAgg.Buffer = {
    other.foreach(buf.offer)
    buf
  }

  /** The sample's equi-depth boundaries: sorted sample values indexed at
    * `i·m/buckets` for i in 1..buckets-1 (duplicates allowed —
    * `value_band` skips band ids over duplicate boundaries). Null on an
    * empty sample, mirroring `percentile_approx`. */
  override def eval(buf: BoundarySketchAgg.Buffer): Any = {
    val m = buf.size
    if (m == 0) null
    else {
      val vals = buf.values()
      java.util.Arrays.sort(vals)
      val out = new Array[Any](buckets - 1)
      var i = 1
      while (i < buckets) {
        out(i - 1) = vals(((i.toLong * m) / buckets).toInt.min(m - 1))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: BoundarySketchAgg.Buffer): Array[Byte] = {
    val n = buf.size
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    buf.foreach { (h, v) => bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundarySketchAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundarySketchAgg.Buffer(BoundarySketchAgg.SampleK)
    var j = 0
    while (j < n) { buf.offer(bb.getLong, bb.getDouble); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundarySketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundarySketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BoundarySketchAgg =
    copy(value = newFirst, hash = newSecond, bucketsExpr = newThird)
  override def prettyName: String = "boundary_sketch"
}

object BoundarySketchAgg {
  /** Sample capacity. Error budget vs the band width: a size-k uniform
    * sample's quantile deviates by ~√(p(1-p)/k) ≤ 0.55% of mass at
    * k=8192, so adjacent-boundary fluctuation (~0.8% of mass) stays well
    * under the 1/64 ≈ 1.56% default band width — BandedRankSpec's
    * ≤ 3n/buckets occupancy pin has ≥ 2× headroom even in the sampled
    * regime. State: 8192 (long, double) pairs = 128 KiB per aggregation
    * buffer, constant in the input size. */
  val SampleK: Int = 8192

  /** Bounded bottom-k by (hash, value) over (hash, value) PAIRS — a
    * multiset, not a set: duplicate values (and the astronomically rare
    * duplicate hashes) are all kept, preserving mass weighting. Equal
    * hashes order by `Double.compare` on the value (a total order incl.
    * NaN/±0.0), so the kept set is a pure function of the input multiset
    * — insertion/merge order cannot change which of two equal-hash pairs
    * survives (r10 ADVICE). Head of the heap = the LARGEST kept pair,
    * i.e. the eviction candidate. */
  final class Buffer(k: Int) {
    private var hs = new Array[Long](math.min(k, 1024))
    private var vs = new Array[Double](math.min(k, 1024))
    private var n = 0

    def size: Int = n

    /** (h1,v1) < (h2,v2) lexicographically, value compared totally. */
    private def lt(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
      h1 < h2 || (h1 == h2 && java.lang.Double.compare(v1, v2) < 0)

    def offer(h: Long, v: Double): Unit = {
      if (n < k) {
        if (n == hs.length) grow()
        // sift up
        hs(n) = h; vs(n) = v
        var i = n
        n += 1
        while (i > 0 && lt(hs((i - 1) >> 1), vs((i - 1) >> 1), hs(i), vs(i))) {
          swap(i, (i - 1) >> 1); i = (i - 1) >> 1
        }
      } else if (lt(h, v, hs(0), vs(0))) {
        // replace the max, sift down
        hs(0) = h; vs(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = l + 1
          var m = i
          if (l < n && lt(hs(m), vs(m), hs(l), vs(l))) m = l
          if (r < n && lt(hs(m), vs(m), hs(r), vs(r))) m = r
          if (m == i) done = true else { swap(i, m); i = m }
        }
      }
    }

    private def grow(): Unit = {
      val cap = math.min(k, hs.length * 2)
      hs = java.util.Arrays.copyOf(hs, cap)
      vs = java.util.Arrays.copyOf(vs, cap)
    }

    private def swap(i: Int, j: Int): Unit = {
      val th = hs(i); hs(i) = hs(j); hs(j) = th
      val tv = vs(i); vs(i) = vs(j); vs(j) = tv
    }

    def values(): Array[Double] = java.util.Arrays.copyOf(vs, n)

    def foreach(f: (Long, Double) => Unit): Unit = {
      var i = 0
      while (i < n) { f(hs(i), vs(i)); i += 1 }
    }
  }
}
