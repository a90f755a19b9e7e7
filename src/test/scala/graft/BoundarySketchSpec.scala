package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.BoundarySketchAgg

/** Direct unit coverage of the boundary-sketch BUFFER (the bounded
  * bottom-k-by-hash sample behind [[graft.core.BandedRank]]'s equi-depth
  * cuts) — the end-to-end behavior is pinned by BandedRankSpec; this
  * spec pins the data structure itself: bottom-k selection, multiset
  * semantics (duplicates kept), merge == one-pass, and growth from the
  * small initial capacity. */
class BoundarySketchSpec extends AnyFunSuite {

  private def fill(buf: BoundarySketchAgg.Buffer,
                   pairs: Seq[(Long, Double)]): Unit =
    pairs.foreach { case (h, v) => buf.offer(h, v) }

  /** Deterministic pseudo-hash, decorrelated from insertion order. */
  private def h(i: Int): Long = {
    var x = i.toLong * 0x9E3779B97F4A7C15L
    x ^= x >>> 33; x *= 0xC2B2AE3D27D4EB4FL; x ^= x >>> 29
    x & Long.MaxValue // keep non-negative for readable assertions
  }

  test("keeps exactly the k smallest hashes' values") {
    val buf = new BoundarySketchAgg.Buffer(4)
    val pairs = (1 to 100).map(i => h(i) -> i.toDouble)
    fill(buf, pairs)
    assert(buf.size == 4)
    val expect = pairs.sortBy(_._1).take(4).map(_._2).sorted
    assert(buf.values().sorted.toSeq == expect)
  }

  test("below capacity the sample IS the input multiset (duplicates kept)") {
    val buf = new BoundarySketchAgg.Buffer(100)
    val pairs = Seq(5L -> 1.0, 3L -> 1.0, 9L -> 2.0, 3L -> 1.0) // dup hash+value
    fill(buf, pairs)
    assert(buf.size == 4)
    assert(buf.values().sorted.toSeq == Seq(1.0, 1.0, 1.0, 2.0))
  }

  test("merge of split streams equals the one-pass sample") {
    val pairs = (1 to 5000).map(i => h(i) -> (i % 97).toDouble)
    val one = new BoundarySketchAgg.Buffer(64)
    fill(one, pairs)
    val (a, b) = pairs.splitAt(1700)
    val bufA = new BoundarySketchAgg.Buffer(64)
    val bufB = new BoundarySketchAgg.Buffer(64)
    fill(bufA, a); fill(bufB, b)
    bufB.foreach(bufA.offer) // merge
    def dump(buf: BoundarySketchAgg.Buffer): Seq[(Long, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      buf.foreach((hh, vv) => out += ((hh, vv)))
      out.sorted.toSeq
    }
    assert(dump(bufA) == dump(one))
  }

  test("buffer grows past the 1024 initial capacity up to k") {
    val buf = new BoundarySketchAgg.Buffer(BoundarySketchAgg.SampleK)
    val n = 3000 // > 1024, < SampleK: everything must be kept
    fill(buf, (1 to n).map(i => h(i) -> i.toDouble))
    assert(buf.size == n)
    assert(buf.values().sorted.toSeq == (1 to n).map(_.toDouble))
  }

  test("insertion order does not change the kept set") {
    val pairs = (1 to 2000).map(i => h(i) -> i.toDouble)
    val fwd = new BoundarySketchAgg.Buffer(32)
    val rev = new BoundarySketchAgg.Buffer(32)
    fill(fwd, pairs); fill(rev, pairs.reverse)
    assert(fwd.values().sorted.toSeq == rev.values().sorted.toSeq)
  }

  test("equal hashes straddling the k boundary tie-break on VALUE, so the " +
       "kept multiset is a pure function of the input (r10 ADVICE)") {
    // k=4; three pairs share the would-be k-th hash with different values:
    // only the smallest-valued of the tied trio may survive, regardless of
    // insertion order or split/merge shape
    val pairs = Seq(1L -> 10.0, 2L -> 20.0, 3L -> 30.0,
                    7L -> 9.0, 7L -> 5.0, 7L -> 1.0)
    def dump(ps: Seq[(Long, Double)]): Seq[(Long, Double)] = {
      val buf = new BoundarySketchAgg.Buffer(4)
      fill(buf, ps)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      buf.foreach((hh, vv) => out += ((hh, vv)))
      out.sorted.toSeq
    }
    val expect = Seq(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 7L -> 1.0)
    pairs.permutations.foreach(p => assert(dump(p) == expect,
      s"order-dependent kept set under insertion order $p"))
    // split/merge shapes: every 2-way split of the canonical order
    (1 until pairs.size).foreach { cut =>
      val (a, b) = pairs.splitAt(cut)
      val bufA = new BoundarySketchAgg.Buffer(4)
      val bufB = new BoundarySketchAgg.Buffer(4)
      fill(bufA, a); fill(bufB, b)
      bufB.foreach(bufA.offer)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      bufA.foreach((hh, vv) => out += ((hh, vv)))
      assert(out.sorted.toSeq == expect, s"merge at cut $cut diverged")
    }
  }
}
