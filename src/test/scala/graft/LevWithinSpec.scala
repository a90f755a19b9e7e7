package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.LevWithin

/** Equivalence proof for the banded early-exit Levenshtein: on every pair,
  * for every budget k, `lev_within` must agree with the full-matrix
  * distance — the exact value when ≤ k, −1 when above. Random pairs run
  * through BOTH the JVM kernel directly and the codegen'd expression
  * against Spark's built-in `levenshtein`. */
class LevWithinSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, "graft-lev-test")

  private def full(aS: String, bS: String): Int = {
    val (a, b) = (aS.codePoints().toArray, bS.codePoints().toArray)
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("kernel agrees with the full matrix for all k on random pairs") {
    val rnd = new scala.util.Random(42)
    def word() = (0 until rnd.nextInt(12)).map(_ =>
      ('a' + rnd.nextInt(4)).toChar).mkString // small alphabet → near pairs
    for (_ <- 1 to 2000) {
      val (a, b) = (word(), word())
      val exact = full(a, b)
      for (k <- 0 to 6) {
        val got = LevWithin.banded(a, b, k)
        val want = if (exact <= k) exact else -1
        assert(got === want, s"a=$a b=$b k=$k exact=$exact")
      }
    }
  }

  test("edge cases: empty strings, identical, negative k, oversized k, code points") {
    assert(LevWithin.banded("", "", 0) === 0)
    assert(LevWithin.banded("", "abc", 3) === 3)
    assert(LevWithin.banded("", "abc", 2) === -1)
    assert(LevWithin.banded("same", "same", 0) === 0)
    assert(LevWithin.banded("a", "b", -1) === -1)
    // an "unbounded" budget must clamp, not overflow (review finding)
    assert(LevWithin.banded("ab", "ab", Int.MaxValue) === 0)
    assert(LevWithin.banded("kitten", "sitting", Int.MaxValue) === 3)
    // code-point semantics: a surrogate-pair emoji is ONE edit, exactly
    // like Spark's built-in — not two UTF-16 units (review finding)
    assert(LevWithin.banded("😀a", "a", 1) === 1)
    assert(LevWithin.banded("😀", "😁", 1) === 1)
  }

  test("codegen'd expression matches the built-in on supplementary characters") {
    import spark.implicits._
    val pairs = Seq(("😀abc", "abc"), ("a😀b", "ab"),
      ("😀", "😁"), ("café", "cafe")).toDF("a", "b")
    pairs.select(expr("lev_within(a, b, 4)").as("banded"),
      levenshtein(col("a"), col("b")).as("exact")).collect()
      .foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("codegen'd expression matches the built-in levenshtein on a frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def word() = (0 until (3 + rnd.nextInt(8))).map(_ =>
      ('a' + rnd.nextInt(5)).toChar).mkString
    val pairs = Seq.fill(500)((word(), word())).toDF("a", "b")
    val rows = pairs.select(
      expr("lev_within(a, b, 3)").as("banded"),
      levenshtein($"a", $"b").as("exact")).collect()
    rows.foreach { r =>
      val (banded, exact) = (r.getInt(0), r.getInt(1))
      assert(banded === (if (exact <= 3) exact else -1))
    }
    // nulls propagate as null, like the built-in
    val n = Seq((null.asInstanceOf[String], "x")).toDF("a", "b")
      .select(expr("lev_within(a, b, 2)")).collect()(0)
    assert(n.isNullAt(0))
  }
}
