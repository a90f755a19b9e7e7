package graft.queries // same package: TextOps is private[queries]

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the shared tokenizer/shingler that the fixture corpus
  * (min 10 tokens/doc) never exercises: the <3-token guard, whitespace
  * runs, and case folding. These guards exist in BOTH engines' mirrors —
  * this spec pins the Spark side; the DuckDB side is textually identical
  * by construction (one shingleSql emitter). */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(2, "graft-test")

  private def shingles(texts: (Long, String)*): Map[Long, Seq[String]] = {
    import spark.implicits._
    TextOps.shingleRows(texts.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq.sorted }
  }

  test("docs with fewer than 3 tokens produce no shingles") {
    val out = shingles(1L -> "", 2L -> "one", 3L -> "two words",
      4L -> "exactly three tokens")
    assert(!out.contains(1L) && !out.contains(2L) && !out.contains(3L))
    assert(out(4L) == Seq("exactly three tokens"))
  }

  test("whitespace runs collapse and case folds before shingling") {
    val out = shingles(1L -> "  A   B\tC  ", 2L -> "a b c")
    assert(out(1L) == out(2L), s"normalization differs: $out")
    assert(out(1L) == Seq("a b c"))
  }

  test("a 5-token doc yields exactly its 3 overlapping shingles in order") {
    val out = shingles(1L -> "v w x y z")
    assert(out(1L) == Seq("v w x", "w x y", "x y z"))
  }
}
