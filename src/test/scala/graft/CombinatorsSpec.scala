package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the cleaning expression combinators, using the exact dirty
  * values from the reference's hand-built fixtures (FIXTURES.md):
  * `15-01-2018` dd-mm date, negative salary, blank/NaN strings. */
class CombinatorsSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(2, "graft-combinators")
  import graft.queries.Scalars.{dateSafe, nullNormalize}

  def one(c: org.apache.spark.sql.Column): Any = {
    val r = spark.range(1).select(c.as("v")).collect()(0)
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("dateSafe parses ISO") {
    assert(one(dateSafe(lit("2018-01-15"))).toString == "2018-01-15")
  }
  test("dateSafe parses dd-MM-yyyy (HR fixture '15-01-2018')") {
    assert(one(dateSafe(lit("15-01-2018"))).toString == "2018-01-15")
  }
  test("dateSafe falls back to 1957-01-01 on garbage") {
    assert(one(dateSafe(lit("not-a-date"))).toString == "1957-01-01")
  }
  test("nullNormalize maps blank/NAN/null to default, trims otherwise") {
    assert(one(nullNormalize(lit(""), "UNASSIGNED_DEPT")) == "UNASSIGNED_DEPT")
    assert(one(nullNormalize(lit("NaN"), "D")) == "D")  // only exact upper NAN…
    assert(one(nullNormalize(lit("nan"), "D")) == "D")
    assert(one(nullNormalize(lit(null).cast("string"), "D")) == "D")
    assert(one(nullNormalize(lit("  It "), "D")) == "It")
  }
  test("coerce: cast failure yields null (ANSI off)") {
    graft.core.Sessions.tune(spark)
    assert(one(lit("abc").cast("int")) == null)
    assert(one(lit("42").cast("int")) == 42)
  }
}
