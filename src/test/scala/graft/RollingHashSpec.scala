package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.RollingHash

/** The native codegen expression must agree exactly with the interpreted
  * HOF formulation (the previous implementation and the oracle's fold) and
  * with the driver-side reference hash. */
class RollingHashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-rh-test")

  test("matches the HOF fold and the Scala reference on testdata") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    val both = docs.select(
      col("norm"),
      RollingHash.rollingHash("norm").as("native"),
      expr("aggregate(sequence(1, length(norm)), CAST(0 AS BIGINT), " +
        "(acc, i) -> (acc * 131 + ascii(substring(norm, i, 1))) % 1000000007)")
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    val sample = both.select("norm", "native").head()
    assert(sample.getLong(1) == RollingHash.hash(sample.getString(0)))
  }

  test("float_dot propagates a null element as a null result (HOF parity)") {
    val row = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d").head()
    assert(row.isNullAt(0))
  }

  test("float_dot matches the HOF zip_with fold on testdata embeddings") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("e2", col("embedding"))
    val both = emb.select(
      expr("float_dot(embedding, e2)").as("native"),
      expr("aggregate(zip_with(embedding, e2, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("registered for SQL via GraftExtensions (Sessions.tune)") {
    import spark.implicits._
    val out = Seq("abc").toDF("s")
    out.createOrReplaceTempView("rh_in")
    val got = spark.sql("SELECT rolling_hash(s) AS h FROM rh_in").head().getLong(0)
    assert(got == RollingHash.hash("abc"))
    // empty string and null behavior
    assert(spark.sql("SELECT rolling_hash('')").head().getLong(0) == 0L)
    assert(spark.sql("SELECT rolling_hash(CAST(NULL AS STRING))").head().isNullAt(0))
  }

  test("long_sqdist propagates a null element as a null result (HOF parity)") {
    val row = spark.sql(
      "SELECT long_sqdist(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)), " +
        "array(CAST(1 AS BIGINT), CAST(2 AS BIGINT))) AS d").head()
    assert(row.isNullAt(0))
  }

  test("long_sqdist matches the HOF zip_with fold on quantized embeddings") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("v", expr("transform(embedding, " +
        "x -> cast(floor(cast(x as double) * 1000000d) as bigint))"))
      .withColumn("v2", expr("transform(reverse(embedding), " +
        "x -> cast(floor(cast(x as double) * 1000000d) as bigint))"))
    val both = emb.select(
      expr("long_sqdist(v, v2)").as("native"),
      expr("aggregate(zip_with(v, v2, (x, y) -> (x - y) * (x - y)), " +
        "cast(0 as bigint), (a, e) -> a + e)").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.filter(col("native").isNull).count() == 0)
  }

  test("dec_sqdist matches the decimal expression chain and its overflow contract") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 6L, 9L)),                 // small: 4+16+36
      (Seq(1000000000000L, -1000000000000L), Seq(-1000000000000L, 1000000000000L)), // 2*(2e12)^2 > Long
      (Seq(3037000499L), Seq(-3037000499L))               // single square near 2^63
    ).toDF("a", "b")
    val got = df.selectExpr("dec_sqdist(a, b) AS k",
      "cast(aggregate(zip_with(a, b, (x, y) -> " +
        "(cast(x as decimal(38,0)) - y) * (cast(x as decimal(38,0)) - y)), " +
        "cast(0 as decimal(38,0)), (acc, e) -> acc + e) as decimal(38,0)) AS h")
      .collect()
    got.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1))
      assert(r.getDecimal(0) == r.getDecimal(1), s"$r")
    }
    // null element propagates
    assert(spark.sql("SELECT dec_sqdist(array(1L, CAST(NULL AS BIGINT)), " +
      "array(1L, 2L))").head().isNullAt(0))
  }
}
