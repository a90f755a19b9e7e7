package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level spec: every registered query runs at sf0.001 and returns a
  * sane result. Exact-value correctness is the DuckDB oracle's job
  * (tools/oracle_check.py); this suite guards compile-to-run health and the
  * queries/oracleSql contract. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-test")
  val sfDir = "/root/testdata/sf0.001"

  test("every oracleSql key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("dedup clusters are valid components and the corpus drops exactly the losers") {
    import org.apache.spark.sql.functions._
    val clusters = SparkEntry.queries("q_dedup_clusters")(spark, sfDir).cache()
    // the representative is the component min: no member below its rep,
    // and every rep labels itself
    assert(clusters.filter(col("doc_id") < col("cluster_rep")).isEmpty)
    val reps = clusters.select(col("cluster_rep")).distinct()
    val selfLabeled = clusters.filter(col("doc_id") === col("cluster_rep"))
      .select(col("cluster_rep"))
    assert(reps.exceptAll(selfLabeled).isEmpty, "a rep that isn't its own cluster member")
    // corpus size = augmented size − non-rep cluster members
    val losers = clusters.filter(col("doc_id") =!= col("cluster_rep")).count()
    val corpus = SparkEntry.queries("q_dedup_corpus")(spark, sfDir).count()
    val docs = graft.core.Tables.documents(spark, sfDir)
    val aug = docs.count() + docs.filter(col("doc_id") % 25 === 0).count()
    assert(corpus == aug - losers, s"corpus $corpus != aug $aug - losers $losers")
    clusters.unpersist()
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
