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

  test("multi-probe ANN dominates single-bucket ANN: superset coverage, never a worse neighbor") {
    import org.apache.spark.sql.functions._
    val ann = SparkEntry.queries("q_embed_ann")(spark, sfDir)
      .select(col("vec_id"), col("cos_sim").as("sim1")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mp = SparkEntry.queries("q_embed_ann_mp")(spark, sfDir)
      .select(col("vec_id"), col("cos_sim")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ann.keySet.subsetOf(mp.keySet),
      s"multi-probe lost vectors: ${ann.keySet -- mp.keySet}")
    // probing a superset of buckets can only improve the best neighbor
    ann.foreach { case (v, s1) =>
      assert(mp(v) >= s1, s"vec $v: multi-probe ${mp(v)} < single-bucket $s1")
    }
  }

  test("MMR picks are greedy-consistent: step 1 is the relevance argmax, " +
    "penalties never decrease marginal-score order") {
    import org.apache.spark.sql.functions._
    val picks = SparkEntry.queries("q_mmr_rerank")(spark, sfDir)
      .orderBy(col("step")).collect()
    assert(picks.length == 5)
    // step 1 has no penalty and must be the pure-relevance argmax: its
    // sim_q is the max sim_q over ALL picks (a later pick can't beat it)
    val sims = picks.map(_.getAs[Double]("sim_q"))
    assert(sims.head == sims.max,
      s"first pick sim_q ${sims.head} < a later pick's ${sims.max}")
    assert(picks.head.getAs[Double]("penalty") == 0.0)
    // mmr scores are non-increasing across steps: each step maximizes over
    // a shrinking pool with only-growing penalties
    val mmrs = picks.map(_.getAs[Double]("mmr"))
    mmrs.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b, s"mmr increased across steps: $a -> $b")
    }
  }

  test("interval merge coverage is bounded: each user covers at least one " +
    "span and never more than events x span") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_interval_merge")(spark, sfDir).collect()
    val nEvents = graft.core.Tables.events(spark, sfDir)
      .groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (user, n, sec) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(sec >= 1800, s"user $user covered $sec s < one 30-min span")
      assert(sec <= nEvents(user) * 1800,
        s"user $user covered $sec s > ${nEvents(user)} events x 1800 s")
      assert(n >= 1 && n <= nEvents(user))
    }
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
