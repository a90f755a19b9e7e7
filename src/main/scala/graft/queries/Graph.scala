package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Iterative graph computation on DataFrames — the loop-with-lineage-
  * truncation pattern every Spark iterative algorithm (PageRank, label
  * propagation, BFS) needs at scale: each iteration is ONE keyed join +
  * aggregation, and `localCheckpoint` cuts the plan after every step so the
  * lineage (and the optimizer's input) stays O(1) instead of doubling per
  * iteration — without it, iteration 20 replans (and on failure recomputes)
  * the whole history.
  *
  * The dedup-clusters operator (TextDedup.qDedupClusters) already does
  * iterate-to-fixpoint min-label propagation; this module carries the
  * weighted-score side of the family.
  */
object Graph {

  /** Fixed-point arithmetic scale: ranks live in integer units of 10⁻¹².
    * Why integers: float PageRank sums are shuffle-order-dependent in the
    * last ulp, so no two runs (let alone two engines) agree bit-for-bit.
    * With ranks as scaled BIGINTs every contribution is an integer
    * division and every aggregation an exact integer sum — associative,
    * commutative, and replayed exactly by the DuckDB oracle's unrolled
    * iterations. The quantization error (≤ outdeg · 10⁻¹² per node per
    * step) is orders below anything a ranking consumer can observe. */
  private val Scale = 1000000000000L
  private val Damp = 85 // d = 0.85, in percent
  private val Iters = 5

  // ----------------------------------------------------------- q_pagerank
  /** PageRank over the co-purchase graph: within each order, consecutive
    * lineitems (by linenumber, partkey-tiebroken — lineitem carries
    * deliberate duplicate (orderkey, linenumber) rows) define a directed
    * part→part edge; rank flows along distinct edges for 5 damped
    * iterations (d = 0.85, dangling mass dropped — documented semantics,
    * identical on both engines).
    *
    * Scale shape: edges/degrees build once (one window + one distinct —
    * both shuffle on the natural keys) and persist; each iteration is a
    * keyed edges⋈ranks join + one aggregation — the only per-iteration
    * shuffle is on node id, AQE-sizable, with no driver-side data path.
    * The part-count scalar is a dim-table count, not a fact collect. At
    * 100 TB the edge list is the big table: it stays partitioned by src
    * across iterations, so the join co-locates after the first shuffle. */
  def qPagerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber", $"l_partkey")
    val edges = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey")
      .withColumn("prev", lag($"l_partkey", 1).over(w))
      .filter($"prev".isNotNull && $"prev" =!= $"l_partkey")
      .select($"prev".cast("long").as("src"), $"l_partkey".cast("long").as("dst"))
      .distinct().persist()
    // (src, dst, outdeg) built once — the per-iteration join only touches
    // ranks, which stays dim-sized and broadcastable
    val linked = edges
      .join(edges.groupBy($"src").agg(count(lit(1)).as("outdeg")), "src")
      .persist()
    val nodes = Tables.part(s, dir).select($"p_partkey".cast("long").as("node"))
      .persist()
    val n = nodes.count() // dim-sized scalar (the N in (1-d)/N)
    val base = (Scale / 100) * (100 - Damp) / n

    var ranks = nodes.withColumn("rank", lit(Scale / n))
    var prevCheckpoint: Option[DataFrame] = None
    for (_ <- 1 to Iters) {
      val contrib = linked
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select($"dst", expr("rank div outdeg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("contrib"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select($"node",
          (lit(base) + expr(s"($Damp * coalesce(contrib, 0L)) div 100")).as("rank"))
        .localCheckpoint() // eager: cut lineage, drop dependence on prior iter
      // iteration k is materialized, so k-1's checkpoint blocks are dead —
      // release them now rather than waiting for GC + ContextCleaner (at
      // real iteration counts the pinned blocks add up to executor pressure)
      prevCheckpoint.foreach(freeCheckpoint)
      prevCheckpoint = Some(ranks)
    }
    Seq(edges, linked, nodes).foreach(_.unpersist())
    ranks.orderBy($"rank".desc, $"node")
      .limit(20)
      .select($"node".as("p_partkey"), $"rank")
  }

  /** Release the storage blocks behind a localCheckpoint'd DataFrame.
    * DataFrame.unpersist() only consults the CacheManager and is a no-op
    * for checkpoints; the blocks belong to the LogicalRDD's backing RDD. */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (qPagerank _))

  val oracle: Map[String, String] = Map(
    "q_pagerank" -> PagerankOracle.sql)
}

/** The unrolled-iteration DuckDB replay of [[Graph.qPagerank]] — 5 chained
  * CTEs, one per iteration, in the same fixed-point integer arithmetic
  * (DuckDB `//` and Spark `div` both truncate toward zero — verified on
  * negatives while building Clustering.qKmeans; ranks here are
  * non-negative anyway). Unrolled rather than recursive because aggregation
  * inside a recursive CTE is engine-version-sensitive; five explicit CTEs
  * are boring and portable. */
private object PagerankOracle {
  private val Scale = 1000000000000L
  private val Damp = 85
  private val Iters = 5

  private def iterCte(i: Int): String =
    s"""r$i AS (
       |  SELECT p.node,
       |    (SELECT ($Scale // 100) * ${100 - Damp} // n FROM nn)
       |      + ($Damp * coalesce(c.contrib, 0)) // 100 AS rank
       |  FROM nodes p
       |  LEFT JOIN (
       |    SELECT e.dst AS node, sum(r.rank // d.outdeg) AS contrib
       |    FROM edges e
       |    JOIN r${i - 1} r ON r.node = e.src
       |    JOIN deg d ON d.src = e.src
       |    GROUP BY e.dst) c USING (node))""".stripMargin

  val sql: String =
    s"""WITH ordered AS (
       |  SELECT l_orderkey, l_partkey,
       |    lag(l_partkey) OVER (PARTITION BY l_orderkey
       |      ORDER BY l_linenumber, l_partkey) AS prev
       |  FROM lineitem),
       |edges AS (
       |  SELECT DISTINCT CAST(prev AS BIGINT) AS src,
       |    CAST(l_partkey AS BIGINT) AS dst
       |  FROM ordered WHERE prev IS NOT NULL AND prev <> l_partkey),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |nn AS (SELECT count(*) AS n FROM part),
       |nodes AS (SELECT CAST(p_partkey AS BIGINT) AS node FROM part),
       |r0 AS (
       |  SELECT node, (SELECT $Scale // n FROM nn) AS rank FROM nodes),
       |${(1 to Iters).map(iterCte).mkString(",\n")}
       |SELECT node AS p_partkey, rank FROM r$Iters
       |ORDER BY rank DESC, node LIMIT 20""".stripMargin
}
