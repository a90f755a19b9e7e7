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

  /** Distinct undirected co-order edges (u < v): parts appearing in the
    * same order are connected. One self-join on the order key + one
    * distinct — both shuffles on natural keys. Shared by q_triangles and
    * q_bfs_levels (and mirrored verbatim by their oracles). */
  private def coOrderEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey".cast("long").as("pk"))
    li.as("a").join(li.as("b"),
        $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
      .select($"a.pk".as("u"), $"b.pk".as("v"))
      .distinct()
  }

  private val coOrderEdgesCte =
    """edges AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"""
      .stripMargin

  // ---------------------------------------------------------- q_triangles
  /** Exact triangle count over the co-order graph, degree-oriented: every
    * undirected edge points from the (degree, id)-smaller endpoint to the
    * larger, so each triangle has exactly one node with both out-edges and
    * is counted once — and, the scale point, out-degrees are bounded by
    * O(√m), which caps the wedge fan-out that a naive node-id orientation
    * lets explode on hub nodes. Three joins, all on node keys, no window. */
  def qTriangles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = coOrderEdges(s, dir).persist()
    val deg = edges.select($"u".as("x")).union(edges.select($"v".as("x")))
      .groupBy($"x").agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.withColumnRenamed("x", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("x", "v").withColumnRenamed("deg", "dv"), "v")
    // orient toward the (deg, id)-larger endpoint
    val oriented = withDeg.select(
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"u")
          .otherwise($"v").as("src"),
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"v")
          .otherwise($"u").as("dst"),
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"dv")
          .otherwise($"du").as("ddst"))
      .persist()
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        $"e1.src" === $"e2.src" &&
          ($"e1.ddst" < $"e2.ddst" ||
            ($"e1.ddst" === $"e2.ddst" && $"e1.dst" < $"e2.dst")))
      .select($"e1.dst".as("b"), $"e2.dst".as("c"))
    val tri = wedges.join(oriented.as("e3"),
        $"b" === $"e3.src" && $"c" === $"e3.dst", "left_semi")
    // materialize the 1-row summary while the caches are live (the eager-
    // release lesson from the round-5 qKmeans review finding), then drop them
    val out = edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
      .select($"n_nodes", $"n_edges", $"n_triangles")
      .localCheckpoint()
    Seq(edges, oriented).foreach(_.unpersist())
    out
  }

  private val qTrianglesSql =
    s"""WITH $coOrderEdgesCte,
       |deg AS (
       |  SELECT x, count(*) AS deg FROM (
       |    SELECT u AS x FROM edges UNION ALL SELECT v AS x FROM edges)
       |  GROUP BY x),
       |oriented AS (
       |  SELECT
       |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
       |         THEN e.u ELSE e.v END AS src,
       |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
       |         THEN e.v ELSE e.u END AS dst,
       |    CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
       |         THEN dv.deg ELSE du.deg END AS ddst
       |  FROM edges e
       |  JOIN deg du ON du.x = e.u
       |  JOIN deg dv ON dv.x = e.v),
       |wedges AS (
       |  SELECT e1.dst AS b, e2.dst AS c
       |  FROM oriented e1 JOIN oriented e2
       |    ON e1.src = e2.src
       |   AND (e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst))),
       |tri AS (
       |  SELECT count(*) AS n_triangles FROM wedges w
       |  WHERE EXISTS (SELECT 1 FROM oriented e3
       |                WHERE e3.src = w.b AND e3.dst = w.c))
       |SELECT (SELECT count(*) FROM deg) AS n_nodes,
       |       (SELECT count(*) FROM edges) AS n_edges,
       |       n_triangles
       |FROM tri""".stripMargin

  // --------------------------------------------------------- q_bfs_levels
  /** BFS distance labels from the smallest connected node, 4 rounds of
    * min-distance propagation over the symmetrized co-order graph — the
    * same loop-with-lineage-truncation shape as PageRank: each round is one
    * keyed join + one min-aggregation, localCheckpoint cuts the plan.
    * Unreached nodes (incl. parts in no order) report dist = -1. At scale
    * the refinement is frontier-delta propagation (join only nodes whose
    * dist changed last round); with diameter-bounded rounds the full-label
    * join here is the simpler, still-single-shuffle form. */
  def qBfsLevels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = coOrderEdges(s, dir)
    val adj = edges.union(edges.select($"v".as("u"), $"u".as("v"))).persist()
    val nodes = Tables.part(s, dir).select($"p_partkey".cast("long").as("node"))
    val src = adj.agg(min($"u").as("node")) // 1-row scalar aggregate
    var dist = src.withColumn("dist", lit(0))
    var prevCheckpoint: Option[DataFrame] = None
    for (_ <- 1 to Iters - 1) {
      val reached = adj.join(dist.withColumnRenamed("node", "u"), "u")
        .select($"v".as("node"), ($"dist" + 1).as("dist"))
      dist = dist.union(reached)
        .groupBy($"node").agg(min($"dist").as("dist"))
        .localCheckpoint()
      prevCheckpoint.foreach(freeCheckpoint)
      prevCheckpoint = Some(dist)
    }
    adj.unpersist()
    nodes.join(dist, Seq("node"), "left")
      .select($"node".as("p_partkey"),
        coalesce($"dist", lit(-1)).as("dist"))
      .orderBy($"p_partkey")
  }

  private val qBfsLevelsSql = {
    def iter(i: Int): String =
      s"""d$i AS (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT a.v AS node, d.dist + 1 AS dist
         |    FROM adj a JOIN d${i - 1} d ON d.node = a.u)
         |  GROUP BY node)""".stripMargin
    s"""WITH $coOrderEdgesCte,
       |adj AS (
       |  SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
       |d0 AS (SELECT min(u) AS node, 0 AS dist FROM adj),
       |${(1 to Iters - 1).map(iter).mkString(",\n")}
       |SELECT p.p_partkey, coalesce(d.dist, -1) AS dist
       |FROM part p LEFT JOIN d${Iters - 1} d ON d.node = p.p_partkey
       |ORDER BY p.p_partkey""".stripMargin
  }

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank"   -> (qPagerank _),
    "q_triangles"  -> (qTriangles _),
    "q_bfs_levels" -> (qBfsLevels _))

  val oracle: Map[String, String] = Map(
    "q_pagerank"   -> PagerankOracle.sql,
    "q_triangles"  -> qTrianglesSql,
    "q_bfs_levels" -> qBfsLevelsSql)
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
