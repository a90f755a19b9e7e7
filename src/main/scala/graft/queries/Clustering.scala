package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** K-means refinement over the embedding corpus — the training step behind
  * the IVF index family (Embeddings.scala consumes a FIXED seeded centroid
  * sample; this is the operator that would learn better ones).
  *
  * Fixed-point discipline, same reasons as Graph.qPagerank: vectors are
  * quantized to micro-units (⌊x·10⁶⌋ as BIGINT, floor on both engines —
  * cast-to-int truncates in Spark but ROUNDS in DuckDB, so the floor is
  * explicit), distances and centroid sums are exact integer arithmetic,
  * and centroid means use integer division (Spark `div` and DuckDB `//`
  * BOTH truncate toward zero — verified on negatives, since embedding
  * sums go negative). Result: every iteration is bit-identical across engines and
  * shuffle orders, so the DuckDB oracle replays all three Lloyd steps as
  * unrolled CTEs. Quantization moves each coordinate < 1e-6 — far below
  * any clustering-relevant signal.
  */
object Clustering {

  private val Iters = 3
  private val Dim = 64

  /** Exact-integer squared-L2 between two micro-unit vectors — the
    * native [[graft.expressions.LongSqDist]] codegen kernel (r14
    * optimization round). It replaces the
    * `aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)), 0L, …)`
    * HOF fold — CodegenFallback, two interpreted lambda calls per
    * ELEMENT, so the k≈64 × dim=64 assignment step ran ~8k interpreted
    * calls per row per pass. Integer arithmetic is exact, so the swap
    * is bit-identical under ANY evaluation order (unlike the float
    * kernels there is no accumulation-order caveat); the DuckDB oracle
    * replays the same sum unchanged. Measured: q_kmeans 5.1 → 2.0 s at
    * sf0.1. */
  private val distExpr = "long_sqdist(v, c)"

  // ------------------------------------------------------------- q_kmeans
  /** 3 Lloyd iterations; the centroid seed is the SAME adaptive-stride
    * sample the IVF index uses as its coarse quantizer (`vec_id % stride`,
    * stride = max(31, ⌈n/64⌉) — k stays ≈ 64 at ANY corpus size; r12: the
    * r11 scaling audit fixed this fixed-parameter class in IVF/LSH but the
    * fix had not been propagated here, leaving k = n/31 unbounded and
    * assignment O(n²/31)). Per iteration: assignment = corpus × broadcast
    * centroids (≤ ~64 rows — never corpus × corpus), argmin by (dist,
    * cell_id) in a per-vector window bounded by k; update = posexplode to
    * (cell, dim, val), one grouped integer sum, arrays rebuilt by sorted
    * collect. localCheckpoint truncates the loop's lineage exactly as in
    * Graph.qPagerank. Output: per-cell membership and exact integer WCSS —
    * the clustering-quality number a tuning loop would watch.
    *
    * Scale shape: the corpus is scanned once per iteration with a
    * broadcast join (no shuffle for assignment); the update shuffles
    * (cell, dim) partial sums — O(k·dim) per mapper after partial
    * aggregation. With k bounded, the per-iteration driver sync and the
    * centroid plan literal are both O(k·dim) CONSTANTS, so at 100 TB this
    * is the textbook distributed k-means; the driver never sees a corpus
    * vector (only the ≤ ~64 synced centroids). Stride is 31 at every
    * driver gate scale (n ≤ 1984), so gate results are byte-stable. */
  def qKmeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vecs = Tables.embeddings(s, dir)
      .select($"vec_id",
        // promotion must be explicit: float*int stays single-precision in
        // one engine and widens in the other — quantize in double on both
        expr("transform(embedding, " +
          "x -> cast(floor(cast(x as double) * 1000000d) as bigint))")
          .as("v"))
      .persist()

    // k-bounding seed stride, identical integer arithmetic to the DuckDB
    // oracle's scalar subquery (and to Embeddings.centroidStride). The
    // count() also materializes the persist before the iteration loop.
    val stride = math.max(31L, (vecs.count() + 63) / 64)

    // Centroids sync through the driver between iterations — k·dim scaled
    // longs (k ≤ ~64 by the stride), the same per-iteration driver traffic
    // Spark MLlib's KMeans pays, and what makes ASSIGNMENT a pure map
    // stage: the centroid array rides into the plan as a bounded literal,
    // each row computes all k distances and takes the first argmin (array
    // ordered by cell_id = the oracle's (dist, cell_id) tie-break) with NO
    // join, NO window, NO shuffle. Only the update step shuffles, and only
    // (cell, dim) partial sums.
    var cents: Array[(Long, Seq[Long])] = vecs
      .filter($"vec_id" % stride === 0).select($"vec_id", $"v")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)

    def assigned: DataFrame =
      vecs
        .withColumn("cids", typedLit(cents.map(_._1).toSeq))
        .withColumn("cvs", typedLit(cents.map(_._2).toSeq))
        .withColumn("dists", expr(s"transform(cvs, c -> $distExpr)"))
        .withColumn("idx", expr("array_position(dists, array_min(dists))").cast("int"))
        .withColumn("cell_id", expr("element_at(cids, idx)"))
        .withColumn("dist", expr("element_at(dists, idx)"))
        .select($"vec_id", $"cell_id", $"dist", $"v")

    for (_ <- 1 to Iters) {
      cents = assigned
        .select($"cell_id", posexplode($"v"))
        .groupBy($"cell_id", $"pos")
        // Spark `div` and DuckDB `//` both truncate toward zero (verified
        // on negatives), so the mean's sub-micro rounding agrees exactly
        .agg(sum($"col").as("sv"), count(lit(1)).as("n"))
        .withColumn("m", expr("sv div n"))
        .groupBy($"cell_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
          .as("c"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    }
    // materialize the (k-row) result while the corpus cache is still live,
    // THEN drop the cache — unpersisting before the lazy consumer executes
    // would make the gated/benched final pass recompute everything uncached
    // (review finding)
    val out = assigned
      .groupBy($"cell_id")
      .agg(count(lit(1)).as("n_members"), sum($"dist").as("wcss"))
      .orderBy($"cell_id")
      .localCheckpoint()
    vecs.unpersist()
    out
  }

  private val qKmeansSql = {
    val dist = (c: String) =>
      s"list_sum(list_transform(range(1, ${Dim + 1}), " +
        s"j -> (v.v[j] - $c.c[j]) * (v.v[j] - $c.c[j])))"
    def iter(i: Int): String =
      s"""a$i AS (
         |  SELECT vec_id, cell_id, v FROM (
         |    SELECT v.vec_id, c.cell_id, v.v,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${dist("c")}, c.cell_id) AS rn
         |    FROM v CROSS JOIN c${i - 1} c) WHERE rn = 1),
         |c$i AS (
         |  SELECT cell_id, list(m ORDER BY pos) AS c FROM (
         |    SELECT cell_id, pos, sum(val) // count(*) AS m FROM (
         |      SELECT cell_id, unnest(range(1, ${Dim + 1})) AS pos,
         |        unnest(v) AS val
         |      FROM a$i)
         |    GROUP BY cell_id, pos)
         |  GROUP BY cell_id)""".stripMargin
    s"""WITH v AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cell_id, v AS c FROM v
       |       WHERE vec_id % (SELECT greatest(31, (count(*) + 63) // 64)
       |                       FROM embeddings) = 0),
       |${(1 to Iters).map(iter).mkString(",\n")},
       |fin AS (
       |  SELECT vec_id, cell_id, dist FROM (
       |    SELECT v.vec_id, c.cell_id, ${dist("c")} AS dist,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${dist("c")}, c.cell_id) AS rn
       |    FROM v CROSS JOIN c$Iters c) WHERE rn = 1)
       |SELECT cell_id, count(*) AS n_members,
       |  CAST(sum(dist) AS BIGINT) AS wcss
       |FROM fin GROUP BY cell_id ORDER BY cell_id""".stripMargin
  }

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmeans" -> (qKmeans _))

  val oracle: Map[String, String] = Map(
    "q_kmeans" -> qKmeansSql)
}
