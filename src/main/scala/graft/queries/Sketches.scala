package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sketch-based approximate aggregation — the operators that replace
  * exact-but-unshardable computations when group cardinalities explode.
  * Unlike Spark's built-in `approx_count_distinct` (HyperLogLog++, whose
  * estimate depends on engine-internal hashing and bias tables), every
  * sketch here is a DETERMINISTIC pure function of md5-derived hashes, so
  * the DuckDB oracle replays the estimator bit-for-bit: approximate in
  * statistics, exact in reproducibility — the property a training-data
  * pipeline needs for auditable corpus stats.
  *
  * The reference counts distincts exactly
  * (/root/reference/04_KPI/KPIs.sql — COUNT(DISTINCT) per view); these are
  * the drop-in sketches for the same questions at 100 TB.
  */
object Sketches {

  private val K = 64

  // -------------------------------------------------------- q_kmv_distinct
  /** KMV (k-minimum-values) distinct-count estimate vs the exact count,
    * per return flag over lineitem's part keys — the estimator made
    * visible, exactly like q_minhash_est for jaccard: run on a sample, the
    * rel_err column prices the sketch width k before committing the full
    * pass.
    *
    * hash = first 8 md5 hex digits of the key as a uniform 32-bit value;
    * estimate = (k−1)·2³² / (k-th smallest distinct hash) when the sketch
    * filled, else exactly the kept count. All estimator arithmetic is one
    * division of identical integers on both engines → bit-identical
    * doubles, no rounding needed anywhere.
    *
    * Scale shape: the native `kmv` aggregate (graft.expressions.KmvAgg)
    * is map-side combinable — each mapper reduces its share of a group to
    * ≤ k longs before the exchange, so the shuffle moves O(groups × k)
    * scalars where exact COUNT(DISTINCT) shuffles every distinct key (its
    * first phase repartitions the full (group, key) stream). The oracle
    * replays the estimate with a window over distinct hashes — same
    * result, exact-shuffle shape — proving the sketch against the
    * semantics it approximates. */
  def qKmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val est = when($"sk.n_kept" < K, $"sk.n_kept".cast("double"))
      .otherwise(lit((K - 1).toDouble * 4294967296.0) / $"sk.kth")
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag".as("flag"))
      .agg(
        countDistinct($"l_partkey").as("n_exact"),
        expr(s"kmv(cast(conv(substring(md5(cast(l_partkey as string)), 1, 8)," +
          s" 16, 10) as bigint), $K)").as("sk"))
      .select($"flag", $"n_exact", est.as("n_est"),
        (abs(est - $"n_exact") / $"n_exact").as("rel_err"))
      .orderBy($"flag")
  }

  private val qKmvDistinctSql =
    s"""WITH h AS (
       |  SELECT DISTINCT l_returnflag AS flag,
       |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT AS hv
       |  FROM lineitem),
       |r AS (
       |  SELECT flag, hv,
       |    row_number() OVER (PARTITION BY flag ORDER BY hv) AS rn,
       |    count(*) OVER (PARTITION BY flag) AS nh
       |  FROM h),
       |sk AS (
       |  SELECT flag, max(CASE WHEN rn = $K THEN hv END) AS kth,
       |    max(nh) AS nh
       |  FROM r GROUP BY flag),
       |ex AS (
       |  SELECT l_returnflag AS flag, count(DISTINCT l_partkey) AS n_exact
       |  FROM lineitem GROUP BY 1),
       |est AS (
       |  SELECT ex.flag, ex.n_exact,
       |    CASE WHEN sk.nh < $K THEN CAST(least(sk.nh, $K) AS DOUBLE)
       |         ELSE ${K - 1}.0 * 4294967296.0 / sk.kth END AS n_est
       |  FROM ex JOIN sk USING (flag))
       |SELECT flag, n_exact, n_est,
       |  abs(n_est - n_exact) / n_exact AS rel_err
       |FROM est ORDER BY flag""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmv_distinct" -> (qKmvDistinct _))

  val oracle: Map[String, String] = Map(
    "q_kmv_distinct" -> qKmvDistinctSql)
}
