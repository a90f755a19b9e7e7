package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{OracleParity => OP, Tables}

/** Sort / limit / set-operation coverage (SURVEY.md §2.6). */
object SetOps {

  // --------------------------------------------------------- q_top10_orders
  /** O1/O2 + LIMIT: global top-k by measure. Spark executes orderBy+limit as
    * TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    * driver; no global sort even at 100 TB. Tie-broken on orderkey. */
  def qTop10Orders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
      .select($"o_orderkey", $"o_custkey",
        OP.dec2($"o_totalprice").cast("double").as("total_price"),
        $"o_orderstatus")
  }

  private val qTop10OrdersSql =
    """SELECT o_orderkey, o_custkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
      |  o_orderstatus
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // -------------------------------------------------------- q_union_distinct
  /** O4: SQL UNION semantics (dedup) — Spark `union` is UNION ALL, so the
    * reference's `UNION` needs an explicit `.distinct()` (the dim_time
    * date ∪ fallback-row pattern, dbt dim_time.sql:28-41). */
  def qUnionDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val custNations = Tables.customer(s, dir).select($"c_nationkey".as("nationkey"))
    val suppNations = Tables.supplier(s, dir).select($"s_nationkey".as("nationkey"))
    custNations.unionByName(suppNations)
      .distinct()
      .orderBy($"nationkey")
  }

  private val qUnionDistinctSql =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  // -------------------------------------------------------------- q_except
  /** O5: EXCEPT — customers who ordered, minus those with any high-value
    * order (the new-rows-only insert shape, TL_combine.sql:14-20). */
  def qExcept(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ordered = Tables.orders(s, dir).select($"o_custkey".as("custkey"))
    val highValue = Tables.orders(s, dir).filter($"o_totalprice" > 400000.0)
      .select($"o_custkey".as("custkey"))
    ordered.except(highValue).orderBy($"custkey")
  }

  private val qExceptSql =
    """SELECT o_custkey AS custkey FROM orders
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
      |ORDER BY custkey""".stripMargin

  // ------------------------------------------------------------ q_intersect
  /** INTERSECT (absent from the reference — SURVEY §2.6 notes it; included
    * for set-op completeness): customers who both placed an order and
    * appear in the event stream. Planned as a left-semi after dedup. */
  def qIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ordered = Tables.orders(s, dir).select($"o_custkey".as("id"))
    val active = Tables.events(s, dir).select($"user_id".as("id"))
    ordered.intersect(active).orderBy($"id")
  }

  private val qIntersectSql =
    """SELECT o_custkey AS id FROM orders
      |INTERSECT
      |SELECT user_id AS id FROM events
      |ORDER BY id""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_top10_orders"   -> (qTop10Orders _),
    "q_union_distinct" -> (qUnionDistinct _),
    "q_except"         -> (qExcept _),
    "q_intersect"      -> (qIntersect _))

  val oracle: Map[String, String] = Map(
    "q_top10_orders"   -> qTop10OrdersSql,
    "q_union_distinct" -> qUnionDistinctSql,
    "q_except"         -> qExceptSql,
    "q_intersect"      -> qIntersectSql)
}
