package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{OracleParity => OP, Tables}

/** Core relational operator coverage (SURVEY.md §2.2–§2.6) expressed over
  * the harness testdata. Each query has a DuckDB oracle in [[oracle]];
  * aliases match column-for-column (driver hashes after sorting columns by
  * name). Every query ends with a deterministic ORDER BY (unique key last)
  * so row-order-sensitive hashing also matches.
  */
object Relational {
  import OP._

  /** q1_agg — TPC-H Q1-style pricing summary. SURVEY §2.4 A3/A4 (SUM+AVG
    * grouped, ROUND), §2.2 P5 (date filter). Two-column group-by keeps the
    * aggregation map-side partial + single shuffle; at 100 TB this is the
    * canonical scan-heavy/low-cardinality agg — no further tuning needed. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumExact($"l_quantity").as("sum_qty"),
        sumExact($"l_extendedprice").as("sum_base_price"),
        sum(discounted($"l_extendedprice", $"l_discount"))
          .cast(DoubleType).as("sum_disc_price"),
        avgExact($"l_quantity").as("avg_qty"),
        avgExact($"l_extendedprice").as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity), 4) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice), 4) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
