package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{OracleParity => OP, Tables}

/** Per-entity event-sequence repair — the two operators every CDC/telemetry
  * feed needs before analytics can trust it: carry-forward imputation of
  * sparse measures, and last-writer-wins changelog compaction (the MERGE
  * semantics of a lakehouse CDC apply, re-expressed as one keyed window).
  * The reference's nearest kin is the incremental unique-key load
  * (/root/reference/05_incremental_load/incremental_load_fact_table.py) —
  * append-only, no updates or deletes; these close the U/D half.
  *
  * Both are ONE shuffle on the entity key; the per-key window sorts
  * event-time sequences that are bounded per entity, so the shape is
  * unchanged at 100 TB (shuffle partitions scale with keys, not history —
  * and a skewed key is a salting candidate, see core/Skew).
  */
object TimeSeries {

  // ---------------------------------------------------------- q_forward_fill
  /** Forward-fill: only purchase events carry a meaningful amount; every
    * event gets the entity's most recent purchase value carried forward
    * (null until the first purchase). `last(ignoreNulls)` over a running
    * rows-frame is the distributed as-of lookup — no self-join, no
    * per-row subquery. Order (ts, event_id) is total, so both engines
    * pick the identical carried value. */
  def qForwardFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("pv",
        when($"event_type" === "purchase", OP.dec2($"value")))
      .select($"event_id", $"user_id", $"event_type",
        last($"pv", ignoreNulls = true).over(w).cast("double")
          .as("last_purchase"))
      .orderBy($"event_id")
  }

  private val qForwardFillSql =
    """SELECT event_id, user_id, event_type,
      |  CAST(last_value(pv IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS last_purchase
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
      |        CASE WHEN event_type = 'purchase'
      |             THEN CAST(value AS DECIMAL(18,2)) END AS pv
      |      FROM events)
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------ q_cdc_apply
  /** Changelog compaction: the event stream read as a CDC feed
    * (signup = insert, error = tombstone delete, everything else = upsert),
    * applied last-writer-wins by the total sequence (ts, event_id). The
    * final state is one row per live key — rank-1 per key, tombstones
    * dropped AFTER picking the winner, so a trailing delete removes the
    * key entirely (the semantics Delta/Hudi MERGE implements; here it is
    * a single row_number window, which AQE shards by key at scale). */
  def qCdcApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val log = Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id",
        when($"event_type" === "signup", "I")
          .when($"event_type" === "error", "D")
          .otherwise("U").as("op"),
        OP.dec2($"value").as("v"))
    val byKey = Window.partitionBy($"user_id")
    log
      .withColumn("rn",
        row_number().over(byKey.orderBy($"ts".desc, $"event_id".desc)))
      .withColumn("n_ops", count(lit(1)).over(byKey))
      .filter($"rn" === 1 && $"op" =!= "D")
      .select($"user_id", $"op".as("last_op"),
        $"v".cast("double").as("last_value"),
        $"ts".as("last_ts"), $"n_ops")
      .orderBy($"user_id")
  }

  private val qCdcApplySql =
    """WITH log AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    CASE WHEN event_type = 'signup' THEN 'I'
      |         WHEN event_type = 'error' THEN 'D'
      |         ELSE 'U' END AS op,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events),
      |ranked AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_ops
      |  FROM log)
      |SELECT user_id, op AS last_op, CAST(v AS DOUBLE) AS last_value,
      |  ts AS last_ts, n_ops
      |FROM ranked WHERE rn = 1 AND op <> 'D'
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_forward_fill" -> (qForwardFill _),
    "q_cdc_apply"    -> (qCdcApply _))

  val oracle: Map[String, String] = Map(
    "q_forward_fill" -> qForwardFillSql,
    "q_cdc_apply"    -> qCdcApplySql)
}
