package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Temporal join operators Spark has no native node for — as-of and range
  * joins — expressed in their scale-safe compositional forms (the (a)-tier
  * of the builder brief's preference order: compose existing ops before
  * reaching for a custom SparkPlan).
  *
  * Both avoid the naive inequality-join plan (BroadcastNestedLoopJoin /
  * cartesian range explosion):
  *  - as-of: union the two streams on a common time axis and take a
  *    running `last(ignoreNulls)` per key — ONE shuffle on the key, state
  *    O(1) per row, no pairwise candidate blowup. The standard
  *    distributed as-of pattern.
  *  - range: rewrite the band predicate to an equi-join on a computed
  *    bucket key (floor(value/width)) against a broadcast range dim.
  *
  * The DuckDB oracles intentionally use the OTHER formulation (native
  * ASOF JOIN; BETWEEN inequality join), so the correctness gate proves the
  * rewrites semantically equivalent, not just self-consistent.
  */
object TemporalJoins {

  // ------------------------------------------------------------ q_asof_join
  /** For every event, the user's most recent order strictly at-or-before
    * the event time (null if none). Orders are pre-collapsed to one row
    * per (custkey, day) — max orderkey — so the as-of pick is unique and
    * engine-independent. */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val od = Tables.orders(s, dir)
      .groupBy($"o_custkey".as("user_id"),
        $"o_orderdate".cast("date").as("od"))
      .agg(max($"o_orderkey").as("ok"))
      .select($"user_id", $"od".cast("timestamp").as("t"),
        $"ok", lit(null).cast("long").as("event_id"), lit(0).as("is_event"))
    val ev = Tables.events(s, dir)
      .select($"user_id", $"ts".as("t"),
        lit(null).cast("long").as("ok"), $"event_id", lit(1).as("is_event"))
    // order rows sort before an event at the same instant (is_event 0<1),
    // so "at-or-before" is inclusive; event_id totalizes event ties
    val w = Window.partitionBy($"user_id")
      .orderBy($"t", $"is_event", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    od.unionByName(ev)
      .withColumn("asof_orderkey", last($"ok", ignoreNulls = true).over(w))
      .filter($"is_event" === 1)
      .select($"user_id", $"event_id", $"asof_orderkey")
      .orderBy($"user_id", $"event_id")
  }

  private val qAsofJoinSql =
    """WITH od AS (
      |  SELECT o_custkey AS user_id,
      |    CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS t,
      |    max(o_orderkey) AS ok
      |  FROM orders GROUP BY 1, 2),
      |ev AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
      |SELECT ev.user_id, ev.event_id, od.ok AS asof_orderkey
      |FROM ev ASOF LEFT JOIN od
      |  ON ev.user_id = od.user_id AND ev.ts >= od.t
      |ORDER BY ev.user_id, ev.event_id""".stripMargin

  // ----------------------------------------------------------- q_range_join
  /** Band/range join: classify each event's value into [lo, hi) bands.
    * Spark side rewrites the band predicate into an equi-join on
    * floor(value/width) — broadcast hash join, no nested-loop — while the
    * oracle keeps the literal BETWEEN inequality join over the same band
    * table, proving the rewrite. */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = s.createDataFrame(
      (0 until 5).map(i => (i, i * 100.0, (i + 1) * 100.0, s"band_$i")))
      .toDF("band_id", "lo", "hi", "band_label")
    Tables.events(s, dir)
      .withColumn("band_id", floor($"value" / 100).cast("int"))
      .join(broadcast(bands), Seq("band_id"))
      .select($"event_id", graft.core.OracleParity.dec2($"value")
        .cast("double").as("value"), $"band_label", $"lo", $"hi")
      .orderBy($"event_id")
  }

  private val qRangeJoinSql =
    """WITH bands AS (
      |  SELECT i AS band_id,
      |    CAST(i * 100.0 AS DOUBLE) AS lo,
      |    CAST((i + 1) * 100.0 AS DOUBLE) AS hi,
      |    'band_' || CAST(i AS VARCHAR) AS band_label
      |  FROM range(0, 5) t(i))
      |SELECT event_id,
      |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value,
      |  band_label, lo, hi
      |FROM events JOIN bands ON value >= lo AND value < hi
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------- q_pit_join
  /** Point-in-time join against an SCD2 dimension — THE warehouse temporal
    * join: each purchase fact is enriched with the dim version that was
    * valid AT the fact's event time (`valid_from ≤ ts < valid_to`,
    * half-open intervals so a fact at a change instant belongs to the NEW
    * version; the current row's null valid_to is the open end). The dim is
    * [[Windows.qScd2Rebuild]]'s versioned table — reusing the derivation
    * means fact and dim can never disagree about history.
    *
    * Scale shape: the join is EQUI on the business key with the interval
    * test as a post-join predicate — it plans as a keyed hash/sort-merge
    * join (versions-per-key rows examined per fact), never a cartesian or
    * broadcast-nested-loop over the fact table, because the equi key is
    * extracted first. Exactly-one-version-per-fact is structural (the
    * rebuild's intervals partition each user's timeline from their first
    * event, and every fact IS an event of that user). */
  def qPitJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = Windows.qScd2Rebuild(s, dir)
      .select($"user_id", $"attr_value", $"valid_from", $"valid_to")
    val facts = Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    facts.join(dim,
      facts("user_id") === dim("user_id") &&
        $"valid_from" <= $"ts" &&
        ($"valid_to".isNull || $"ts" < $"valid_to"))
      .select($"event_id", facts("user_id").as("user_id"),
        $"attr_value", $"valid_from")
      .orderBy($"event_id")
  }

  private val qPitJoinSql =
    """WITH evts AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events),
      |changes AS (
      |  SELECT * FROM (
      |    SELECT *, LAG(event_type, 1) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |    FROM evts)
      |  WHERE event_type IS DISTINCT FROM prev_type),
      |dim AS (
      |  SELECT user_id, event_type AS attr_value, ts AS valid_from,
      |    LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS valid_to
      |  FROM changes)
      |SELECT f.event_id, f.user_id, d.attr_value, d.valid_from
      |FROM evts f
      |JOIN dim d ON f.user_id = d.user_id
      |  AND d.valid_from <= f.ts
      |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
      |WHERE f.event_type = 'purchase'
      |ORDER BY f.event_id""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join"  -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_pit_join"   -> (qPitJoin _))

  val oracle: Map[String, String] = Map(
    "q_asof_join"  -> qAsofJoinSql,
    "q_range_join" -> qRangeJoinSql,
    "q_pit_join"   -> qPitJoinSql)
}
