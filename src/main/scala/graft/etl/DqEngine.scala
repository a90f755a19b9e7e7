package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Rule-based data-quality engine (SURVEY §2.9): the reference's ~14
  * check-log-fix patterns (row-iterating Python loops,
  * /root/reference/02_Extract_and_transform_raw_data/A2_hr_etl.py:34-41,96-111)
  * become a declarative rule list — each rule contributes a violation
  * predicate (logged with the pre-fix value) and a fix expression, applied
  * sequentially like the pandas code so later rules see earlier fixes.
  *
  * Everything is Column algebra: the DQ log is a union of filters and the
  * cleaned frame a chain of withColumn — no collect, no loops, no UDFs.
  * Scale note: N rules = N lazy filter branches over the same source; at
  * 100 TB, `df.cache()` (or a single scan via struct-explode) bounds it to
  * one materialization — rules themselves don't shuffle.
  */
object DqEngine {

  /** One cleaning rule for `column`: rows matching `violation` are logged
    * with the current column value, then the column is replaced by `fixed`
    * everywhere (fix expressions are usually conditional, leaving clean rows
    * untouched). */
  final case class Rule(column: String, violation: Column, fixed: Column, issue: String)

  /** Apply rules in order; returns (cleaned, dqLog).
    * `rowRef` identifies the row in log entries — a business key column,
    * never a positional index (Spark has no stable row order; SURVEY §7). */
  def clean(df: DataFrame, table: String, rowRef: Column,
            rules: Seq[Rule], ctx: JobContext): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    rules.foldLeft((df, DqLog.empty(spark))) { case ((cur, log), r) =>
      val violations = cur.filter(r.violation).select(
        DqLog.entry(ctx, table, r.column, rowRef, col(r.column), r.issue): _*)
      (cur.withColumn(r.column, r.fixed), log.unionByName(violations))
    }
  }

  /** Full-row dedup with capture (A8, ET_combined.py:118-132): duplicates
    * beyond the first (ordered by `orderCol` within identical rows) are
    * logged then dropped. One shuffle on the full row hash. */
  def dedupWithLog(df: DataFrame, table: String, rowRef: Column,
                   orderCol: Column, ctx: JobContext): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(df.columns.map(col): _*).orderBy(orderCol)
    val rn = df.withColumn("__rn", row_number().over(w))
    val dropped = rn.filter(col("__rn") > 1).select(
      DqLog.entry(ctx, table, "*", rowRef,
        lit(null).cast(StringType), "duplicate_row"): _*)
    (rn.filter(col("__rn") === 1).drop("__rn"), dropped)
  }
}
