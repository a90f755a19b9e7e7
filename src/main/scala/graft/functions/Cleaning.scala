package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's cleaning semantics as pure Column combinators — every
  * pandas helper / dbt macro from SURVEY.md §2.8, §2.11 compiles to built-in
  * Spark expressions (whole-stage-codegen'd, no UDFs).
  *
  * Reference citations (all under /root/reference/):
  *  - date repair: 02_Extract_and_transform_raw_data/A2_hr_etl.py:39-51 and
  *    05_dbt_implementation/.../macros/utils/date_safe.sql:1-7
  *  - null-string normalization: A2_hr_etl.py:22-23, C2_ops_etl.py:18-20,
  *    stg_hr_employee.sql:13
  *  - gender/status remap: A2_hr_etl.py:28-30,66-68; stg_hr_employee.sql:16-36
  *  - float-suffix strip: B2_finance_etl.py:51-53; stg_finance_expense.sql:32-33
  *  - surrogate/row-hash keys: TL_combine.sql:28-29; dbt generate_surrogate_key
  */
object Cleaning {

  /** Multi-format date parse with fallback: try yyyy-MM-dd, then dd-MM-yyyy,
    * else `fallback` (null when the pandas-variant semantics are wanted —
    * HR/Finance fall back to null, Ops to 1957-01-01; SURVEY §2.8). */
  def dateSafe(c: Column, fallback: Option[String] = Some("1957-01-01")): Column = {
    val parsed = coalesce(to_date(c, "yyyy-MM-dd"), to_date(c, "dd-MM-yyyy"))
    fallback.fold(parsed)(f => coalesce(parsed, lit(java.sql.Date.valueOf(f))))
  }

  /** ''/NAN/null → default; otherwise trimmed original. */
  def nullNormalize(c: Column, default: String): Column =
    when(c.isNull || upper(trim(c)).isin("", "NAN", "NULL"), lit(default))
      .otherwise(trim(c))

  /** {m,M,male,MALE}→M, {f,F,female,FEMALE}→F, else UNKNOWN. */
  def genderNormalize(c: Column): Column =
    when(upper(trim(c)).isin("M", "MALE"), "M")
      .when(upper(trim(c)).isin("F", "FEMALE"), "F")
      .otherwise("UNKNOWN")

  /** {ACTIVE→Active, RESIGNED→Resigned, else Unknown}. */
  def statusNormalize(c: Column): Column =
    when(upper(trim(c)) === "ACTIVE", "Active")
      .when(upper(trim(c)) === "RESIGNED", "Resigned")
      .otherwise("Unknown")

  /** Strip a float-string suffix: '123.0' → '123' (pandas int-through-float
    * artifacts in ID columns). Non-matching strings pass through. */
  def stripFloatSuffix(c: Column): Column =
    when(c.rlike("^\\d+\\.0$"), regexp_replace(c, "\\.0$", "")).otherwise(c)

  /** to_numeric(errors='coerce') semantics: unparseable → null (requires the
    * engine's ANSI-off session, enforced by graft.core.Sessions/Tables). */
  def coerceDecimal(c: Column, precision: Int = 12, scale: Int = 2): Column =
    c.cast(DecimalType(precision, scale))

  /** dbt generate_surrogate_key / TL_combine row_hash:
    * md5 over '::'-joined stringified columns (nulls → ''). */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("::", cols.map(c => coalesce(c.cast(StringType), lit(""))): _*))
}
