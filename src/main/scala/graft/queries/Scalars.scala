package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{OracleParity => OP, Tables}
import graft.functions.Cleaning

/** Scalar-function & cleaning-operator coverage (SURVEY.md §2.8, §2.9, S6).
  * These are the reference's pandas/SQL cleaning semantics re-expressed as
  * pure Column combinators — zero UDFs, everything stays inside whole-stage
  * codegen. */
object Scalars {

  // --------------------------------------------------------- q_date_series
  /** S6: generate_series date dimension (2020-01-01..2030-12-31 daily,
    * ∪ the 1957-01-01 fallback row — combined_dw_schema.sql:39-58), with
    * date-part extraction and the DOW-corrected weekend flag (Postgres DOW
    * 0=Sun vs Spark dayofweek 1=Sun, SURVEY §2.8). 4,018 rows — a driver-
    * side-free generator: `sequence` explodes distributed. */
  def qDateSeries(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val days = s.range(1).select(explode(sequence(
      lit(java.sql.Date.valueOf("2020-01-01")),
      lit(java.sql.Date.valueOf("2030-12-31")),
      expr("interval 1 day"))).as("full_date"))
    val fallback = s.range(1)
      .select(lit(java.sql.Date.valueOf("1957-01-01")).as("full_date"))
    days.unionByName(fallback).distinct()
      .select(
        $"full_date",
        dayofmonth($"full_date").as("day"),
        month($"full_date").as("month"),
        quarter($"full_date").as("quarter"),
        year($"full_date").as("year"),
        dayofweek($"full_date").isin(1, 7).as("is_weekend"))
      .withColumn("time_id",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy($"full_date")))
      .orderBy($"time_id")
  }

  private val qDateSeriesSql =
    """WITH dates AS (
      |  SELECT CAST(d AS DATE) AS full_date
      |  FROM generate_series(DATE '2020-01-01', DATE '2030-12-31', INTERVAL 1 DAY) t(d)
      |  UNION
      |  SELECT DATE '1957-01-01')
      |SELECT full_date, day(full_date) AS day, month(full_date) AS month,
      |  quarter(full_date) AS quarter, year(full_date) AS year,
      |  dayofweek(full_date) IN (0, 6) AS is_weekend,
      |  CAST(ROW_NUMBER() OVER (ORDER BY full_date) AS INT) AS time_id
      |FROM dates ORDER BY time_id""".stripMargin

  // ----------------------------------------------------------- q_date_safe
  /** §2.8 multi-format date parsing with fallback (the `fix_date` /
    * `date_safe` macro): try yyyy-MM-dd, then dd-MM-yyyy, else 1957-01-01.
    * Pure `coalesce(to_date...)` expression — null-on-parse-failure (ANSI
    * off) gives pandas' errors='coerce' semantics with no UDF. */
  def dateSafe(c: Column, fallback: String = "1957-01-01"): Column =
    Cleaning.dateSafe(c, Some(fallback))

  def qDateSafe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // build a 3-way dirty date-string column from o_orderdate, then repair it
    val dirty = Tables.orders(s, dir).select(
      $"o_orderkey",
      when($"o_orderkey" % 3 === 0, date_format($"o_orderdate", "yyyy-MM-dd"))
        .when($"o_orderkey" % 3 === 1, date_format($"o_orderdate", "dd-MM-yyyy"))
        .otherwise(lit("not-a-date")).as("raw_date"))
    dirty
      .withColumn("parsed_date", dateSafe($"raw_date"))
      .orderBy($"o_orderkey")
  }

  private val qDateSafeSql =
    """WITH dirty AS (
      |  SELECT o_orderkey,
      |    CASE
      |      WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
      |      WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%d-%m-%Y')
      |      ELSE 'not-a-date' END AS raw_date
      |  FROM orders)
      |SELECT o_orderkey, raw_date,
      |  CAST(COALESCE(
      |    try_strptime(raw_date, '%Y-%m-%d'),
      |    try_strptime(raw_date, '%d-%m-%Y'),
      |    TIMESTAMP '1957-01-01 00:00:00') AS DATE) AS parsed_date
      |FROM dirty ORDER BY o_orderkey""".stripMargin

  // ----------------------------------------------------- q_clean_normalize
  /** §2.8 string-cleaning stack: trim/upper, initcap, CASE-WHEN value remap,
    * null-string normalization (''/'NAN'/'null' → default) — the
    * stg_hr_employee / stg_ops_downtime cleaning semantics. */
  def nullNormalize(c: Column, default: String): Column =
    Cleaning.nullNormalize(c, default)

  def qCleanNormalize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        $"doc_id",
        upper(trim($"lang")).as("lang_code"),
        when(upper(trim($"lang")) === "EN", "ENGLISH")
          .when(upper(trim($"lang")) === "FR", "FRENCH")
          .when(upper(trim($"lang")) === "ES", "SPANISH")
          .otherwise("OTHER").as("lang_name"),
        // first-char-only capitalization (not initcap: Spark initcap
        // capitalizes every word while the oracle's upper(substr(c,1,1)) ||
        // lower(substr(c,2)) touches only the first character — they agree
        // on single tokens only, so match the oracle's semantics exactly)
        concat(upper(substring($"source", 1, 1)),
          lower(substring($"source", 2, Int.MaxValue))).as("source_title"),
        nullNormalize($"source", "UNKNOWN_SRC").as("source_clean"))
      .orderBy($"doc_id")
  }

  private val qCleanNormalizeSql =
    """SELECT doc_id,
      |  upper(trim(lang)) AS lang_code,
      |  CASE upper(trim(lang))
      |    WHEN 'EN' THEN 'ENGLISH' WHEN 'FR' THEN 'FRENCH'
      |    WHEN 'ES' THEN 'SPANISH' ELSE 'OTHER' END AS lang_name,
      |  upper(substr(source, 1, 1)) || lower(substr(source, 2)) AS source_title,
      |  CASE WHEN source IS NULL OR upper(trim(source)) IN ('', 'NAN', 'NULL')
      |       THEN 'UNKNOWN_SRC' ELSE trim(source) END AS source_clean
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- q_md5_surrogate
  /** §2.8 md5 surrogate/row-hash keys: md5(concat_ws('::', cols)) — the SCD2
    * row_hash (TL_combine.sql:28-29) and dbt generate_surrogate_key pattern.
    * Hash keys shard uniformly → no hot partitions at 100 TB, unlike
    * sequence ids. Delegates to [[Cleaning.surrogateKey]], which coalesces
    * each column to '' before joining — without it concat_ws silently skips
    * nulls, so (a, null) and (null, a) would collide. */
  def surrogateKey(cols: Column*): Column = Cleaning.surrogateKey(cols: _*)

  def qMd5Surrogate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.nation(s, dir)
      .select(
        $"n_nationkey",
        surrogateKey($"n_name", $"n_nationkey".cast(StringType)).as("nation_sk"),
        md5($"n_name").as("name_hash"))
      .orderBy($"n_nationkey")
  }

  private val qMd5SurrogateSql =
    """SELECT n_nationkey,
      |  md5(concat_ws('::', COALESCE(n_name, ''),
      |    COALESCE(CAST(n_nationkey AS VARCHAR), ''))) AS nation_sk,
      |  md5(n_name) AS name_hash
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // --------------------------------------------------- q_numeric_coerce
  /** §2.8 numeric coercion + regex: extract digits from a JSON-ish string
    * (regexp_extract), cast-with-null-on-failure (pandas to_numeric
    * errors='coerce'), float-suffix detection (`^\d+\.0$` rlike), abs+round.
    */
  def qNumericCoerce(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        $"event_id",
        regexp_extract($"props", "\"k\": (\\d+)", 1).cast(IntegerType).as("k"),
        // cast of garbage → null → coalesce 0 (coerce semantics)
        coalesce(regexp_extract($"props", "\"v\": (\\d+)", 1).cast(IntegerType),
          lit(0)).as("v_coerced"),
        concat(floor($"value").cast(LongType).cast(StringType), lit(".0"))
          .rlike("^\\d+\\.0$").as("looks_float"),
        OP.dec2(abs($"value" - 100.0)).cast(DoubleType).as("abs_dev"))
      .orderBy($"event_id")
  }

  private val qNumericCoerceSql =
    """SELECT event_id,
      |  try_cast(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k,
      |  COALESCE(try_cast(regexp_extract(props, '"v": (\d+)', 1) AS INT), 0)
      |    AS v_coerced,
      |  regexp_matches(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) || '.0', '^\d+\.0$')
      |    AS looks_float,
      |  CAST(CAST(abs(value - 100.0) AS DECIMAL(18,2)) AS DOUBLE) AS abs_dev
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------- q_float_fix
  /** F-floatfix (stg_finance_expense.sql:32-33; B2_finance_etl.py:51-53):
    * pandas int-through-float ID artifacts — '123.0' → '123', non-matching
    * strings pass through. Exercises [[Cleaning.stripFloatSuffix]] against
    * a 3-way dirty column manufactured from order keys. */
  def qFloatFix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dirty = Tables.orders(s, dir).select(
      $"o_orderkey",
      when($"o_orderkey" % 3 === 0, concat($"o_custkey".cast(StringType), lit(".0")))
        .when($"o_orderkey" % 3 === 1, $"o_custkey".cast(StringType))
        .otherwise(concat(lit("id-"), $"o_custkey".cast(StringType))).as("raw_id"))
    dirty
      .withColumn("fixed_id", Cleaning.stripFloatSuffix($"raw_id"))
      .orderBy($"o_orderkey")
  }

  private val qFloatFixSql =
    """WITH dirty AS (
      |  SELECT o_orderkey,
      |    CASE
      |      WHEN o_orderkey % 3 = 0 THEN CAST(o_custkey AS VARCHAR) || '.0'
      |      WHEN o_orderkey % 3 = 1 THEN CAST(o_custkey AS VARCHAR)
      |      ELSE 'id-' || CAST(o_custkey AS VARCHAR) END AS raw_id
      |  FROM orders)
      |SELECT o_orderkey, raw_id,
      |  CASE WHEN regexp_matches(raw_id, '^\d+\.0$')
      |       THEN regexp_replace(raw_id, '\.0$', '')
      |       ELSE raw_id END AS fixed_id
      |FROM dirty ORDER BY o_orderkey""".stripMargin

  // --------------------------------------------------------- q_null_filter
  /** P7 null-drop filter (C2_ops_etl.py:64 dropna; dbt
    * stg_ops_downtime.sql:31). `nullif(x,'error') IS NOT NULL` over the
    * derived column would NOT push to the scan (the predicate references
    * an expression, not a column) — so the filter is phrased on the raw
    * column (`x IS NOT NULL AND x != 'error'`, same rows) and reaches the
    * parquet reader as PushedFilters (PlanAuditSpec asserts it). At scale
    * that's row-group skipping vs a full-table decode. */
  def qNullFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"event_type".isNotNull && $"event_type" =!= "error")
      .select($"event_id", nullif($"event_type", lit("error")).as("maybe_type"))
      .orderBy($"event_id")
  }

  private val qNullFilterSql =
    """SELECT event_id, NULLIF(event_type, 'error') AS maybe_type
      |FROM events
      |WHERE NULLIF(event_type, 'error') IS NOT NULL
      |ORDER BY event_id""".stripMargin

  // -------------------------------------------------------- q_dq_rules
  /** §2.9: the rule-based DQ engine shape — N predicate rules over a table,
    * each violation emitting a log row {table, column, row_reference,
    * original_value, issue}; one union'd pass, no row loops. */
  def qDqRules(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    def logRow(col: String, orig: Column, issue: String)(pred: Column): DataFrame =
      docs.filter(pred).select(
        lit("documents").as("table_name"),
        lit(col).as("column_name"),
        $"doc_id".cast(StringType).as("row_reference"),
        orig.cast(StringType).as("original_value"),
        lit(issue).as("issue"))
    val shortDoc = logRow("n_chars", $"n_chars", "short_doc")($"n_chars" < 150)
    val unexpectedLang = logRow("lang", $"lang", "unexpected_lang")(
      !$"lang".isin("en", "fr", "es", "de"))
    val fewTokens = logRow("text", size(split(trim($"text"), "\\s+")), "few_tokens")(
      size(split(trim($"text"), "\\s+")) < 30)
    shortDoc.unionByName(unexpectedLang).unionByName(fewTokens)
      .orderBy($"issue", $"row_reference")
  }

  private val qDqRulesSql =
    """SELECT * FROM (
      |  SELECT 'documents' AS table_name, 'n_chars' AS column_name,
      |    CAST(doc_id AS VARCHAR) AS row_reference,
      |    CAST(n_chars AS VARCHAR) AS original_value, 'short_doc' AS issue
      |  FROM documents WHERE n_chars < 150
      |  UNION ALL
      |  SELECT 'documents', 'lang', CAST(doc_id AS VARCHAR),
      |    CAST(lang AS VARCHAR), 'unexpected_lang'
      |  FROM documents WHERE lang NOT IN ('en', 'fr', 'es', 'de')
      |  UNION ALL
      |  SELECT 'documents', 'text', CAST(doc_id AS VARCHAR),
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS VARCHAR),
      |    'few_tokens'
      |  FROM documents WHERE len(string_split_regex(trim(text), '\s+')) < 30)
      |ORDER BY issue, row_reference""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_date_series"     -> (qDateSeries _),
    "q_date_safe"       -> (qDateSafe _),
    "q_clean_normalize" -> (qCleanNormalize _),
    "q_md5_surrogate"   -> (qMd5Surrogate _),
    "q_numeric_coerce"  -> (qNumericCoerce _),
    "q_float_fix"       -> (qFloatFix _),
    "q_null_filter"     -> (qNullFilter _),
    "q_dq_rules"        -> (qDqRules _))

  val oracle: Map[String, String] = Map(
    "q_date_series"     -> qDateSeriesSql,
    "q_date_safe"       -> qDateSafeSql,
    "q_clean_normalize" -> qCleanNormalizeSql,
    "q_md5_surrogate"   -> qMd5SurrogateSql,
    "q_numeric_coerce"  -> qNumericCoerceSql,
    "q_float_fix"       -> qFloatFixSql,
    "q_null_filter"     -> qNullFilterSql,
    "q_dq_rules"        -> qDqRulesSql)
}
