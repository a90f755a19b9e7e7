package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{OracleParity => OP, Tables}

/** Physical-layout operators — the write-side decisions that make 100 TB
  * readable: multi-dimensional clustering keys for data skipping. A
  * parquet scan prunes row groups by min/max statistics, but min/max on a
  * single sort column only skips for predicates on THAT column; a Z-order
  * (Morton) key interleaves the bits of several columns so rows close in
  * the key are close in EVERY interleaved dimension — one clustered write
  * serves range predicates on any of them (the technique behind
  * Delta/Iceberg OPTIMIZE ZORDER; Morton 1966).
  *
  * The reference loads its facts unordered
  * (/root/reference/03_load_into_fact_and_dim_tables/TL_combine.sql:189-203
  * — NOT-EXISTS guarded INSERT…SELECT, no ORDER BY); at its row counts scan
  * order is irrelevant. At 100 TB
  * the cluster key IS the difference between scanning 100 TB and 100 GB
  * for a 2-predicate slice.
  */
object Layout {

  /** Bit-interleave two 8-bit ints into a 16-bit Morton code using plain
    * shift/mask arithmetic — identical integer ops on both engines (no
    * engine-specific bit intrinsics), codegen-friendly (a 16-term constant
    * fold of shifts and ands, no UDF). */
  private def morton8(x: Column, y: Column): Column =
    (0 until 8).map { b =>
      (shiftright(x, b).bitwiseAND(lit(1)) * lit(1 << (2 * b))) +
        (shiftright(y, b).bitwiseAND(lit(1)) * lit(1 << (2 * b + 1)))
    }.reduce(_ + _)

  private def morton8Sql(x: String, y: String): String =
    (0 until 8).map { b =>
      s"(($x >> $b) & 1) * ${1 << (2 * b)} + (($y >> $b) & 1) * ${1 << (2 * b + 1)}"
    }.mkString(" + ")

  // ------------------------------------------------------------- q_zorder
  /** Z-order clustering key over part's (size, retail-price) — the layout
    * pass a warehouse runs before writing a fact sorted for 2-D data
    * skipping. Emits each part's quantized coordinates, its 16-bit Morton
    * key, and the target file/row-group id (`cluster` = key's high byte:
    * 256 balanced buckets whose members are rectangle-local in (size,
    * price) space).
    *
    * Quantization: size is already 1..50 (6 bits used of 8); price is
    * bucketed to 8 bits over its [900, 2100) domain via integer floor —
    * exact decimal→int arithmetic on both engines (floor of a DECIMAL(18,2),
    * never a double truncate-vs-round cast).
    *
    * Scale shape: computing the key is a stateless per-row map; the write
    * itself is `repartitionByRange(cluster).sortWithinPartitions(zval)` —
    * one range shuffle, the same cost as any global sort the load was
    * already paying, after which BOTH `p_size BETWEEN a AND b` and
    * `p_retailprice BETWEEN c AND d` predicates prune ~√-proportionally
    * instead of one of them scanning everything. */
  def qZorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = $"p_size".cast("int")
    val y = floor((OP.dec2($"p_retailprice") - lit(900)) / lit(5))
      .cast("int").bitwiseAND(lit(255))
    Tables.part(s, dir)
      .select($"p_partkey", x.as("zx"), y.as("zy"),
        morton8(x, y).as("zval"))
      .withColumn("cluster", shiftright($"zval", 8))
      .orderBy($"zval", $"p_partkey")
  }

  private val qZorderSql = {
    val x = "CAST(p_size AS INTEGER)"
    val y = "CAST(floor((CAST(p_retailprice AS DECIMAL(18,2)) - 900) / 5) " +
      "AS INTEGER) & 255"
    s"""WITH q AS (
       |  SELECT p_partkey, $x AS zx, $y AS zy FROM part)
       |SELECT p_partkey, zx, zy,
       |  ${morton8Sql("zx", "zy")} AS zval,
       |  (${morton8Sql("zx", "zy")}) >> 8 AS cluster
       |FROM q
       |ORDER BY zval, p_partkey""".stripMargin
  }

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder" -> (qZorder _))

  val oracle: Map[String, String] = Map(
    "q_zorder" -> qZorderSql)
}
