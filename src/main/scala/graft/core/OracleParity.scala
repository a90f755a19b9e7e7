package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Expression combinators that make double-typed measures hash-comparable
  * against a DuckDB oracle.
  *
  * Problem: `sum(double)` is order-dependent (fp addition is not
  * associative), and Spark's shuffle-order differs run to run and engine to
  * engine. Fix: aggregate in exact decimal space (the testdata's money/qty
  * columns carry ≤2 real decimal digits), then cast the final scalar back to
  * double. Both engines compute the identical exact decimal, so the final
  * doubles are bit-identical. Same trick the reference gets for free from
  * Postgres NUMERIC (`/root/reference/01_DW_schema_and_roles_creation/
  * combined_dw_schema.sql:66,84,113`).
  */
object OracleParity {
  /** Exact 2-decimal view of a double measure (money, hours, quantity). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a 2-decimal measure, emitted as double. */
  def sumExact(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Order-independent avg: exact decimal sum / count, divided in double.
    * Rounded to `scale` (no double is an exact decimal tie at scale ≥ 1, so
    * HALF_UP-vs-HALF_EVEN divergence between engines cannot trigger). */
  def avgExact(c: Column, scale: Int = 4): Column =
    round(sum(dec2(c)).cast(DoubleType) / count(c), scale)

  /** revenue-style product: exact price * (1 - exact discount). */
  def discounted(price: Column, discount: Column): Column =
    dec2(price) * (lit(1) - discount.cast(DecimalType(4, 2)))
}
