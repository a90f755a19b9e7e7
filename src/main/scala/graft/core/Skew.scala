package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 / builder brief: "salting for
  * skew, AQE for runtime re-plan").
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains necessary when one logical key is so hot that even split
  * partitions overwhelm a task (the classic null-key / celebrity-key
  * problem), or when an aggregation — not a join — is skewed.
  */
object Skew {

  /** Salted equi-join of a skewed `large` side against `small`:
    * large rows get a deterministic salt in [0, factor); the small side is
    * replicated `factor` times so every (key, salt) pair finds its match.
    * The join key becomes (key, salt) → a hot key's rows spread over
    * `factor` tasks. Replication cost: |small| × factor, so keep `small`
    * dimension-sized (that's also when salting beats AQE).
    *
    * Salt is derived from stable row content (xxhash64 of the key plus the
    * given `saltFrom` columns), not rand() — reruns and retries partition
    * identically. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 factor: Int, saltFrom: Seq[Column]): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // saltFrom must VARY WITHIN the hot key: an empty list (or a constant
    // placeholder column) collapses every hot row to one salt — the skew
    // stays while the small side is still replicated factor×
    require(saltFrom.nonEmpty,
      "saltFrom must contain at least one column that varies within a hot key")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(col(key) +: saltFrom: _*), lit(factor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${factor - 1})")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation for skewed group keys:
    * groupBy (key, salt) computes partials, then a second tiny groupBy (key)
    * combines them. `partialAggs` must be decomposable (sum/count/min/max
    * family); the caller supplies the final combination over the partial
    * column names. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // Salt must vary even when a hot key carries ONE constant value (the
    // null-key/placeholder case) — content-derived salt would collapse to
    // a single partition there, so the salt is positional. Positional
    // expressions are marked nondeterministic, which makes this map stage
    // INDETERMINATE to the scheduler: on a fetch failure Spark re-runs the
    // dependent stages wholesale rather than mixing old and re-salted
    // partials, so retries cannot double-count or lose rows. The final
    // aggregate itself is salt-distribution-independent.
    df.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(factor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(col(valueCol)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
  }
}
