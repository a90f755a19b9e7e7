package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** THE tokenization/shingling definition shared by the dedup pipeline
  * (TextDedup) and the corpus-quality operators (CorpusQuality), plus its
  * DuckDB mirror. Single source of truth on purpose: a decontamination or
  * repetition score is only meaningful if its normalization matches the
  * dedup shingles', so a change here re-normalizes every consumer at once
  * instead of silently desynchronizing copy-pasted variants. */
private[queries] object TextOps {

  /** Lowercased whitespace-split tokens. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word 3-gram shingles as exploded (doc_id, shingle) rows; docs with <3
    * tokens produce none (same guard in [[shingleSql]]). */
  def shingleRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
        .as("shingle"))

  /** 16-bit hex bucket of a seeded doc-id hash — THE deterministic
    * sampling/splitting gate (TrainingData's q_hash_sample / q_train_split
    * and the corpus pipeline must agree on it, or a doc could land in
    * different splits depending on which operator assigned it). */
  def seededBucket(seed: String): Column =
    substring(md5(concat(lit(seed), col("doc_id").cast("string"))), 1, 4)

  def seededBucketSql(seed: String, ref: String = "doc_id"): String =
    s"substr(md5('$seed' || CAST($ref AS VARCHAR)), 1, 4)"

  /** Normalized-text identity hash (lowercase, trim, collapse whitespace,
    * md5) — THE exact-dedup key. TextDedup's q_exact_dup and the corpus
    * pipeline's dedup stage must agree on it, or a doc kept by one is
    * dropped by the other. */
  def normTextHash(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** DuckDB mirror of [[normTextHash]]. */
  def normTextHashSql(ref: String = "text"): String =
    s"md5(lower(trim(regexp_replace($ref, '\\s+', ' ', 'g'))))"

  /** DuckDB mirror of [[shingleRows]] over table/CTE `src`, emitted as a
    * CTE named `cte` (duplicates kept — callers add DISTINCT as needed). */
  def shingleSql(src: String, cte: String): String =
    s"""$cte AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(w)-1),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
       |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |        FROM $src)
       |  WHERE len(w) >= 3)""".stripMargin
}
