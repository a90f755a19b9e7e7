package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Reproducible corpus-assembly operators for LLM training-data pipelines:
  * deterministic sampling, train/val/test splitting, per-source mixture
  * weighting, and seeded epoch shuffling.
  *
  * All four are HASH-gated, never rand()-gated: the decision for a row is a
  * pure function of (seed, doc_id), so it is identical across reruns,
  * engines (md5 hex matches DuckDB exactly — the oracle runs the same
  * algebra), cluster sizes, and partitionings. That reproducibility is the
  * difference between "a sample" and an auditable training set. Scale
  * shape: sample/split/mixture are stateless row filters — no shuffle, no
  * state, embarrassingly parallel, and the filter sits directly on the
  * scan; the epoch shuffle is one distributed range-partitioned sort.
  *
  * Buckets come from the first 4 hex chars of a seeded md5 — a uniform
  * 16-bit integer (conv/radix is avoided: lexicographic compare on the hex
  * prefix is engine-portable with zero cast traffic). Thresholds are hex
  * literals: p = threshold/65536.
  */
object TrainingData {

  /** 16-bit hex bucket of a seeded doc hash — shared with the corpus
    * pipeline via [[TextOps.seededBucket]] (split assignments must agree
    * across operators). */
  private def bucket(seed: String) = TextOps.seededBucket(seed)

  private def bucketSql(seed: String) = TextOps.seededBucketSql(seed)

  // ------------------------------------------------------- q_hash_sample
  /** Deterministic ~10% corpus sample: keep rows whose 16-bit bucket is
    * below 0x1999 (6553/65536 = 9.999…%). A pure scan-level filter — the
    * sample of a 100 TB corpus reads 100 TB once and shuffles nothing, and
    * re-running it (or running it in DuckDB) selects the same documents. */
  def qHashSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(bucket("sample1:") < "1999")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  private val qHashSampleSql =
    s"""SELECT doc_id, lang, source FROM documents
       |WHERE ${bucketSql("sample1:")} < '1999'
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- q_train_split
  /** Train/val/test assignment (~80/10/10) from one hash draw per doc:
    * bucket < 0xcccc → train, < 0xe666 → val, else test. Assignment is
    * stable under corpus growth — adding documents never moves an existing
    * doc between splits (the classic leakage bug with rank- or
    * rand()-based splits). */
  def qTrainSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(bucket("split1:") < "cccc", "train")
          .when(bucket("split1:") < "e666", "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))

  private val qTrainSplitSql =
    s"""SELECT doc_id,
       |  CASE WHEN ${bucketSql("split1:")} < 'cccc' THEN 'train'
       |       WHEN ${bucketSql("split1:")} < 'e666' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- q_source_mixture
  /** Per-source mixture weighting: each source keeps a configured fraction
    * of its documents (the "downsample the web crawl, keep all the books"
    * move). One CASE for the per-source threshold, one hash gate — still a
    * stateless scan filter; the mixture of a 100 TB corpus costs one pass.
    * Emits the per-source survivor counts (the mixture report). */
  def qSourceMixture(s: SparkSession, dir: String): DataFrame = {
    val threshold = when(col("source") === "web", lit("4000"))   // 25%
      .when(col("source") === "forum", lit("8000"))              // 50%
      .otherwise(lit("ffff"))                                    // keep ~all
    Tables.documents(s, dir)
      .filter(bucket("mix1:") < threshold)
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("source"))
  }

  private val qSourceMixtureSql =
    s"""SELECT source, count(*) AS n_kept FROM documents
       |WHERE ${bucketSql("mix1:")} <
       |  CASE WHEN source = 'web' THEN '4000'
       |       WHEN source = 'forum' THEN '8000'
       |       ELSE 'ffff' END
       |GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------ q_epoch_shuffle
  /** Seeded epoch shuffle: global order by md5(epoch-seed ∥ doc_id) —
    * a full deterministic permutation per epoch seed, realized as ONE
    * distributed range-partitioned sort (no window, no single-partition
    * stage; writers then emit partition files in sorted order). Tie-break
    * on doc_id keeps the order total even under hash collisions. */
  def qEpochShuffle(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat(lit("epoch1:"), col("doc_id").cast("string"))).as("shuffle_key"))
      .orderBy(col("shuffle_key"), col("doc_id"))

  private val qEpochShuffleSql =
    """SELECT doc_id,
      |  md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin

  // ------------------------------------------------------ q_pack_sequences
  /** Sequence packing: assign shuffled docs to fixed token-budget training
    * sequences (budget 4096) by a running token total — contiguous-fill
    * packing, the standard pretraining batch-assembly step.
    *
    * The running total is a GLOBAL cumulative sum, which a naive window
    * (no partitionBy) would execute on a single partition — the classic
    * scale-killer. Here it is a distributed prefix sum instead: docs are
    * range-bucketed by the first hex digit of their shuffle key (16 ordered
    * buckets), each bucket computes its local cumsum in parallel, and each
    * row adds the total of all preceding buckets — a 16-row aggregate
    * cumsum broadcast back. Order (bucket, key, doc_id) equals order
    * (key, doc_id) because the bucket IS the key's first character, so the
    * oracle can verify with a plain single-window cumsum while the engine
    * plan stays parallel. At 100 TB the bucket count scales with the
    * cluster (256/4096 buckets = 2-3 hex chars) — the offset table stays
    * trivially broadcastable. */
  def qPackSequences(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Budget = 4096
    val docs = Tables.documents(s, dir).select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"),
      md5(concat(lit("pack1:"), col("doc_id").cast("string"))).as("key"))
      .withColumn("bucket", substring(col("key"), 1, 1))
    // parallel per-bucket local cumsum
    val wLocal = Window.partitionBy(col("bucket"))
      .orderBy(col("key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = docs.withColumn("local_cum", sum(col("n_tok")).over(wLocal))
    // 16-row offset table: total tokens of all strictly-preceding buckets
    val wOff = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy(col("bucket"))
      .agg(sum(col("n_tok")).as("btot"))
      .withColumn("offset", coalesce(sum(col("btot")).over(wOff), lit(0L)))
      .select(col("bucket"), col("offset"))
    local.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_tok", col("local_cum") + col("offset"))
      .select(col("doc_id"), col("n_tok"),
        ((col("cum_tok") - col("n_tok")) / Budget).cast("long").as("seq_id"))
      .orderBy(col("seq_id"), col("doc_id"))
  }

  private val qPackSequencesSql =
    """SELECT doc_id, n_tok,
      |  CAST(floor((cum_tok - n_tok) / 4096) AS BIGINT) AS seq_id
      |FROM (
      |  SELECT doc_id, n_tok,
      |    sum(n_tok) OVER (ORDER BY key, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
      |  FROM (
      |    SELECT doc_id,
      |      CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
      |      md5('pack1:' || CAST(doc_id AS VARCHAR)) AS key
      |    FROM documents))
      |ORDER BY seq_id, doc_id""".stripMargin

  // ---------------------------------------------------- q_weighted_sample
  /** Weighted sampling without replacement (Efraimidis–Spirakis 2006,
    * "Weighted random sampling with a reservoir"): each row draws key
    * u^(1/w) and the k LARGEST keys win — inclusion probability
    * proportional to weight, exactly-k output.
    *
    * The float-free twist: for INTEGER weight w, u^(1/w) is distributed as
    * the max of w independent uniforms, so the key is
    * `max(md5(seed:id:i) for i in 1..w)` — a lexicographic max over hex
    * strings. No pow/ln, no doubles: engines that disagree in the last ulp
    * of transcendental functions still produce the identical sample, which
    * is what makes the draw auditable (and DuckDB-replayable) rather than
    * merely "seeded".
    *
    * Weight here is a length proxy (1 + n_chars/100, capped at 8) — the
    * "sample long documents more" mixture move. Scale shape: the key is a
    * stateless per-row expression (w ≤ 8 md5s), and top-k-by-key plans as
    * TakeOrderedAndProject — per-partition bounded heaps merged on the
    * driver, no global sort, no shuffle of the corpus. */
  def qWeightedSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        (lit(1) + least(expr("cast(n_chars div 100 as int)"), lit(7))).as("weight"))
      .withColumn("key", array_max(expr(
        "transform(sequence(1, weight), " +
          "i -> md5(concat('ws1:', cast(doc_id as string), ':', cast(i as string))))")))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(50)

  private val qWeightedSampleSql =
    """SELECT doc_id, weight,
      |  list_max(list_transform(range(1, weight + 1),
      |    i -> md5('ws1:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))))
      |    AS key
      |FROM (SELECT doc_id,
      |        1 + least(CAST(n_chars // 100 AS INT), 7) AS weight
      |      FROM documents)
      |ORDER BY key DESC, doc_id LIMIT 50""".stripMargin

  // -------------------------------------------------------- q_sample_topk
  /** Exactly-k uniform sample: global top-k by a seeded doc hash. The
    * hash-threshold sample (q_hash_sample) has binomial size — fine for
    * "about 10%", wrong for "exactly 100 eval docs". Ordering by the hash
    * IS a uniform draw, and `ORDER BY hash LIMIT k` plans as
    * TakeOrderedAndProject: each partition keeps a k-row heap and the
    * driver merges heaps — the exact-k sample of a 100 TB corpus shuffles
    * k rows, not a sorted corpus. Like the split assignment, membership is
    * monotone under corpus growth: a new doc evicts at most one old one. */
  def qSampleTopk(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        md5(concat(lit("topk1:"), col("doc_id").cast("string"))).as("draw"))
      .orderBy(col("draw"), col("doc_id"))
      .limit(100)

  private val qSampleTopkSql =
    """SELECT doc_id, source,
      |  md5('topk1:' || CAST(doc_id AS VARCHAR)) AS draw
      |FROM documents ORDER BY draw, doc_id LIMIT 100""".stripMargin

  // -------------------------------------------------------- q_group_sample
  /** Stratified exactly-k sample: k=5 docs per source, chosen uniformly by
    * a seeded hash — "5 spot-check docs from every corpus slice".
    *
    * The naive formulation is a row_number window over the whole corpus
    * partitioned by source: a full shuffle + per-group SORT of 100 TB to
    * keep 5 rows each. Here the native bounded-heap `topk` aggregate
    * (graft.expressions.TopKAgg) does it as ONE aggregation: each mapper
    * keeps a k-row heap per group, partials merge heap-wise, and only
    * O(groups × k) scalars cross the exchange — the same contrast
    * q_topk_native vs q_window_topk demonstrates, applied to sampling.
    * The oracle runs the window formulation — proving heap == window. */
  def qGroupSample(s: SparkSession, dir: String): DataFrame = {
    val k = 5
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        conv(substring(md5(concat(lit("gs1:"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("double").as("h"))
      .groupBy(col("source"))
      .agg(expr(s"topk(h, doc_id, $k)").as("t"))
      .select(col("source"), posexplode(col("t")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("doc_id"))
      .orderBy(col("source"), col("rk"))
  }

  private val qGroupSampleSql =
    """SELECT source, rn AS rk, doc_id FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY h DESC, doc_id) AS rn
      |  FROM (SELECT source, doc_id,
      |          ('0x' || substr(md5('gs1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
      |        FROM documents))
      |WHERE rn <= 5 ORDER BY source, rk""".stripMargin

  // -------------------------------------------------------- q_length_buckets
  /** Length-curriculum bucketing: within each source, docs are split into
    * ntile(10) deciles of character length — the assignment step of
    * curriculum schedules and length-balanced batch construction (train
    * short-to-long, or cap each batch's decile mix). Output is the
    * per-(source, decile) summary a scheduler consumes.
    *
    * Scale shape: the ntile window partitions BY SOURCE, so no global
    * single-partition sort; per-source ordering is (n_chars, doc_id) —
    * total, both engines. The summary aggregate is O(sources × 10).
    *
    * ntile semantics (identical in Spark and DuckDB): equal buckets,
    * remainder distributed one-each to the leading buckets. */
  def qLengthBuckets(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("source"), col("decile"))
  }

  private val qLengthBucketsSql =
    """SELECT source, decile, count(*) AS n_docs,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM (
      |  SELECT source, doc_id, n_chars,
      |    CAST(ntile(10) OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS INT) AS decile
      |  FROM documents)
      |GROUP BY source, decile
      |ORDER BY source, decile""".stripMargin

  // ------------------------------------------------------------- registry
  // --------------------------------------------- q_context_window_stats
  /** Context-window budget audit: for each candidate training sequence
    * length (512 / 2048 / 8192 BPE-ish tokens), how much of the corpus
    * survives doc-level truncation — docs over budget, tokens kept vs
    * lost, and the padding waste of one-doc-per-sequence batching
    * (kept / (sequences × window)). The sizing table a pretraining run
    * reads BEFORE [[qPackSequences]] commits to a window: truncation
    * loss rises with shorter windows, padding waste with longer — this
    * emits both sides of that tradeoff from one corpus pass.
    *
    * All counts are exact integers (per-doc token counts, min/ceil in
    * integer arithmetic); utilization is one IEEE division. Scale shape:
    * one projection to per-doc token counts, then a 3-row broadcast
    * cross join and ONE map-side-combinable aggregate — no shuffle of
    * document text. */
  def qContextWindowStats(s: SparkSession, dir: String): DataFrame = {
    // project ONLY the token count — no doc_id, so the parquet scan prunes
    // to the single text column (PlanAuditSpec pins this)
    val toks = Tables.documents(s, dir)
      .select(size(expr(
        """regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"""))
        .cast("long").as("t"))
    val windows = Seq(512L, 2048L, 8192L)
    val w = toks.sparkSession.createDataFrame(
      windows.map(Tuple1(_))).toDF("win")
    toks.crossJoin(broadcast(w))
      .select(col("win"), col("t"),
        least(col("t"), col("win")).as("kept"),
        expr("(least(t, win) + win - 1) div win").as("seqs"))
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("t") > col("win"), 1L).otherwise(0L))
          .as("n_truncated"),
        sum(col("t")).as("tokens_total"),
        sum(col("kept")).as("tokens_kept"),
        sum(col("t") - col("kept")).as("tokens_lost"),
        sum(col("seqs")).as("n_sequences"))
      .withColumn("utilization",
        col("tokens_kept").cast("double")
          / (col("n_sequences") * col("win")).cast("double"))
      .orderBy(col("win"))
  }

  private val qContextWindowStatsSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(lower(trim(text)),
      |      '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS t
      |  FROM documents),
      |w AS (SELECT CAST(v AS BIGINT) AS win
      |      FROM (VALUES (512), (2048), (8192)) s(v)),
      |x AS (
      |  SELECT win, t, least(t, win) AS kept,
      |    (least(t, win) + win - 1) // win AS seqs
      |  FROM toks, w)
      |SELECT win, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN t > win THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_truncated,
      |  CAST(sum(t) AS BIGINT) AS tokens_total,
      |  CAST(sum(kept) AS BIGINT) AS tokens_kept,
      |  CAST(sum(t - kept) AS BIGINT) AS tokens_lost,
      |  CAST(sum(seqs) AS BIGINT) AS n_sequences,
      |  CAST(sum(kept) AS DOUBLE)
      |    / (CAST(sum(seqs) AS BIGINT) * win) AS utilization
      |FROM x GROUP BY win ORDER BY win""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_context_window_stats" -> (qContextWindowStats _),
    "q_length_buckets"  -> (qLengthBuckets _),
    "q_hash_sample"     -> (qHashSample _),
    "q_train_split"     -> (qTrainSplit _),
    "q_source_mixture"  -> (qSourceMixture _),
    "q_epoch_shuffle"   -> (qEpochShuffle _),
    "q_pack_sequences"  -> (qPackSequences _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_sample_topk"     -> (qSampleTopk _),
    "q_group_sample"    -> (qGroupSample _))

  val oracle: Map[String, String] = Map(
    "q_context_window_stats" -> qContextWindowStatsSql,
    "q_length_buckets"  -> qLengthBucketsSql,
    "q_hash_sample"     -> qHashSampleSql,
    "q_train_split"     -> qTrainSplitSql,
    "q_source_mixture"  -> qSourceMixtureSql,
    "q_epoch_shuffle"   -> qEpochShuffleSql,
    "q_pack_sequences"  -> qPackSequencesSql,
    "q_weighted_sample" -> qWeightedSampleSql,
    "q_sample_topk"     -> qSampleTopkSql,
    "q_group_sample"    -> qGroupSampleSql)
}
