package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus-quality and curation operators for LLM training-data pipelines:
  * benchmark decontamination, repetition-based quality filtering
  * (Gopher-style rules), PII scrubbing, temperature-scaled source mixing,
  * per-domain caps, and vocabulary-coverage (OOV) scoring.
  *
  * The reference warehouse's quality surface is its DQ rule engine over
  * relational rows (/root/reference/02_Extract_and_transform_raw_data/
  * ET_combined.py:60-135 — nulls, ranges, formats); these operators extend
  * the same idea — declarative, logged, reproducible quality gates — to
  * document corpora. Shared scale properties:
  *   - every score is a per-document aggregate of an exploded token/shingle
  *     stream: partial aggregation collapses the explosion map-side, so the
  *     shuffle per corpus pass moves O(n_docs) rows, not O(n_tokens);
  *   - every reference set that a document is checked against (benchmark
  *     shingle set, vocabulary) is orders of magnitude smaller than the
  *     corpus and is broadcast — the corpus never shuffles for membership
  *     tests;
  *   - every decision is a pure function of the document text (plus seeded
  *     md5 where sampling is involved) — rerunning on a different cluster
  *     or engine (the DuckDB oracle) reproduces it bit-for-bit.
  */
object CorpusQuality {

  /** Tokenization + shingling shared with TextDedup — single source of
    * truth in [[TextOps]] (quality scores are only meaningful under the
    * dedup pipeline's normalization). */
  private def tokens(c: Column): Column = TextOps.words(c)

  private def shingleRows(docs: DataFrame): DataFrame =
    TextOps.shingleRows(docs)

  private def shingleSql(src: String): String = TextOps.shingleSql(src, "shq")

  /** The RAW (duplicate-keeping) shingle posting list of the UNMODIFIED
    * corpus, materialized once per corpus via [[graft.io.IndexStore]] and
    * shared by decontamination and the curation pipeline — the consumers'
    * plans scan the stored parquet instead of re-exploding the text (the
    * same build-once pattern as TextDedup's LSH index; at 100 TB this is
    * the difference between one corpus pass and one per consumer). */
  private def corpusShingles(s: SparkSession, dir: String): DataFrame =
    graft.io.IndexStore.materialized(s, dir, "corpus_shingles_raw")(
      shingleRows(Tables.documents(s, dir).select(col("doc_id"), col("text"))))

  /** Docs sharing ≥ 5 distinct shingles with the benchmark slice
    * (doc_id % 33) — THE contamination predicate, shared by the standalone
    * q_decontaminate and the pipeline's stage 3 so the two can never
    * disagree on what "contaminated" means. Input is a raw (duplicate-
    * keeping) shingle stream; the broadcast bench join filters it map-side
    * and countDistinct dedups only the survivors. */
  private def contaminatedIds(sh: DataFrame): DataFrame = {
    val bench = sh.filter(col("doc_id") % 33 === 0)
      .select(col("shingle")).distinct()
    sh.join(broadcast(bench), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_overlap"))
      .filter(col("n_overlap") >= 5)
  }

  /** Per-doc Gopher repetition aggregates — max single-token count `mx`,
    * token total `n_tok`, shingle total `n_sh`, distinct shingles `n_dist`
    * — shared by q_repetition_filter (planted corpus) and the pipeline's
    * quality gate (real corpus). Callers apply [[topWordFrac]] /
    * [[dup3gramFrac]] with the 0.2 / 0.3 thresholds. */
  private def repetitionStats(docs: DataFrame, sh: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val wordAgg = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("mx"), sum(col("cnt")).as("n_tok"))
    val shAgg = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"), countDistinct(col("shingle")).as("n_dist"))
    // LEFT join: a sub-3-token doc has no shingle rows; it must still be
    // classified (dup_3gram_frac = 0 — nothing repeated), not silently
    // dropped from the corpus gate
    wordAgg.join(shAgg, Seq("doc_id"), "left")
  }

  private def topWordFrac: Column = round(col("mx") / col("n_tok"), 4)
  private def dup3gramFrac: Column =
    coalesce(round(lit(1) - col("n_dist") / col("n_sh"), 4), lit(0.0))

  // ------------------------------------------------------- q_decontaminate
  /** Benchmark n-gram decontamination: flag training documents sharing ≥ 5
    * distinct word-3-grams with a held-out benchmark set (here: every 33rd
    * doc stands in for the benchmark; production points this at the real
    * eval suites). This is the standard pre-training hygiene pass — a train
    * doc that contains benchmark n-grams leaks the test set.
    *
    * Scale shape: the benchmark shingle set is MB-sized regardless of corpus
    * size (eval suites are small), so it BROADCASTS; the corpus-side shingle
    * stream is filtered by the broadcast hash join map-side and only
    * (doc_id, hit) survivors reach the per-doc count — the 100 TB corpus is
    * read once and never shuffled against itself. */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame =
    // bench set = the 1/33 slice of the STORED posting list (production:
    // the real eval suites — a tiny static table); the corpus-side stream
    // stays RAW (no corpus-wide distinct exchange) — see contaminatedIds
    contaminatedIds(corpusShingles(s, dir)).orderBy(col("doc_id"))

  private val qDecontaminateSql =
    s"""WITH ${shingleSql("documents")},
       |sh AS (SELECT DISTINCT doc_id, shingle FROM shq),
       |bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 33 = 0)
       |SELECT doc_id, count(*) AS n_overlap
       |FROM sh JOIN bsh USING (shingle)
       |GROUP BY doc_id HAVING count(*) >= 5
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------- q_repetition_filter
  /** Gopher-style repetition quality filter: per document, the fraction of
    * tokens that are the single most frequent token (`top_word_frac`) and
    * the fraction of duplicated word-3-grams (`dup_3gram_frac`); a doc is
    * `flagged` when either exceeds its threshold (0.2 / 0.3). Every 20th
    * doc is doubled (text ∥ text) to manufacture the self-repetition the
    * synthetic corpus lacks — the planted docs land at dup_3gram_frac ≈ 0.5
    * and trip the gate, natural docs sit ≤ 0.07.
    *
    * Scale shape: two exploded streams (tokens, shingles), each collapsed
    * by map-side partial aggregation to one row per (doc, token) and one
    * per doc; no joins except the final per-doc zip. Stateless per
    * document → embarrassingly parallel at any corpus size. */
  def qRepetitionFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 20 === 0, concat(col("text"), lit(" "), col("text")))
        .otherwise(col("text")).as("text"))
    repetitionStats(docs, shingleRows(docs))
      .select(col("doc_id"),
        topWordFrac.as("top_word_frac"),
        dup3gramFrac.as("dup_3gram_frac"),
        (topWordFrac > 0.2 || dup3gramFrac > 0.3).as("flagged"))
      .orderBy(col("doc_id"))
  }

  private val qRepetitionFilterSql =
    s"""WITH rep AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 20 = 0 THEN text || ' ' || text ELSE text END AS text
       |  FROM documents),
       |t AS (SELECT doc_id,
       |        unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |      FROM rep),
       |wc AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
       |wa AS (SELECT doc_id, max(cnt) AS mx, sum(cnt) AS n_tok FROM wc GROUP BY 1),
       |${shingleSql("rep")},
       |sa AS (SELECT doc_id, count(*) AS n_sh, count(DISTINCT shingle) AS n_dist
       |       FROM shq GROUP BY 1)
       |SELECT wa.doc_id,
       |  round(mx / n_tok, 4) AS top_word_frac,
       |  coalesce(round(1 - n_dist / n_sh, 4), 0.0) AS dup_3gram_frac,
       |  (round(mx / n_tok, 4) > 0.2
       |    OR coalesce(round(1 - n_dist / n_sh, 4), 0.0) > 0.3) AS flagged
       |FROM wa LEFT JOIN sa USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- q_pii_scrub
  /** PII scrubbing: count and redact email addresses and phone numbers,
    * emitting the redaction counts plus an md5 of the scrubbed text (the
    * auditable proof-of-redaction — two engines agreeing on the hash agree
    * on every byte of the output). The synthetic corpus contains no PII, so
    * deterministic emails (every 10th doc) and phone numbers (every 15th)
    * are planted identically in both engines — the operator's ground truth.
    *
    * Scale shape: pure per-row map (regexp_count + regexp_replace inside
    * whole-stage codegen), no shuffle at all — the cheapest possible class
    * of corpus pass. */
  def qPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    val aug = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 10 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 15 === 0,
          concat(lit(" call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("text"))
    aug.select(col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phones"),
      md5(regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>")).as("scrub_hash"))
      .orderBy(col("doc_id"))
  }

  private val qPiiScrubSql =
    """WITH aug AS (
      |  SELECT doc_id, text
      |    || CASE WHEN doc_id % 10 = 0
      |            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |            ELSE '' END
      |    || CASE WHEN doc_id % 15 = 0
      |            THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |            ELSE '' END AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
      |    AS n_emails,
      |  CAST(len(regexp_extract_all(text, '\+1-555-[0-9]{4}')) AS BIGINT)
      |    AS n_phones,
      |  md5(regexp_replace(regexp_replace(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS scrub_hash
      |FROM aug ORDER BY doc_id""".stripMargin

  // -------------------------------------------------- q_temperature_mixture
  /** Temperature-scaled language mixture (the UniMax/T5 α=0.5 move): each
    * language's sampling weight ∝ √n_docs, flattening the natural skew
    * (en 218 docs vs fr 64 at sf0.01) so low-resource languages are
    * up-weighted relative to proportional sampling. Emits the weight table
    * plus the per-language document budget for a 100k-doc training mix.
    *
    * Engine-portability note: √n is scaled to an INTEGER (×10⁴) before the
    * cross-language normalization, so the denominator is an exact integer
    * sum — no floating-point reduction whose summation order could differ
    * between engines. The only FP ops are one division and one rounding,
    * identical IEEE-754 in both. Scale shape: one map-side-combinable
    * count per language (languages ≈ dozens → the weight table is a
    * broadcast-sized scalar table). */
  def qTemperatureMixture(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("t", round(sqrt(col("n_docs")) * 10000, 0).cast("long"))
    counts.withColumn("tot", sum(col("t")).over(Window.partitionBy()))
      .select(col("lang"), col("n_docs"),
        round(col("t") / col("tot"), 6).as("weight"),
        round(col("t") / col("tot") * 100000, 0).cast("long").as("budget_docs"))
      .orderBy(col("lang"))
  }

  private val qTemperatureMixtureSql =
    """WITH c AS (
      |  SELECT lang, count(*) AS n_docs,
      |    CAST(round(sqrt(count(*)) * 10000) AS BIGINT) AS t
      |  FROM documents GROUP BY lang)
      |SELECT lang, n_docs,
      |  round(t / (sum(t) OVER ()), 6) AS weight,
      |  CAST(round(t / (sum(t) OVER ()) * 100000) AS BIGINT) AS budget_docs
      |FROM c ORDER BY lang""".stripMargin

  // ------------------------------------------------------------ q_source_cap
  /** Per-domain document cap (the Common-Crawl "no domain dominates" rule):
    * keep at most 10 documents per source, preferring longer documents
    * (n_chars DESC, doc_id tiebreak — a total order, so the cap is
    * deterministic). One window over the source partition; at scale the
    * rank never materializes more than the per-source top slice after the
    * filter, and partitioning by source is exactly the layout a
    * source-sharded corpus already has — typically zero extra shuffle. */
  def qSourceCap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 10)
      .orderBy(col("source"), col("rk"))
  }

  private val qSourceCapSql =
    """SELECT doc_id, source, n_chars, CAST(rk AS INT) AS rk FROM (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 10 ORDER BY source, rk""".stripMargin

  // ------------------------------------------------------------- q_oov_rate
  /** Vocabulary-coverage score: fraction of a document's tokens outside the
    * corpus-wide top-16 vocabulary (by frequency, ties broken by token — a
    * total order, so the vocabulary set is engine-deterministic). The
    * CCNet-style "does this doc look like the reference distribution"
    * gate, with the unigram vocab standing in for an LM. The synthetic
    * corpus has 31 distinct tokens, so top-16 yields a discriminative
    * score; production uses ~10⁵ — still broadcast-sized.
    *
    * Scale shape: pass 1 computes the vocab (map-side-combinable count,
    * top-k of a tiny distinct-token table); pass 2 is a BROADCAST left
    * join of the token stream against the vocab — the corpus never
    * shuffles; per-doc aggregation is partial-agg-collapsed. */
  def qOovRate(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(16)
      .select(col("tok"), lit(1).as("in_v"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tok"),
        round(col("n_oov") / col("n_tok"), 4).as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  private val qOovRateSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |  FROM documents),
      |vocab AS (
      |  SELECT tok FROM (
      |    SELECT tok, count(*) AS cnt FROM t GROUP BY tok
      |    ORDER BY cnt DESC, tok LIMIT 16)),
      |j AS (
      |  SELECT t.doc_id, (v.tok IS NOT NULL) AS hit
      |  FROM t LEFT JOIN vocab v ON v.tok = t.tok)
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_tok,
      |  round(CAST(sum(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT)
      |        / count(*), 4) AS oov_rate
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ q_chunk_docs
  /** Context-window chunking: split every document into 32-token windows
    * with stride 24 (8-token overlap) — the fixed-length chunking step of
    * pretraining tokenization and RAG indexing. Emits per chunk its index,
    * token count, and an md5 content hash (the downstream join key; two
    * engines agreeing on every hash agree on every chunk boundary).
    *
    * Scale shape: a pure per-row transform (array slice inside
    * whole-stage codegen) followed by explode — no shuffle, no state; the
    * ~1.3× row amplification carries (doc_id, int, int, hash) only. The
    * stride/size are corpus-tuning constants, not plan shape. */
  def qChunkDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, size(w)-1, 24),
          |  s -> struct(size(slice(w, s+1, 32)) AS n,
          |              md5(concat_ws(' ', slice(w, s+1, 32))) AS h))"""
          .stripMargin)))
      .select(col("doc_id"), col("pos").as("chunk_id"),
        col("col.n").as("n_tok"), col("col.h").as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))

  private val qChunkDocsSql =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
      |  FROM documents),
      |c AS (SELECT doc_id, w, unnest(range(0, len(w), 24)) AS s FROM d)
      |SELECT doc_id, CAST(s // 24 AS INT) AS chunk_id,
      |  CAST(len(list_slice(w, s+1, least(s+32, len(w)))) AS INT) AS n_tok,
      |  md5(array_to_string(list_slice(w, s+1, least(s+32, len(w))), ' '))
      |    AS chunk_hash
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // ------------------------------------------------------ q_corpus_pipeline
  /** END-TO-END corpus curation — the composition the individual operators
    * exist for, in the order a production pretraining pipeline runs them:
    *
    *   1. exact dedup (keep the min-doc_id copy of each normalized text)
    *   2. quality gates (Gopher repetition rules on the REAL corpus:
    *      top_word_frac ≤ 0.2, dup_3gram_frac ≤ 0.3)
    *   3. decontamination (drop docs sharing ≥ 5 shingles with the
    *      benchmark slice — which removes the benchmark members
    *      themselves, exactly as a real pipeline must)
    *   4. deterministic train/val/test assignment (seeded md5 bucket)
    *
    * Output: the training manifest (doc_id, lang, source, n_tok, split).
    * Every stage is a stateless filter or a map-side-combinable aggregate
    * over streams the component queries already proved scale-shaped; the
    * composition adds NO new shuffle class — stages 1-3 join back to the
    * corpus on doc_id (the natural key the corpus is already
    * partitionable by at 100 TB). */
  def qCorpusPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))

    // 1. exact dedup: keeper = min doc_id per normalized-text hash (the
    // same TextOps.normTextHash identity q_exact_dup groups on)
    val keepers = docs
      .withColumn("th", TextOps.normTextHash(col("text")))
      .groupBy(col("th")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))

    // stages 2 and 3 read the MATERIALIZED corpus shingle table (one
    // build pass, three consumers) instead of re-exploding the text
    val sh = corpusShingles(s, dir)

    // 2. quality gate = the same repetitionStats/thresholds as
    // q_repetition_filter, on the real corpus (no plants here)
    val clean = repetitionStats(docs, sh)
      .filter(topWordFrac <= 0.2 && dup3gramFrac <= 0.3)
      .select(col("doc_id"), col("n_tok"))

    // 3. decontamination vs the benchmark slice — the same contaminatedIds
    // predicate as q_decontaminate (broadcast bench set)
    val contaminated = contaminatedIds(sh).select(col("doc_id"))

    // 4. manifest with the deterministic split
    docs.join(keepers, Seq("doc_id"))
      .join(clean, Seq("doc_id"))
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
        when(TextOps.seededBucket("split1:") < "cccc", "train")
          .when(TextOps.seededBucket("split1:") < "e666", "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  private val qCorpusPipelineSql =
    s"""WITH keepers AS (
       |  SELECT min(doc_id) AS doc_id
       |  FROM (SELECT doc_id, ${TextOps.normTextHashSql("text")} AS th
       |        FROM documents)
       |  GROUP BY th),
       |t AS (SELECT doc_id,
       |        unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |      FROM documents),
       |wc AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
       |wa AS (SELECT doc_id, max(cnt) AS mx,
       |         CAST(sum(cnt) AS BIGINT) AS n_tok FROM wc GROUP BY 1),
       |${shingleSql("documents")},
       |sa AS (SELECT doc_id, count(*) AS n_sh, count(DISTINCT shingle) AS n_dist
       |       FROM shq GROUP BY 1),
       |clean AS (
       |  SELECT wa.doc_id, wa.n_tok FROM wa LEFT JOIN sa USING (doc_id)
       |  WHERE round(mx / n_tok, 4) <= 0.2
       |    AND coalesce(round(1 - n_dist / n_sh, 4), 0.0) <= 0.3),
       |shd AS (SELECT DISTINCT doc_id, shingle FROM shq),
       |bsh AS (SELECT DISTINCT shingle FROM shd WHERE doc_id % 33 = 0),
       |contaminated AS (
       |  SELECT doc_id FROM shd JOIN bsh USING (shingle)
       |  GROUP BY doc_id HAVING count(*) >= 5)
       |SELECT d.doc_id, d.lang, d.source, c.n_tok,
       |  CASE WHEN ${TextOps.seededBucketSql("split1:", "d.doc_id")} < 'cccc' THEN 'train'
       |       WHEN ${TextOps.seededBucketSql("split1:", "d.doc_id")} < 'e666' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents d
       |JOIN keepers k ON k.doc_id = d.doc_id
       |JOIN clean c ON c.doc_id = d.doc_id
       |LEFT JOIN contaminated x ON x.doc_id = d.doc_id
       |WHERE x.doc_id IS NULL
       |ORDER BY d.doc_id""".stripMargin

  // --------------------------------------------------------- q_ngram_novelty
  /** Marginal-novelty curve: per doc (in ingestion = doc_id order), the
    * fraction of its distinct 3-gram shingles never seen in ANY earlier
    * doc. The curve a curation loop watches while growing a corpus — when
    * marginal novelty flattens, new data from that firehose is mostly
    * repetition and the crawl budget should move elsewhere.
    *
    * Scale shape: one shingle explode (distinct), one min-aggregate per
    * shingle for its first-seen doc, one keyed join back — the same
    * two-shuffle budget as the dedup index build, with no window over the
    * raw stream. */
  def qNgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val sh = TextOps.shingleRows(
      Tables.documents(s, dir).select(col("doc_id"), col("text"))).distinct()
    val first = sh.groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("first_seen"))
    sh.join(first, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("first_seen") === col("doc_id"), 1)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles"), 4)
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  private val qNgramNoveltySql =
    s"""WITH ${TextOps.shingleSql("documents", "sh")},
       |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |first AS (
       |  SELECT shingle, min(doc_id) AS first_seen FROM shd GROUP BY shingle)
       |SELECT doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN first_seen = doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_novel,
       |  round(CAST(sum(CASE WHEN first_seen = doc_id THEN 1 ELSE 0 END)
       |    AS DOUBLE) / count(*), 4) AS novelty
       |FROM shd JOIN first USING (shingle)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ q_heaps_law
  /** Heaps-law vocabulary growth curve: cumulative distinct word types vs
    * cumulative tokens as the corpus grows in ingestion (doc_id) order —
    * the sub-linear curve whose flattening tells a data buyer the next
    * billion tokens add few new words. Sampled at 100-doc corpus-position
    * checkpoints: per-token first-seen bucket (min aggregate, the
    * [[qNgramNovelty]] machinery) gives new types per bucket; the
    * cumulative sums then run over the corpus/100 bucket aggregate via
    * the BANDED prefix sum ([[graft.core.BandedRank.prefixSum]]) — a
    * 100× reduction is not a bound, so the growth curve gets band-local
    * running sums plus broadcast band offsets rather than one
    * single-partition window (widen the bucket AND the decomposition
    * holds at any corpus). Type/token ratio is one double division,
    * rounded. */
  def qHeapsLaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toksd = Tables.documents(s, dir)
      .select($"doc_id", explode(TextOps.words(col("text"))).as("tok"))
      .withColumn("bucket", expr("doc_id div 100"))
    val perBucket = toksd.groupBy($"bucket")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct($"doc_id").as("n_docs"))
    val newTypes = toksd.groupBy($"tok").agg(min($"bucket").as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n_new_types"))
    // banded prefix sums (BandedRank.prefixSum): the bucket aggregate is
    // corpus/100 — a 100× reduction, not a bound — so the growth-curve
    // cumsum gets band-local running sums + broadcast band offsets
    // instead of a single-partition window (round-7 discipline)
    val filled = perBucket.join(newTypes, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_new_types"))
    graft.core.BandedRank
      .prefixSum(filled, "bucket", Seq.empty,
        Seq("n_tokens" -> "cum_tokens", "n_new_types" -> "cum_types"))
      .select($"bucket", $"n_docs", $"cum_tokens", $"cum_types",
        round($"cum_types".cast("double") / $"cum_tokens", 6).as("ttr"))
      .orderBy($"bucket")
  }

  private val qHeapsLawSql =
    """WITH toksd AS (
      |  SELECT doc_id, doc_id // 100 AS bucket,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |  FROM documents),
      |pb AS (
      |  SELECT bucket, count(*) AS n_tokens,
      |    count(DISTINCT doc_id) AS n_docs
      |  FROM toksd GROUP BY 1),
      |nt AS (
      |  SELECT bucket, count(*) AS n_new_types FROM (
      |    SELECT tok, min(bucket) AS bucket FROM toksd GROUP BY tok)
      |  GROUP BY 1),
      |cum AS (
      |  SELECT pb.bucket, pb.n_docs,
      |    CAST(sum(pb.n_tokens) OVER (ORDER BY pb.bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_tokens,
      |    CAST(sum(coalesce(nt.n_new_types, 0)) OVER (ORDER BY pb.bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_types
      |  FROM pb LEFT JOIN nt USING (bucket))
      |SELECT bucket, n_docs, cum_tokens, cum_types,
      |  round(CAST(cum_types AS DOUBLE) / cum_tokens, 6) AS ttr
      |FROM cum ORDER BY bucket""".stripMargin

  // -------------------------------------------------------- q_quality_vs_dup
  /** Quality-vs-duplication calibration: docs banded by composite quality
    * score (5 fixed 0.2-wide bands — no global window, unlike a ntile)
    * cross-tabbed against span-level duplication membership. The curation
    * question it answers: are the low-quality docs also the duplicated
    * ones (one filter suffices) or independent failure modes (both
    * filters earn their keep)?
    *
    * Composes two gated operators — [[TextAnalysis.qQualityScore]] and
    * [[TextDedup.qSpanDedup]] — and the oracle composes their published
    * SQL the same way, so this cross-tab can never drift from the
    * operators it summarizes. Scale shape: both inputs are per-doc maps /
    * aggregates; the cross-tab is one O(5) aggregate after a keyed left
    * join. */
  def qQualityVsDup(s: SparkSession, dir: String): DataFrame = {
    val q = qualityScoreStored(s, dir)
      .select(col("doc_id"), col("quality_score"))
    val dup = spanDedupStored(s, dir)
      .select(col("doc_id"), lit(1).as("is_dup"))
    q.withColumn("band",
        least(lit(4), floor(col("quality_score") * 5).cast("int")))
      .join(dup, Seq("doc_id"), "left")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"), count(col("is_dup")).as("n_dup"))
      .select(col("band"), col("n_docs"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_docs"), 4).as("dup_rate"))
      .orderBy(col("band"))
  }

  private val qQualityVsDupSql =
    s"""WITH q AS (
       |  SELECT doc_id, quality_score FROM (
       |${TextAnalysis.qQualityScoreSql})),
       |dup AS (
       |  SELECT doc_id, 1 AS is_dup FROM (
       |${TextDedup.qSpanDedupSql}))
       |SELECT band, count(*) AS n_docs, count(is_dup) AS n_dup,
       |  round(CAST(count(is_dup) AS DOUBLE) / count(*), 4) AS dup_rate
       |FROM (SELECT q.doc_id,
       |        least(4, CAST(floor(quality_score * 5) AS INT)) AS band,
       |        d.is_dup
       |      FROM q LEFT JOIN dup d USING (doc_id))
       |GROUP BY band
       |ORDER BY band""".stripMargin

  /** Materialized copies of the component pipelines the composition
    * queries ([[qSourceCard]], [[qQualityVsDup]]) consume — the same
    * build-once-read-many [[graft.io.IndexStore]] asset shape that fixed
    * the graph family's cost in round 6. Each component is a gated
    * operator that still runs LIVE under its own registry name; a
    * composition re-paying the whole span-dedup LSH chain (r6 bench:
    * q_source_card 10.5 s) is the 100-TB anti-pattern — a card reader
    * must scan the stored per-doc outputs, not re-derive the corpus
    * pass. Results are byte-identical (parquet roundtrip of the same
    * frame). */
  private def qualityScoreStored(s: SparkSession, dir: String): DataFrame =
    graft.io.IndexStore.materialized(s, dir, "comp_quality_score")(
      TextAnalysis.qQualityScore(s, dir))
  private def spanDedupStored(s: SparkSession, dir: String): DataFrame =
    graft.io.IndexStore.materialized(s, dir, "comp_span_dedup")(
      TextDedup.qSpanDedup(s, dir))
  private def sourceEntropyStored(s: SparkSession, dir: String): DataFrame =
    graft.io.IndexStore.materialized(s, dir, "comp_source_entropy")(
      TextAnalysis.qSourceEntropy(s, dir))

  private def corpusPipelineStored(s: SparkSession, dir: String): DataFrame =
    graft.io.IndexStore.materialized(s, dir, "comp_corpus_pipeline")(
      qCorpusPipeline(s, dir))

  // -------------------------------------------------------- q_mixture_greedy
  /** Greedy mixture allocation under caps: spend a token budget (half the
    * corpus) across sources in mean-quality order, capping any single
    * source at 30% of the corpus — the closed-form solution of the
    * budget-constrained mixture LP when the objective is linear in
    * per-source quality. Complements [[graft.queries.TrainingData]]'s
    * samplers (WHICH rows) with the design table (HOW MUCH of each
    * source), next to the temperature/proportional mixtures it
    * outperforms whenever quality varies by source.
    *
    * Greedy-by-prefix is exact here: alloc_i = min(capped_i, remaining
    * budget after all better-quality sources take theirs) — one ordered
    * window over the O(sources) aggregate, all integer tokens; epochs
    * are exact ppm. Component inputs read from their materialized
    * stores. */
  def qMixtureGreedy(s: SparkSession, dir: String): DataFrame = {
    val toks = sourceEntropyStored(s, dir)
      .select(col("source"), col("n_tokens"))
    val qual = qualityScoreStored(s, dir)
      .select(col("doc_id"),
        round(col("quality_score") * 1e4, 0).cast("long").as("qmu"))
      .join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("source"))
      // exact 1e-4-unit integer mean via one truncating division — the
      // ORDERING key, so it must be engine-identical
      .agg(expr("sum(qmu) div count(1)").as("q4"))
    val tot = toks.agg(sum(col("n_tokens")).as("t"))
    val w = Window.orderBy(col("q4").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(qual, Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("budget", expr("t div 2"))
      .withColumn("cap", expr("(t * 3) div 10"))
      .withColumn("m", least(col("n_tokens"), col("cap")))
      .withColumn("cum_before",
        coalesce(sum(col("m")).over(w), lit(0L)))
      .withColumn("alloc",
        least(col("m"), greatest(lit(0L), col("budget") - col("cum_before"))))
      .select(col("source"), col("n_tokens"), col("q4"), col("m"),
        col("alloc"),
        expr("(alloc * 1000000) div n_tokens").as("epochs_ppm"))
      .orderBy(col("q4").desc, col("source"))
  }

  private val qMixtureGreedySql =
    s"""WITH toks AS (
       |  SELECT source, n_tokens FROM (
       |${TextAnalysis.qSourceEntropySql})),
       |qual AS (
       |  SELECT d.source,
       |    CAST(sum(CAST(round(q.quality_score * 1e4, 0) AS BIGINT))
       |      // count(*) AS BIGINT) AS q4
       |  FROM (${TextAnalysis.qQualityScoreSql}) q
       |  JOIN documents d ON d.doc_id = q.doc_id
       |  GROUP BY d.source),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM toks),
       |base AS (
       |  SELECT toks.source, CAST(toks.n_tokens AS BIGINT) AS n_tokens,
       |    qual.q4, t // 2 AS budget, (t * 3) // 10 AS cap,
       |    least(CAST(toks.n_tokens AS BIGINT), (t * 3) // 10) AS m
       |  FROM toks JOIN qual USING (source), tot),
       |alloc AS (
       |  SELECT source, n_tokens, q4, m, budget,
       |    coalesce(CAST(sum(m) OVER (ORDER BY q4 DESC, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS cum_before
       |  FROM base)
       |SELECT source, n_tokens, q4, m,
       |  least(m, greatest(0, budget - cum_before)) AS alloc,
       |  (least(m, greatest(0, budget - cum_before)) * 1000000) // n_tokens
       |    AS epochs_ppm
       |FROM alloc ORDER BY q4 DESC, source""".stripMargin

  // ------------------------------------------------------------ q_calibration
  /** Reliability diagram of the composite quality score against actual
    * e2e-curation survival: docs binned by score (ten fixed 0.1 bands),
    * per bin the mean score vs the observed survival rate through
    * [[qCorpusPipeline]], and the gap — is a 0.8-scoring doc really
    * ~80%-likely to survive curation, or is the score mis-calibrated?
    * (Σ n·|gap|/N over these rows is the expected calibration error.)
    * The model-eval primitive that decides whether the score can gate
    * admission directly or needs recalibration first.
    *
    * Engine parity: scores are exact 10⁻⁴ units summed as integers;
    * means/rates are IEEE divisions rounded at the projection. Scale:
    * reads two materialized per-doc component outputs; the cross-tab is
    * O(10). */
  def qCalibration(s: SparkSession, dir: String): DataFrame = {
    val score = qualityScoreStored(s, dir)
      .select(col("doc_id"), col("quality_score"))
    val kept = corpusPipelineStored(s, dir)
      .select(col("doc_id"), lit(1L).as("kept"))
    score
      .withColumn("bin",
        least(lit(9), floor(col("quality_score") * 10).cast("int")))
      .join(kept, Seq("doc_id"), "left")
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("kept"), lit(0L))).as("n_kept"),
        sum(round(col("quality_score") * 1e4, 0).cast("long")).as("s4"))
      .select(col("bin"), col("n_docs"), col("n_kept"),
        round(col("s4").cast("double") / col("n_docs") / 1e4, 6)
          .as("mean_score"),
        round(col("n_kept").cast("double") / col("n_docs"), 6)
          .as("keep_rate"),
        round(col("s4").cast("double") / col("n_docs") / 1e4
          - col("n_kept").cast("double") / col("n_docs"), 6).as("gap"))
      .orderBy(col("bin"))
  }

  private val qCalibrationSql =
    s"""WITH q AS (
       |  SELECT doc_id, quality_score FROM (
       |${TextAnalysis.qQualityScoreSql})),
       |kept AS (
       |  SELECT doc_id, 1 AS kept FROM (
       |${qCorpusPipelineSql})),
       |b AS (
       |  SELECT least(9, CAST(floor(quality_score * 10) AS INT)) AS bin,
       |    CAST(round(quality_score * 1e4, 0) AS BIGINT) AS s4,
       |    coalesce(kept, 0) AS kept
       |  FROM q LEFT JOIN kept USING (doc_id)),
       |g AS (
       |  SELECT bin, count(*) AS n_docs,
       |    CAST(sum(kept) AS BIGINT) AS n_kept,
       |    CAST(sum(s4) AS BIGINT) AS s4
       |  FROM b GROUP BY bin)
       |SELECT bin, n_docs, n_kept,
       |  round(CAST(s4 AS DOUBLE) / n_docs / 1e4, 6) AS mean_score,
       |  round(CAST(n_kept AS DOUBLE) / n_docs, 6) AS keep_rate,
       |  round(CAST(s4 AS DOUBLE) / n_docs / 1e4
       |    - CAST(n_kept AS DOUBLE) / n_docs, 6) AS gap
       |FROM g ORDER BY bin""".stripMargin

  // ----------------------------------------------------------- q_source_card
  /** The per-source dataset card: document/token volume, distribution
    * entropy, mean quality, and span-duplication rate on ONE page — the
    * artifact a mixture designer actually reads (each column is a gated
    * operator; this is their join). Everything after the component
    * operators is O(sources), and the component outputs are read from
    * their materialized store (above), not re-derived.
    *
    * Mean quality is averaged in exact 10⁻⁴ units (the score's own
    * precision) so the fold order cannot surface; the dup rate is an
    * integer ratio. */
  def qSourceCard(s: SparkSession, dir: String): DataFrame = {
    val docsSrc = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"))
    val base = docsSrc.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val ent = sourceEntropyStored(s, dir)
      .select(col("source"), col("n_tokens"), col("entropy_nats"))
    val qual = qualityScoreStored(s, dir)
      .select(col("doc_id"),
        round(col("quality_score") * 1e4, 0).cast("long").as("qmu"))
      .join(docsSrc, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(round(sum(col("qmu")).cast("double") / count(lit(1)) / lit(1e4), 4)
        .as("mean_quality"))
    val dup = spanDedupStored(s, dir).select(col("doc_id"))
      .join(docsSrc, Seq("doc_id"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_dup_docs"))
    base.join(ent, Seq("source"))
      .join(qual, Seq("source"))
      .join(dup, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("entropy_nats"), col("mean_quality"),
        round(coalesce(col("n_dup_docs"), lit(0L)).cast("double")
          / col("n_docs"), 4).as("dup_doc_rate"))
      .orderBy(col("source"))
  }

  private val qSourceCardSql =
    s"""WITH base AS (
       |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
       |ent AS (
       |  SELECT source, n_tokens, entropy_nats FROM (
       |${TextAnalysis.qSourceEntropySql})),
       |qual AS (
       |  SELECT d.source,
       |    round(CAST(sum(CAST(round(q.quality_score * 1e4, 0) AS BIGINT))
       |      AS DOUBLE) / count(*) / 1e4, 4) AS mean_quality
       |  FROM (${TextAnalysis.qQualityScoreSql}) q
       |  JOIN documents d ON d.doc_id = q.doc_id
       |  GROUP BY d.source),
       |dup AS (
       |  SELECT d.source, count(*) AS n_dup_docs
       |  FROM (${TextDedup.qSpanDedupSql}) sp
       |  JOIN documents d ON d.doc_id = sp.doc_id
       |  GROUP BY d.source)
       |SELECT b.source, b.n_docs, e.n_tokens, e.entropy_nats,
       |  q.mean_quality,
       |  round(CAST(coalesce(u.n_dup_docs, 0) AS DOUBLE) / b.n_docs, 4)
       |    AS dup_doc_rate
       |FROM base b
       |JOIN ent e USING (source)
       |JOIN qual q ON q.source = b.source
       |LEFT JOIN dup u ON u.source = b.source
       |ORDER BY source""".stripMargin

  // ------------------------------------------------------------------ q_dsir
  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): score every document by how much more likely its
    * tokens are under a small curated TARGET distribution than under the
    * raw-pool distribution, using hashed n-gram features. The target slice
    * here is `doc_id % 7 = 0` (the curated-seed idiom, like
    * q_decontaminate's `% 33` benchmark slice); features are unigrams
    * hashed into 64 buckets (production uses 10⁴–10⁶ — still a broadcast).
    *
    * Per bucket b: p_t(b) = (c_t(b)+1)/(T+64) and p_r(b) = (c_r(b)+1)/(R+64)
    * (Laplace-smoothed); a document's importance weight is
    * Σ_tok [ln p_t(bucket(tok)) − ln p_r(bucket(tok))]. `selected` marks
    * weight > 0 — the doc looks more target-like than pool-like — a
    * per-row decision, no global order statistic.
    *
    * Engine parity: the two lns are each rounded to 6 dp (the BM25/entropy
    * idiom) and micro-scaled to exact BIGINTs, so every per-doc sum is
    * integer arithmetic; `dsir_micro` IS the weight in 10⁻⁶ nat units.
    *
    * Scale shape: pass 1 is one map-side-combinable bucket count (64 rows
    * out); the 64-row log-ratio table is BROADCAST back onto the token
    * stream, so the only corpus-sized shuffle is the per-doc partial-agg
    * sum. The bucket hash is md5-based ([[graft.queries.Sketches]] idiom)
    * so both engines bucket identically. */
  def qDsir(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("bkt",
        expr("cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint) % 64"))
    val counts = toks
      .groupBy(col("bkt"))
      .agg(sum(when(col("doc_id") % 7 === 0, 1L).otherwise(0L)).as("ct"),
        sum(when(col("doc_id") % 7 === 0, 0L).otherwise(1L)).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("t_tot"),
      sum(col("cr")).as("r_tot"))
    def lnMicro(c: Column, tot: Column): Column =
      round(round(log((c + lit(1)).cast("double") / (tot + lit(64))), 6)
        * lit(1e6), 0).cast("long")
    val lr = counts.crossJoin(broadcast(totals))
      .select(col("bkt"),
        (lnMicro(col("ct"), col("t_tot"))
          - lnMicro(col("cr"), col("r_tot"))).as("lr_micro"))
    toks.join(broadcast(lr), Seq("bkt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("lr_micro")).as("dsir_micro"))
      .select(col("doc_id"), col("n_tok"), col("dsir_micro"),
        when(col("doc_id") % 7 === 0, 1).otherwise(0).as("is_target"),
        when(col("dsir_micro") > 0, 1).otherwise(0).as("selected"))
      .orderBy(col("doc_id"))
  }

  private val qDsirSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS bkt
      |  FROM t),
      |c AS (
      |  SELECT bkt,
      |    sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS ct,
      |    sum(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END) AS cr
      |  FROM b GROUP BY bkt),
      |tot AS (SELECT sum(ct) AS t_tot, sum(cr) AS r_tot FROM c),
      |lr AS (
      |  SELECT bkt,
      |    CAST(round(round(ln((ct + 1) / (t_tot + 64.0)), 6) * 1e6, 0)
      |      AS BIGINT)
      |    - CAST(round(round(ln((cr + 1) / (r_tot + 64.0)), 6) * 1e6, 0)
      |      AS BIGINT) AS lr_micro
      |  FROM c, tot)
      |SELECT b.doc_id,
      |  CAST(count(*) AS BIGINT) AS n_tok,
      |  CAST(sum(lr.lr_micro) AS BIGINT) AS dsir_micro,
      |  CAST(CASE WHEN b.doc_id % 7 = 0 THEN 1 ELSE 0 END AS INT) AS is_target,
      |  CAST(CASE WHEN sum(lr.lr_micro) > 0 THEN 1 ELSE 0 END AS INT)
      |    AS selected
      |FROM b JOIN lr ON lr.bkt = b.bkt
      |GROUP BY b.doc_id
      |ORDER BY b.doc_id""".stripMargin

  // --------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_card"        -> (qSourceCard _),
    "q_quality_vs_dup"     -> (qQualityVsDup _),
    "q_calibration"        -> (qCalibration _),
    "q_mixture_greedy"     -> (qMixtureGreedy _),
    "q_ngram_novelty"      -> (qNgramNovelty _),
    "q_heaps_law"          -> (qHeapsLaw _),
    "q_corpus_pipeline"    -> (qCorpusPipeline _),
    "q_chunk_docs"         -> (qChunkDocs _),
    "q_decontaminate"      -> (qDecontaminate _),
    "q_repetition_filter"  -> (qRepetitionFilter _),
    "q_pii_scrub"          -> (qPiiScrub _),
    "q_temperature_mixture" -> (qTemperatureMixture _),
    "q_source_cap"         -> (qSourceCap _),
    "q_oov_rate"           -> (qOovRate _),
    "q_dsir"               -> (qDsir _))

  val oracle: Map[String, String] = Map(
    "q_source_card"        -> qSourceCardSql,
    "q_quality_vs_dup"     -> qQualityVsDupSql,
    "q_calibration"        -> qCalibrationSql,
    "q_mixture_greedy"     -> qMixtureGreedySql,
    "q_ngram_novelty"      -> qNgramNoveltySql,
    "q_heaps_law"          -> qHeapsLawSql,
    "q_corpus_pipeline"    -> qCorpusPipelineSql,
    "q_chunk_docs"         -> qChunkDocsSql,
    "q_decontaminate"      -> qDecontaminateSql,
    "q_repetition_filter"  -> qRepetitionFilterSql,
    "q_pii_scrub"          -> qPiiScrubSql,
    "q_temperature_mixture" -> qTemperatureMixtureSql,
    "q_source_cap"         -> qSourceCapSql,
    "q_oov_rate"           -> qOovRateSql,
    "q_dsir"               -> qDsirSql)
}
