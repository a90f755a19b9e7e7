package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Per-document text-analysis operators for LLM training-data curation:
  * token statistics, stopword-based language ID, composite quality scoring,
  * and rolling-hash content fingerprinting.
  *
  * All pure Column/higher-order-function expressions over the `documents`
  * table — embarrassingly parallel per-row map work with no shuffle except
  * the final presentation sort; at 100 TB these run at parquet-scan speed
  * inside whole-stage codegen. Arithmetic is integer-exact or single-step
  * double ops evaluated in the same order by both engines, so results are
  * bit-identical against the DuckDB oracle.
  */
object TextAnalysis {
  private def toks(text: Column): Column = split(lower(trim(text)), "\\s+")

  private val enStops = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  private val frStops = Seq("le", "la", "et", "les", "des", "un", "une", "du", "est", "dans")
  private val esStops = Seq("el", "la", "y", "los", "las", "un", "una", "del", "es", "en")

  private def inList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ", ", ")")

  /** Count of tokens appearing in `xs` (multiset, via filter+size). */
  private def hits(xs: Seq[String]): Column =
    size(expr(s"filter(w, t -> t IN ${inList(xs)})"))

  // ------------------------------------------------------------ q_text_stats
  /** Token counting + shape stats: whitespace token count, total token
    * chars (exact int), avg token length (one int/int division — identical
    * IEEE double both engines), stopword count and ratio. */
  def qTextStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("w", toks(col("text")))
      .select(
        col("doc_id"),
        size(col("w")).as("n_tokens"),
        expr("aggregate(w, 0, (acc, t) -> acc + length(t))").as("n_token_chars"),
        round(expr("aggregate(w, 0, (acc, t) -> acc + length(t))") / size(col("w")), 4)
          .as("avg_token_len"),
        hits(enStops).as("n_stopwords"),
        round(hits(enStops) / size(col("w")), 4).as("stopword_ratio"))
      .orderBy(col("doc_id"))
  // (oracle casts its BIGINT len()/list_sum() counters to INT to mirror
  // Spark's int32 size()/aggregate-over-int results — dtype is part of the
  // driver's schema compare)

  private val qTextStatsSql =
    s"""SELECT doc_id,
       |  CAST(len(w) AS INT) AS n_tokens,
       |  CAST(list_sum(list_transform(w, t -> length(t))) AS INT) AS n_token_chars,
       |  round(list_sum(list_transform(w, t -> length(t))) / len(w), 4)
       |    AS avg_token_len,
       |  CAST(len(list_filter(w, t -> t IN ${inList(enStops)})) AS INT) AS n_stopwords,
       |  round(len(list_filter(w, t -> t IN ${inList(enStops)})) / len(w), 4)
       |    AS stopword_ratio
       |FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q_lang_id
  /** Stopword-profile language ID (the n-gram-heuristic family): count hits
    * against per-language stopword lists, predict by the same fixed
    * precedence CASE on both engines. */
  def qLangId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("w", toks(col("text")))
      .select(
        col("doc_id"), col("lang"),
        hits(enStops).as("en_hits"),
        hits(frStops).as("fr_hits"),
        hits(esStops).as("es_hits"))
      .withColumn("lang_pred",
        when(col("en_hits") >= col("fr_hits") && col("en_hits") >= col("es_hits"), "en")
          .when(col("fr_hits") >= col("es_hits"), "fr")
          .otherwise("es"))
      .withColumn("agrees", col("lang_pred") === col("lang"))
      .orderBy(col("doc_id"))

  private val qLangIdSql =
    s"""SELECT doc_id, lang, en_hits, fr_hits, es_hits,
       |  CASE WHEN en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |       WHEN fr_hits >= es_hits THEN 'fr'
       |       ELSE 'es' END AS lang_pred,
       |  (CASE WHEN en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       |        WHEN fr_hits >= es_hits THEN 'fr'
       |        ELSE 'es' END) = lang AS agrees
       |FROM (
       |  SELECT doc_id, lang,
       |    CAST(len(list_filter(w, t -> t IN ${inList(enStops)})) AS INT) AS en_hits,
       |    CAST(len(list_filter(w, t -> t IN ${inList(frStops)})) AS INT) AS fr_hits,
       |    CAST(len(list_filter(w, t -> t IN ${inList(esStops)})) AS INT) AS es_hits
       |  FROM (SELECT doc_id, lang,
       |          string_split_regex(lower(trim(text)), '\\s+') AS w
       |        FROM documents))
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- q_quality_score
  /** Composite quality score in [0,1]: length component (saturating at 100
    * tokens), char-length component (saturating at 500 chars), stopword
    * density. Weights fixed; every step is the same scalar IEEE op sequence
    * on both engines, rounded to 4. The DQ-gate shape for corpus filtering —
    * `WHERE quality_score >= τ` pushes straight down onto the scan. */
  def qQualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("w", toks(col("text")))
      .select(
        col("doc_id"),
        size(col("w")).as("n_tokens"), // oracle casts len() to INT to match
        round(
          least(lit(1.0), size(col("w")) / lit(100.0)) * 0.5
            + least(lit(1.0), col("n_chars") / lit(500.0)) * 0.3
            + least(lit(0.3), hits(enStops) / size(col("w"))) / 0.3 * 0.2,
          4).as("quality_score"))
      .orderBy(col("doc_id"))

  private[queries] val qQualityScoreSql =
    s"""SELECT doc_id,
       |  CAST(len(w) AS INT) AS n_tokens,
       |  round(
       |    least(1.0, len(w) / 100.0) * 0.5
       |    + least(1.0, n_chars / 500.0) * 0.3
       |    + least(0.3, len(list_filter(w, t -> t IN ${inList(enStops)})) / len(w)) / 0.3 * 0.2,
       |  4) AS quality_score
       |FROM (SELECT doc_id, n_chars,
       |        string_split_regex(lower(trim(text)), '\\s+') AS w
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- q_token_count
  /** BPE-style pre-tokenization count next to the whitespace count: the
    * GPT-ish pre-tokenizer regex family (letter runs | digit runs | single
    * punctuation) via regexp_extract_all. The pattern uses only syntax
    * shared by Java regex and RE2 so both engines tokenize identically.
    * The tokens-per-word ratio is the cost predictor LLM-data pipelines
    * budget by. */
  def qTokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("w", toks(col("text")))
      .withColumn("bpe", expr(
        """regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"""))
      .select(
        col("doc_id"),
        size(col("w")).as("n_ws_tokens"),
        size(col("bpe")).as("n_bpe_tokens"),
        round(size(col("bpe")) / size(col("w")), 4).as("tokens_per_word"))
      .orderBy(col("doc_id"))

  private val qTokenCountSql =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INT)
      |    AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
      |    AS INT) AS n_bpe_tokens,
      |  round(len(regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
      |    / len(string_split_regex(lower(trim(text)), '\s+')), 4)
      |    AS tokens_per_word
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- q_fertility
  /** Tokenizer fertility by source: subword tokens per whitespace word
    * (the "fertility" a tokenizer paper reports per language/domain) and
    * characters per subword token (the compression ratio), using the same
    * GPT-ish pre-tokenizer as [[qTokenCount]]. The per-source token budget
    * predictor: a source with fertility 1.8 costs 1.8× the tokens of its
    * word count, and a falling chars-per-token means the tokenizer is
    * fragmenting that domain. Aggregating per SOURCE (vs q_token_count's
    * per-doc view) is what a mixture planner actually consumes.
    *
    * Engine parity: every emitted count is an exact integer sum; the two
    * ratios are single double divisions of those exact integers (identical
    * cross-engine) rounded at scale 4, where no exact decimal tie exists.
    *
    * Scale shape: per-row token counting inside whole-stage codegen (no
    * explode — `size(...)` never materializes the arrays into a shuffle),
    * then ONE map-side-combinable groupBy(source); output is O(sources). */
  def qFertility(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), col("n_chars"),
        size(toks(col("text"))).as("n_ws"),
        size(expr(
          """regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"""))
          .as("n_bpe"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("n_ws").cast("long")).as("n_ws_tokens"),
        sum(col("n_bpe").cast("long")).as("n_bpe_tokens"))
      .select(col("source"), col("n_docs"), col("sum_chars"),
        col("n_ws_tokens"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_ws_tokens"), 4)
          .as("fertility"),
        round(col("sum_chars").cast("double") / col("n_bpe_tokens"), 4)
          .as("chars_per_token"))
      .orderBy(col("source"))

  private val qFertilitySql =
    """WITH d AS (
      |  SELECT source, n_chars,
      |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_ws,
      |    len(regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
      |      AS n_bpe
      |  FROM documents)
      |SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(n_ws) AS BIGINT) AS n_ws_tokens,
      |  CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
      |  round(CAST(sum(n_bpe) AS DOUBLE) / sum(n_ws), 4) AS fertility,
      |  round(CAST(sum(n_chars) AS DOUBLE) / sum(n_bpe), 4) AS chars_per_token
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ----------------------------------------------------------- q_fingerprint
  /** Rolling polynomial content fingerprint: fold h = (h*131 + ascii(c)) mod
    * 1e9+7 over every character of the whitespace-normalized text. Exact
    * 64-bit integer arithmetic — engine-portable, order-defined, and stable
    * under re-partitioning (per-row, no aggregation). The cheap
    * change-detection key for incremental corpus syncs (the row_hash idea,
    * TL_combine.sql:28-29, applied to documents). */
  def qFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .select(
        col("doc_id"),
        length(col("norm")).as("n_chars_norm"),
        // native codegen expression (graft.expressions.RollingHash) — the
        // HOF formulation aggregate(sequence(1, length(norm)), …) computes
        // the identical value but interpreted per character (measured ~10×
        // slower); the oracle's list_reduce mirrors the same fold
        graft.expressions.RollingHash.rollingHash("norm")
          .as("fingerprint"))
      .orderBy(col("doc_id"))

  private val qFingerprintSql =
    """SELECT doc_id,
      |  CAST(length(norm) AS INT) AS n_chars_norm,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(norm) + 1),
      |        i -> CAST(ascii(substr(norm, i, 1)) AS BIGINT))),
      |    (acc, x) -> (acc * 131 + x) % 1000000007) AS fingerprint
      |FROM (SELECT doc_id,
      |        regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q_bm25
  /** BM25 keyword search: rank the corpus against a fixed query-term set
    * (k1 = 1.2, b = 0.75) and return the top-20 docs. The retrieval
    * complement of the embedding-ANN family — a production curation stack
    * keyword-searches its corpus (targeted audits, contamination triage)
    * exactly like this.
    *
    * Scale shape: the query-term set is tiny and the `isin` filter prunes
    * the exploded token stream MAP-SIDE (no corpus shuffle for membership);
    * tf/doclen are map-side-combinable aggregates; N and avgdl are 1-row
    * scalars broadcast into the scoring join; the final top-20 is a
    * TakeOrderedAndProject (k rows to the driver, no global sort).
    *
    * Engine parity: idf = ln((N-df+0.5)/(df+0.5)+1) is rounded to 6 dp at
    * the ONE transcendental step; everything after is IEEE-exact +,*,/ on
    * identical doubles, and per-term contributions are summed as
    * µ-scaled BIGINTs so the per-doc total is order-independent. */
  def qBm25(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("vector", "hash", "spark", "merge")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), toks(col("text")).as("w"))
    val dl = docs.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs.select(col("doc_id"), explode(col("w")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(df), Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", round(
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)), 6))
      .withColumn("c", col("idf") * ((col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) *
          (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))))
      .withColumn("ci", round(col("c") * lit(1e6), 0).cast("long"))
    contrib.groupBy(col("doc_id"))
      .agg((sum(col("ci")) / lit(1e6)).as("bm25"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  private[queries] val qBm25Sql =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
      |  FROM documents),
      |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
      |stats AS (SELECT count(*) AS n_docs,
      |            CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, tok, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(w) AS tok FROM d)
      |  WHERE tok IN ('vector', 'hash', 'spark', 'merge')
      |  GROUP BY doc_id, tok),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      |contrib AS (
      |  SELECT t.doc_id,
      |    CAST(round(
      |      round(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0), 6)
      |        * ((t.tf * 2.2) /
      |           (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)))
      |      * 1e6, 0) AS BIGINT) AS ci
      |  FROM tf t
      |  JOIN df f USING (tok)
      |  JOIN dl l USING (doc_id)
      |  CROSS JOIN stats s)
      |SELECT doc_id, CAST(sum(ci) AS BIGINT) / 1e6 AS bm25,
      |  count(*) AS n_terms
      |FROM contrib
      |GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id
      |LIMIT 20""".stripMargin

  // ------------------------------------------------------------ q_ngram_next
  /** Bigram continuation table: for every prefix token, the top-3 next
    * tokens by corpus frequency — the n-gram language-model building block
    * (next-token frequency tables are how classic LM smoothing, contamination
    * heuristics, and boilerplate detectors see a corpus). Tie-break on the
    * token string keeps ranks total; the corpus is lowercase ASCII, so both
    * engines' binary string orders agree.
    *
    * Scale shape: consecutive-pair construction is a per-row map over the
    * token array (no self-join — `transform` over index sequence), the
    * count is one map-side-combinable groupBy on (prefix, next), and the
    * rank window runs on the AGGREGATED table (O(vocab²) rows at worst,
    * independent of corpus size). The full corpus is read once, shuffled
    * once at (prefix, next) granularity. */
  def qNgramNext(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Tables.documents(s, dir)
      .select(TextOps.words(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w)-2), " +
          "i -> named_struct('prefix', w[i], 'next', w[i+1]))")).as("p"))
      .select(col("p.prefix").as("prefix"), col("p.next").as("next"))
    val win = Window.partitionBy(col("prefix"))
      .orderBy(col("cnt").desc, col("next"))
    pairs.groupBy(col("prefix"), col("next"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(win).cast("int"))
      .filter(col("rank") <= 3)
      .orderBy(col("prefix"), col("rank"))
  }

  private val qNgramNextSql =
    """WITH d AS (
      |  SELECT string_split_regex(lower(trim(text)), '\s+') AS l
      |  FROM documents),
      |p AS (
      |  SELECT unnest(list_transform(range(1, len(l)),
      |    i -> struct_pack(prefix := l[i], next := l[i + 1]))) AS pr
      |  FROM d WHERE len(l) >= 2),
      |c AS (
      |  SELECT pr.prefix AS prefix, pr.next AS next, count(*) AS cnt
      |  FROM p GROUP BY 1, 2),
      |r AS (
      |  SELECT prefix, next, cnt,
      |    CAST(row_number() OVER (PARTITION BY prefix
      |      ORDER BY cnt DESC, next) AS INTEGER) AS rank
      |  FROM c)
      |SELECT prefix, next, cnt, rank FROM r
      |WHERE rank <= 3
      |ORDER BY prefix, rank""".stripMargin

  // ------------------------------------------------------------- registry
  // ------------------------------------------------------------ q_lm_score
  /** Perplexity-style quality scoring — the standard LM-based corpus
    * filter: each document's mean negative log-probability of its bigrams
    * under the corpus's own bigram model (P(w₂|w₁) = c(w₁w₂)/c(w₁·)).
    * Low score = predictable text; outliers at either end are the
    * boilerplate/garbage candidates a curation pass inspects. Trained on
    * the corpus it scores, so every bigram is seen (no smoothing needed)
    * and the operator is self-contained.
    *
    * Float discipline (the BM25 precedent): −ln(P) is the ONE
    * transcendental step, rounded to integer µ-nats per bigram; per-doc
    * totals are exact BIGINT sums (order-independent), and the mean is one
    * division of identical integers — bit-identical across engines.
    *
    * Scale shape: the bigram count tables are vocab²-bounded aggregates
    * (broadcastable), the doc-side join is a stateless lookup on the
    * exploded pair stream, and the per-doc reduce is one keyed sum. */
  def qLmScore(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(s, dir)
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-2), " +
          "i -> named_struct('w1', w[i], 'w2', w[i+1]))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c12 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    pairs
      .join(broadcast(c12), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .withColumn("unats",
        round(-log(col("c12").cast("double") / col("c1")) * 1e6, 0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("unats")).as("total_unats"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("total_unats").cast("double") / col("n_bigrams")).as("mean_unats"))
      .orderBy(col("doc_id"))
  }

  private val qLmScoreSql =
    """WITH pairs AS (
      |  SELECT doc_id,
      |    unnest(w[1:len(w)-1]) AS w1,
      |    unnest(w[2:len(w)]) AS w2
      |  FROM (SELECT doc_id,
      |          string_split_regex(lower(trim(text)), '\s+') AS w
      |        FROM documents)
      |  WHERE len(w) >= 2),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1),
      |scored AS (
      |  SELECT p.doc_id,
      |    CAST(round(-ln(CAST(c12.c12 AS DOUBLE) / c1.c1) * 1e6, 0) AS BIGINT)
      |      AS unats
      |  FROM pairs p
      |  JOIN c12 ON c12.w1 = p.w1 AND c12.w2 = p.w2
      |  JOIN c1 ON c1.w1 = p.w1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(unats) AS DOUBLE) / count(*) AS mean_unats
      |FROM scored GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ q_bpe_step
  /** One BPE merge iteration's counting phase — the inner loop of
    * byte-pair-encoding tokenizer training: count adjacent character
    * pairs across every token OCCURRENCE in the corpus (multiplicity
    * matters — that's what makes frequent words dominate the merge order)
    * and emit the top merge candidates. Corpus-scale tokenizer induction
    * is exactly this aggregation repeated per merge; one iteration under
    * the gate proves the counting core.
    *
    * Scale shape: explode to (left, right) pairs is stateless and
    * scan-local; the count is map-side combined over an alphabet²-bounded
    * key space, so the exchange carries partial counts, not the pair
    * stream. Top-20 by (count, pair) is a total order. */
  def qBpeStep(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(TextOps.words(col("text"))).as("tok"))
      .select(split(col("tok"), "").as("c"))
      .filter(size(col("c")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(c)-2), " +
          "i -> named_struct('l', c[i], 'r', c[i+1]))")).as("p"))
      .groupBy(col("p.l").as("left_ch"), col("p.r").as("right_ch"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("left_ch"), col("right_ch"))
      .limit(20)

  private val qBpeStepSql =
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |  FROM documents),
      |pairs AS (
      |  SELECT unnest(c[1:len(c)-1]) AS left_ch,
      |         unnest(c[2:len(c)]) AS right_ch
      |  FROM (SELECT string_split(tok, '') AS c FROM toks)
      |  WHERE len(c) >= 2)
      |SELECT left_ch, right_ch, count(*) AS cnt
      |FROM pairs GROUP BY 1, 2
      |ORDER BY cnt DESC, left_ch, right_ch LIMIT 20""".stripMargin

  // ------------------------------------------------------------ q_bpe_train
  /** The BPE TRAINING LOOP q_bpe_step counts one round of: three full
    * merge iterations, each picking the corpus-weighted best adjacent
    * symbol pair and rewriting every word's symbol sequence — the
    * Sennrich et al. (ACL 2016) subword-induction algorithm as it
    * actually runs.
    *
    * State lives where real BPE trainers keep it: a WORD-FREQUENCY table
    * (vocab-sized — symbol sequences never ride the corpus), built by one
    * fact-scale token count. Symbol sequences are sentinel-delimited
    * strings (`|s||p||a||r||k|`), so the merge is a plain `replace` of
    * `|a||b|` with `|ab|` — leftmost non-overlapping, exactly canonical
    * BPE's one-pass greedy semantics, identical in both engines (the
    * wrapped-sentinel form makes overlapping runs like `aaa` merge to
    * `(aa)(a)` correctly, which naive space-delimited replace gets
    * wrong). Each iteration: pair fan-out over the vocab table
    * (alphabet²-bounded aggregate), best pair by (count, a, b) total
    * order as a 1-row broadcast, rewrite. Output = the 3 chosen merges
    * with their counts — the artifact a tokenizer ships. */
  def qBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(explode(TextOps.words(col("text"))).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
    var vocab = words.select(
      concat(lit("|"), array_join(split($"tok", ""), "||"), lit("|"))
        .as("seq"),
      $"cnt")
    val steps = (1 to 3).map { it =>
      val pairs = vocab
        .withColumn("syms",
          split(expr("substring(seq, 2, length(seq) - 2)"), "\\|\\|"))
        .filter(size($"syms") >= 2)
        .select($"cnt", explode(expr(
          "transform(sequence(0, size(syms)-2), " +
            "i -> named_struct('a', syms[i], 'b', syms[i+1]))")).as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"cnt").as("pair_cnt"))
      val best = pairs.orderBy($"pair_cnt".desc, $"a", $"b").limit(1)
      vocab = vocab.crossJoin(broadcast(best))
        .withColumn("seq", expr(
          "replace(seq, '|' || a || '||' || b || '|', '|' || a || b || '|')"))
        .select($"seq", $"cnt")
      // (no per-round truncation here, unlike qBpeEncode: the train
      // output consumes only the three 1-row `best` tables, and an eager
      // per-round vocab materialization measured SLOWER than the lazy
      // chain — 1.32 → 1.67 s at sf0.1)
      best.select(lit(it).as("merge_rank"), $"a", $"b", $"pair_cnt")
    }
    steps.reduce(_ unionByName _).orderBy($"merge_rank")
  }

  /** One unrolled oracle iteration (same generator pattern as morton8Sql —
    * the three stages must be mechanically identical). */
  private def bpeStageSql(i: Int): String =
    s"""p$i AS (
       |  SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pair_cnt FROM (
       |    SELECT unnest(syms[1:len(syms)-1]) AS a,
       |           unnest(syms[2:len(syms)]) AS b, cnt
       |    FROM (SELECT string_split(substring(seq, 2, length(seq) - 2),
       |                   '||') AS syms, cnt
       |          FROM w${i - 1})
       |    WHERE len(syms) >= 2)
       |  GROUP BY a, b),
       |b$i AS (SELECT * FROM p$i ORDER BY pair_cnt DESC, a, b LIMIT 1),
       |w$i AS (
       |  SELECT replace(seq, '|' || b$i.a || '||' || b$i.b || '|',
       |           '|' || b$i.a || b$i.b || '|') AS seq, cnt
       |  FROM w${i - 1} CROSS JOIN b$i)""".stripMargin

  private val qBpeTrainSql =
    s"""WITH toks AS (
       |  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |  FROM documents),
       |words AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
       |w0 AS (
       |  SELECT '|' || array_to_string(string_split(tok, ''), '||') || '|'
       |           AS seq, cnt
       |  FROM words),
       |${bpeStageSql(1)},
       |${bpeStageSql(2)},
       |${bpeStageSql(3)}
       |SELECT 1 AS merge_rank, a, b, pair_cnt FROM b1
       |UNION ALL SELECT 2, a, b, pair_cnt FROM b2
       |UNION ALL SELECT 3, a, b, pair_cnt FROM b3
       |ORDER BY merge_rank""".stripMargin

  // ------------------------------------------------------------ q_bpe_encode
  /** The ENCODE side of BPE: train the 3 merges exactly as [[qBpeTrain]]
    * (same word-frequency state, same wrapped-sentinel rewrite), then
    * tokenize the whole corpus with the learned vocabulary and emit each
    * document's size accounting — words, characters, BPE tokens — the
    * number a training-data budget is actually denominated in.
    *
    * Scale shape: the merges train on the vocab-sized word table; the
    * encode step is a BROADCAST join of the corpus token stream against
    * the final (token → symbol count) map — no per-document re-running of
    * the merge loop, which is the difference between O(corpus) and
    * O(corpus × merges) at 100 TB. One final per-doc aggregate. */
  def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toksd = Tables.documents(s, dir)
      .select($"doc_id", explode(TextOps.words(col("text"))).as("tok"))
    var vocab = toksd.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .select($"tok",
        concat(lit("|"), array_join(split($"tok", ""), "||"), lit("|"))
          .as("seq"),
        $"cnt")
    for (_ <- 1 to 3) {
      val pairs = vocab
        .withColumn("syms",
          split(expr("substring(seq, 2, length(seq) - 2)"), "\\|\\|"))
        .filter(size($"syms") >= 2)
        .select($"cnt", explode(expr(
          "transform(sequence(0, size(syms)-2), " +
            "i -> named_struct('a', syms[i], 'b', syms[i+1]))")).as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"cnt").as("pair_cnt"))
      val best = pairs.orderBy($"pair_cnt".desc, $"a", $"b").limit(1)
        .select($"a", $"b")
      vocab = vocab.crossJoin(broadcast(best))
        .withColumn("seq", expr(
          "replace(seq, '|' || a || '||' || b || '|', '|' || a || b || '|')"))
        .select($"tok", $"seq", $"cnt")
        // vocab-sized eager truncation per merge round (the graph-loop
        // lineage discipline, r14 optimization round): un-truncated, round
        // k's plan embeds round k−1 TWICE (via pairs→best and via the
        // rewrite), so the final job re-executed the token aggregate once
        // per nesting — measured 2.0 → 1.6 s at sf0.1
        .localCheckpoint()
    }
    val enc = vocab.select($"tok",
      size(split(expr("substring(seq, 2, length(seq) - 2)"), "\\|\\|"))
        .as("n_syms"))
    toksd.join(broadcast(enc), "tok")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length($"tok")).as("n_chars"),
        sum($"n_syms").as("n_bpe"))
      .orderBy($"doc_id")
  }

  /** bpeStageSql with the token key carried through the rewrite CTEs —
    * the encode oracle needs tok → final seq, not just the merges. */
  private def bpeEncStageSql(i: Int): String =
    s"""p$i AS (
       |  SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pair_cnt FROM (
       |    SELECT unnest(syms[1:len(syms)-1]) AS a,
       |           unnest(syms[2:len(syms)]) AS b, cnt
       |    FROM (SELECT string_split(substring(seq, 2, length(seq) - 2),
       |                   '||') AS syms, cnt
       |          FROM w${i - 1})
       |    WHERE len(syms) >= 2)
       |  GROUP BY a, b),
       |b$i AS (SELECT * FROM p$i ORDER BY pair_cnt DESC, a, b LIMIT 1),
       |w$i AS (
       |  SELECT tok, replace(seq, '|' || b$i.a || '||' || b$i.b || '|',
       |           '|' || b$i.a || b$i.b || '|') AS seq, cnt
       |  FROM w${i - 1} CROSS JOIN b$i)""".stripMargin

  private val qBpeEncodeSql =
    s"""WITH toksd AS (
       |  SELECT doc_id,
       |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |  FROM documents),
       |words AS (SELECT tok, count(*) AS cnt FROM toksd GROUP BY tok),
       |w0 AS (
       |  SELECT tok,
       |    '|' || array_to_string(string_split(tok, ''), '||') || '|'
       |      AS seq, cnt
       |  FROM words),
       |${bpeEncStageSql(1)},
       |${bpeEncStageSql(2)},
       |${bpeEncStageSql(3)},
       |enc AS (
       |  SELECT tok,
       |    len(string_split(substring(seq, 2, length(seq) - 2), '||'))
       |      AS n_syms
       |  FROM w3)
       |SELECT d.doc_id, count(*) AS n_words,
       |  CAST(sum(length(d.tok)) AS BIGINT) AS n_chars,
       |  CAST(sum(e.n_syms) AS BIGINT) AS n_bpe
       |FROM toksd d JOIN enc e USING (tok)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------ q_inverted_index
  /** Inverted-index build: token → document frequency + the first 8 doc ids
    * as an ascending postings CSV. `array_distinct` inside each document
    * makes (token, doc) pairs unique BEFORE the explode — the map-side dedup
    * that keeps the shuffle at O(distinct pairs); the postings cap is a
    * row_number ≤ 8 filter, so per-token state is bounded (the unbounded
    * collect_list a naive build would do is exactly what breaks on a
    * stopword token at 100 TB — the native TopKAgg is the drop-in if the
    * cap must be an aggregate). df ≥ 50 keeps only index-worthy terms. */
  def qInvertedIndex(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = docTokenPairs(s, dir)
    val dfs = pairs.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val posts = pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("tok")).orderBy(col("doc_id"))))
      .filter(col("rn") <= 8)
      .groupBy(col("tok"))
      .agg(expr("array_join(transform(array_sort(collect_list(doc_id)), " +
        "x -> cast(x as string)), ',')").as("postings"))
    dfs.join(posts, "tok").filter(col("df") >= 50)
      .select(col("tok"), col("df"), col("postings"))
      .orderBy(col("tok"))
  }

  private val qInvertedIndexSql =
    """WITH pairs AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id,
      |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |    FROM documents)),
      |dfs AS (SELECT tok, count(*) AS df FROM pairs GROUP BY tok),
      |ranked AS (
      |  SELECT tok, doc_id,
      |    row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
      |  FROM pairs),
      |posts AS (
      |  SELECT tok,
      |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
      |      AS postings
      |  FROM ranked WHERE rn <= 8 GROUP BY tok)
      |SELECT d.tok, d.df, p.postings
      |FROM dfs d JOIN posts p USING (tok)
      |WHERE d.df >= 50 ORDER BY d.tok""".stripMargin

  /** Distinct (doc_id, token) pairs — `array_distinct` inside each document
    * dedups map-side BEFORE the explode, so the downstream shuffle carries
    * O(distinct pairs), not O(tokens). Shared by q_inverted_index and
    * q_colloc_lift (their oracles mirror the same `SELECT DISTINCT`). */
  private def docTokenPairs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(toks(col("text")))).as("tok"))

  // -------------------------------------------------------- q_posting_cost
  /** Inverted-index size estimator: per token, the raw 8-byte-per-posting
    * cost vs the delta+varint encoding a real index writes (gaps between
    * sorted doc ids, 7 payload bits per byte — the varint byte count is an
    * exact integer CASE ladder, engine-portable). The index-layout sibling
    * of q_lsh_cost / q_join_size_est: it prices the posting lists BEFORE
    * the index is built, and the compression ratio is what decides
    * doc-id reassignment work.
    *
    * Scale shape: the lag window per token partition IS the index-build
    * shape (postings are materialized term-sorted per segment); a hot
    * term's postings are segment-local in production, corpus-local here.
    * First gap is measured from −1 so a lone doc 0 still costs one byte. */
  def qPostingCost(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("tok")).orderBy(col("doc_id"))
    val varint = (g: Column) =>
      when(g < 128L, 1L).when(g < 16384L, 2L)
        .when(g < 2097152L, 3L).when(g < 268435456L, 4L).otherwise(5L)
    docTokenPairs(s, dir)
      .withColumn("gap",
        col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w), lit(-1L)))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"),
        (count(lit(1)) * 8).as("raw_bytes"),
        sum(varint(col("gap"))).as("varint_bytes"))
      .select(col("tok"), col("df"), col("raw_bytes"), col("varint_bytes"),
        round(col("varint_bytes").cast("double") / col("raw_bytes"), 4)
          .as("compression_ratio"))
      .orderBy(col("tok"))
  }

  private val qPostingCostSql =
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, tok
      |  FROM (SELECT doc_id,
      |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |        FROM documents)),
      |g AS (
      |  SELECT tok,
      |    doc_id - coalesce(lag(doc_id, 1) OVER (
      |      PARTITION BY tok ORDER BY doc_id), -1) AS gap
      |  FROM dt)
      |SELECT tok, count(*) AS df,
      |  count(*) * 8 AS raw_bytes,
      |  CAST(sum(CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
      |           WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
      |           ELSE 5 END) AS BIGINT) AS varint_bytes,
      |  round(CAST(sum(CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
      |           WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
      |           ELSE 5 END) AS DOUBLE) / (count(*) * 8), 4)
      |    AS compression_ratio
      |FROM g
      |GROUP BY tok
      |ORDER BY tok""".stripMargin

  // -------------------------------------------------------- q_colloc_lift
  /** Token collocation mining: document-level co-occurrence lift
    * N·c(a,b) / (c(a)·c(b)) for token pairs appearing together in ≥ 20% of
    * documents — PMI's argument without the cross-engine-libm ln. The
    * pair expansion is per-document over DISTINCT tokens (vocab-bounded,
    * so the fan-out is ≤ |vocab|² per doc, not |doc|²); pair counts and
    * per-token document frequencies are two map-side-combined aggregations
    * and the final join is against the vocab-sized df table, broadcast. */
  def qCollocLift(s: SparkSession, dir: String): DataFrame = {
    val pairs = docTokenPairs(s, dir)
    val dfs = pairs.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val co = pairs.as("a").join(pairs.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"))
      .agg(count(lit(1)).as("c_ab"))
    val nDocs = Tables.documents(s, dir)
      .agg(count(lit(1)).cast("double").as("n_docs"))
    co.join(broadcast(dfs.withColumnRenamed("tok", "tok_a")
        .withColumnRenamed("c", "c_a")), "tok_a")
      .join(broadcast(dfs.withColumnRenamed("tok", "tok_b")
        .withColumnRenamed("c", "c_b")), "tok_b")
      .crossJoin(broadcast(nDocs))
      .filter(col("c_ab") * 5 >= col("n_docs"))
      .select(col("tok_a"), col("tok_b"), col("c_ab"), col("c_a"), col("c_b"),
        round((col("n_docs") * col("c_ab").cast("double")) /
          (col("c_a").cast("double") * col("c_b").cast("double")), 6)
          .as("lift"))
      .orderBy(col("tok_a"), col("tok_b"))
  }

  private val qCollocLiftSql =
    """WITH pairs AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id,
      |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |    FROM documents)),
      |dfs AS (SELECT tok, count(*) AS c FROM pairs GROUP BY tok),
      |co AS (
      |  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS c_ab
      |  FROM pairs a JOIN pairs b
      |    ON a.doc_id = b.doc_id AND a.tok < b.tok
      |  GROUP BY tok_a, tok_b),
      |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
      |SELECT tok_a, tok_b, c_ab, da.c AS c_a, db.c AS c_b,
      |  round((n_docs * CAST(c_ab AS DOUBLE))
      |        / (CAST(da.c AS DOUBLE) * CAST(db.c AS DOUBLE)), 6) AS lift
      |FROM co
      |JOIN dfs da ON da.tok = co.tok_a
      |JOIN dfs db ON db.tok = co.tok_b
      |CROSS JOIN nd
      |WHERE c_ab * 5 >= n_docs
      |ORDER BY tok_a, tok_b""".stripMargin

  // -------------------------------------------------------- q_source_entropy
  /** Per-source token-distribution diagnostics: token volume, vocabulary
    * size, type-token ratio, and Shannon entropy (nats) of the unigram
    * distribution. The data-mixing view of a corpus — entropy and TTR are
    * the standard first-order diversity signals a pretraining mixture
    * weighs sources by (a low-entropy source is templated/repetitive no
    * matter how large it is).
    *
    * Scale shape: one explode + one map-side-combinable (source, token)
    * count — the only corpus-sized shuffle; everything after runs on the
    * O(sources × vocab) aggregate, with the per-source totals joined back
    * broadcast. Output is O(sources).
    *
    * Engine parity (the BM25 idiom): ln is rounded to 6 dp at the one
    * transcendental step, each -p·ln(p) term is nano-scaled to a BIGINT so
    * the per-source sum is order-independent, and the final /1e9 is one
    * exact double division. */
  def qSourceEntropy(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(col("source"), explode(TextOps.words(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"))
    val ent = counts
      .join(broadcast(totals.select(col("source"), col("n_tokens"))),
        Seq("source"))
      .withColumn("p", col("c").cast("double") / col("n_tokens"))
      .withColumn("term_nano",
        round((-col("p")) * round(log(col("p")), 6) * lit(1e9), 0)
          .cast("long"))
      .groupBy(col("source"))
      .agg((sum(col("term_nano")) / lit(1e9)).as("entropy_nats"))
    totals.join(ent, Seq("source"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        round(col("vocab").cast("double") / col("n_tokens"), 6)
          .as("type_token_ratio"),
        col("entropy_nats"))
      .orderBy(col("source"))
  }

  private[queries] val qSourceEntropySql =
    """WITH t AS (
      |  SELECT source,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |  FROM documents),
      |c AS (SELECT source, tok, count(*) AS c FROM t GROUP BY 1, 2),
      |tot AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    count(*) AS vocab
      |  FROM c GROUP BY source),
      |e AS (
      |  SELECT c.source,
      |    CAST(sum(CAST(round(
      |      (-(CAST(c.c AS DOUBLE) / tot.n_tokens))
      |        * round(ln(CAST(c.c AS DOUBLE) / tot.n_tokens), 6) * 1e9,
      |      0) AS BIGINT)) AS BIGINT) AS en
      |  FROM c JOIN tot USING (source) GROUP BY c.source)
      |SELECT tot.source, tot.n_tokens, tot.vocab,
      |  round(CAST(tot.vocab AS DOUBLE) / tot.n_tokens, 6)
      |    AS type_token_ratio,
      |  e.en / 1e9 AS entropy_nats
      |FROM tot JOIN e USING (source)
      |ORDER BY source""".stripMargin

  // -------------------------------------------------------- q_js_divergence
  /** Per-source Jensen-Shannon divergence (nats) between the source's
    * unigram token distribution and the whole-corpus distribution — the
    * mixture-drift read-out next to [[qSourceEntropy]]'s diversity numbers:
    * a high-JSD source is lexically unlike the blend it feeds, so its
    * mixture weight moves perplexity more than its token count suggests.
    * JSD(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M) with M = (P+Q)/2; tokens the source
    * never emits still contribute the ½·q·ln(2) mass-coverage term.
    *
    * Scale shape: one corpus explode + one map-side-combinable
    * (source, token) count — the only corpus-sized shuffle (shared with
    * q_source_entropy); the JSD grid is sources × vocab rows built from
    * broadcast O(vocab) aggregates, never a corpus-sized join. Output is
    * O(sources).
    *
    * Engine parity: the q_source_entropy nano-ln discipline — p, q, m are
    * IEEE doubles derived from exact BIGINT counts, ln is rounded to 6 dp
    * at the one transcendental step, each token's term is nano-scaled to a
    * BIGINT so the per-source sum is order-independent, and the final /1e9
    * is one exact double division. */
  def qJsDivergence(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(col("source"), explode(TextOps.words(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val srcTotals = counts.groupBy(col("source"))
      .agg(sum(col("c")).as("n_src"))
    val vocab = counts.groupBy(col("tok")).agg(sum(col("c")).as("cc"))
    val nTotal = vocab.agg(sum(col("cc")).as("n_total"))
    val grid = srcTotals
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(nTotal))
      .join(counts, Seq("source", "tok"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val terms = grid
      .withColumn("p", col("c").cast("double") / col("n_src"))
      .withColumn("q", col("cc").cast("double") / col("n_total"))
      .withColumn("m", (col("p") + col("q")) / lit(2))
      .withColumn("term_nano",
        round((when(col("c") > 0,
            lit(0.5) * col("p") * round(log(col("p") / col("m")), 6))
          .otherwise(lit(0.0))
          + lit(0.5) * col("q") * round(log(col("q") / col("m")), 6))
          * lit(1e9), 0).cast("long"))
    terms.groupBy(col("source"), col("n_src"))
      .agg(sum(when(col("c") > 0, 1L).otherwise(0L)).as("overlap_vocab"),
        (sum(col("term_nano")) / lit(1e9)).as("jsd_nats"))
      .select(col("source"), col("n_src").as("n_tokens"),
        col("overlap_vocab"), col("jsd_nats"))
      .orderBy(col("source"))
  }

  private[queries] val qJsDivergenceSql =
    """WITH t AS (
      |  SELECT source,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |  FROM documents),
      |c AS (SELECT source, tok, count(*) AS c FROM t GROUP BY 1, 2),
      |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_src
      |       FROM c GROUP BY 1),
      |cv AS (SELECT tok, CAST(sum(c) AS BIGINT) AS cc FROM c GROUP BY 1),
      |nt AS (SELECT CAST(sum(cc) AS BIGINT) AS n_total FROM cv),
      |grid AS (
      |  SELECT st.source, st.n_src, cv.tok, cv.cc, nt.n_total,
      |    coalesce(c.c, 0) AS c
      |  FROM st CROSS JOIN cv CROSS JOIN nt
      |  LEFT JOIN c ON c.source = st.source AND c.tok = cv.tok),
      |terms AS (
      |  SELECT source, n_src,
      |    CASE WHEN c > 0 THEN 1 ELSE 0 END AS hit,
      |    CAST(round((
      |      CASE WHEN c > 0 THEN
      |        0.5 * (CAST(c AS DOUBLE) / n_src)
      |          * round(ln((CAST(c AS DOUBLE) / n_src)
      |            / ((CAST(c AS DOUBLE) / n_src
      |                + CAST(cc AS DOUBLE) / n_total) / 2)), 6)
      |      ELSE 0.0 END
      |      + 0.5 * (CAST(cc AS DOUBLE) / n_total)
      |        * round(ln((CAST(cc AS DOUBLE) / n_total)
      |          / ((CAST(c AS DOUBLE) / n_src
      |              + CAST(cc AS DOUBLE) / n_total) / 2)), 6)
      |    ) * 1e9, 0) AS BIGINT) AS term_nano
      |  FROM grid)
      |SELECT source, n_src AS n_tokens,
      |  CAST(sum(hit) AS BIGINT) AS overlap_vocab,
      |  CAST(sum(term_nano) AS BIGINT) / 1e9 AS jsd_nats
      |FROM terms GROUP BY source, n_src
      |ORDER BY source""".stripMargin

  // -------------------------------------------------------- q_topic_keywords
  /** Per-source distinctive keywords: the top-5 tokens by frequency lift
    * (source rate ÷ corpus rate) at support ≥ 5 — the "what is this
    * source about" profiler a mixture designer reads next to
    * q_source_entropy's diversity numbers. Lift over TF-IDF here because
    * the corpus shares one small vocabulary: document frequency carries no
    * contrast, relative rates do.
    *
    * Scale shape: one corpus shuffle to (source, token) counts; source
    * totals and corpus token totals are vocab-bounded broadcasts; the
    * rank window runs over the O(sources × vocab) aggregate only. Lift is
    * an exact integer cross-product ratio — one double division, rounded
    * once. */
  def qTopicKeywords(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sc = Tables.documents(s, dir)
      .select(col("source"), explode(TextOps.words(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c_src"))
    val srcTot = sc.groupBy(col("source")).agg(sum(col("c_src")).as("n_src"))
    val corpTok = sc.groupBy(col("tok")).agg(sum(col("c_src")).as("c_all"))
    val corpTot = sc.agg(sum(col("c_src")).as("n_all"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("lift").desc, col("tok"))
    sc.filter(col("c_src") >= 5)
      .join(broadcast(srcTot), Seq("source"))
      .join(broadcast(corpTok), Seq("tok"))
      .crossJoin(broadcast(corpTot))
      .withColumn("lift",
        // both products in DOUBLE: corpus-scale token counts overflow a
        // BIGINT product; the engines multiply the same exact doubles
        round((col("c_src").cast("double") * col("n_all").cast("double"))
          / (col("n_src").cast("double") * col("c_all").cast("double")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("source"), col("rank"), col("tok"), col("c_src"),
        col("lift"))
      .orderBy(col("source"), col("rank"))
  }

  private val qTopicKeywordsSql =
    """WITH sc AS (
      |  SELECT source, tok, count(*) AS c_src
      |  FROM (SELECT source,
      |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2),
      |st AS (SELECT source, CAST(sum(c_src) AS BIGINT) AS n_src
      |       FROM sc GROUP BY source),
      |ct AS (SELECT tok, CAST(sum(c_src) AS BIGINT) AS c_all
      |       FROM sc GROUP BY tok),
      |nt AS (SELECT CAST(sum(c_src) AS BIGINT) AS n_all FROM sc),
      |scored AS (
      |  SELECT sc.source, sc.tok, sc.c_src,
      |    round((CAST(sc.c_src AS DOUBLE) * CAST(nt.n_all AS DOUBLE))
      |      / (CAST(st.n_src AS DOUBLE) * CAST(ct.c_all AS DOUBLE)), 6)
      |      AS lift
      |  FROM sc
      |  JOIN st USING (source)
      |  JOIN ct USING (tok)
      |  CROSS JOIN nt
      |  WHERE sc.c_src >= 5),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY source
      |    ORDER BY lift DESC, tok) AS INT) AS rank
      |  FROM scored)
      |SELECT source, rank, tok, c_src, lift
      |FROM ranked WHERE rank <= 5
      |ORDER BY source, rank""".stripMargin

  // ------------------------------------------------------------------ q_zipf
  /** Zipf's-law audit of the corpus token distribution: global frequencies
    * ranked descending, with the rank×frequency product that the law
    * predicts is ~constant — the one-glance sanity check that a corpus'
    * token distribution is natural-language-shaped (a bot-generated or
    * template corpus shows a flat head or a truncated tail). Everything is
    * exact integers (counts, ranks, products): no log-log fit, no float
    * accumulation, bit-identical on both engines by construction.
    *
    * Scale shape: explode → ONE map-side-combined count per token (vocab-
    * bounded shuffle), rank window over the VOCAB aggregate. The
    * rank-1-frequency join-back is a broadcast of one row. */
  def qZipf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = Tables.documents(s, dir)
      .select(explode(toks(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val ranked = freq.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("tok"))).cast("long"))
    ranked
      .withColumn("top_freq", max(col("freq")).over(Window.partitionBy()))
      .select(col("rank"), col("tok"), col("freq"),
        (col("rank") * col("freq")).as("rank_x_freq"),
        expr("(100 * freq) div top_freq").as("pct_of_top"))
      .orderBy(col("rank"))
      .limit(40)
  }

  private val qZipfSql =
    """WITH t AS (
      |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |  FROM documents),
      |f AS (
      |  SELECT tok, count(*) AS freq FROM t WHERE tok <> '' GROUP BY tok),
      |r AS (
      |  SELECT tok, freq,
      |    CAST(row_number() OVER (ORDER BY freq DESC, tok) AS BIGINT) AS rank,
      |    max(freq) OVER () AS top_freq
      |  FROM f)
      |SELECT rank, tok, freq, rank * freq AS rank_x_freq,
      |  (100 * freq) // top_freq AS pct_of_top
      |FROM r ORDER BY rank LIMIT 40""".stripMargin

  // ---------------------------------------------------------- q_tfidf_cosine
  /** TF-IDF cosine retrieval: the 20 documents most similar to doc 0 under
    * sparse tf-idf vectors, scored through a POSTING-LIST join — the
    * weighted-vector retrieval that completes the similarity triad (sets →
    * q_jaccard_pairs, dense vectors → q_embed_topk, weighted sparse →
    * here). Weights are BM25-style fixed-point: idf = round(ln(N/df), 6)
    * snapped to a 10⁻⁶ grid, w = tf·idf·10⁶ as an exact long, so every
    * dot/norm sum is an exact 128-bit integer aggregation (the established
    * order-independence trick from q_bm25) and the cosine is one double
    * division at the end.
    *
    * Scale shape: postings build in one explode+count pass; per-doc norms
    * in one more vocab-bounded aggregation; the query vector is a
    * broadcast of O(|query doc| tokens) rows, so scoring is a map-side
    * hash join over the postings — no all-pairs, no fact-sized shuffle
    * beyond the tf build. This is the 100 TB retrieval shape: index once,
    * score by posting intersection. */
  def qTfidfCosine(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val tf = docs.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf6",
        (round(log(col("n_docs").cast("double") / col("df").cast("double")), 6) * 1e6)
          .cast("long"))
    val w = tf.join(broadcast(df.select(col("tok"), col("idf6"))), "tok")
      .select(col("doc_id"), col("tok"),
        (col("tf") * col("idf6")).cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("w"))
    val norms = w.groupBy(col("doc_id"))
      .agg(sum(col("w") * col("w")).cast("double").as("nrm2"))
    val qv = w.filter(col("doc_id") === 0L)
      .select(col("tok"), col("w").as("wq"))
    val qn = norms.filter(col("doc_id") === 0L).select(col("nrm2").as("qn2"))
    w.filter(col("doc_id") =!= 0L)
      .join(broadcast(qv), "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("w") * col("wq")).cast("double").as("dot"),
        count(lit(1)).as("n_shared"))
      .join(norms, "doc_id")
      .crossJoin(broadcast(qn))
      .select(col("doc_id"), col("n_shared"),
        round(col("dot") / (sqrt(col("nrm2")) * sqrt(col("qn2"))), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("doc_id"))
      .limit(20)
  }

  private val qTfidfCosineSql =
    """WITH d AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, tok, count(*) AS tf FROM d WHERE tok <> ''
      |  GROUP BY doc_id, tok),
      |nd AS (SELECT count(*) AS n_docs FROM documents),
      |idf AS (
      |  SELECT tok,
      |    CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6)
      |      * 1e6 AS BIGINT) AS idf6
      |  FROM tf CROSS JOIN nd GROUP BY tok, n_docs),
      |w AS (
      |  SELECT doc_id, tok, CAST(tf * idf6 AS HUGEINT) AS w
      |  FROM tf JOIN idf USING (tok)),
      |norms AS (
      |  SELECT doc_id, CAST(sum(w * w) AS DOUBLE) AS nrm2 FROM w GROUP BY doc_id),
      |qv AS (SELECT tok, w AS wq FROM w WHERE doc_id = 0),
      |qn AS (SELECT nrm2 AS qn2 FROM norms WHERE doc_id = 0),
      |sc AS (
      |  SELECT w.doc_id, CAST(sum(w.w * q.wq) AS DOUBLE) AS dot,
      |    count(*) AS n_shared
      |  FROM w JOIN qv q USING (tok) WHERE w.doc_id <> 0
      |  GROUP BY w.doc_id)
      |SELECT s.doc_id, s.n_shared,
      |  round(s.dot / (sqrt(n.nrm2) * sqrt(qn.qn2)), 4) AS cos_sim
      |FROM sc s JOIN norms n USING (doc_id) CROSS JOIN qn
      |ORDER BY cos_sim DESC, doc_id LIMIT 20""".stripMargin

  // ------------------------------------------------------------ q_prf_expand
  /** Pseudo-relevance-feedback query expansion (Rocchio-style): run the
    * seed query, take the top-10 matching docs as presumed-relevant
    * feedback, and surface the 5 terms that are common in the feedback set
    * but rare in the corpus — weight = (fb_df/10)·ln(N/df), the idf-damped
    * feedback frequency. The retrieval-side companion to [[qBm25]]: BM25
    * scores a fixed query, this grows the query.
    *
    * Scale shape: the feedback set is a TakeOrderedAndProject top-10
    * (never a full sort), broadcast into the term scan; candidate terms
    * are distinct (doc, term) pairs of TEN docs — tiny; the corpus df
    * aggregate is the one fact-sized shuffle and is map-side combinable.
    * Stopword/shape filters prune the candidate space before any join. */
  def qPrfExpand(s: SparkSession, dir: String): DataFrame = {
    val q0 = Seq("vector", "hash")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), toks(col("text")).as("w"))
    val tok = docs.select(col("doc_id"), explode(col("w")).as("tok"))
    val fb = tok.filter(col("tok").isin(q0: _*))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("q_tf"))
      .orderBy(col("q_tf").desc, col("doc_id")).limit(10)
      .select(col("doc_id"))
    val fbTerms = tok.join(broadcast(fb), "doc_id")
      .filter(!col("tok").isin((q0 ++ enStops ++ frStops ++ esStops): _*))
      .filter(length(col("tok")) >= 3 && col("tok").rlike("^[a-z]+$"))
      .distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("fb_df"))
    val corpusDf = tok.select(col("doc_id"), col("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("corpus_df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    fbTerms.join(corpusDf, "tok").crossJoin(broadcast(nDocs))
      .withColumn("weight",
        round((col("fb_df") / lit(10.0)) *
          log(col("n_docs").cast("double") / col("corpus_df")), 4))
      .select(col("tok").as("term"), col("fb_df"), col("corpus_df"),
        col("weight"))
      .orderBy(col("weight").desc, col("term")).limit(5)
  }

  private val qPrfExpandSql =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(w) AS tok FROM d),
       |fb AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, count(*) AS q_tf FROM tok
       |    WHERE tok IN ('vector', 'hash') GROUP BY 1)
       |  ORDER BY q_tf DESC, doc_id LIMIT 10),
       |fbt AS (
       |  SELECT tok, count(*) AS fb_df FROM (
       |    SELECT DISTINCT t.doc_id, t.tok
       |    FROM tok t JOIN fb USING (doc_id)
       |    WHERE t.tok NOT IN ${inList(Seq("vector", "hash") ++ enStops ++ frStops ++ esStops)}
       |      AND len(t.tok) >= 3 AND regexp_full_match(t.tok, '[a-z]+'))
       |  GROUP BY tok),
       |cdf AS (
       |  SELECT tok, count(*) AS corpus_df FROM (
       |    SELECT DISTINCT doc_id, tok FROM tok) GROUP BY tok),
       |n AS (SELECT count(*) AS n_docs FROM d)
       |SELECT f.tok AS term, f.fb_df, c.corpus_df,
       |  round((f.fb_df / 10.0) *
       |    ln(CAST(n_docs AS DOUBLE) / c.corpus_df), 4) AS weight
       |FROM fbt f JOIN cdf c USING (tok) CROSS JOIN n
       |ORDER BY weight DESC, term LIMIT 5""".stripMargin

  // -------------------------------------------------------------- q_powerlaw
  /** Power-law exponent of the token frequency distribution: least-squares
    * slope of ln(freq) on ln(rank) over the top-100 ranks — the one-number
    * completion of [[qZipf]]'s rank×freq table (Zipf predicts slope ≈ −1).
    * ln terms are nano-scaled to exact longs before summing (the
    * q_source_entropy order-independence trick), so the five regression
    * sums are exact integers and the closed form is one double expression.
    * Rank window runs over the vocab-bounded aggregate. */
  def qPowerlaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val freq = Tables.documents(s, dir)
      .select(explode(toks(col("text"))).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(
        Window.orderBy($"freq".desc, $"tok")))
      .filter($"rank" <= 100)
      .select(
        round(log($"rank".cast("double")) * 1e9, 0).cast("long").as("lx"),
        round(log($"freq".cast("double")) * 1e9, 0).cast("long").as("ly"))
    freq
      .agg(count(lit(1)).cast("double").as("n"),
        sum($"lx".cast(DecimalType38)).cast("double").as("sx"),
        sum($"ly".cast(DecimalType38)).cast("double").as("sy"),
        sum(($"lx".cast(DecimalType38) * $"lx")).cast("double").as("sxx"),
        sum(($"lx".cast(DecimalType38) * $"ly")).cast("double").as("sxy"))
      .select($"n".cast("long").as("n_ranks"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx"), 6).as("zipf_slope"))
  }

  private val qPowerlawSql =
    """WITH freq AS (
      |  SELECT tok, count(*) AS freq
      |  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
      |          AS tok
      |        FROM documents)
      |  GROUP BY tok),
      |ranked AS (
      |  SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1e9, 0) AS BIGINT)
      |           AS lx,
      |         CAST(round(ln(CAST(freq AS DOUBLE)) * 1e9, 0) AS BIGINT)
      |           AS ly
      |  FROM (SELECT freq,
      |          row_number() OVER (ORDER BY freq DESC, tok) AS rank
      |        FROM freq)
      |  WHERE rank <= 100),
      |g AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(lx AS HUGEINT)) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(ly AS HUGEINT)) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(lx AS HUGEINT) * lx) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(lx AS HUGEINT) * ly) AS DOUBLE) AS sxy
      |  FROM ranked)
      |SELECT CAST(n AS BIGINT) AS n_ranks,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
      |FROM g""".stripMargin

  private val DecimalType38 = org.apache.spark.sql.types.DecimalType(38, 0)

  // ----------------------------------------------------------- q_naive_bayes
  /** Multinomial naive-Bayes language classification, trained and
    * evaluated inside the engine: even doc_ids train per-language
    * Laplace-smoothed word log-probabilities, odd doc_ids are scored by
    * summing their token counts against each class's table, and the
    * output is the per-language confusion matrix — the from-scratch
    * text classifier every curation stack keeps next to its heuristic
    * [[qLangId]]. (On this synthetic corpus the shared template
    * vocabulary caps accuracy at ~0.37 vs a 0.2 uniform baseline, with
    * the majority-class prior visibly pulling predictions toward 'en' —
    * exactly the diagnostic a confusion matrix exists to show.)
    *
    * Engine parity (the BM25/source-entropy ln discipline): each
    * log-probability is ln of an exact rational, rounded to 6 dp at the
    * ONE transcendental step, micro-scaled to a BIGINT; per-doc scores
    * are exact integer sums of count×logprob, and the argmax breaks
    * ties on (score DESC, lang ASC) — total.
    *
    * Scale shape: training is one (lang, token) map-side-combinable
    * aggregate (O(classes × vocab)); scoring joins the per-doc token
    * counts against the BROADCAST model (classes × vocab is
    * dim-sized); the confusion rollup is O(classes²). At 100 TB the
    * model table stays small — the fact-sized work is two token
    * aggregations. */
  def qNaiveBayes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toksOf = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(TextOps.words(col("text"))).as("tok"))
    val train = toksOf.filter(col("doc_id") % 2 === 0)
    val test = toksOf.filter(col("doc_id") % 2 =!= 0)
    val vocab = train.agg(countDistinct($"tok").as("v"))
    val cls = train.groupBy($"lang")
      .agg(count(lit(1)).as("total_c"),
        countDistinct($"doc_id").as("n_docs_c"))
      .crossJoin(broadcast(train.agg(
        countDistinct($"doc_id").as("n_docs"))))
      .crossJoin(broadcast(vocab))
      .select($"lang", $"total_c", $"v",
        expr("cast(round(round(ln(cast(n_docs_c as double)" +
          " / cast(n_docs as double)), 6) * 1e6, 0) as bigint)")
          .as("prior_micro"),
        expr("cast(round(round(ln(1.0 / cast(total_c + v as double)), 6)" +
          " * 1e6, 0) as bigint)").as("unseen_micro"))
    val lp = train.groupBy($"lang", $"tok").agg(count(lit(1)).as("cnt"))
      .join(cls.select($"lang", $"total_c", $"v"), Seq("lang"))
      .select($"lang", $"tok",
        expr("cast(round(round(ln(cast(cnt + 1 as double)" +
          " / cast(total_c + v as double)), 6) * 1e6, 0) as bigint)")
          .as("lp_micro"))
    val docToks = test.groupBy($"doc_id", $"lang".as("lang_true"), $"tok")
      .agg(count(lit(1)).as("cnt"))
    val scored = docToks
      .crossJoin(broadcast(cls.select($"lang".as("cand"), $"unseen_micro",
        $"prior_micro")))
      .join(broadcast(lp.withColumnRenamed("lang", "cand")),
        Seq("cand", "tok"), "left")
      .groupBy($"doc_id", $"lang_true", $"cand")
      .agg((sum($"cnt" * coalesce($"lp_micro", $"unseen_micro"))
        + max($"prior_micro")).as("score"))
    val pred = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"score".desc, $"cand")))
      .filter($"rk" === 1)
    pred.groupBy($"lang_true", $"cand".as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang_true", $"lang_pred")
  }

  private val qNaiveBayesSql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |  FROM documents),
      |train AS (SELECT * FROM t WHERE doc_id % 2 = 0),
      |test AS (SELECT * FROM t WHERE doc_id % 2 <> 0),
      |v AS (SELECT count(DISTINCT tok) AS v FROM train),
      |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM train),
      |cls AS (
      |  SELECT lang, count(*) AS total_c,
      |    CAST(round(round(ln(CAST(count(DISTINCT doc_id) AS DOUBLE)
      |      / CAST(n_docs AS DOUBLE)), 6) * 1e6, 0) AS BIGINT)
      |      AS prior_micro,
      |    CAST(round(round(ln(1.0 / CAST(count(*) + v AS DOUBLE)), 6)
      |      * 1e6, 0) AS BIGINT) AS unseen_micro,
      |    v
      |  FROM train, v, nd GROUP BY lang, v, n_docs),
      |lp AS (
      |  SELECT w.lang, w.tok,
      |    CAST(round(round(ln(CAST(w.cnt + 1 AS DOUBLE)
      |      / CAST(c.total_c + c.v AS DOUBLE)), 6) * 1e6, 0) AS BIGINT)
      |      AS lp_micro
      |  FROM (SELECT lang, tok, count(*) AS cnt
      |        FROM train GROUP BY 1, 2) w
      |  JOIN cls c USING (lang)),
      |dt AS (
      |  SELECT doc_id, lang AS lang_true, tok, count(*) AS cnt
      |  FROM test GROUP BY 1, 2, 3),
      |scored AS (
      |  SELECT dt.doc_id, dt.lang_true, c.lang AS cand,
      |    CAST(sum(dt.cnt * coalesce(lp.lp_micro, c.unseen_micro))
      |      + max(c.prior_micro) AS BIGINT) AS score
      |  FROM dt
      |  CROSS JOIN cls c
      |  LEFT JOIN lp ON lp.lang = c.lang AND lp.tok = dt.tok
      |  GROUP BY 1, 2, 3),
      |pred AS (
      |  SELECT lang_true, cand AS lang_pred
      |  FROM (SELECT lang_true, cand,
      |          row_number() OVER (PARTITION BY doc_id
      |            ORDER BY score DESC, cand) AS rk
      |        FROM scored)
      |  WHERE rk = 1)
      |SELECT lang_true, lang_pred, count(*) AS n_docs
      |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_naive_bayes"   -> (qNaiveBayes _),
    "q_powerlaw"     -> (qPowerlaw _),
    "q_prf_expand"   -> (qPrfExpand _),
    "q_zipf"          -> (qZipf _),
    "q_tfidf_cosine"  -> (qTfidfCosine _),
    "q_topic_keywords" -> (qTopicKeywords _),
    "q_posting_cost"   -> (qPostingCost _),
    "q_source_entropy" -> (qSourceEntropy _),
    "q_js_divergence" -> (qJsDivergence _),
    "q_colloc_lift"    -> (qCollocLift _),
    "q_inverted_index" -> (qInvertedIndex _),
    "q_bpe_step"    -> (qBpeStep _),
    "q_bpe_train"   -> (qBpeTrain _),
    "q_bpe_encode"  -> (qBpeEncode _),
    "q_lm_score"    -> (qLmScore _),
    "q_text_stats"    -> (qTextStats _),
    "q_lang_id"       -> (qLangId _),
    "q_quality_score" -> (qQualityScore _),
    "q_token_count"   -> (qTokenCount _),
    "q_fertility"     -> (qFertility _),
    "q_fingerprint"   -> (qFingerprint _),
    "q_ngram_next"    -> (qNgramNext _),
    "q_bm25"          -> (qBm25 _))

  val oracle: Map[String, String] = Map(
    "q_naive_bayes"   -> qNaiveBayesSql,
    "q_powerlaw"     -> qPowerlawSql,
    "q_prf_expand"   -> qPrfExpandSql,
    "q_zipf"          -> qZipfSql,
    "q_tfidf_cosine"  -> qTfidfCosineSql,
    "q_topic_keywords" -> qTopicKeywordsSql,
    "q_posting_cost"   -> qPostingCostSql,
    "q_source_entropy" -> qSourceEntropySql,
    "q_js_divergence" -> qJsDivergenceSql,
    "q_colloc_lift"    -> qCollocLiftSql,
    "q_inverted_index" -> qInvertedIndexSql,
    "q_bpe_step"    -> qBpeStepSql,
    "q_bpe_train"   -> qBpeTrainSql,
    "q_bpe_encode"  -> qBpeEncodeSql,
    "q_lm_score"    -> qLmScoreSql,
    "q_text_stats"    -> qTextStatsSql,
    "q_lang_id"       -> qLangIdSql,
    "q_quality_score" -> qQualityScoreSql,
    "q_token_count"   -> qTokenCountSql,
    "q_fertility"     -> qFertilitySql,
    "q_fingerprint"   -> qFingerprintSql,
    "q_ngram_next"    -> qNgramNextSql,
    "q_bm25"          -> qBm25Sql)
}
