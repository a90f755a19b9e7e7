package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Document-deduplication operators for LLM training-data pipelines:
  * exact-dup (hash groupBy), MinHash + LSH banding, SimHash, and exact
  * n-gram Jaccard verification over LSH candidates.
  *
  * The reference warehouse has plain `DISTINCT` dedup only
  * (/root/reference/02_Extract_and_transform_raw_data/ET_combined.py:118-132);
  * these operators extend it to the near-duplicate regime a 100 TB web-scale
  * corpus needs. Scale design, every query:
  *   - candidate generation is ALWAYS bucketed (md5 text-hash, LSH band
  *     signature) and pair enumeration happens inside buckets only — there is
  *     no crossJoin / all-pairs step anywhere;
  *   - every hash is md5 (hex string), so results are engine-portable and
  *     the DuckDB oracle computes the identical algebra;
  *   - minhash aggregation is a single map-side-combinable groupBy (12 `min`
  *     aggs over the exploded shingle stream) — one shuffle per corpus pass;
  *   - the index tables (buckets, simhash signatures, shingle posting list)
  *     are MATERIALIZED once per corpus ([[Index]]) and the verify queries
  *     read the stored parquet — the derivation subtree appears once in the
  *     whole pipeline, not once per join side.
  *
  * At 100 TB: the shingle explosion is ~50-100× row amplification but carries
  * only (doc_id, shingle-hash); partial min() collapses it map-side, so the
  * shuffle moves ~n_docs × 12 hashes. Band width r=3 / 12 hashes targets
  * Jaccard ≳ 0.7 candidates (P(candidate) = 1-(1-J^3)^4); production tunes
  * (bands, r) per corpus without changing the plan shape.
  */
object TextDedup {
  private val NumHashes = 12
  private val BandRows  = 3
  private val NumBands  = NumHashes / BandRows // 4

  /** Tokenization + shingling shared with CorpusQuality — single source of
    * truth in [[TextOps]] so the quality scores and the dedup shingles can
    * never silently desynchronize. */
  private def words(text: Column): Column = TextOps.words(text)

  private def shingleRows(docs: DataFrame): DataFrame =
    TextOps.shingleRows(docs)

  private val shingleSqlCte = TextOps.shingleSql("aug", "sh")

  /** Near-dup test corpus: documents ∪ perturbed copies (first word dropped,
    * doc_id+10000) of every 25th doc. The synthetic corpus has no natural
    * near-dups, so the fixture manufactures ground truth the same way on
    * both engines. */
  private def augmented(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))

  private val augmentedSqlCte =
    """aug AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000 AS doc_id,
      |    regexp_replace(text, '^\S+\s+', '') AS text
      |  FROM documents WHERE doc_id % 25 = 0)""".stripMargin

  /** Per-doc minhash signature columns mh0..mh11 over the shingle stream.
    * The 12 permutation hashes are disjoint 8-hex (32-bit) windows of 3
    * seeded md5 digests — 3 md5 invocations per shingle instead of 12, and
    * 8-char instead of 32-char min-agg state (4× less partial-agg traffic;
    * locally timing-neutral, the explode+shuffle dominates at this SF).
    * min() is duplicate-insensitive, so no
    * distinct needed pre-agg; partial aggregation collapses the explosion
    * map-side. */
  private def minhashes(sh: DataFrame): DataFrame = {
    val digest = concat(
      md5(col("shingle")),
      md5(concat(lit("1:"), col("shingle"))),
      md5(concat(lit("2:"), col("shingle"))))
    val withDigest = sh.withColumn("digest", digest)
    val aggs = (0 until NumHashes).map(k =>
      min(substring(col("digest"), 8 * k + 1, 8)).as(s"mh$k"))
    withDigest.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  private val minhashSqlCte = {
    val mins = (0 until NumHashes)
      .map(k => s"    min(substr(digest, ${8 * k + 1}, 8)) AS mh$k")
      .mkString(",\n")
    s"""mh AS (
       |  SELECT doc_id,
       |$mins
       |  FROM (SELECT doc_id,
       |          md5(shingle) || md5('1:' || shingle) || md5('2:' || shingle)
       |            AS digest
       |        FROM sh)
       |  GROUP BY doc_id)""".stripMargin
  }

  /** LSH band signatures: (doc_id, band_id, band_sig) — md5 over each band's
    * r=3 concatenated minhashes. Docs sharing any (band_id, band_sig) bucket
    * are near-dup candidates. */
  private def bandRows(mh: DataFrame): DataFrame = {
    val banded = (0 until NumBands).foldLeft(mh) { (df, b) =>
      val cols = (0 until BandRows).map(r => col(s"mh${b * BandRows + r}"))
      df.withColumn(s"band$b", md5(concat_ws("|", cols: _*)))
    }
    val stack = (0 until NumBands).map(b => s"$b, band$b").mkString(", ")
    banded.selectExpr("doc_id",
      s"stack($NumBands, $stack) AS (band_id, band_sig)")
  }

  private val bandSqlCte = {
    val arms = (0 until NumBands).map { b =>
      val cols = (0 until BandRows).map(r => s"mh${b * BandRows + r}")
      s"  SELECT doc_id, $b AS band_id, md5(concat_ws('|', ${cols.mkString(", ")})) AS band_sig FROM mh"
    }
    "bands AS (\n" + arms.mkString("\n  UNION ALL\n") + ")"
  }

  /** Build-once-read-many index tables — shared store in
    * [[graft.io.IndexStore]] (see its scaladoc for the lifetime/keying
    * rationale); this alias keeps the call sites short. */
  private def Index = graft.io.IndexStore

  /** Stored LSH bucket table over the augmented corpus. */
  private def augBuckets(s: SparkSession, dir: String): DataFrame =
    Index.materialized(s, dir, "buckets")(
      bandRows(minhashes(shingleRows(augmented(Tables.documents(s, dir))))))

  /** Stored distinct (doc_id, shingle) posting list over the augmented
    * corpus — the exact-Jaccard verify input. */
  private def augShingles(s: SparkSession, dir: String): DataFrame =
    Index.materialized(s, dir, "shingles")(
      shingleRows(augmented(Tables.documents(s, dir))).distinct())

  /** Stored simhash signature table over the augmented corpus. */
  private def augSimhash(s: SparkSession, dir: String): DataFrame =
    Index.materialized(s, dir, "simhash")(
      simhashOf(augmented(Tables.documents(s, dir))))

  /** Stored minhash signature table (mh0..mh11) over the augmented corpus. */
  private def augMinhash(s: SparkSession, dir: String): DataFrame =
    Index.materialized(s, dir, "minhash")(
      minhashes(shingleRows(augmented(Tables.documents(s, dir)))))

  /** LSH candidate pairs (a < b, distinct) — THE single definition used by
    * every verify-stage query (jaccard, fuzzy): docs sharing any band
    * bucket. Both self-join sides read the STORED bucket table, so the
    * minhash derivation appears nowhere in the verify plans. */
  private def candidatePairs(s: SparkSession, dir: String): DataFrame = {
    val buckets = augBuckets(s, dir)
    buckets.select(col("band_id"), col("band_sig"), col("doc_id").as("a"))
      .join(buckets.select(col("band_id"), col("band_sig"), col("doc_id").as("b")),
        Seq("band_id", "band_sig"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  private val candSqlCte =
    """cand AS (
      |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      |  FROM bands l JOIN bands r
      |    ON l.band_id = r.band_id AND l.band_sig = r.band_sig
      |  WHERE l.doc_id < r.doc_id)""".stripMargin

  /** 16-bit SimHash fingerprint per doc (see q_simhash scaladoc) — shared
    * by the fingerprint query and the fuzzy verify stage. */
  private def simhashOf(docs: DataFrame): DataFrame = {
    val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val toks = docs.select(col("doc_id"), explode(words(col("text"))).as("tok"))
    val sums = (0 until 16).map(b =>
      sum(when(substring(md5(col("tok")), b + 1, 1).isin(hexHigh: _*), 1)
        .otherwise(-1)).as(s"s$b"))
    toks.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SQL mirror of [[simhashOf]] over source table/CTE `src` — emits
    * toks/sums/sim CTE text (final CTE named `sim`). */
  private def simhashSqlCtes(src: String): String = {
    val sums = (0 until 16).map(b =>
      s"    sum(CASE WHEN substr(md5(tok), ${b + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n")
    val fp = (0 until 16)
      .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id,
       |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |  FROM $src),
       |sums AS (
       |  SELECT doc_id,
       |$sums
       |  FROM toks GROUP BY doc_id),
       |sim AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM sums)""".stripMargin
  }

  // ------------------------------------------------------------ q_exact_dup
  /** Exact dedup by normalized-text hash over a corpus with manufactured
    * exact copies: groups with >1 doc, keeper = min doc_id (the
    * ET_combined.py:118-132 keep-first policy, hash-partitioned instead of
    * pandas row order). One groupBy shuffle on the 32-hex hash — uniform
    * partitioning at any scale. */
  /** Dedup-debt growth curve: exact-duplicate rate per 100-doc ingestion
    * bucket, with the cumulative rate — "is the duplicate fraction of the
    * incoming stream rising as the corpus grows", the monitoring view a
    * curation pipeline alarms on (a rising curve means the crawl is
    * re-visiting, a flat one means dedup is keeping up). A doc is a dup
    * when an earlier doc (lower doc_id) carries the same normalized text
    * hash — the same [[graft.queries.TextOps.normTextHash]] key every
    * dedup stage shares.
    *
    * Engine parity: counts and ppm shares are exact integers. Scale
    * shape: one hash aggregate (first-seen per hash, map-side combined),
    * one keyed join back, a bucket rollup, and the cumulative sums ride
    * the banded prefix sum ([[graft.core.BandedRank.prefixSum]] — the
    * q_heaps_law shape; bucket count grows with the corpus, so no
    * single-partition window). */
  def qDedupRateCurve(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextOps.normTextHash(col("text")).as("h"))
    val firstSeen = docs.groupBy(col("h"))
      .agg(min(col("doc_id")).as("first_id"))
    val perBucket = docs.join(firstSeen, "h")
      .withColumn("bucket", expr("doc_id div 100"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("doc_id") =!= col("first_id"), lit(1))).as("n_dups"))
    graft.core.BandedRank
      .prefixSum(perBucket, "bucket", Seq.empty,
        Seq("n_docs" -> "cum_docs", "n_dups" -> "cum_dups"))
      .select(col("bucket"), col("n_docs"), col("n_dups"),
        expr("cast((cast(n_dups as decimal(38,0)) * 1000000)" +
          " div cast(n_docs as decimal(38,0)) as bigint)").as("dup_ppm"),
        expr("cast((cast(cum_dups as decimal(38,0)) * 1000000)" +
          " div cast(cum_docs as decimal(38,0)) as bigint)")
          .as("cum_dup_ppm"))
      .orderBy(col("bucket"))
  }

  private val qDedupRateCurveSql =
    s"""WITH docs AS (
       |  SELECT doc_id, ${TextOps.normTextHashSql("text")} AS h
       |  FROM documents),
       |first_seen AS (
       |  SELECT h, min(doc_id) AS first_id FROM docs GROUP BY 1),
       |per_bucket AS (
       |  SELECT doc_id // 100 AS bucket,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(count(*) FILTER (doc_id <> first_id) AS BIGINT) AS n_dups
       |  FROM docs JOIN first_seen USING (h)
       |  GROUP BY 1),
       |c AS (
       |  SELECT bucket, n_docs, n_dups,
       |    CAST(sum(n_docs) OVER (ORDER BY bucket
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
       |    CAST(sum(n_dups) OVER (ORDER BY bucket
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_dups
       |  FROM per_bucket)
       |SELECT bucket, n_docs, n_dups,
       |  CAST((CAST(n_dups AS HUGEINT) * 1000000)
       |    // CAST(n_docs AS HUGEINT) AS BIGINT) AS dup_ppm,
       |  CAST((CAST(cum_dups AS HUGEINT) * 1000000)
       |    // CAST(cum_docs AS HUGEINT) AS BIGINT) AS cum_dup_ppm
       |FROM c ORDER BY bucket""".stripMargin

  def qExactDup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    corpus
      .withColumn("text_hash", TextOps.normTextHash(col("text")))
      .groupBy(col("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_docs") > 1)
      .orderBy(col("text_hash"))
  }

  private val qExactDupSql =
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 10 = 0)
      |SELECT ${TextOps.normTextHashSql("text")} AS text_hash,
      |  count(*) AS n_docs, min(doc_id) AS keep_id
      |FROM corpus
      |GROUP BY 1 HAVING count(*) > 1
      |ORDER BY text_hash""".stripMargin

  // ------------------------------------------------------- q_span_dedup
  /** Window width (tokens) for cross-document span detection. */
  private val SpanW = 8

  /** Cross-document repeated-SPAN detection — the substring-level member of
    * the dedup family (whole-doc: q_exact_dup; set-level: minhash/jaccard).
    * Training corpora carry boilerplate sentences repeated VERBATIM across
    * otherwise-distinct documents (licenses, navigation chrome, templated
    * intros); span-level dedup finds and quantifies them where doc-level
    * hashing cannot. For every SpanW-token window of every doc, the span's
    * identity is the md5 of its joined tokens; spans seen in ≥2 distinct
    * docs are flagged, and each affected doc reports how much of it is
    * duplicated material.
    *
    * Scale shape: the span hash is computed INSIDE the row (one `transform`
    * over the token array), so the exploded stream is narrow (doc_id, hash)
    * pairs — O(total_tokens) rows of 16-byte keys, never the W-token text.
    * Flagging is one map-side-combinable aggregate on the hash; the
    * flag-back join is keyed on the same hash (single shuffle, uniform —
    * md5 keys cannot skew). The suffix-array alternative finds maximal
    * repeats but needs a global sort of every suffix; fixed-W rolling
    * windows are the shape that parallelizes. */
  def qSpanDedup(s: SparkSession, dir: String): DataFrame = {
    val spans = Tables.documents(s, dir)
      .select(col("doc_id"), TextOps.words(col("text")).as("w"))
      .filter(size(col("w")) >= SpanW)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(w) - $SpanW), " +
          s"i -> md5(concat_ws(' ', slice(w, i + 1, $SpanW))))")).as("h"))
    // One (h, doc_id) pre-aggregate feeds every consumer (r14 optimization
    // round, guide §2.4 "establish the partitioning once"): previously the
    // flagged/per-doc/dup branches each re-ran the scan + per-window md5
    // transform into their own exchange; now the heavy map side runs once,
    // the three aggregates are small regroups of `g`, and Spark reuses the
    // single exchange (ReusedExchange) across the branches. Identities:
    // countDistinct(doc_id) per h = count(*) over g; span counts = Σ c.
    val g = spans.groupBy(col("h"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val flagged = g.groupBy(col("h"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val perDoc = g.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_spans"))
    val dup = g.join(flagged, Seq("h"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("dup_spans"))
    perDoc.join(dup, Seq("doc_id"))
      .select(col("doc_id"), col("n_spans"), col("dup_spans"),
        round(col("dup_spans").cast("double") / col("n_spans"), 4)
          .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  private[queries] val qSpanDedupSql =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |  FROM documents),
       |sp AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(0, greatest(len(w) - $SpanW + 1, 0)),
       |      i -> md5(array_to_string(w[i + 1 : i + $SpanW], ' ')))) AS h
       |  FROM d),
       |flagged AS (
       |  SELECT h FROM sp GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |per_doc AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY doc_id),
       |dup AS (
       |  SELECT doc_id, count(*) AS dup_spans
       |  FROM sp JOIN flagged USING (h) GROUP BY doc_id)
       |SELECT doc_id, n_spans, dup_spans,
       |  round(CAST(dup_spans AS DOUBLE) / n_spans, 4) AS dup_frac
       |FROM per_doc JOIN dup USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- q_minhash_bucket
  /** The LSH bucket table over the raw corpus: every doc's 4 band signatures.
    * This is the distributable index a 100 TB dedup shuffles on — downstream
    * joins key on (band_id, band_sig), never on document pairs. */
  def qMinhashBucket(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    bandRows(minhashes(shingleRows(docs)))
      .orderBy(col("doc_id"), col("band_id"))
  }

  private val qMinhashBucketSql =
    s"""WITH aug AS (SELECT doc_id, text FROM documents),
       |$shingleSqlCte,
       |$minhashSqlCte,
       |$bandSqlCte
       |SELECT doc_id, band_id, band_sig FROM bands
       |ORDER BY doc_id, band_id""".stripMargin

  // -------------------------------------------------------- q_minhash_pairs
  /** Full MinHash-LSH near-dup pipeline on the augmented corpus: shingle →
    * minhash → band → bucket self-join → distinct candidate pairs (a < b).
    * The join is keyed on (band_id, band_sig): pair enumeration cost is
    * Σ bucket² over near-identical docs only, not corpus². */
  def qMinhashPairs(s: SparkSession, dir: String): DataFrame =
    candidatePairs(s, dir).orderBy(col("a"), col("b"))

  private val qMinhashPairsSql =
    s"""WITH $augmentedSqlCte,
       |$shingleSqlCte,
       |$minhashSqlCte,
       |$bandSqlCte,
       |$candSqlCte
       |SELECT a, b FROM cand
       |ORDER BY a, b""".stripMargin

  // -------------------------------------------------------- q_jaccard_pairs
  /** Exact 3-gram Jaccard verification of the LSH candidates (the
    * verify-within-bucket stage): |A∩B| via a shingle equi-join restricted to
    * candidate pairs, |A∪B| = |A|+|B|−|A∩B|. Cost is candidates × shingles,
    * never corpus². DuckDB `/` on integers is float division, matching
    * Spark's long/long → double. */
  def qJaccardPairs(s: SparkSession, dir: String): DataFrame =
    jaccardScored(s, dir).orderBy(col("a"), col("b"))

  /** Shared pair-scoring core: every LSH candidate pair with its exact
    * shingle-intersection count and both set sizes —
    * (a, b, n_inter, sz_a, sz_b). The jaccard and containment verifies are
    * different projections of THIS one computation. */
  private def pairScores(s: SparkSession, dir: String): DataFrame = {
    val sh = augShingles(s, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val cand = candidatePairs(s, dir)
    val inter = cand
      .join(sh.select(col("doc_id").as("a"), col("shingle")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("b", "shingle"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_inter"))
    cand
      .join(inter, Seq("a", "b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sz_a")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("sz_b")), Seq("b"))
  }

  /** Candidate pairs with exact Jaccard — shared by the pair query and the
    * cluster-resolution stage. */
  private def jaccardScored(s: SparkSession, dir: String): DataFrame =
    pairScores(s, dir)
      .select(col("a"), col("b"), col("n_inter"),
        (col("sz_a") + col("sz_b") - col("n_inter")).as("n_union"),
        round(col("n_inter") / (col("sz_a") + col("sz_b") - col("n_inter")), 6)
          .as("jaccard"))

  /** CTE chain ending in `jac(a, b, n_inter, n_union, jaccard)` — the SQL
    * mirror of [[jaccardScored]], shared by the pair and cluster oracles. */
  private val jacSqlCtes =
    s"""$augmentedSqlCte,
       |$shingleSqlCte,
       |$minhashSqlCte,
       |$bandSqlCte,
       |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
       |$candSqlCte,
       |inter AS (
       |  SELECT c.a, c.b, count(*) AS n_inter
       |  FROM cand c
       |  JOIN shd sa ON sa.doc_id = c.a
       |  JOIN shd sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
       |  GROUP BY c.a, c.b),
       |jac AS (
       |  SELECT c.a, c.b, COALESCE(i.n_inter, 0) AS n_inter,
       |    za.sz + zb.sz - COALESCE(i.n_inter, 0) AS n_union,
       |    round(COALESCE(i.n_inter, 0) / (za.sz + zb.sz - COALESCE(i.n_inter, 0)), 6)
       |      AS jaccard
       |  FROM cand c
       |  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
       |  JOIN sizes za ON za.doc_id = c.a
       |  JOIN sizes zb ON zb.doc_id = c.b)""".stripMargin

  private val qJaccardPairsSql =
    s"""WITH $jacSqlCtes
       |SELECT a, b, n_inter, n_union, jaccard FROM jac
       |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------ q_dedup_clusters
  /** Near-duplicate threshold for an edge in the dedup graph. */
  private val ClusterJaccard = 0.6

  /** Cluster resolution — the stage that turns verified pairs into
    * droppable duplicates: connected components over the jaccard ≥ 0.6
    * edge set, each doc labeled with its component's min doc_id (the
    * canonical representative, same keep-min policy as q_exact_dup).
    *
    * Algorithm: [[Graph.minLabelComponents]] — iterative min-label
    * propagation to a fixpoint over the pre-mirrored edge set (one loop
    * shared with the co-order graph's q_components; near-dup clusters are
    * shallow, so 2-3 rounds in practice). */
  def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    val edges = jaccardScored(s, dir)
      .filter(col("jaccard") >= ClusterJaccard).select(col("a"), col("b"))
    val bidir = edges
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    Graph.minLabelComponents(bidir)
      .select(col("node").as("doc_id"), col("label").as("cluster_rep"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: min reachable doc_id per node via a recursive walk over the
    * mirrored edge set — for an undirected graph, min-reachable = the
    * component minimum, exactly the fixpoint of min-label propagation. */
  private val qDedupClustersSql =
    s"""WITH RECURSIVE $jacSqlCtes,
       |edges AS (
       |  SELECT a, b FROM jac WHERE jaccard >= $ClusterJaccard
       |  UNION ALL
       |  SELECT b AS a, a AS b FROM jac WHERE jaccard >= $ClusterJaccard),
       |walk(node, label) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node)
       |SELECT node AS doc_id, min(label) AS cluster_rep
       |FROM walk GROUP BY node ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------- q_dedup_corpus
  /** The payoff of the whole pipeline: the deduplicated corpus. Every doc
    * whose cluster representative is some OTHER doc is dropped (left-anti
    * join against the cluster losers); representatives and docs in no
    * cluster survive. Emits (doc_id, text_md5) so the row is hashable and
    * the oracle can confirm the exact surviving set. */
  def qDedupCorpus(s: SparkSession, dir: String): DataFrame = {
    val losers = qDedupClusters(s, dir)
      .filter(col("cluster_rep") =!= col("doc_id")).select(col("doc_id"))
    augmented(Tables.documents(s, dir))
      .join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  private val qDedupCorpusSql =
    s"""WITH RECURSIVE $jacSqlCtes,
       |edges AS (
       |  SELECT a, b FROM jac WHERE jaccard >= $ClusterJaccard
       |  UNION ALL
       |  SELECT b AS a, a AS b FROM jac WHERE jaccard >= $ClusterJaccard),
       |walk(node, label) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node),
       |losers AS (
       |  SELECT node AS doc_id FROM walk
       |  GROUP BY node HAVING min(label) <> node)
       |SELECT g.doc_id, md5(g.text) AS text_md5
       |FROM aug g
       |WHERE g.doc_id NOT IN (SELECT doc_id FROM losers)
       |ORDER BY g.doc_id""".stripMargin

  // ------------------------------------------------------------ q_dup_matrix
  /** Cross-source duplication matrix: verified near-dup pairs (jaccard ≥
    * 0.6, the q_dedup_clusters edge set) rolled up by unordered source
    * pair — the provenance view a corpus curator reads before dropping a
    * source ("is B mostly a mirror of A?"). Augmented ids (+10000) map
    * back to their base doc's source.
    *
    * Scale shape: pair generation is the stored-index LSH chain; the
    * source lookup is two keyed joins against the documents table; the
    * matrix aggregate is O(sources²) — tiny. Jaccard averages are summed
    * as exact µ-units so the fold order cannot surface. */
  def qDupMatrix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"))
    val base = (id: Column) =>
      when(id >= 10000, id - 10000).otherwise(id)
    val pairs = jaccardScored(s, dir)
      .filter(col("jaccard") >= ClusterJaccard)
      .select(base(col("a")).as("base_a"), base(col("b")).as("base_b"),
        (round(col("jaccard") * 1e6, 0)).cast("long").as("jmu"))
    pairs
      .join(docs.select(col("doc_id").as("base_a"), col("source").as("sa")),
        Seq("base_a"))
      .join(docs.select(col("doc_id").as("base_b"), col("source").as("sb")),
        Seq("base_b"))
      .groupBy(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("jmu")).cast("double") / count(lit(1)) / lit(1e6), 6)
          .as("avg_jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val qDupMatrixSql =
    s"""WITH $jacSqlCtes,
       |edges AS (
       |  SELECT CASE WHEN a >= 10000 THEN a - 10000 ELSE a END AS base_a,
       |         CASE WHEN b >= 10000 THEN b - 10000 ELSE b END AS base_b,
       |         CAST(round(jaccard * 1e6, 0) AS BIGINT) AS jmu
       |  FROM jac WHERE jaccard >= $ClusterJaccard),
       |srcd AS (
       |  SELECT e.jmu, da.source AS sa, db.source AS sb
       |  FROM edges e
       |  JOIN documents da ON da.doc_id = e.base_a
       |  JOIN documents db ON db.doc_id = e.base_b)
       |SELECT least(sa, sb) AS src_a, greatest(sa, sb) AS src_b,
       |  count(*) AS n_pairs,
       |  round(CAST(sum(jmu) AS DOUBLE) / count(*) / 1e6, 6) AS avg_jaccard
       |FROM srcd
       |GROUP BY 1, 2
       |ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------------- q_dedup_impact
  /** Curation ROI of near-dup removal: docs and TOKENS before vs after
    * cluster-based dedup (q_dedup_corpus's keep-min policy), with removal
    * percentages. Token impact ≠ doc impact — dedup that drops 8% of docs
    * but 1% of tokens removed boilerplate stubs, not capacity — and this
    * one-row report is the number that justifies (or kills) the dedup
    * stage's compute budget.
    *
    * Scale shape: two token-count aggregates (full and kept corpus — the
    * kept set comes from the already-priced cluster pipeline) and a 1-row
    * combine; integer ratios, two double divisions. */
  def qDedupImpact(s: SparkSession, dir: String): DataFrame = {
    val aug = augmented(Tables.documents(s, dir))
      .select(col("doc_id"), size(words(col("text"))).cast("long").as("tk"))
    val losers = qDedupClusters(s, dir)
      .filter(col("cluster_rep") =!= col("doc_id")).select(col("doc_id"))
    val kept = aug.join(losers, Seq("doc_id"), "left_anti")
    val full = aug.agg(count(lit(1)).as("n_docs_total"),
      sum(col("tk")).as("tokens_total"))
    val after = kept.agg(count(lit(1)).as("n_docs_kept"),
      sum(col("tk")).as("tokens_kept"))
    full.crossJoin(broadcast(after))
      .select(col("n_docs_total"), col("n_docs_kept"),
        col("tokens_total"), col("tokens_kept"),
        round((col("n_docs_total") - col("n_docs_kept")).cast("double")
          / col("n_docs_total"), 4).as("pct_docs_removed"),
        round((col("tokens_total") - col("tokens_kept")).cast("double")
          / col("tokens_total"), 4).as("pct_tokens_removed"))
  }

  private val qDedupImpactSql =
    s"""WITH RECURSIVE $jacSqlCtes,
       |cedges AS (
       |  SELECT a, b FROM jac WHERE jaccard >= $ClusterJaccard
       |  UNION ALL
       |  SELECT b AS a, a AS b FROM jac WHERE jaccard >= $ClusterJaccard),
       |walk(node, label) AS (
       |  SELECT DISTINCT a, a FROM cedges
       |  UNION
       |  SELECT e.b, w.label FROM walk w JOIN cedges e ON e.a = w.node),
       |losers AS (
       |  SELECT node AS doc_id FROM walk
       |  GROUP BY node HAVING node <> min(label)),
       |tk AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
       |      AS tk
       |  FROM aug),
       |full_c AS (
       |  SELECT count(*) AS n_docs_total,
       |    CAST(sum(tk) AS BIGINT) AS tokens_total FROM tk),
       |after_c AS (
       |  SELECT count(*) AS n_docs_kept,
       |    CAST(sum(tk) AS BIGINT) AS tokens_kept
       |  FROM tk WHERE doc_id NOT IN (SELECT doc_id FROM losers))
       |SELECT n_docs_total, n_docs_kept, tokens_total, tokens_kept,
       |  round(CAST(n_docs_total - n_docs_kept AS DOUBLE) / n_docs_total, 4)
       |    AS pct_docs_removed,
       |  round(CAST(tokens_total - tokens_kept AS DOUBLE) / tokens_total, 4)
       |    AS pct_tokens_removed
       |FROM full_c CROSS JOIN after_c""".stripMargin

  // ------------------------------------------------------------- q_lsh_cost
  /** LSH self-join cost model from the stored bucket table: per band, the
    * bucket count, the heaviest bucket, and the EXACT candidate-pair
    * volume Σ c·(c−1)/2 the bucket self-join will generate — the
    * pre-flight number that decides whether to widen the signature before
    * running the join (the dedup-index sibling of q_join_size_est). A hot
    * bucket shows up here as max_bucket² before it shows up as a straggler
    * task.
    *
    * Scale shape: two map-side-combinable aggregates over the stored
    * index — strictly cheaper than the join it prices. */
  def qLshCost(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    augBuckets(s, dir)
      .groupBy($"band_id", $"band_sig").agg(count(lit(1)).as("c"))
      .groupBy($"band_id")
      .agg(count(lit(1)).as("n_buckets"),
        sum($"c").as("n_rows"),
        max($"c").as("max_bucket"),
        sum(expr("(c * (c - 1)) div 2")).cast("long").as("est_pairs"))
      .orderBy($"band_id")
  }

  private val qLshCostSql =
    s"""WITH $augmentedSqlCte,
       |$shingleSqlCte,
       |$minhashSqlCte,
       |$bandSqlCte,
       |bc AS (
       |  SELECT band_id, band_sig, count(*) AS c
       |  FROM bands GROUP BY 1, 2)
       |SELECT band_id, count(*) AS n_buckets,
       |  CAST(sum(c) AS BIGINT) AS n_rows,
       |  max(c) AS max_bucket,
       |  CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS est_pairs
       |FROM bc GROUP BY band_id
       |ORDER BY band_id""".stripMargin

  // -------------------------------------------------------- q_threshold_sweep
  /** Dedup-threshold operating characteristic: for Jaccard cutoffs 0.5 to
    * 0.9, how many verified pairs and how many distinct affected docs
    * survive — the tuning curve read before committing a corpus to one
    * threshold (too low merges distinct docs, too high leaves mirrors in).
    *
    * Scale shape: the scored pairs come from the stored-index LSH chain
    * once; the sweep is a 5-row broadcast threshold list joined against
    * the O(pairs) table — the whole sweep costs one extra aggregate, not
    * five corpus passes. */
  def qThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val thr = s.range(5, 10).select(($"id" / 10.0).as("thr"))
    val pairs = jaccardScored(s, dir).select($"a", $"b", $"jaccard")
    val hits = pairs.crossJoin(broadcast(thr))
      .filter($"jaccard" >= $"thr")
    val nPairs = hits.groupBy($"thr").agg(count(lit(1)).as("n_pairs"))
    val nDocs = hits.select($"thr", $"a".as("d"))
      .unionByName(hits.select($"thr", $"b".as("d")))
      .groupBy($"thr").agg(countDistinct($"d").as("n_docs"))
    nPairs.join(nDocs, Seq("thr"))
      .select($"thr", $"n_pairs", $"n_docs")
      .orderBy($"thr")
  }

  private val qThresholdSweepSql =
    s"""WITH $jacSqlCtes,
       |thr AS (SELECT CAST(i AS DOUBLE) / 10 AS thr FROM range(5, 10) t(i)),
       |hits AS (
       |  SELECT t.thr, j.a, j.b FROM jac j
       |  CROSS JOIN thr t WHERE j.jaccard >= t.thr),
       |np AS (SELECT thr, count(*) AS n_pairs FROM hits GROUP BY thr),
       |nd AS (
       |  SELECT thr, count(DISTINCT d) AS n_docs
       |  FROM (SELECT thr, a AS d FROM hits
       |        UNION ALL SELECT thr, b AS d FROM hits)
       |  GROUP BY thr)
       |SELECT thr, n_pairs, n_docs
       |FROM np JOIN nd USING (thr)
       |ORDER BY thr""".stripMargin

  // -------------------------------------------------------------- q_simhash
  /** 16-bit SimHash fingerprints: per token, bit b contributes +1/−1 by the
    * b-th hex nibble of md5(token) (top bit of the nibble); fingerprint bit =
    * sign of the sum. Token multiset weighting comes free from explode (no
    * distinct). One groupBy with 16 integer sums — map-side combinable, one
    * shuffle of 16 ints per doc at any scale. Near-dups then bucket by
    * fingerprint (or by Hamming-ball probes) instead of pairwise compare. */
  def qSimhash(s: SparkSession, dir: String): DataFrame =
    simhashOf(Tables.documents(s, dir)).orderBy(col("doc_id"))

  private val qSimhashSql =
    s"""WITH ${simhashSqlCtes("documents")}
       |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------- q_fuzzy_verify
  /** Fuzzy verification metrics over the SAME LSH candidate pairs
    * (never all-pairs): Levenshtein edit distance on a normalized text
    * prefix, and SimHash Hamming distance via bit_count(xor) — the two
    * standard near-dup confirmations besides Jaccard. Both exact integer
    * metrics, portable across engines. */
  def qFuzzyVerify(s: SparkSession, dir: String): DataFrame = {
    val aug = augmented(Tables.documents(s, dir))
    val cand = candidatePairs(s, dir)
    val sim = augSimhash(s, dir)
    val prefix = aug.select(col("doc_id"),
      substring(regexp_replace(lower(trim(col("text"))), "\\s+", " "), 1, 64)
        .as("prefix"))
    cand
      .join(sim.select(col("doc_id").as("a"), col("simhash").as("sh_a")), Seq("a"))
      .join(sim.select(col("doc_id").as("b"), col("simhash").as("sh_b")), Seq("b"))
      .join(prefix.select(col("doc_id").as("a"), col("prefix").as("px_a")), Seq("a"))
      .join(prefix.select(col("doc_id").as("b"), col("prefix").as("px_b")), Seq("b"))
      .select(col("a"), col("b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int")
          .as("simhash_hamming"),
        levenshtein(col("px_a"), col("px_b")).as("prefix_edit_dist"))
      .orderBy(col("a"), col("b"))
  }

  private val qFuzzyVerifySql = {
    s"""WITH $augmentedSqlCte,
       |$shingleSqlCte,
       |$minhashSqlCte,
       |$bandSqlCte,
       |$candSqlCte,
       |${simhashSqlCtes("aug")},
       |px AS (
       |  SELECT doc_id,
       |    substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 64)
       |      AS prefix
       |  FROM aug)
       |SELECT c.a, c.b,
       |  CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT)
       |    AS simhash_hamming,
       |  CAST(levenshtein(pa.prefix, pb.prefix) AS INT) AS prefix_edit_dist
       |FROM cand c
       |JOIN sim sa ON sa.doc_id = c.a
       |JOIN sim sb ON sb.doc_id = c.b
       |JOIN px pa ON pa.doc_id = c.a
       |JOIN px pb ON pb.doc_id = c.b
       |ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------- q_contain_dup
  /** Containment dedup (sub-document duplicates): over the LSH candidate
    * pairs, score |A∩B| / min(|A|, |B|) — the containment coefficient. A
    * near-1 containment with a sub-1 Jaccard is the "document A is a copy
    * of a PIECE of document B" case (boilerplate wrappers, quoted reposts,
    * truncated mirrors) that symmetric Jaccard under-scores: the planted
    * first-word-dropped copies land at containment 1.0 but Jaccard
    * (n−3)/(n−2) < 1. Same scale shape as q_jaccard_pairs — both sides
    * read the STORED shingle posting list and candidate set, cost is
    * candidates × shingles, never corpus². */
  def qContainDup(s: SparkSession, dir: String): DataFrame = {
    val contain = round(col("n_inter") / least(col("sz_a"), col("sz_b")), 6)
    pairScores(s, dir)
      .filter(contain >= 0.9)
      .select(col("a"), col("b"), col("n_inter"), contain.as("containment"))
      .orderBy(col("a"), col("b"))
  }

  private val qContainDupSql =
    s"""WITH $jacSqlCtes
       |SELECT i.a, i.b, i.n_inter,
       |  round(i.n_inter / least(za.sz, zb.sz), 6) AS containment
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.a
       |JOIN sizes zb ON zb.doc_id = i.b
       |WHERE round(i.n_inter / least(za.sz, zb.sz), 6) >= 0.9
       |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------- q_minhash_est
  /** The MinHash estimator made visible: for every LSH candidate pair,
    * the SIGNATURE-agreement Jaccard estimate (fraction of the 12 minhash
    * slots that agree — E[agree] = J is the identity the entire
    * minhash/LSH design rests on) next to the exact shingle Jaccard and
    * the estimation error. At 100 TB this is the diagnostic that decides
    * whether 12 hashes suffice for the corpus at hand (widen to 64/128
    * when the error spread is too wide for the dedup threshold) — run on
    * a sample, it prices the signature width before the full pass; the
    * per-pair cost is 12 column equality checks on the stored signature
    * table, no shingle join at all for the estimate side. */
  def qMinhashEst(s: SparkSession, dir: String): DataFrame = {
    val mh = augMinhash(s, dir)
    val agree = (0 until NumHashes)
      .map(k => when(col(s"a_mh$k") === col(s"b_mh$k"), 1).otherwise(0))
      .reduce(_ + _)
    val renamedA = (0 until NumHashes).foldLeft(
      mh.withColumnRenamed("doc_id", "a")) { (df, k) =>
      df.withColumnRenamed(s"mh$k", s"a_mh$k") }
    val renamedB = (0 until NumHashes).foldLeft(
      mh.withColumnRenamed("doc_id", "b")) { (df, k) =>
      df.withColumnRenamed(s"mh$k", s"b_mh$k") }
    jaccardScored(s, dir)
      .join(renamedA, Seq("a"))
      .join(renamedB, Seq("b"))
      .select(col("a"), col("b"),
        round(agree / lit(NumHashes.toDouble), 4).as("jaccard_est"),
        col("jaccard").as("jaccard_exact"),
        // + 0.0 normalizes IEEE -0.0 → +0.0 (exact no-op otherwise):
        // Spark's BigDecimal round collapses the sign of zero, DuckDB's
        // doesn't, and the driver hashes the sign bit
        (round(agree / lit(NumHashes.toDouble) - col("jaccard"), 4) + lit(0.0))
          .as("est_error"))
      .orderBy(col("a"), col("b"))
  }

  private val qMinhashEstSql = {
    val agree = (0 until NumHashes)
      .map(k => s"(CASE WHEN ma.mh$k = mb.mh$k THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $jacSqlCtes
       |SELECT j.a, j.b,
       |  round(($agree) / ${NumHashes}.0, 4) AS jaccard_est,
       |  j.jaccard AS jaccard_exact,
       |  round(($agree) / ${NumHashes}.0 - j.jaccard, 4) + 0.0 AS est_error
       |FROM jac j
       |JOIN mh ma ON ma.doc_id = j.a
       |JOIN mh mb ON mb.doc_id = j.b
       |ORDER BY 1, 2""".stripMargin
  }

  // ------------------------------------------------------------- registry
  // ---------------------------------------------------------- q_incr_dedup
  /** Incremental dedup — the operational shape of LSH at a continuously-fed
    * corpus: when a batch of documents ARRIVES, its band signatures join
    * against the STORED index (built when the base corpus loaded) plus
    * themselves; the base×base pair space is never rescanned. Here the
    * base is the original corpus (index materialized via IndexStore, as in
    * production) and the arriving batch is the perturbed near-dup copies;
    * the oracle computes the FULL-corpus candidate set and restricts it to
    * pairs involving an arrival — a green row proves incremental discovery
    * finds exactly what a full rebuild would have found for the new docs.
    *
    * Scale shape: per arrival batch the cost is O(|delta| · bands) hashing
    * plus a keyed join against the index — independent of corpus size
    * except through index lookup, which is the whole point. */
  def qIncrDedup(s: SparkSession, dir: String): DataFrame = {
    val baseBands = graft.io.IndexStore.materialized(s, dir, "bands_base") {
      bandRows(minhashes(shingleRows(
        Tables.documents(s, dir).select(col("doc_id"), col("text")))))
    }
    val delta = Tables.documents(s, dir).filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
    // materialized like the base index: three consumers below (vs-base join
    // + both sides of the within self-join) would otherwise re-run the
    // delta's shingle→minhash→band pipeline three times (review finding)
    val deltaBands = graft.io.IndexStore.materialized(s, dir, "bands_delta") {
      bandRows(minhashes(shingleRows(delta)))
    }
    val vsBase = deltaBands
      .select(col("band_id"), col("band_sig"), col("doc_id").as("b"))
      .join(baseBands.select(col("band_id"), col("band_sig"), col("doc_id").as("a")),
        Seq("band_id", "band_sig"))
      .select(col("a"), col("b"))
    val within = deltaBands
      .select(col("band_id"), col("band_sig"), col("doc_id").as("a"))
      .join(deltaBands.select(col("band_id"), col("band_sig"), col("doc_id").as("b")),
        Seq("band_id", "band_sig"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    vsBase.unionByName(within).distinct().orderBy(col("a"), col("b"))
  }

  private val qIncrDedupSql =
    s"""WITH $augmentedSqlCte,
       |$shingleSqlCte,
       |$minhashSqlCte,
       |$bandSqlCte,
       |$candSqlCte
       |SELECT a, b FROM cand WHERE b >= 10000
       |ORDER BY a, b""".stripMargin

  // ------------------------------------------------------ q_dedup_keep_best
  /** Dedup with a QUALITY policy: inside every near-dup cluster keep the
    * longest member (ties to the smaller id), not the smallest id — the
    * policy real corpus pipelines want ("keep the most complete copy";
    * the manufactured near-dups are first-word-truncated, so min-id and
    * keep-best genuinely disagree here and the gate can tell the policies
    * apart). Builds on the same connected components as q_dedup_clusters;
    * the winner selection is a row_number window per cluster — bounded by
    * cluster size, the same justification as every per-group window in
    * the dedup family. */
  def qDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val members = qDedupClusters(s, dir)
      .join(augmented(Tables.documents(s, dir))
        .select(col("doc_id"), length(col("text")).as("len")), "doc_id")
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("cluster_rep"))))
      .filter(col("n_members") > 1)
    members
      .withColumn("rn", row_number().over(Window.partitionBy(col("cluster_rep"))
        .orderBy(col("len").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("cluster_rep"), col("doc_id").as("keep_id"),
        col("len").as("keep_len"), col("n_members"))
      .orderBy(col("cluster_rep"))
  }

  private val qDedupKeepBestSql =
    s"""WITH RECURSIVE $jacSqlCtes,
       |edges AS (
       |  SELECT a, b FROM jac WHERE jaccard >= $ClusterJaccard
       |  UNION ALL
       |  SELECT b AS a, a AS b FROM jac WHERE jaccard >= $ClusterJaccard),
       |walk(node, label) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node),
       |clusters AS (
       |  SELECT node AS doc_id, min(label) AS cluster_rep
       |  FROM walk GROUP BY node),
       |members AS (
       |  SELECT c.cluster_rep, c.doc_id, length(a.text) AS len,
       |    count(*) OVER (PARTITION BY c.cluster_rep) AS n_members
       |  FROM clusters c JOIN aug a ON a.doc_id = c.doc_id)
       |SELECT cluster_rep, doc_id AS keep_id, len AS keep_len, n_members
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY cluster_rep
       |    ORDER BY len DESC, doc_id) AS rn
       |  FROM members WHERE n_members > 1)
       |WHERE rn = 1 ORDER BY cluster_rep""".stripMargin

  // ---------------------------------------------------------- q_prefix_join
  /** Exact set-similarity join by PREFIX FILTERING (Chaudhuri/Ganti/Kaushik
    * ICDE'06; PPJoin, Xiao et al. WWW'08): all pairs with shingle-Jaccard
    * ≥ 0.7, with a completeness GUARANTEE the LSH family deliberately
    * trades away. Order each doc's shingles by ascending document
    * frequency (rarest first, ties by shingle); if two sets reach Jaccard
    * t they must share a token within their first |s| − ⌈t·|s|⌉ + 1
    * tokens — so only docs sharing a PREFIX token (≈30% of the set at
    * t = 0.7, and the rarest 30%, so the inverted lists are short) become
    * candidates, and exact verification runs on candidates only.
    *
    * The oracle computes ground truth WITHOUT the filter (full posting-
    * list self-join): a green row is a machine-checked proof that prefix
    * filtering lost no pair — exact recall, versus q_minhash_pairs' tuned
    * P(candidate) = 1−(1−J³)⁴. Both paradigms share the verify stage and
    * the stored shingle index.
    *
    * Scale shape: df ranking is one aggregate + a per-doc (bounded) rank
    * window; candidate generation shuffles only prefix tokens (the rare
    * tail of each set); the quadratic blowup of a frequent token is capped
    * because frequent tokens land OUTSIDE prefixes. ⌈t·n⌉ is integer
    * arithmetic ((7n+9) div 10) on both engines. */
  def qPrefixJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    prefixJoinPairs(s, dir).orderBy($"a", $"b")
  }

  /** The full prefix-filter + PPJoin + verify pipeline, sans presentation
    * sort — factored out (r14 optimization round) so [[qMinhashRecall]]
    * can consume the exact pair set as a build-once IndexStore asset (the
    * coorder_edges / triangle_stats discipline) instead of re-running the
    * candidate and verify joins on every invocation. [[qPrefixJoin]]
    * itself always computes the pipeline fresh — it is the query whose
    * oracle PROVES prefix filtering lost no pair, so its bench time must
    * price the computation, not a parquet read. */
  private def prefixJoinPairs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val sh = augShingles(s, dir)
    // both sides of the candidate self-join consume the ranked-prefix
    // subtree; store it like the other derived index tables (parquet via
    // IndexStore) rather than localCheckpoint — checkpoint blocks have no
    // release path from a lazy consumer and would stay pinned per
    // invocation (review finding), while the store builds once per corpus
    val prefix = graft.io.IndexStore.materialized(s, dir, "prefix07") {
      val df = sh.groupBy($"shingle").agg(count(lit(1)).as("dfreq"))
      val w = Window.partitionBy($"doc_id").orderBy($"dfreq", $"shingle")
      sh.join(df, "shingle")
        .withColumn("rn", row_number().over(w))
        .withColumn("sz", count(lit(1)).over(Window.partitionBy($"doc_id")))
        .filter($"rn" <= $"sz" - expr("(7 * sz + 9) div 10") + 1)
        .select($"doc_id", $"shingle", $"sz")
    }
    val cand = prefix.select($"doc_id".as("a"), $"shingle", $"sz".as("sz_pa"))
      .join(prefix.select($"doc_id".as("b"), $"shingle", $"sz".as("sz_pb")),
        Seq("shingle"))
      .filter($"a" < $"b" &&
        // PPJoin length filter — lossless at J ≥ 0.7: the smaller set must
        // be ≥ 0.7× the larger (|x∩y| ≤ min, ≥ t·|x∪y| ≥ t·max). Cuts
        // size-incompatible candidates before the verify join pays for them
        least($"sz_pa", $"sz_pb") * 10 >= greatest($"sz_pa", $"sz_pb") * 7)
      .select($"a", $"b").distinct()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.select($"doc_id".as("a"), $"shingle"), Seq("a"))
      .join(sh.select($"doc_id".as("b"), $"shingle"), Seq("b", "shingle"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select($"doc_id".as("a"), $"sz".as("sz_a")), Seq("a"))
      .join(sizes.select($"doc_id".as("b"), $"sz".as("sz_b")), Seq("b"))
      .select($"a", $"b", $"n_inter",
        ($"sz_a" + $"sz_b" - $"n_inter").as("n_union"))
      .filter($"n_inter" * 10 >= $"n_union" * 7)
      .withColumn("jaccard", round($"n_inter" / $"n_union", 6))
  }

  private val qPrefixJoinSql =
    s"""WITH $augmentedSqlCte,
       |$shingleSqlCte,
       |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1),
       |inter AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_inter
       |  FROM shd x JOIN shd y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT a, b, n_inter,
       |  sa.sz + sb.sz - n_inter AS n_union,
       |  round(n_inter / (sa.sz + sb.sz - n_inter), 6) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = a
       |JOIN sizes sb ON sb.doc_id = b
       |WHERE n_inter * 10 >= (sa.sz + sb.sz - n_inter) * 7
       |ORDER BY a, b""".stripMargin

  // -------------------------------------------------------- q_minhash_recall
  /** LSH index-quality diagnostic: candidate recall of the banded minhash
    * index against the COMPLETE exact ground truth at Jaccard ≥ 0.7 (the
    * prefix-filter join, whose completeness lemma PropertiesSpec proves).
    * The text sibling of q_ann_recall: banding is probabilistic
    * (P(candidate) = 1−(1−J³)⁴), and this one number is what decides
    * whether to add bands or widen rows before trusting the index.
    *
    * Scale shape: both pair sets come from stored indexes (bands, ranked
    * prefix); the intersection is one keyed semi join on (a, b); output is
    * a single row of counts. */
  def qMinhashRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // exact ground truth as a build-once stored index: the diagnostic
    // consumes the SAME pair set q_prefix_join's oracle proves complete,
    // so the derivation builds once per (corpus, JVM) and this query's
    // plan scans the stored pairs instead of re-running the candidate +
    // verify joins (r14 optimization round; the coorder_edges pattern)
    val exact = graft.io.IndexStore.materialized(s, dir, "exact_pairs07") {
      prefixJoinPairs(s, dir).select($"a", $"b")
    }
    val bands = augBuckets(s, dir)
    val cand = bands.select($"band_id", $"band_sig", $"doc_id".as("a"))
      .join(bands.select($"band_id", $"band_sig", $"doc_id".as("b")),
        Seq("band_id", "band_sig"))
      .filter($"a" < $"b").select($"a", $"b").distinct()
    val hit = exact.join(cand, Seq("a", "b"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_candidates"))))
      .crossJoin(broadcast(hit.agg(count(lit(1)).as("n_hit"))))
      .select($"n_exact", $"n_candidates", $"n_hit",
        round($"n_hit".cast("double") / $"n_exact", 4).as("recall"))
  }

  private val qMinhashRecallSql =
    s"""WITH $augmentedSqlCte,
       |$shingleSqlCte,
       |$minhashSqlCte,
       |$bandSqlCte,
       |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1),
       |inter AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_inter
       |  FROM shd x JOIN shd y
       |    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |exact AS (
       |  SELECT a, b FROM inter
       |  JOIN sizes sa ON sa.doc_id = a
       |  JOIN sizes sb ON sb.doc_id = b
       |  WHERE n_inter * 10 >= (sa.sz + sb.sz - n_inter) * 7),
       |$candSqlCte,
       |hit AS (SELECT e.a, e.b FROM exact e
       |        JOIN cand c ON c.a = e.a AND c.b = e.b)
       |SELECT (SELECT count(*) FROM exact) AS n_exact,
       |  (SELECT count(*) FROM cand) AS n_candidates,
       |  (SELECT count(*) FROM hit) AS n_hit,
       |  round(CAST((SELECT count(*) FROM hit) AS DOUBLE)
       |    / (SELECT count(*) FROM exact), 4) AS recall""".stripMargin

  // ----------------------------------------------------------- q_cdc_chunks
  /** Content-defined chunking dedup — the storage-level complement of the
    * document dedup family: split every document into chunks whose
    * boundaries are decided by CONTENT (a token whose seeded hash falls
    * under a ~1/16 mask closes the chunk), then find chunks shared across
    * documents. Because boundaries move with the text, an insertion
    * re-chunks only its neighborhood — unlike fixed-width chunking, where
    * one inserted word shifts every later chunk (the rsync/LBFS insight,
    * here at word granularity: FastCDC's gear-hash cut test collapsed to a
    * per-token hash compare, which is what makes it SQL-replayable).
    *
    * Scale shape: tokenize + flag + per-doc running boundary count are
    * scan-local (the window partitions by doc — bounded by document
    * length); the only corpus-wide shuffle is the final groupBy on chunk
    * hash, carrying one 32-hex row per chunk. The manufactured near-dup
    * pairs in the corpus surface as shared chunks; output is the duplicate
    * chunk inventory (occurrences, distinct docs). */
  def qCdcChunks(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"doc_id",
        regexp_replace(lower(trim($"text")), "\\s+", " ").as("norm"))
      .select($"doc_id", posexplode(split($"norm", " ")))
      .toDF("doc_id", "pos", "tok")
      .withColumn("b",
        when(substring(md5(concat(lit("cdc1:"), $"tok")), 1, 1) === "0", 1)
          .otherwise(0))
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = toks
      .withColumn("chunk_id", coalesce(sum($"b").over(w), lit(0L)))
      .groupBy($"doc_id", $"chunk_id")
      .agg(expr(
        "md5(array_join(transform(array_sort(collect_list(struct(pos, tok)))," +
          " x -> x.tok), ' '))").as("chunk_hash"),
        count(lit(1)).as("n_tok"))
    chunks.groupBy($"chunk_hash", $"n_tok")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct($"doc_id").as("n_docs"))
      .filter($"n_occ" > 1)
      .orderBy($"n_occ".desc, $"chunk_hash")
      .limit(50)
  }

  private val qCdcChunksSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(range(1, len(w) + 1)) - 1 AS pos,
      |    unnest(w) AS tok
      |  FROM (SELECT doc_id,
      |          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
      |        FROM documents)),
      |flagged AS (
      |  SELECT doc_id, pos, tok,
      |    CASE WHEN substr(md5('cdc1:' || tok), 1, 1) = '0' THEN 1 ELSE 0 END AS b
      |  FROM toks),
      |chunks AS (
      |  SELECT doc_id,
      |    coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id,
      |    pos, tok
      |  FROM flagged),
      |hashed AS (
      |  SELECT doc_id, chunk_id,
      |    md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash,
      |    count(*) AS n_tok
      |  FROM chunks GROUP BY doc_id, chunk_id)
      |SELECT chunk_hash, n_tok, count(*) AS n_occ,
      |  count(DISTINCT doc_id) AS n_docs
      |FROM hashed GROUP BY chunk_hash, n_tok
      |HAVING count(*) > 1
      |ORDER BY n_occ DESC, chunk_hash LIMIT 50""".stripMargin

  // ---------------------------------------------------- q_string_sim_join
  /** Fuzzy string self-join over the part-name domain: name pairs within
    * edit distance 2, with how many parts each variant covers — the
    * entity-resolution primitive ("cold anvil" vs "old anvil" are the
    * same product line; MinHash can't see it because shingle overlap is
    * word-level). Three scale moves, in order:
    *   1. collapse the FACT to its distinct value domain first (64 names
    *      for 2M parts — pairwise work is domain², never rows²);
    *   2. block on the last token (the entity head noun) so candidates
    *      are per-block, not domain² — the LSH-bucket shape in string
    *      space. Blocking trades recall for scale exactly like LSH bands:
    *      a pair differing in the head noun is invisible (at distance ≤ 2
    *      none such exists here — head nouns differ by ≥ 3 edits);
    *   3. cheap length prefilter (|Δlen| ≤ 2 is NECESSARY for edit
    *      distance ≤ 2) before the O(len²) Levenshtein verify.
    * Both engines implement the identical textbook Levenshtein, so the
    * verify step is engine-portable. */
  def qStringSimJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = Tables.part(s, dir)
      .groupBy($"p_name".as("nm"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("blk", element_at(split($"nm", " "), -1))
      .withColumn("ln", length($"nm"))
    val a = names.select($"nm".as("name_a"), $"n_parts".as("n_parts_a"),
      $"blk", $"ln".as("la"))
    val b = names.select($"nm".as("name_b"), $"n_parts".as("n_parts_b"),
      $"blk", $"ln".as("lb"))
    // lev_within: native banded Levenshtein (graft.expressions.LevWithin)
    // — O(k·n) cells with early exit instead of the built-in's full O(n·m)
    // matrix; −1 encodes "> k", so the ≤2 decision and the emitted
    // distance are exactly the built-in's (LevWithinSpec proves it)
    a.join(b, Seq("blk"))
      .filter($"name_a" < $"name_b" && abs($"la" - $"lb") <= 2)
      .withColumn("dist", expr("lev_within(name_a, name_b, 2)"))
      .filter($"dist" >= 0)
      .select($"name_a", $"name_b", $"dist", $"n_parts_a", $"n_parts_b")
      .orderBy($"dist", $"name_a", $"name_b")
  }

  private val qStringSimJoinSql =
    """WITH names AS (
      |  SELECT p_name AS nm, count(*) AS n_parts,
      |    split_part(p_name, ' ', -1) AS blk, length(p_name) AS ln
      |  FROM part GROUP BY 1)
      |SELECT a.nm AS name_a, b.nm AS name_b,
      |  CAST(levenshtein(a.nm, b.nm) AS INT) AS dist,
      |  CAST(a.n_parts AS BIGINT) AS n_parts_a,
      |  CAST(b.n_parts AS BIGINT) AS n_parts_b
      |FROM names a JOIN names b
      |  ON a.blk = b.blk AND a.nm < b.nm AND abs(a.ln - b.ln) <= 2
      |WHERE levenshtein(a.nm, b.nm) <= 2
      |ORDER BY dist, name_a, name_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_sim_join" -> (qStringSimJoin _),
    "q_incr_dedup"      -> (qIncrDedup _),
    "q_dedup_keep_best" -> (qDedupKeepBest _),
    "q_prefix_join"    -> (qPrefixJoin _),
    "q_cdc_chunks"     -> (qCdcChunks _),
    "q_minhash_est"    -> (qMinhashEst _),
    "q_contain_dup"    -> (qContainDup _),
    "q_dedup_rate_curve" -> (qDedupRateCurve _),
    "q_exact_dup"      -> (qExactDup _),
    "q_span_dedup"     -> (qSpanDedup _),
    "q_dup_matrix"     -> (qDupMatrix _),
    "q_minhash_recall" -> (qMinhashRecall _),
    "q_threshold_sweep" -> (qThresholdSweep _),
    "q_lsh_cost"       -> (qLshCost _),
    "q_dedup_impact"   -> (qDedupImpact _),
    "q_minhash_bucket" -> (qMinhashBucket _),
    "q_minhash_pairs"  -> (qMinhashPairs _),
    "q_jaccard_pairs"  -> (qJaccardPairs _),
    "q_fuzzy_verify"   -> (qFuzzyVerify _),
    "q_simhash"        -> (qSimhash _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_dedup_corpus"   -> (qDedupCorpus _))

  val oracle: Map[String, String] = Map(
    "q_string_sim_join" -> qStringSimJoinSql,
    "q_incr_dedup"      -> qIncrDedupSql,
    "q_dedup_keep_best" -> qDedupKeepBestSql,
    "q_prefix_join"    -> qPrefixJoinSql,
    "q_cdc_chunks"     -> qCdcChunksSql,
    "q_minhash_est"    -> qMinhashEstSql,
    "q_contain_dup"    -> qContainDupSql,
    "q_dedup_rate_curve" -> qDedupRateCurveSql,
    "q_exact_dup"      -> qExactDupSql,
    "q_span_dedup"     -> qSpanDedupSql,
    "q_dup_matrix"     -> qDupMatrixSql,
    "q_minhash_recall" -> qMinhashRecallSql,
    "q_threshold_sweep" -> qThresholdSweepSql,
    "q_lsh_cost"       -> qLshCostSql,
    "q_dedup_impact"   -> qDedupImpactSql,
    "q_minhash_bucket" -> qMinhashBucketSql,
    "q_minhash_pairs"  -> qMinhashPairsSql,
    "q_jaccard_pairs"  -> qJaccardPairsSql,
    "q_fuzzy_verify"   -> qFuzzyVerifySql,
    "q_simhash"        -> qSimhashSql,
    "q_dedup_clusters" -> qDedupClustersSql,
    "q_dedup_corpus"   -> qDedupCorpusSql)
}
