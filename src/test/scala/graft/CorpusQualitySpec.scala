package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the corpus-quality operators (CorpusQuality.scala
  * + q_contain_dup). Exact values are the DuckDB oracle's job; this suite
  * asserts the *meaning*: planted contamination/repetition/PII/sub-document
  * copies are detected, caps hold, weights normalize. */
class CorpusQualitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-test")
  val sfDir = "/root/testdata/sf0.001"

  def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("decontaminate flags every benchmark member with full self-overlap") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val benchIds = docs.filter(col("doc_id") % 33 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val flagged = q("q_decontaminate").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every benchmark doc overlaps itself 100%: if it has >= 5 distinct
    // shingles it must be flagged
    val missing = benchIds.filter(!flagged.contains(_))
    assert(missing.isEmpty, s"benchmark members not flagged: $missing")
  }

  test("repetition filter trips on every doubled doc and stays in [0,1]") {
    val rows = q("q_repetition_filter").collect()
    rows.foreach { r =>
      val (top, dup) = (r.getDouble(1), r.getDouble(2))
      assert(top >= 0 && top <= 1 && dup >= 0 && dup <= 1,
        s"fraction out of range: $r")
    }
    val planted = rows.filter(_.getLong(0) % 20 == 0)
    assert(planted.nonEmpty)
    planted.foreach { r =>
      assert(r.getDouble(2) > 0.3 && r.getBoolean(3),
        s"doubled doc not flagged: $r")
    }
  }

  test("pii scrub counts exactly the planted redactions and changes the hash") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("raw_hash"))
    val rows = q("q_pii_scrub").join(docs, Seq("doc_id")).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val (emails, phones) = (r.getLong(1), r.getLong(2))
      assert(emails == (if (id % 10 == 0) 1 else 0), s"emails wrong: $r")
      assert(phones == (if (id % 15 == 0) 1 else 0), s"phones wrong: $r")
      val changed = r.getString(3) != r.getString(4)
      // text is augmented (planted suffix) for redacted docs, so the
      // scrubbed hash differs from the raw-text hash iff anything was
      // planted (scrubbing replaced it with a marker)
      assert(changed == (id % 10 == 0 || id % 15 == 0), s"hash parity: $r")
    }
  }

  test("temperature mixture normalizes and flattens the language skew") {
    val rows = q("q_temperature_mixture").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val wSum = rows.map(_._3).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum to $wSum")
    val total = rows.map(_._2).sum.toDouble
    // sqrt scaling: every below-average language gets MORE than its
    // proportional share, every above-average one less
    rows.foreach { case (lang, n, w) =>
      val prop = n / total
      if (prop < 1.0 / rows.size) assert(w > prop, s"$lang not up-weighted")
      else if (prop > 1.0 / rows.size) assert(w < prop, s"$lang not down-weighted")
    }
  }

  test("source cap keeps at most 10 docs per source, longest first") {
    val rows = q("q_source_cap").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    rows.groupBy(_._1).foreach { case (src, grp) =>
      assert(grp.length <= 10, s"$src over cap")
      val byRank = grp.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to grp.length), s"$src ranks not dense")
      assert(byRank.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"$src not longest-first")
    }
  }

  test("oov rate is a valid fraction and the vocab covers the corpus mass") {
    val rows = q("q_oov_rate").collect()
    rows.foreach { r =>
      val rate = r.getDouble(2)
      assert(rate >= 0 && rate <= 1, s"oov out of range: $r")
    }
    // top-16 of 31 tokens must cover well over half the token mass
    val meanOov = rows.map(_.getDouble(2)).sum / rows.length
    assert(meanOov < 0.5, s"mean OOV $meanOov implausibly high")
  }

  test("chunking tiles every document: strided starts cover all tokens exactly") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = q("q_chunk_docs").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    chunks.groupBy(_._1).foreach { case (id, grp) =>
      val n = docs(id)
      val expected = (0 until n by 24).map(s => math.min(32, n - s))
      val got = grp.sortBy(_._2).map(_._3).toSeq
      assert(got == expected, s"doc $id chunks $got != $expected (n=$n)")
    }
    assert(chunks.map(_._1).toSet == docs.keySet)
  }

  test("profile reports zero nulls and sane distincts on the measure columns") {
    val rows = q("q_profile").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(rows.keySet == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus"))
    rows.foreach { case (c, (nNull, nDist, mn, mx)) =>
      assert(nNull == 0, s"$c null count")
      assert(nDist > 0, s"$c distinct count")
      val numeric = !c.startsWith("l_return") && !c.startsWith("l_line")
      assert(mn.isDefined == numeric && mx.isDefined == numeric, s"$c min/max")
    }
    val (_, _, qMin, qMax) = rows("l_quantity")
    assert(qMin.get.asInstanceOf[Double] >= 1.0 &&
      qMax.get.asInstanceOf[Double] <= 50.0)
  }

  test("corpus pipeline: manifest excludes contaminated docs and agrees with q_train_split") {
    val manifest = q("q_corpus_pipeline").collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    // composition: every doc q_decontaminate flags (incl. the benchmark
    // members themselves) is absent from the training manifest
    val contaminated = q("q_decontaminate").collect().map(_.getLong(0)).toSet
    val leaked = contaminated.intersect(manifest.keySet)
    assert(leaked.isEmpty, s"contaminated docs in the manifest: $leaked")
    // split assignment is THE shared seeded hash: identical to
    // q_train_split for every surviving doc
    val split = q("q_train_split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    manifest.foreach { case (id, sp) =>
      assert(split(id) == sp, s"doc $id split $sp != q_train_split ${split(id)}")
    }
    assert(manifest.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("containment scores every planted sub-document copy at 1.0") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plantedBases = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val pairs = q("q_contain_dup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // the first-word-dropped copy's shingles are a strict subset of its
    // base's: (base, base+10000) must appear with containment 1.0
    plantedBases.foreach { base =>
      val hit = pairs.find(p => p._1 == base && p._2 == base + 10000)
      assert(hit.isDefined, s"planted pair ($base, ${base + 10000}) missing")
      assert(hit.get._3 == 1.0, s"planted pair containment ${hit.get._3} != 1.0")
    }
  }

  test("heaps law: curve is cumulative, ttr falls, vocab total is exact") {
    val rows = q("q_heaps_law").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("cum_tokens"),
        r.getAs[Long]("cum_types"), r.getAs[Double]("ttr")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // both series strictly ordered by construction of a cumulative sum
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 < b._2, "cum_tokens must strictly grow per bucket")
      assert(a._3 <= b._3, "cum_types can never shrink")
    }
    // the last checkpoint's cum_types IS the corpus vocabulary size
    val vocab = graft.core.Tables.documents(spark, sfDir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .distinct().count()
    assert(rows.last._3 == vocab, s"final cum_types ${rows.last._3} != vocab $vocab")
    // sub-linear growth: type/token ratio at the end below the start
    assert(rows.last._4 <= rows.head._4, "ttr must not rise as the corpus grows")
    for (r <- rows) assert(r._4 == math.rint(r._3.toDouble / r._2 * 1e6) / 1e6)
  }

  test("sub-3-token docs are classified by the repetition filter, not dropped") {
    import spark.implicits._
    // the fixture corpus has no short docs (min 10 tokens), so build one:
    // a 2-token doc yields zero shingles and must still surface with
    // dup_3gram_frac = 0.0 (nothing repeated), never vanish from the gate
    val dir = java.nio.file.Files.createTempDirectory("graft_short").toString
    Seq(
      (1L, "tiny doc", "en", "web", 8L),
      (2L, "a normal length document with plenty of tokens to shingle",
        "en", "web", 57L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_repetition_filter")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(rows.contains(1L), "short doc dropped from the repetition filter")
    val (top, dup, flagged) = rows(1L)
    // two distinct tokens: top_word_frac = 0.5 trips the 0.2 gate (short
    // docs are legitimately low-quality); dup frac defaults to 0, and the
    // doc is CLASSIFIED as flagged rather than silently missing
    assert(dup == 0.0 && top == 0.5 && flagged, s"short doc stats: ${rows(1L)}")
    assert(rows.contains(2L))
  }
}
