package graft

import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{DqEngine, JobContext}
import graft.functions.Cleaning
import graft.warehouse.Scd2

/** Property-based invariants (SURVEY §5.4): cleaning idempotence, SCD2
  * structural invariants under random change batches, dedup-log
  * completeness (kept + logged == input). */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-prop-test")

  /** Raw-ScalaCheck sampling loop (scalatestplus bridge not in this build):
    * run the property over `n` generated samples. */
  private def forAllSampled[A](g: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(body)

  private val dirtyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)), Gen.const(""), Gen.const("NaN"),
    Gen.const("null"), Gen.const("  padded  "), Gen.const("M"),
    Gen.const("female"), Gen.const("123.0"), Gen.const("2020-05-17"),
    Gen.const("17-05-2020"), Gen.const("not-a-date"))

  test("cleaning combinators are idempotent: clean(clean(x)) == clean(x)") {
    forAllSampled(Gen.listOfN(40, dirtyString)) { vals =>
      import spark.implicits._
      val df = vals.toDF("x")
      def cleanOnce(c: org.apache.spark.sql.Column) =
        Cleaning.nullNormalize(Cleaning.stripFloatSuffix(trim(c)), "DEFAULT")
      val once = df.select(cleanOnce($"x").as("x"))
      val twice = once.select(cleanOnce($"x").as("x"))
      assert(once.collect().toSeq == twice.collect().toSeq)
    }
  }

  test("genderNormalize output is closed over {M, F, UNKNOWN} and idempotent-stable") {
    forAllSampled(Gen.listOfN(40, dirtyString)) { vals =>
      import spark.implicits._
      val out = vals.toDF("g").select(Cleaning.genderNormalize(col("g")).as("g"))
      val domain = out.collect().map(_.getString(0)).toSet
      assert(domain.subsetOf(Set("M", "F", "UNKNOWN")))
      // M/F are fixed points of the normalizer
      val again = out.select(Cleaning.genderNormalize(col("g")).as("g"))
      assert(again.collect().map(_.getString(0)).toSet.subsetOf(Set("M", "F", "UNKNOWN")))
    }
  }

  test("dateSafe returns a valid date or the fallback, never throws") {
    forAllSampled(Gen.listOfN(40, dirtyString)) { vals =>
      import spark.implicits._
      val parsed = vals.toDF("d")
        .select(Cleaning.dateSafe(col("d"), Some("1957-01-01")).as("p"))
      assert(parsed.filter(col("p").isNull).count() == 0)
    }
  }

  private val empRow: Gen[(String, String, String)] = for {
    id <- Gen.chooseNum(1, 8).map(n => s"e$n")
    name <- Gen.oneOf("Ann", "Bob", "Cyn", "Dee")
    dept <- Gen.oneOf("IT", "HR", "OPS")
  } yield (id, name, dept)

  test("SCD2 invariants hold under random batches: ≤1 current per key, " +
    "intervals ordered, unchanged-rerun is a no-op") {
    import spark.implicits._
    forAllSampled(Gen.zip(Gen.listOfN(6, empRow), Gen.listOfN(6, empRow)), 5) { case (s0, s1) =>
      val snap0 = s0.distinctBy(_._1).toDF("emp_id", "name", "dept")
      val snap1 = s1.distinctBy(_._1).toDF("emp_id", "name", "dept")
      val cur = Scd2.initial(snap0, "emp_id", Seq("name", "dept"),
        Date.valueOf("2020-01-01"))
      val merged = Scd2.merge(cur, snap1, "emp_id", Seq("name", "dept"),
        Date.valueOf("2024-01-01")).cache()
      // ≤1 current row per business key
      assert(merged.filter($"is_current").groupBy($"emp_id").count()
        .filter($"count" > 1).count() == 0)
      // expired rows close before/at the fresh row's open
      assert(merged.filter(!$"is_current" && $"valid_to".isNull).count() == 0)
      // rerunning the same batch changes nothing
      val again = Scd2.merge(merged, snap1, "emp_id", Seq("name", "dept"),
        Date.valueOf("2024-06-01"))
      assert(again.count() == merged.count())
    }
  }

  test("LSH invariant: identical texts share every band; perturbed near-dups" +
    " are found as candidates") {
    // the augmented-corpus queries rest on this: an exact copy has an
    // identical shingle set -> identical minhash signature -> collides in
    // all 4 bands, so exact dups can never be missed by the LSH stage
    val spark0 = spark
    import spark0.implicits._
    val dir = "/root/testdata/sf0.001"
    val buckets = graft.queries.TextDedup.qMinhashBucket(spark, dir)
      .groupBy($"doc_id").count()
    // every doc emits exactly NumBands=4 band rows
    assert(buckets.filter($"count" =!= 4).count() == 0)
    // manufactured near-dup pairs (doc_id, doc_id+10000) all surface
    val pairs = graft.queries.TextDedup.qMinhashPairs(spark, dir)
      .filter($"b" === $"a" + 10000)
    val expected = graft.core.Tables.documents(spark, dir)
      .filter($"doc_id" % 25 === 0).count()
    assert(pairs.count() >= expected * 9 / 10,
      s"LSH recall collapsed: ${pairs.count()} of $expected perturbed pairs")
  }

  test("dedupWithLog completeness: kept + logged == input; kept is distinct") {
    import spark.implicits._
    val dupRow: Gen[(String, String)] = for {
      k <- Gen.chooseNum(1, 5).map(n => s"k$n")
      v <- Gen.oneOf("a", "b")
    } yield (k, v)
    forAllSampled(Gen.listOfN(30, dupRow)) { rows =>
      val df = rows.toDF("k", "v")
      val ctx = JobContext("prop-job", Date.valueOf("2024-01-01"))
      val (kept, logged) = DqEngine.dedupWithLog(df, "t", col("k"), col("k"), ctx)
      assert(kept.count() + logged.count() == df.count())
      assert(kept.count() == df.distinct().count())
    }
  }

  test("weighted sample: key is the lexicographic max of exactly w md5 draws" +
    " and the winner set is partition-invariant") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.TrainingData.qWeightedSample(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (id, w, key) = (r.getAs[Long]("doc_id"), r.getAs[Int]("weight"),
        r.getAs[String]("key"))
      assert(w >= 1 && w <= 8, s"weight $w out of range")
      // replay the max-of-w-uniforms key on the driver: the ES u^(1/w) draw
      // for integer w, realized as a pure string max — bit-identical here
      val md = java.security.MessageDigest.getInstance("MD5")
      val draws = (1 to w).map { i =>
        md.reset()
        md.digest(s"ws1:$id:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }
      assert(draws.max == key, s"doc $id: key $key != max of $w draws")
    }
    // the top-k heap merge must not depend on physical partitioning
    val ids = got.map(_.getAs[Long]("doc_id")).toSeq
    val reshuffled = graft.core.Tables.documents(spark, dir).repartition(7)
      .select(col("doc_id"),
        (lit(1) + least(expr("cast(n_chars div 100 as int)"), lit(7))).as("weight"))
      .withColumn("key", array_max(expr(
        "transform(sequence(1, weight), " +
          "i -> md5(concat('ws1:', cast(doc_id as string), ':', cast(i as string))))")))
      .orderBy(col("key").desc, col("doc_id")).limit(50)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(reshuffled == ids, "weighted sample changed under repartitioning")
  }

  test("prefix filtering is complete on random token sets: no pair with " +
    "Jaccard >= 0.7 escapes the candidate stage") {
    // the lemma qPrefixJoin rests on, checked directly on adversarial
    // random sets (the fixture corpus only exercises one similarity shape):
    // order tokens by (global df, token); if J(x,y) >= t then x and y share
    // a token inside their |s| - ceil(t*|s|) + 1 prefixes
    val docGen = Gen.listOfN(14, Gen.chooseNum(0, 24)).map(_.distinct)
    forAllSampled(Gen.listOfN(24, docGen), 6) { rawDocs =>
      val docs = rawDocs.zipWithIndex.map { case (ts, i) => (i, ts.toSet) }
        .filter(_._2.nonEmpty)
      val df = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
      def prefix(s: Set[Int]): Set[Int] = {
        val n = s.size
        val plen = n - (7 * n + 9) / 10 + 1
        s.toSeq.sortBy(t => (df(t), t)).take(plen).toSet
      }
      for {
        (a, sa) <- docs; (b, sb) <- docs if a < b
        inter = (sa & sb).size
        union = sa.size + sb.size - inter
        if inter * 10 >= union * 7
      } assert((prefix(sa) & prefix(sb)).nonEmpty,
        s"pair ($a,$b) J=${inter.toDouble / union} shares no prefix token: " +
          s"$sa / $sb")
    }
  }

  test("pagerank: fixed-point ranks are bounded by the mass invariants and " +
    "identical across runs") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val a = graft.queries.Graph.qPagerank(spark, dir).collect()
    // every rank >= the teleport base and <= total mass; dangling + floor
    // can only LOSE mass, never create it
    val n = graft.core.Tables.part(spark, dir).count()
    val base = (1000000000000L / 100) * 15 / n
    a.foreach { r =>
      val rank = r.getAs[Long]("rank")
      assert(rank >= base, s"rank $rank below teleport base $base")
      assert(rank <= 1000000000000L, s"rank $rank exceeds total mass")
    }
    // integer arithmetic: a second run (fresh plan, fresh shuffles) is
    // bit-identical, not just statistically close
    val b = graft.queries.Graph.qPagerank(spark, dir).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "pagerank diverged between identical runs")
  }

  test("topk aggregate equals the row_number window on random data, any k") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // duplicate scores on purpose (small score domain) to stress tie-breaks
    val rowGen = Gen.zip(Gen.choose(0L, 5L), Gen.choose(0, 9).map(_ / 2.0))
    val caseGen = Gen.zip(Gen.listOfN(120, rowGen), Gen.choose(1, 6))
    forAllSampled(caseGen, 6) { case (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((g, s), i) => (g, s, i.toLong) }.toDF("g", "s", "i")
        .repartition(5) // spread groups across partitions → real merges
      // compare WITH the array position so a correctly-membered but
      // mis-ordered topk result still fails
      val native = df.groupBy($"g")
        .agg(expr(s"topk(s, i, $k)").as("t"))
        .select($"g", posexplode($"t"))
        .select($"g", ($"pos" + 1).cast("long").as("rk"),
          $"col.score", $"col.id")
      val w = Window.partitionBy($"g").orderBy($"s".desc, $"i")
      val reference = df
        .withColumn("rn", row_number().over(w)).filter($"rn" <= k)
        .select($"g", $"rn".cast("long").as("rk"),
          $"s".as("score"), $"i".as("id"))
      assert(native.exceptAll(reference).isEmpty &&
        reference.exceptAll(native).isEmpty,
        s"topk(k=$k) diverged from the window reference")
    }
  }

  test("min-label propagation equals union-find on random graphs") {
    val edgeGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 18)
      m <- Gen.choose(1, 28)
      es <- Gen.listOfN(m, for {
        u <- Gen.choose(0L, n.toLong - 1)
        v <- Gen.choose(0L, n.toLong - 1) if u != v
      } yield (math.min(u, v), math.max(u, v)))
    } yield es
    forAllSampled(edgeGen, n = 6) { es =>
      import spark.implicits._
      val e = es.toDF("u", "v")
      val bidir = e.select($"u".as("a"), $"v".as("b"))
        .unionByName(e.select($"v".as("a"), $"u".as("b")))
      val got = graft.queries.Graph.minLabelComponents(bidir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((u, v) <- es) {
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      val nodes = es.flatMap(p => Seq(p._1, p._2)).distinct
      // canonical rep = min node of the component, on both sides
      val want = nodes.map { x =>
        val r = find(x)
        x -> nodes.filter(y => find(y) == r).min
      }.toMap
      assert(got === want, s"CC diverged on edges $es")
    }
  }
}
