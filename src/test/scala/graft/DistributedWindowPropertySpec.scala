package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{DistributedRank, DistributedRankRewrite}

/** Randomized parity harness for [[graft.plans.DistributedWindowExec]]:
  * across random data shapes (null density, tie density, group
  * cardinality), random shuffle widths, random PRE-partitionings
  * (sometimes strictly finer than the window key — the straddle path),
  * and random supported-function subsets, the marker-rewritten plan
  * must reproduce WindowExec row for row. The directed cases live in
  * DistributedRankSpec; this spec walks the cross-product the directed
  * cases can't enumerate. Tie-insensitive functions (rank, dense_rank,
  * RANGE aggregates) run over the bare (v) order so real peer runs keep
  * getting exercised; tie-SENSITIVE draws (lag/lead/ntile/ROWS frames,
  * r11 added lead + rolling) switch the whole mix to a total
  * (v, id) order — the same determinism contract WindowExec has. */
class DistributedWindowPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = graft.core.Sessions.local(4, "graft-distwin-prop")
    DistributedRank.install(s)
    s
  }

  private val M = DistributedRankRewrite.NameMarker

  private case class Shape(n: Int, distinctVals: Int, nullMod: Int,
                           groups: Int, shuffleWidth: Int,
                           prePartition: Int, // 0 = none, else width of a
                                              // FINER repartitionByRange
                           funcs: List[String])

  private val shapes: Gen[Shape] = for {
    n <- Gen.choose(200, 3000)
    dv <- Gen.oneOf(1, 3, 17, 101)
    nullMod <- Gen.oneOf(0, 3, 11) // 0 = no nulls
    groups <- Gen.oneOf(0, 1, 2, 5) // 0 = global window
    width <- Gen.oneOf(2, 5, 13)
    pre <- Gen.oneOf(0, 0, 3, 9)
    funcs <- Gen.someOf("rk", "dr", "sum", "min", "max", "ct", "av", "lg",
        "nt", "pr", "ld", "rsum", "rmin", "rct", "fv", "nv", "cd",
        "dsum", "dmn", "dav", "drs", "dfl",
        "sdv", "vpo", "crr", "cvs")
      .suchThat(_.nonEmpty).map(_.toList)
  } yield Shape(n, dv, nullMod, groups, width, pre, funcs)

  private def data(sh: Shape): DataFrame = {
    import spark.implicits._
    val base = spark.range(sh.n).select(
      $"id",
      when(if (sh.nullMod == 0) lit(false) else $"id" % sh.nullMod === 0,
        lit(null))
        .otherwise(abs(hash(concat(lit("v"), $"id"))) % sh.distinctVals)
        .cast("long").as("v"),
      (if (sh.groups == 0) lit(0L)
       else abs(hash(concat(lit("g"), $"id"))) % sh.groups).as("flag"),
      (abs(hash(concat(lit("w"), $"id"))) % 50 - 10).cast("long").as("w"),
      // the r14 decimal channel: NUMERIC(12,2)-shaped money values with
      // their own null stripe (offset from v's so the masks differ)
      when(if (sh.nullMod == 0) lit(false) else $"id" % sh.nullMod === 1,
        lit(null))
        .otherwise(((abs(hash(concat(lit("m"), $"id"))) % 100000)
          .cast("double") / 100).cast("decimal(12,2)")).as("dw"),
      // r14 variance/corr family partners: an integer second measure and
      // a decimal second measure, each with its OWN null stripe so the
      // pair-non-null masking differs from every other column's
      when(if (sh.nullMod == 0) lit(false) else $"id" % sh.nullMod === 2,
        lit(null))
        .otherwise((abs(hash(concat(lit("u"), $"id"))) % 37 - 5)
          .cast("long")).as("w2"),
      when(if (sh.nullMod == 0) lit(false) else $"id" % sh.nullMod === 2,
        lit(null))
        .otherwise(((abs(hash(concat(lit("n"), $"id"))) % 70000)
          .cast("double") / 100).cast("decimal(12,2)")).as("dw2"))
    if (sh.prePartition > 0)
      base.repartitionByRange(sh.prePartition, $"flag", $"v", $"id")
    else base
  }

  private def build(df: DataFrame, sh: Shape,
                    nm: String => String): DataFrame = {
    // lag and ntile are tie-SENSITIVE (the WindowExec contract too), so
    // any shape that draws them runs the whole mix over a TOTAL order;
    // the tie-insensitive shapes keep the bare (v) order so peer runs
    // with real ties keep getting exercised
    val tieSensitive = Set("lg", "nt", "ld", "rsum", "rmin", "rct",
      "fv", "nv", "drs", "vpo")
    val ord =
      if (sh.funcs.exists(tieSensitive)) Seq(col("v"), col("id"))
      else Seq(col("v"))
    val w: WindowSpec =
      if (sh.groups == 0) Window.orderBy(ord: _*)
      else Window.partitionBy(col("flag")).orderBy(ord: _*)
    sh.funcs.foldLeft(df) { (d, f) =>
      f match {
        case "rk"  => d.withColumn(nm("rk"), rank().over(w))
        case "dr"  => d.withColumn(nm("dr"), dense_rank().over(w))
        case "sum" => d.withColumn(nm("s"), sum(col("w")).over(w))
        case "min" => d.withColumn(nm("mn"), min(col("w")).over(w))
        case "max" => d.withColumn(nm("mx"), max(col("w")).over(w))
        case "ct"  => d.withColumn(nm("ct"), count(col("v")).over(w))
        case "av"  => d.withColumn(nm("av"), avg(col("w")).over(w))
        case "lg"  => d.withColumn(nm("lg"), lag(col("w"), 3).over(w))
        case "nt"  => d.withColumn(nm("nt"), ntile(6).over(w))
        case "pr"  => d.withColumn(nm("pr"), percent_rank().over(w))
        case "cd"  => d.withColumn(nm("cd"), cume_dist().over(w))
        case "ld"  => d.withColumn(nm("ld"), lead(col("w"), 2).over(w))
        case "rsum" => d.withColumn(nm("rs"),
          sum(col("w")).over(w.rowsBetween(-4, Window.currentRow)))
        case "rmin" => d.withColumn(nm("rm"),
          min(col("w")).over(w.rowsBetween(-4, Window.currentRow)))
        case "rct" => d.withColumn(nm("rc"),
          count(col("v")).over(w.rowsBetween(-4, Window.currentRow)))
        case "fv" => d.withColumn(nm("fv"), first(col("w")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        case "nv" => d.withColumn(nm("nv"), nth_value(col("w"), 6).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        // r14 decimal family: exact accumulation -> string equality is
        // safe for every decimal function, avg included (scale-6 result)
        case "dsum" => d.withColumn(nm("ds"), sum(col("dw")).over(w))
        case "dmn"  => d.withColumn(nm("dmn"), min(col("dw")).over(w))
        case "dav"  => d.withColumn(nm("dav"), avg(col("dw")).over(w))
        case "drs"  => d.withColumn(nm("drs"),
          sum(col("dw")).over(w.rowsBetween(-4, Window.currentRow)))
        case "dfl"  => d.withColumn(nm("dfl"), max(col("dw")).over(
          w.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        // r14 decomposed moment family. String equality stays safe: the
        // integer inputs keep every Σ/Σ² an exact integer-valued double,
        // the decimal inputs recover the exact decimal channel, and both
        // arms share the identical final projection, so the doubles are
        // bit-for-bit (WindowVarianceDecompose runs in BOTH arms — what
        // differs is only the routing of the sum/count bases)
        case "sdv" => d.withColumn(nm("sdv"), stddev_samp(col("w")).over(w))
        case "vpo" => d.withColumn(nm("vpo"),
          var_pop(col("w")).over(w.rowsBetween(-4, Window.currentRow)))
        case "crr" => d.withColumn(nm("crr"),
          corr(col("w"), col("w2")).over(w))
        case "cvs" => d.withColumn(nm("cvs"),
          covar_samp(col("dw"), col("dw2")).over(w))
      }
    }
  }

  test("random shapes: marker plan == WindowExec (20 sampled shapes)") {
    val params = Gen.Parameters.default
    (0 until 20).foreach { i =>
      val sh = shapes.pureApply(params, Seed(0xBADC0FFEL + i), 100)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions",
          sh.shuffleWidth.toString)
        val df = data(sh)
        val off = build(df, sh, identity)
          .collect().map(_.toString).sorted.toSeq
        val marked = build(df, sh, l => s"${M}_$l")
        val on0 = marked.columns.filter(_.startsWith(s"${M}_"))
          .foldLeft(marked)((d, c) =>
            d.withColumnRenamed(c, c.stripPrefix(s"${M}_")))
        // freeze the rewrite, then compare sorted row strings; `av` over
        // integral w sums exactly in doubles (< 2^53), so string
        // equality is safe for every function in the mix
        on0.queryExecution.optimizedPlan
        val on = on0.collect().map(_.toString).sorted.toSeq
        assert(on == off, s"shape $i diverged: $sh")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
