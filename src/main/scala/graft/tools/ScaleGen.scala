package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the SCALING AUDIT (r10 VERDICT
  * item 1: "measure the 100×-scale story instead of arguing it").
  *
  * `runMain graft.tools.ScaleGen <srcSfDir> <outDir> <replicas> [tables]`
  *
  * Writes every table of `srcSfDir` (or only the comma-listed `tables`
  * subset — e.g. a documents-only wider replica for a single-query
  * adjudication, without paying for a 180M-row lineitem) replicated
  * `replicas`× under `outDir`, DISTRIBUTION-EXACT by construction
  * rather than re-modeled:
  * each replica is the source data under a per-replica key remap
  * (`key·R + rep`), so every per-key row count, join fanout, null rate,
  * value distribution and skew profile is preserved bit-for-bit while
  * total volume scales linearly — the property a growth-ratio audit
  * needs (a re-modeled synthetic corpus would confound scale with law).
  * Replica 0 is the identity, so the source data set is a subset of the
  * output. Fixed dims (region, nation) stay as-is, the TPC-H convention.
  *
  * Two tables carry SIMILARITY structure that naive replication would
  * corrupt (every row would gain R−1 exact twins — a quadratic near-dup
  * explosion that exists in no real corpus):
  *  - documents: replica i ≠ 0 applies a TOKEN CIPHER — every
  *    whitespace token gets a `~i` suffix. Shingle sets transform
  *    bijectively, so WITHIN a replica every Jaccard similarity (and
  *    thus the near-dup pair population) equals the source exactly,
  *    while cross-replica token sets are disjoint (Jaccard 0): dup
  *    pairs scale ×R, corpus ×R — linear, the LSH design's promise;
  *  - embeddings: replica i applies a SIGNED COORDINATE PERMUTATION
  *    (affine index map j → (a·j+b) mod d with odd a, plus
  *    hash-deterministic sign flips) — an exact orthogonal transform,
  *    so within-replica cosine geometry is preserved to the bit while
  *    cross-replica similarities collapse to noise (E[cos] = 0,
  *    sd ≈ 1/√d).
  *
  * Everything is hash-/arithmetic-deterministic: same inputs → same
  * bytes, no RNG, no clock.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleGen <srcSfDir> <outDir> <replicas> [tables]")
    val (srcDir, outDir, rStr) = (args(0), args(1), args(2))
    val allTables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    // a typo'd subset must fail here, not exit 0 with an empty output dir
    only.foreach { ts =>
      val unknown = ts -- allTables
      require(unknown.isEmpty, s"unknown tables: ${unknown.mkString(", ")}")
    }
    val r = rStr.toInt
    require(r >= 1, "replicas must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.tune(spark)

    def src(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")
    def write(name: String, df: => DataFrame): Long = {
      if (only.exists(!_.contains(name))) { println(s"[scalegen] $name: skipped"); return 0L }
      val path = s"$outDir/$name.parquet"
      df.write.mode("overwrite").parquet(path)
      val n = spark.read.parquet(path).count()
      println(s"[scalegen] $name: $n rows -> $path")
      n
    }

    // cross join with the replica index; key remap preserves per-key
    // multiplicity: key k of replica i becomes k·R + i
    val reps = spark.range(r).withColumnRenamed("id", "rep")
    def remap(c: Column): Column = c * r + col("rep")
    def replicated(name: String, keyCols: Seq[String]): DataFrame = {
      val base = src(name).crossJoin(broadcast(reps))
      keyCols.foldLeft(base)((d, k) => d.withColumn(k, remap(col(k))))
        .drop("rep")
    }

    // fixed dims: copy-through (TPC-H keeps nation/region constant in SF)
    write("region", src("region"))
    write("nation", src("nation"))
    write("customer", replicated("customer", Seq("c_custkey")))
    write("supplier", replicated("supplier", Seq("s_suppkey")))
    write("part", replicated("part", Seq("p_partkey")))
    write("orders", replicated("orders", Seq("o_orderkey", "o_custkey")))
    write("lineitem", replicated("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey")))
    write("events", replicated("events", Seq("event_id", "user_id")))

    // documents: token cipher per replica (identity at rep 0). Built
    // inside write()'s by-name argument so a subset run never opens the
    // source file (same discipline as the embeddings block below).
    write("documents", src("documents").crossJoin(broadcast(reps))
      .withColumn("doc_id", remap(col("doc_id")))
      .withColumn("text",
        when(col("rep") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1~"), col("rep")))))
      .withColumn("n_chars", length(col("text")))
      .drop("rep"))

    // embeddings: signed coordinate permutation per replica. The whole
    // block — dim derivation (an eager head() job on the SOURCE file),
    // the gcd require, and the write — sits behind the same subset check
    // write() applies, so a tables-subset run neither scans nor demands
    // an embeddings.parquet the source dir may not have (r13 ADVICE).
    if (!only.exists(!_.contains("embeddings"))) {
      val dim = src("embeddings")
        .select(size(col("embedding"))).head().getInt(0)
      val emb = src("embeddings").crossJoin(broadcast(reps))
        .withColumn("vec_id", remap(col("vec_id")))
        .withColumn("embedding", expr(
          // a = 2·rep+1 is odd → coprime with any power-of-two dim (and
          // with the actual dim checked below); identity at rep 0
          s"""transform(sequence(0, $dim - 1), j ->
             |  embedding[int((int(2 * rep + 1) * j + int(7 * rep)) % $dim)]
             |  * (CASE WHEN rep = 0L OR pmod(hash(rep, j), 2) = 0
             |     THEN CAST(1.0 AS FLOAT) ELSE CAST(-1.0 AS FLOAT) END))
             |""".stripMargin))
        .drop("rep")
      // the affine map j → (a·j+b) mod d is a bijection iff gcd(a, d) = 1.
      // a = 2·rep+1 odd guarantees that only for power-of-two dims (dim=6,
      // a=3 fails: gcd=3 silently duplicates coordinates) — so check every
      // replica's multiplier against the ACTUAL dim, no parity shortcut
      // (r11 ADVICE).
      require((0 until r).forall(rep =>
        BigInt(2 * rep + 1).gcd(BigInt(dim)) == 1),
        s"dim $dim shares a factor with an odd multiplier 2*rep+1 — pick new a's")
      write("embeddings", emb)
    } else println("[scalegen] embeddings: skipped")

    println(s"[scalegen] done: $srcDir x$r -> $outDir")
    spark.stop()
  }
}
