package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media ride through the warehouse as opaque `binary` payload
  * columns + a typed metadata struct, and the per-item decode /
  * feature-extract / resize / frame-sample steps run as partition-local
  * transforms over the binary bytes.
  *
  * The Spark-side plumbing here — schema, batch shape, partitioning,
  * operator signatures — is real and tested; the codec itself is STUBBED
  * with a deterministic fake (see [[FakeCodec]]): this build ships no
  * image/audio libraries, and a production deployment swaps exactly one
  * function. The fake parses a tiny self-describing header ("GFT1" magic +
  * width/height/channels) so decode logic, error paths (corrupt payload →
  * null + issue row), and shape arithmetic are all exercised.
  *
  * Scale design:
  *  - payloads never visit the driver: all ops are `mapPartitions` over the
  *    rows of a partition (the Scala analogue of batch-wise Pandas UDFs) or
  *    pure expressions; partition sizing is governed by bytes not rows —
  *    repartition media tables by `total_bytes / target_partition_bytes`;
  *  - metadata (dims, codec, duration) lives in a plain struct column so
  *    filters like `meta.width >= 64` prune BEFORE any decode happens and
  *    push down to the parquet scan;
  *  - derived features are fixed-width float arrays — the same shape the
  *    [[graft.queries.Embeddings]] ANN operators consume downstream.
  */
object Multimodal {

  /** Driver entry with a REAL DuckDB oracle: the fake codec is pure
    * integer arithmetic on (media_id, pixel index), so the whole
    * decode → histogram pipeline is replayable in SQL (see
    * [[oracle]]). The `features` float array is projected back to its
    * exact integer bin counts (`round(f · w·h·c)` recovers the count —
    * |float error| ≪ 0.5 at ≤1152 pixels) joined as a CSV string, so
    * every output column is a scalar the driver can sort/hash and the
    * float normalization inside [[extractFeatures]] stays oracle-exact. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> ((s: SparkSession, _: String) =>
      extractFeatures(syntheticMedia(s, 200))
        .withColumn("features",
          when(col("features").isNull, lit(null: String)).otherwise(
            concat_ws(",", transform(col("features"),
              f => round(f * col("width") * col("height") * col("channels"))
                .cast("long").cast("string")))))
        .orderBy(col("media_id"))),
    "q_multimodal_resize" -> ((s: SparkSession, _: String) =>
      resize(syntheticMedia(s, 200), 6, 5)
        .withColumn("pixels", bytesCsv(col("payload"), headerBytes = 7))
        .drop("payload")
        .orderBy(col("media_id"))),
    "q_multimodal_frames" -> ((s: SparkSession, _: String) =>
      sampleFrames(syntheticMedia(s, 200), stride = 3)
        .withColumn("frame_px", bytesCsv(col("frame"), headerBytes = 0))
        .drop("frame")
        .orderBy(col("media_id"), col("frame_no"))),
    // Audio framing: the audio-modality rows treated as mono PCM sample
    // streams (payload body = samples), cut into 16-sample windows with
    // hop 8 — the standard feature-extraction front end (and the shape a
    // real STFT/VAD plugs into). Per frame: integer energy Σ|b−128| and
    // an activity flag; per media: frame/active counts + total energy.
    // Pure codegen expression chain over the hex rendering (no UDF, no
    // mapPartitions — framing is index arithmetic, not codec work);
    // corrupt payloads fail the magic+length check and drop out, same
    // contract as decode. Oracle replays the LCG samples byte-for-byte.
    "q_audio_frames" -> ((s: SparkSession, _: String) => {
      val body = length(col("payload")) - 7
      syntheticMedia(s, 200)
        .filter(col("modality") === "audio")
        .filter(expr("substring(hex(payload), 1, 8) = '47465431'") &&
          length(col("payload")) ===
            col("meta.width") * col("meta.height") * col("meta.channels") + 7)
        .select(col("media_id"), hex(col("payload")).as("hx"),
          body.cast("long").as("nb"))
        .filter(col("nb") >= 16)
        .select(col("media_id"), col("hx"),
          explode(expr("sequence(cast(0 as bigint), (nb - 16) div 8)"))
            .as("k"))
        .withColumn("energy", expr(
          "aggregate(transform(sequence(0, 15), j -> " +
            "abs(cast(conv(substr(hx, cast(15 + (k * 8 + j) * 2 as int), 2)," +
            " 16, 10) as bigint) - 128)), cast(0 as bigint), " +
            "(acc, e) -> acc + e)"))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("energy") >= 1024, 1L).otherwise(0L)).as("n_active"),
          sum(col("energy")).as("total_energy"))
        .orderBy(col("media_id"))
    }),
    // Perceptual hash near-dup (dHash): the ORDER-sensitive complement of
    // q_media_neardup's histogram cosine — a dHash encodes the horizontal
    // gradient STRUCTURE (8×9 stride-sampled grid, bit = left<right), so
    // two images with identical color distributions but different layout
    // diverge here and match there. 64 bits packed as two 32-bit words in
    // BIGINTs (one << 63 would overflow the sign), Hamming distance =
    // bit_count(xor) per word, top-10 closest same-shape pairs. Pure
    // codegen over the hex rendering (the q_audio_frames idiom); the
    // oracle replays the LCG pixels arithmetically, never touching bytes.
    "q_media_phash" -> ((s: SparkSession, _: String) => {
      // first-channel byte of grid cell (r, c9): row = r·h div 8,
      // col = c9·w div 9 — valid for every synthetic shape (w,h ≥ 8)
      def pix(rExpr: String, cExpr: String): String =
        "cast(conv(substr(hx, cast(15 + (((" + rExpr + ") * h div 8) * w + " +
          "((" + cExpr + ") * w div 9)) * ch * 2 as int), 2), 16, 10) as bigint)"
      def word(lo: Int): String =
        s"aggregate(sequence($lo, ${lo + 31}), cast(0 as bigint), (acc, k) -> " +
          "acc + (CASE WHEN " + pix("(k - " + lo + ") div 8 + " + (lo / 8).toString,
            "(k - " + lo + ") % 8") + " < " +
          pix("(k - " + lo + ") div 8 + " + (lo / 8).toString,
            "(k - " + lo + ") % 8 + 1") +
          s" THEN shiftleft(cast(1 as bigint), cast(k - $lo as int)) ELSE cast(0 as bigint) END))"
      val hashed = syntheticMedia(s, 200)
        .filter(col("modality") === "image")
        .filter(expr("substring(hex(payload), 1, 8) = '47465431'") &&
          length(col("payload")) ===
            col("meta.width") * col("meta.height") * col("meta.channels") + 7)
        .select(col("media_id"), hex(col("payload")).as("hx"),
          col("meta.width").as("w"), col("meta.height").as("h"),
          col("meta.channels").as("ch"))
        .select(col("media_id"), col("w"), col("h"), col("ch"),
          expr(word(0)).as("h1"), expr(word(32)).as("h2"))
      def side(n: String) = hashed.select(col("media_id").as(n),
        col("w"), col("h"), col("ch"),
        col("h1").as(s"h1_$n"), col("h2").as(s"h2_$n"))
      side("a").join(side("b"), Seq("w", "h", "ch"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          expr("bit_count(h1_a ^ h1_b) + bit_count(h2_a ^ h2_b)")
            .cast("int").as("hamming"))
        .orderBy(col("hamming"), col("a"), col("b"))
        .limit(10)
    }),
    // Media near-dup: the decode→features→similarity bridge, end to end.
    // Blocking key = shape metadata (you never compare a thumbnail to a 4K
    // frame — and the block join replaces the cartesian product), then
    // EXACT cosine over integer histogram vectors inside each block: dot
    // and norms are integer sums, the one sqrt is IEEE-exact, so the
    // similarity is bit-identical in the DuckDB replay. Top-20 pairs.
    "q_media_neardup" -> ((s: SparkSession, _: String) => {
      val f = extractFeatures(syntheticMedia(s, 200))
        .filter(col("ok"))
        .withColumn("counts", expr("transform(features, " +
          "f -> cast(round(f * width * height * channels) as bigint))"))
        .withColumn("nrm", expr(
          "aggregate(counts, cast(0 as bigint), (acc, e) -> acc + e * e)"))
      def side(n: String) = f.select(col("media_id").as(n),
        col("width"), col("height"), col("channels"),
        col("counts").as(s"c_$n"), col("nrm").as(s"n_$n"))
      side("a").join(side("b"), Seq("width", "height", "channels"))
        .filter(col("a") < col("b"))
        .withColumn("dot", expr("aggregate(zip_with(c_a, c_b, " +
          "(x, y) -> x * y), cast(0 as bigint), (acc, e) -> acc + e)"))
        .withColumn("cos_sim",
          col("dot") / sqrt((col("n_a") * col("n_b")).cast("double")))
        .select(col("a"), col("b"), col("cos_sim"))
        .orderBy(col("cos_sim").desc, col("a"), col("b"))
        .limit(20)
    }))

  /** Binary column → CSV of unsigned byte values past `headerBytes`, as a
    * pure codegen'd expression chain (hex + per-pair base conversion) — the
    * projection that lets the driver sort/hash an opaque payload and the
    * DuckDB oracle replay it byte-for-byte. */
  private def bytesCsv(bin: Column, headerBytes: Int): Column = {
    val start = headerBytes * 2 + 1 // 1-based offset into the hex rendering
    when(bin.isNull, lit(null).cast("string"))
      // a payload at/under the header length has no body: emit "" — without
      // this guard Spark's sequence(0, -1) counts DOWN ([0, -1]) and the
      // transform emits junk values for truncated payloads (review finding;
      // latent for the current callers, which only pass well-formed sizes)
      .when(length(bin) <= headerBytes, lit(""))
      .otherwise(concat_ws(",",
        transform(
          sequence(lit(0), length(bin).cast("int") - lit(headerBytes + 1)),
          i => conv(substr(hex(bin), lit(start) + i * 2, lit(2)), 16, 10))))
  }

  /** DuckDB replay of [[FakeCodec]] + [[extractFeatures]] over the same
    * 200-row synthetic table: pixel byte = ((id+i)·1103515245+12345) >>> 16
    * & 0xff, all BIGINT ops (`// 65536 % 256` — operands are positive, so
    * shift = floor-div). idx is the 0..1151 index pool (max w·h·c) joined
    * with `j < w·h·c` because generate_series takes no lateral args.
    * mean_intensity is one division of identical integers in both engines
    * → bit-identical doubles. */
  val oracle: Map[String, String] = Map(
    // Replay of q_media_phash: the dHash grid cells replay the LCG body
    // bytes arithmetically (byte j of media i = ((i+j)·1103515245+12345)
    // // 65536 % 256 — the q_multimodal_features idiom); identical bit
    // packing into two 32-bit words and bit_count(xor) Hamming.
    "q_media_phash" ->
      """WITH m AS (
        |  SELECT CAST(i AS BIGINT) AS media_id,
        |         8 + (i % 5) * 4 AS w, 8 + (i % 3) * 4 AS h,
        |         CASE WHEN i % 2 = 0 THEN 3 ELSE 1 END AS ch
        |  FROM generate_series(0, 199) AS t(i)),
        |img AS (
        |  SELECT * FROM m
        |  WHERE media_id % 4 <> 3
        |    AND NOT (media_id % 13 = 0 AND media_id > 0)),
        |kk AS (SELECT CAST(v AS BIGINT) AS k FROM generate_series(0, 63) s(v)),
        |bits AS (
        |  SELECT i.media_id, i.w, i.h, i.ch, kk.k,
        |    CASE WHEN
        |      ((i.media_id + (((kk.k // 8) * i.h // 8) * i.w
        |        + ((kk.k % 8) * i.w // 9)) * i.ch)
        |        * 1103515245 + 12345) // 65536 % 256
        |      <
        |      ((i.media_id + (((kk.k // 8) * i.h // 8) * i.w
        |        + (((kk.k % 8) + 1) * i.w // 9)) * i.ch)
        |        * 1103515245 + 12345) // 65536 % 256
        |    THEN 1 ELSE 0 END AS bit
        |  FROM img i CROSS JOIN kk),
        |hashes AS (
        |  SELECT media_id, w, h, ch,
        |    CAST(sum(CASE WHEN k < 32
        |      THEN bit * (CAST(1 AS BIGINT) << CAST(k AS INT))
        |      ELSE 0 END) AS BIGINT) AS h1,
        |    CAST(sum(CASE WHEN k >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << CAST(k - 32 AS INT))
        |      ELSE 0 END) AS BIGINT) AS h2
        |  FROM bits GROUP BY 1, 2, 3, 4)
        |SELECT a.media_id AS a, b.media_id AS b,
        |  CAST(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2))
        |    AS INT) AS hamming
        |FROM hashes a JOIN hashes b
        |  ON a.w = b.w AND a.h = b.h AND a.ch = b.ch
        |  AND a.media_id < b.media_id
        |ORDER BY hamming, a, b LIMIT 10""".stripMargin,
    // Replay of q_audio_frames: audio rows are i % 4 = 3 (all odd → c = 1,
    // body = w·h samples ≥ 64); sample k·8+j replays the fake-codec LCG;
    // frame k ∈ [0, (nb−16)//8]; energy/activity identical integer ops.
    "q_audio_frames" ->
      """WITH m AS (
        |  SELECT CAST(i AS BIGINT) AS media_id,
        |         8 + (i % 5) * 4 AS w, 8 + (i % 3) * 4 AS h,
        |         CASE WHEN i % 2 = 0 THEN 3 ELSE 1 END AS c
        |  FROM generate_series(0, 199) AS t(i)),
        |audio AS (
        |  SELECT media_id, w * h * c AS nb FROM m
        |  WHERE media_id % 4 = 3
        |    AND NOT (media_id % 13 = 0 AND media_id > 0)),
        |frames AS (
        |  SELECT a.media_id, k.k FROM audio a
        |  JOIN (SELECT CAST(v AS BIGINT) AS k
        |        FROM generate_series(0, 200) AS s(v)) k
        |    ON k.k <= (a.nb - 16) // 8),
        |j AS (SELECT CAST(v AS BIGINT) AS j FROM generate_series(0, 15) AS s(v)),
        |en AS (
        |  SELECT f.media_id, f.k,
        |    sum(abs(((f.media_id + f.k * 8 + j.j) * 1103515245 + 12345)
        |      // 65536 % 256 - 128)) AS energy
        |  FROM frames f CROSS JOIN j GROUP BY 1, 2)
        |SELECT media_id, count(*) AS n_frames,
        |  CAST(sum(CASE WHEN energy >= 1024 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_active,
        |  CAST(sum(energy) AS BIGINT) AS total_energy
        |FROM en GROUP BY media_id ORDER BY media_id""".stripMargin,
    "q_multimodal_features" ->
      """WITH m AS (
        |  SELECT CAST(i AS BIGINT) AS media_id,
        |         8 + (i % 5) * 4 AS w, 8 + (i % 3) * 4 AS h,
        |         CASE WHEN i % 2 = 0 THEN 3 ELSE 1 END AS c
        |  FROM generate_series(0, 199) AS t(i)),
        |good AS (SELECT * FROM m WHERE NOT (media_id % 13 = 0 AND media_id > 0)),
        |idx AS (SELECT CAST(j AS BIGINT) AS j FROM generate_series(0, 1151) AS s(j)),
        |px AS (
        |  SELECT g.media_id, g.w, g.h, g.c,
        |         ((g.media_id + i.j) * 1103515245 + 12345) // 65536 % 256 AS b
        |  FROM good g JOIN idx i ON i.j < g.w * g.h * g.c),
        |hist AS (
        |  SELECT media_id, b // 16 AS bin, count(*) AS v FROM px GROUP BY 1, 2),
        |bins AS (SELECT g.media_id, CAST(bb.bin AS BIGINT) AS bin
        |         FROM good g, generate_series(0, 15) AS bb(bin)),
        |feat AS (
        |  SELECT b.media_id,
        |    string_agg(CAST(coalesce(h.v, 0) AS VARCHAR), ',' ORDER BY b.bin)
        |      AS features
        |  FROM bins b LEFT JOIN hist h ON h.media_id = b.media_id AND h.bin = b.bin
        |  GROUP BY b.media_id),
        |mi AS (SELECT media_id, sum(b) / (w * h * c) AS mean_intensity
        |       FROM px GROUP BY media_id, w, h, c)
        |SELECT m.media_id,
        |  NOT (m.media_id % 13 = 0 AND m.media_id > 0) AS ok,
        |  CASE WHEN g.media_id IS NOT NULL THEN CAST(m.w AS INTEGER) END AS width,
        |  CASE WHEN g.media_id IS NOT NULL THEN CAST(m.h AS INTEGER) END AS height,
        |  CASE WHEN g.media_id IS NOT NULL THEN CAST(m.c AS INTEGER) END AS channels,
        |  mi.mean_intensity, f.features
        |FROM m
        |LEFT JOIN good g USING (media_id)
        |LEFT JOIN mi USING (media_id)
        |LEFT JOIN feat f USING (media_id)
        |ORDER BY m.media_id""".stripMargin,
    // Replay of [[resize]] (nearest-neighbor, 6×5 target): output pixel j
    // maps to source index ((y·h//5)·w + (x·w//6))·c + ch with ch = j % c,
    // x = (j//c) % 6, y = j//c//6 — all BIGINT floor-divs, identical to the
    // Scala int arithmetic; the byte value replays the fake-codec LCG as in
    // q_multimodal_features. Corrupt payloads → ok=false, NULL pixels.
    "q_multimodal_resize" ->
      """WITH m AS (
        |  SELECT CAST(i AS BIGINT) AS media_id,
        |         8 + (i % 5) * 4 AS w, 8 + (i % 3) * 4 AS h,
        |         CASE WHEN i % 2 = 0 THEN 3 ELSE 1 END AS c
        |  FROM generate_series(0, 199) AS t(i)),
        |good AS (SELECT * FROM m WHERE NOT (media_id % 13 = 0 AND media_id > 0)),
        |idx AS (SELECT CAST(j AS BIGINT) AS j FROM generate_series(0, 89) AS s(j)),
        |px AS (
        |  SELECT g.media_id, i.j,
        |    ((g.media_id
        |      + ((i.j // g.c // 6 * g.h // 5) * g.w
        |         + (i.j // g.c % 6) * g.w // 6) * g.c + i.j % g.c)
        |     * 1103515245 + 12345) // 65536 % 256 AS b
        |  FROM good g JOIN idx i ON i.j < 30 * g.c),
        |pix AS (
        |  SELECT media_id, string_agg(CAST(b AS VARCHAR), ',' ORDER BY j)
        |    AS pixels
        |  FROM px GROUP BY media_id)
        |SELECT m.media_id,
        |  NOT (m.media_id % 13 = 0 AND m.media_id > 0) AS ok,
        |  p.pixels
        |FROM m LEFT JOIN pix p USING (media_id)
        |ORDER BY m.media_id""".stripMargin,
    // Replay of [[sampleFrames]] (stride 3): frame rows y ∈ {0,3,…} < h,
    // frame bytes j ∈ [0, w·c) at source index y·w·c + j; corrupt payloads
    // emit no rows (matching the flatMap's empty branch).
    "q_multimodal_frames" ->
      """WITH m AS (
        |  SELECT CAST(i AS BIGINT) AS media_id,
        |         8 + (i % 5) * 4 AS w, 8 + (i % 3) * 4 AS h,
        |         CASE WHEN i % 2 = 0 THEN 3 ELSE 1 END AS c
        |  FROM generate_series(0, 199) AS t(i)),
        |good AS (SELECT * FROM m WHERE NOT (media_id % 13 = 0 AND media_id > 0)),
        |frames AS (
        |  SELECT g.media_id, g.w, g.h, g.c, y.y
        |  FROM good g
        |  JOIN (SELECT CAST(v AS BIGINT) AS y
        |        FROM generate_series(0, 15, 3) AS s(v)) y ON y.y < g.h),
        |idx AS (SELECT CAST(j AS BIGINT) AS j FROM generate_series(0, 83) AS s(j)),
        |fb AS (
        |  SELECT f.media_id, f.y, i.j,
        |    ((f.media_id + f.y * f.w * f.c + i.j) * 1103515245 + 12345)
        |      // 65536 % 256 AS b
        |  FROM frames f JOIN idx i ON i.j < f.w * f.c)
        |SELECT media_id, CAST(y // 3 AS INTEGER) AS frame_no,
        |  string_agg(CAST(b AS VARCHAR), ',' ORDER BY j) AS frame_px
        |FROM fb GROUP BY media_id, y
        |ORDER BY media_id, frame_no""".stripMargin,
    // Replay of q_media_neardup: histogram vectors from the same LCG pixel
    // arithmetic, shape-blocked pairs, integer dot/norms, one sqrt.
    "q_media_neardup" ->
      """WITH m AS (
        |  SELECT CAST(i AS BIGINT) AS media_id,
        |         8 + (i % 5) * 4 AS w, 8 + (i % 3) * 4 AS h,
        |         CASE WHEN i % 2 = 0 THEN 3 ELSE 1 END AS c
        |  FROM generate_series(0, 199) AS t(i)),
        |good AS (SELECT * FROM m WHERE NOT (media_id % 13 = 0 AND media_id > 0)),
        |idx AS (SELECT CAST(j AS BIGINT) AS j FROM generate_series(0, 1151) AS s(j)),
        |px AS (
        |  SELECT g.media_id, g.w, g.h, g.c,
        |         ((g.media_id + i.j) * 1103515245 + 12345) // 65536 % 256 AS b
        |  FROM good g JOIN idx i ON i.j < g.w * g.h * g.c),
        |hist AS (
        |  SELECT media_id, b // 16 AS bin, count(*) AS v FROM px GROUP BY 1, 2),
        |vec AS (
        |  SELECT g.media_id, g.w, g.h, g.c, CAST(bb.bin AS BIGINT) AS bin,
        |         CAST(coalesce(h.v, 0) AS BIGINT) AS v
        |  FROM good g
        |  CROSS JOIN generate_series(0, 15) AS bb(bin)
        |  LEFT JOIN hist h ON h.media_id = g.media_id AND h.bin = bb.bin),
        |nrm AS (
        |  SELECT media_id, any_value(w) AS w, any_value(h) AS h,
        |         any_value(c) AS c, CAST(sum(v * v) AS BIGINT) AS nn
        |  FROM vec GROUP BY media_id),
        |dots AS (
        |  SELECT x.media_id AS a, y.media_id AS b,
        |         CAST(sum(x.v * y.v) AS BIGINT) AS dot
        |  FROM vec x
        |  JOIN vec y ON x.bin = y.bin AND x.w = y.w AND x.h = y.h
        |    AND x.c = y.c AND x.media_id < y.media_id
        |  GROUP BY 1, 2)
        |SELECT d.a, d.b,
        |  CAST(d.dot AS DOUBLE)
        |    / sqrt(CAST(na.nn * nb.nn AS DOUBLE)) AS cos_sim
        |FROM dots d
        |JOIN nrm na ON na.media_id = d.a
        |JOIN nrm nb ON nb.media_id = d.b
        |ORDER BY cos_sim DESC, d.a, d.b LIMIT 20""".stripMargin)

  /** Media-table schema: id + modality + typed metadata + opaque payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("codec", StringType))), nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Deterministic fake codec standing in for the real image library.
    * Payload layout: "GFT1" magic, then width/height/channels bytes, then
    * width*height*channels "pixel" bytes. */
  object FakeCodec {
    val Magic: Array[Byte] = "GFT1".getBytes("UTF-8")

    def encode(width: Int, height: Int, channels: Int, seed: Long): Array[Byte] = {
      val px = Array.tabulate(width * height * channels)(i =>
        (((seed + i) * 1103515245 + 12345) >>> 16 & 0xff).toByte)
      Magic ++ Array(width.toByte, height.toByte, channels.toByte) ++ px
    }

    /** Decoded image: dims + pixel bytes. Returns None for corrupt input —
      * the error path every real codec needs. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (payload == null || payload.length < 7) return None
      if (!payload.take(4).sameElements(Magic)) return None
      val (w, h, c) = (payload(4) & 0xff, payload(5) & 0xff, payload(6) & 0xff)
      val px = payload.drop(7)
      if (px.length != w * h * c) None else Some((w, h, c, px))
    }
  }

  /** Build a deterministic demo media table from a row range (the fixture
    * generator for tests; a real pipeline reads parquet with this schema).
    * Every 13th payload is corrupted to exercise the decode error path. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val (w, h, c) = (8 + (i % 5) * 4, 8 + (i % 3) * 4, if (i % 2 == 0) 3 else 1)
      val good = FakeCodec.encode(w, h, c, i.toLong)
      val payload = if (i % 13 == 0 && i > 0) good.drop(5) else good
      Row(i.toLong, if (i % 4 == 3) "audio" else "image",
        Row(w, h, c, "gft1"), payload)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }

  /** Feature-extraction output schema. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_intensity", DoubleType),
    StructField("features", ArrayType(FloatType))))

  /** Decode + feature-extract, partition-local (no shuffle, no driver
    * traffic). Features = `dim`-bin histogram of pixel bytes, L1-normalized
    * — deterministic, fixed-width, ANN-ready. Corrupt payloads yield
    * ok=false rows instead of failing the job. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        FakeCodec.decode(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, c, px)) =>
            val hist = new Array[Long](dim)
            px.foreach(b => hist((b & 0xff) * dim / 256) += 1)
            val total = math.max(px.length, 1).toDouble
            val feats = hist.map(v => (v / total).toFloat)
            val mean = px.map(_ & 0xff).sum / total
            Row(id, true, w, h, c, mean, feats.toSeq)
          case None =>
            Row(id, false, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(out, featureSchema)
  }

  /** Resize stub: recompute shape metadata + a deterministic downsampled
    * payload (nearest-neighbor over the fake pixel grid). Partition-local. */
  def resize(media: DataFrame, newW: Int, newH: Int): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("payload", BinaryType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        FakeCodec.decode(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, c, px)) =>
            val resized = Array.tabulate(newW * newH * c) { i =>
              val ch = i % c; val x = (i / c) % newW; val y = i / c / newW
              px(((y * h / newH) * w + (x * w / newW)) * c + ch)
            }
            Row(id, true,
              FakeCodec.Magic ++ Array(newW.toByte, newH.toByte, c.toByte) ++ resized)
          case None => Row(id, false, null)
        }
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Frame-sample stub (video → every `stride`-th row of the pixel grid as
    * a "frame"): one input row explodes to k output rows, the shape a video
    * pipeline needs. Implemented as flatMap over partitions. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        FakeCodec.decode(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, c, px)) =>
            (0 until h by stride).zipWithIndex.map { case (y, fno) =>
              Row(id, fno, px.slice(y * w * c, (y + 1) * w * c))
            }
          case None => Seq.empty[Row]
        }
      }
    }
    spark.createDataFrame(out, schema)
  }
}
