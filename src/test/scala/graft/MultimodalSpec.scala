package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.FakeCodec

/** Spark-side plumbing tests for the multimodal operators: schema, batch
  * shape, error paths, determinism. The codec is the documented stub. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-mm-test")

  lazy val media = Multimodal.syntheticMedia(spark, 52).cache()

  test("codec round-trips and rejects corrupt payloads") {
    val enc = FakeCodec.encode(4, 3, 2, 7L)
    val Some((w, h, c, px)) = FakeCodec.decode(enc)
    assert((w, h, c) == (4, 3, 2) && px.length == 24)
    assert(FakeCodec.decode(enc.drop(3)).isEmpty)
    assert(FakeCodec.decode(Array[Byte](1, 2)).isEmpty)
  }

  test("media table carries typed metadata filterable before decode") {
    // metadata predicate prunes without touching payload bytes
    val wide = media.filter(col("meta.width") >= 16)
    assert(wide.count() > 0 && wide.count() < media.count())
    assert(media.schema("payload").dataType.typeName == "binary")
  }

  test("feature extraction: fixed-width L1-normalized features, error rows") {
    val feats = Multimodal.extractFeatures(media, dim = 16).cache()
    assert(feats.count() == 52)
    val bad = feats.filter(!col("ok"))
    assert(bad.count() == 3) // ids 13, 26, 39 corrupted
    val good = feats.filter(col("ok"))
    assert(good.filter(size(col("features")) =!= 16).count() == 0)
    // L1 norm == 1 (exact: histogram counts / total)
    val sums = good.select(expr(
      "aggregate(features, CAST(0.0 AS DOUBLE), (a, x) -> a + x)").as("s"))
    assert(sums.filter(abs(col("s") - 1.0) > 1e-6).count() == 0)
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, dim = 16)
    assert(feats.select("media_id", "mean_intensity")
      .except(again.select("media_id", "mean_intensity")).count() == 0)
  }

  test("resize produces decodable payloads with the new shape") {
    val resized = Multimodal.resize(media, 4, 4)
    val ok = resized.filter(col("ok")).collect()
    assert(ok.nonEmpty)
    ok.take(5).foreach { r =>
      val Some((w, h, _, _)) = FakeCodec.decode(r.getAs[Array[Byte]]("payload"))
      assert((w, h) == (4, 4))
    }
  }

  test("frame sampling explodes one row into stride-spaced frames") {
    val frames = Multimodal.sampleFrames(media, stride = 4).cache()
    assert(frames.count() > media.count()) // 1→k explosion
    // frame numbering dense from 0 per media_id
    val perId = frames.groupBy("media_id")
      .agg(min("frame_no").as("mn"), max("frame_no").as("mx"), count(lit(1)).as("n"))
    assert(perId.filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count() == 0)
  }

  test("features feed the ANN operators' expected shape (Array[Float])") {
    val feats = Multimodal.extractFeatures(media).filter(col("ok"))
    val dt = feats.schema("features").dataType
    assert(dt == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType))
  }
}
