package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("perceptual-hash near-dup finds payload copies, skips distinct media") {
    import org.apache.spark.sql.functions._
    // controlled payloads: ids 1/2 share bytes (exact dup), 3 is a
    // padded re-encode of the same content (histogram-identical after
    // normalization → same phash), 4 concentrates mass elsewhere
    val a = Array.tabulate[Byte](64)(i => (i % 8).toByte)
    val b = Array.tabulate[Byte](192)(i => (i % 8).toByte) // a, repeated
    val c = Array.fill[Byte](64)(200.toByte)
    val media = Seq(
      (1L, "image", a), (2L, "image", a), (3L, "image", b),
      (4L, "image", c))
      .toDF("media_id", "kind", "bytes")
    val pairs = Multimodal.nearDupMediaPairs(spark, media,
      maxHammingDistance = 0)
      .select("media_id_a", "media_id_b")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // the planted-copy contract at scale: synthesized corpus + copies
    val corpus = Multimodal.synthesize(spark, 200)
    val planted = corpus.filter($"media_id" % 13 === 0)
      .withColumn("media_id", $"media_id" + 100000)
    val found = Multimodal.nearDupMediaPairs(spark,
      corpus.unionByName(planted), maxHammingDistance = 0)
      .filter($"media_id_b" === $"media_id_a" + 100000).count()
    assert(found === corpus.filter($"media_id" % 13 === 0).count())
  }

  test("degenerate (zero-variance) features don't all collide at hash 0") {
    // exactly-uniform histograms: no bin strictly above the mean — the
    // threshold hash carries no signal, so distinct degenerate features
    // must fall back to content hashes instead of all colliding at 0
    val u1 = Array.fill(64)(0.5f)
    val u2 = Array.fill(64)(0.25f)
    val h1 = Multimodal.perceptualHash(u1)
    val h2 = Multimodal.perceptualHash(u2)
    assert(h1 !== 0L)
    assert(h1 !== h2, "distinct degenerate features must not collide")
    // identical degenerate features still pair as exact copies
    assert(Multimodal.perceptualHash(u1.clone) === h1)
    // non-degenerate path unchanged: some bin above the mean sets bits
    val spiky = Array.tabulate(64)(i => if (i == 3) 1f else 0f)
    assert(Multimodal.perceptualHash(spiky) === (1L << 3))
  }

  test("synthesize produces the media schema with binary payloads") {
    val media = Multimodal.synthesize(spark, 30)
    // names + types must match the declared contract (nullability is
    // tighter in the synthesized frame, which is fine)
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f => (f.name, f.dataType.simpleString))
    assert(shape(media.schema) === shape(Multimodal.mediaSchema))
    assert(media.count() === 30)
    assert(media.select("kind").distinct().as[String].collect().toSet ===
      Set("image", "audio", "video"))
  }

  test("resize keeps a byte fraction proportional to the area ratio") {
    val media = Multimodal.synthesize(spark, 12)
    val sizes = media.select("media_id", "bytes", "meta.width", "meta.height")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1).length, r.getInt(2), r.getInt(3))).toMap
    val resized = Multimodal.resize(spark, media, targetW = 64, targetH = 64)
      .select("media_id", "bytes").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).length).toMap
    resized.foreach { case (id, outLen) =>
      val (inLen, w, h) = sizes(id)
      val scale = math.min(1.0, 64.0 * 64 / (w.toDouble * h))
      val expected = math.max(1, (inLen * scale).toInt)
      // regression for the Long-division bug (every downscale kept 1 byte)
      assert(outLen === expected, s"media $id: $outLen != $expected")
      if (w.toLong * h > 64 * 64) assert(outLen > 1 || inLen * scale < 2)
    }
  }

  test("sampleFrames chunks video payloads at the stride") {
    val media = Multimodal.synthesize(spark, 30)
    val frames = Multimodal.sampleFrames(spark, media, frameSize = 16,
      stride = 2).collect()
    assert(frames.nonEmpty)
    // only video rows produce frames; frame indices follow the stride
    val kinds = media.select("media_id", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    frames.foreach { f =>
      assert(kinds(f.media_id) === "video")
      assert(f.frame_idx % 2 === 0)
      assert(f.frame_bytes.length <= 16)
    }
  }

  test("extractFeatures is deterministic and partition-parallel") {
    val media = Multimodal.synthesize(spark, 30)
    val f1 = Multimodal.extractFeatures(spark, media).collect()
      .map(r => r.media_id -> r.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(spark, media).collect()
      .map(r => r.media_id -> r.feature.toSeq).toMap
    assert(f1 === f2)
    assert(f1.size === 30)
    // histogram features are L1-normalized
    f1.values.foreach(v => assert(math.abs(v.sum - 1.0) < 1e-3))
  }
}
