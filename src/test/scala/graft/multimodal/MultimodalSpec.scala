package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

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
