package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends GraftSpec {

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaTable(spark, sf)
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val n = media.count()
    assert(n == Tables.documents(spark, sf).count())
    assert(media.select("meta.kind").distinct().count() == 3)
  }

  test("feature extraction is deterministic and histogram sums to byte count") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf)).collect()
    feats.foreach { f =>
      assert(f.histogram.sum == f.n_bytes)
      assert(f.mean_intensity > 0 && f.mean_intensity < 256)
    }
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf)).collect()
    assert(feats.map(f => f.media_id -> f.mean_intensity).toMap ==
      again.map(f => f.media_id -> f.mean_intensity).toMap)
  }

  test("resize caps payloads and patches metadata consistently") {
    val media = Multimodal.mediaTable(spark, sf)
    val orig = media.collect().map(m => m.media_id -> m).toMap
    val resized = Multimodal.resize(media, 64).collect()
    resized.foreach { m =>
      assert(m.payload.length <= 64)
      val o = orig(m.media_id)
      if (o.payload.length > 64) {
        assert(m.meta.width == math.max(1, o.meta.width / 2))
        assert(m.payload.sameElements(o.payload.take(64)))
      } else assert(m.meta == o.meta)
    }
  }

  test("frame sampling decimates video payloads deterministically") {
    val media = Multimodal.mediaTable(spark, sf)
    val orig = media.collect().map(m => m.media_id -> m).toMap
    val sampled = Multimodal.frameSample(media, frameBytes = 16, everyNth = 2).collect()
    sampled.foreach { m =>
      val o = orig(m.media_id)
      if (o.meta.kind != "video") assert(m.payload.sameElements(o.payload))
      else {
        // kept frames are the even-indexed 16-byte slices of the original
        val expected = o.payload.grouped(16).zipWithIndex
          .collect { case (f, i) if i % 2 == 0 => f }.flatten.toArray
        assert(m.payload.sameElements(expected), s"media ${m.media_id}")
        assert(m.meta.durationMs == o.meta.durationMs / 2)
      }
    }
  }

  test("metadata predicate filters without touching payloads") {
    val imgs = Multimodal.selectKind(Multimodal.mediaTable(spark, sf), "image")
    assert(imgs.count() > 0)
    assert(imgs.collect().forall(_.meta.kind == "image"))
    val stats = Multimodal.featureStats(
      Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))).collect()
    assert(stats.length == 3)
    assert(stats.map(_.getAs[Long]("n_items")).sum == Tables.documents(spark, sf).count())
  }
}
