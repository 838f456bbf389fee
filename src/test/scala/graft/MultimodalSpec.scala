package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("decodeStub: deterministic L1-normalized 16-bin histogram") {
    val f = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(f.length == 16)
    assert(math.abs(f.sum - 1.0f) < 1e-5)
    assert(f.sameElements(Multimodal.decodeStub("hello world".getBytes("UTF-8"))))
  }

  test("decodeStub: null/empty payload yields zero vector") {
    assert(Multimodal.decodeStub(null).forall(_ == 0f))
    assert(Multimodal.decodeStub(Array.emptyByteArray).forall(_ == 0f))
  }

  test("featurize pipeline: schema, batch shape, byte counts (L7)") {
    val out = Multimodal.documentPayloadFeatures(spark, sf)
    assert(out.columns.sameElements(Array("media_id", "kind", "n_bytes", "features")))
    val row = out.orderBy($"media_id").limit(1)
      .select($"n_bytes", size($"features")).as[(Long, Int)].head()
    assert(row._1 > 0 && row._2 == 16)
    assert(out.count() == Tables.documents(spark, sf).count())
  }
}
