package graft

import org.apache.spark.sql.functions._
import graft.operators.Media

class MediaSpec extends SparkSpec {

  test("media table carries binary payload + typed metadata") {
    val m = Media.mediaTable(spark, sfDir)
    val r = m.select(col("doc_id"), col("meta.byte_len"), length(col("payload")))
      .collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getInt(1) === row.getInt(2),
      "metadata byte_len must equal payload length"))
  }

  test("byteHistogram bins sum to payload length (per-partition decode)") {
    val m = Media.mediaTable(spark, sfDir).limit(20)
    val h = Media.byteHistogram(spark, m)
    val lens = m.select("doc_id", "meta.byte_len").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    h.collect().foreach { r =>
      val total = r.getAs[Seq[Long]](1).sum
      assert(total === lens(r.getLong(0)))
    }
  }

  test("frameSample keeps every stride-th fixed-size chunk") {
    val m = Media.mediaTable(spark, sfDir).limit(5)
    val frames = Media.frameSample(spark, m, chunk = 100, stride = 2)
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lens = m.select("doc_id", "meta.byte_len").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (id, n) =>
      val chunks = math.max((lens(id) + 99) / 100, 1)
      assert(n === (chunks + 1) / 2, s"doc $id: $chunks chunks -> keep ceil(half)")
    }
  }

  test("decodeStub is deterministic and length-preserving") {
    val in = Array[Byte](1, 2, 3, -5)
    assert(Media.decodeStub(in).toSeq === Media.decodeStub(in).toSeq)
    assert(Media.decodeStub(in).length === 4)
  }
}
