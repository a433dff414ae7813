package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class KmeansSpec extends SparkSpec {

  test("k-means training reduces inertia over the seed codebook") {
    val q = Similarity.quantized(spark, sfDir)
    val seed = q.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("q").as("qc"))
    val trained = Similarity.trainCentroids(spark, sfDir, k = 16, iters = 3)
    assert(trained.count() <= 16 && trained.count() > 1)
    val before = Similarity.inertia(q, seed)
    val after = Similarity.inertia(q, trained)
    assert(after < before,
      s"training must improve the codebook: before=$before after=$after")
  }

  test("training is deterministic") {
    val a = Similarity.trainCentroids(spark, sfDir, k = 8, iters = 2)
      .orderBy("cid").collect().map(_.toString)
    val b = Similarity.trainCentroids(spark, sfDir, k = 8, iters = 2)
      .orderBy("cid").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
