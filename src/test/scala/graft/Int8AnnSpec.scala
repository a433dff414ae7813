package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Int8 symmetric quantization: code-range invariant and search
  * quality (recall@k vs the full-precision ranking) — the index-tuning
  * check that decides whether 1-byte codes are good enough before a
  * corpus is re-encoded at scale. */
class Int8AnnSpec extends SparkSpec {

  test("int8 codes stay in [-127, 127] and zero vectors code to zeros") {
    val codes = Similarity.int8Codes(spark, sfDir)
    val bad = codes.select(explode(col("q")).as("c"))
      .filter(col("c") < -127 || col("c") > 127).count()
    assert(bad === 0L)
    // every non-zero vector uses the full range: max|code| = 127
    val under = codes.filter(col("n2") > 0)
      .withColumn("cmax", expr("aggregate(q, 0L, (m, x) -> greatest(m, abs(x)))"))
      .filter(col("cmax") =!= 127).count()
    assert(under === 0L, "symmetric scaling must hit 127 on the max dim")
  }

  test("multi-probe LSH recall dominates single-bucket LSH recall") {
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
      val exact = Similarity.annBruteForce(spark, sfDir, k = 3)
        .select(col("probe_id"), col("nbr_id"))
      val hits = exact.join(approx.select("probe_id", "nbr_id"),
        Seq("probe_id", "nbr_id"), "left_semi").count()
      hits.toDouble / exact.count()
    }
    val single = recallOf(Similarity.annLsh(spark, sfDir, k = 3))
    val multi = recallOf(Similarity.annLshMultiProbe(spark, sfDir, k = 3))
    // bit-flip probing can only widen each probe's candidate set
    assert(multi >= single, s"multi-probe $multi < single-bucket $single")
    assert(multi > 0.0, "multi-probe must find some true neighbors")
  }

  test("trained codebooks beat the deterministic stand-ins on recall@5") {
    // same structure (residual IVF-PQ, same seeds, same nprobe), the
    // only delta is Lloyd training of both quantizers — recall must
    // not get WORSE for the training cost
    val trained = Similarity.recallVsExact(spark, sfDir,
      Similarity.annPqTrained(spark, sfDir, k = 5), k = 5)
    val untrained = Similarity.recallVsExact(spark, sfDir,
      Similarity.annIvfPqResidual(spark, sfDir, k = 5), k = 5)
    assert(trained >= untrained,
      s"trained recall $trained < untrained $untrained")
    assert(trained > 0.0, "trained index must find some true neighbors")
  }

  test("int8 recall@5 against full-precision brute force is high") {
    val exact = Similarity.annBruteForce(spark, sfDir, k = 5)
      .select(col("probe_id"), col("nbr_id"))
    val quant = Similarity.annInt8(spark, sfDir, k = 5)
      .select(col("probe_id"), col("nbr_id"))
    val hits = exact.join(quant, Seq("probe_id", "nbr_id"), "left_semi").count()
    val total = exact.count()
    assert(total > 0)
    val recall = hits.toDouble / total
    // 127 levels per dim loses almost nothing on cosine ranking
    assert(recall >= 0.8, s"int8 recall@5 = $recall")
  }
}
