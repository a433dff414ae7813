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

  test("filtered ANN: predicate holds in-index, never by post-filtering") {
    val q = Similarity.quantized(spark, sfDir)
      .select(col("vec_id"), col("label"))
    val res = Similarity.annIvfFiltered(spark, sfDir, k = 3)
    // every neighbor satisfies the predicate (same label as probe)
    val labeled = res
      .join(q.withColumnRenamed("vec_id", "probe_id")
        .withColumnRenamed("label", "pl"), "probe_id")
      .join(q.withColumnRenamed("vec_id", "nbr_id")
        .withColumnRenamed("label", "nl"), "nbr_id")
    assert(labeled.filter(col("pl") =!= col("nl")).count() === 0L)
    // ranks are dense 1..k per probe
    res.collect().groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to rows.length))
    }
    // in-index filtering out-fills post-filtering: applying the label
    // predicate AFTER an unfiltered top-k returns at most as many
    // qualified neighbors for every probe
    val post = Similarity.annIvf(spark, sfDir, k = 3)
      .join(q.withColumnRenamed("vec_id", "probe_id")
        .withColumnRenamed("label", "pl"), "probe_id")
      .join(q.withColumnRenamed("vec_id", "nbr_id")
        .withColumnRenamed("label", "nl"), "nbr_id")
      .filter(col("pl") === col("nl"))
      .groupBy("probe_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inIdx = res.groupBy("probe_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    inIdx.foreach { case (p, n) =>
      assert(n >= post.getOrElse(p, 0L),
        s"probe $p: in-index filter must never under-fill vs post-filter")
    }
  }

  test("hybrid retrieval: both legs contribute to the fused ranking") {
    val fusedTop = Similarity.hybridRetrieval(spark, sfDir, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(fusedTop.nonEmpty)
    // dense-only top-5 for comparison
    val denseTop = Similarity.annBruteForce(spark, sfDir, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // the fusion must not degenerate to the dense ranking (the
    // lexical leg reorders at least one probe's list)
    assert(fusedTop.toSet !== denseTop.toSet,
      "RRF fusion must differ from the pure dense ranking")
    // ranks dense 1..k per probe
    fusedTop.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length))
    }
  }
}
