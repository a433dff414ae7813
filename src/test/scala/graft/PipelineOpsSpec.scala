package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{DataQuality, Dedup, Olap, Similarity, TextOps}

/** Round-7 training-pipeline additions: binary (sign-bit) ANN,
  * BPE encode under the trained vocab, domain-balanced mixing. */
class PipelineOpsSpec extends SparkSpec {

  test("binary signature packs 64 dims into one word and popcount matches sign count") {
    val q = Similarity.quantized(spark, sfDir)
    // recompute the packed signature exactly as annBinary does
    val packed = q.withColumn("sig", expr(
      "transform(sequence(0, (size(q) - 1) div 64), w -> " +
        "aggregate(zip_with(slice(q, w * 64 + 1, 64), sequence(0, 63), " +
        "(v, j) -> IF(v is not null and v > 0, " +
        "shiftleft(cast(1 as bigint), cast(j as int)), cast(0 as bigint))), " +
        "cast(0 as bigint), (acc, x) -> acc | x))"))
    val badWidth = packed.filter(size(col("sig")) =!= 1).count()
    assert(badWidth === 0L, "64-dim vectors must pack to exactly one word")
    // the packed popcount must equal the semantic positive-dim count —
    // the same cross-check the oracle performs across engines
    val mismatch = packed
      .withColumn("pc", expr("aggregate(sig, 0, (a, x) -> a + bit_count(x))"))
      .withColumn("pos", expr("size(filter(q, v -> v > 0))"))
      .filter(col("pc") =!= col("pos")).count()
    assert(mismatch === 0L, "popcount(sig) must equal #positive components")
  }

  test("binary hamming candidates + exact rerank keep recall@5 high") {
    val exact = Similarity.annBruteForce(spark, sfDir, k = 5)
      .select(col("probe_id"), col("nbr_id"))
    val bin = Similarity.annBinary(spark, sfDir, k = 5)
      .select(col("probe_id"), col("nbr_id"))
    val total = exact.count()
    assert(total > 0)
    val hits = exact.join(bin, Seq("probe_id", "nbr_id"), "left_semi").count()
    val recall = hits.toDouble / total
    assert(recall >= 0.8, s"binary-rescore recall@5 = $recall")
  }

  test("bpe encode: token counts sit between word and char counts and merges compress") {
    val enc = TextOps.bpeEncode(spark, sfDir).cache()
    val chars = Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr(
        s"length(replace(${TextOps.normExpr}, ' ', ''))").as("n_alnum"))
    val joined = enc.join(chars, "doc_id")
    // every word is at least one token; merges only shrink, so
    // n_words <= n_tok <= alnum char count
    assert(joined.filter(col("n_tok") < col("n_words")).count() === 0L)
    assert(joined.filter(col("n_tok") > col("n_alnum")).count() === 0L)
    // three adopted merges must actually compress somewhere
    assert(joined.filter(col("n_tok") < col("n_alnum")).count() > 0L)
  }

  test("temperature mixing: integer sqrt-weight allocation, shared bucket nests") {
    val mt = DataQuality.mixTemperature(spark, sfDir, total = 200).cache()
    // uniform 25-doc sources here: w = 5 each, Σw = 100, so
    // rate = 200e6·5/(100·25) = 400000 ppm for every source
    assert(mt.filter(col("rate_ppm") =!= 400000L).count() === 0L)
    assert(mt.count() > 0)
    // both samplers share the md5 bucket, so the lower-rate
    // temperature sample nests inside the 600000-ppm capped sample
    val capped = DataQuality.mixSample(spark, sfDir, perSource = 15)
    assert(mt.select("doc_id").except(capped.select("doc_id")).count() === 0L)
  }

  test("semdedup: survivors are pairwise non-similar, first of cell survives") {
    val sd = Similarity.semDedup(spark, sfDir).cache()
    assert(sd.filter(col("is_dup")).count() > 0, "threshold must bite")
    // the earliest vector of every cell has no earlier neighbor
    val firstDropped = sd.withColumn("rn",
      row_number().over(Window.partitionBy("cell").orderBy("vec_id")))
      .filter(col("rn") === 1 && col("is_dup")).count()
    assert(firstDropped === 0L)
    // greedy earlier-id rule ⇒ the kept set is an independent set:
    // recompute pairwise cos among survivors, none may exceed τ
    val q = Similarity.quantized(spark, sfDir)
    val sv = sd.filter(!col("is_dup")).join(q, "vec_id")
    val a = sv.select(col("cell"), col("vec_id"),
      col("q").as("qa"), col("n2").as("n2a"))
    val b = sv.select(col("cell"), col("vec_id").as("vb"),
      col("q").as("qb"), col("n2").as("n2b"))
    val bad = a.join(b, Seq("cell")).filter(col("vec_id") < col("vb"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .filter(expr("cast(dot as double) / (sqrt(cast(n2a as double)) * " +
        "sqrt(cast(n2b as double))) > 0.35")).count()
    assert(bad === 0L, "two surviving vectors in one cell are near-dups")
  }

  test("mix sample: membership honors rates, is deterministic, and nests by budget") {
    val m15 = DataQuality.mixSample(spark, sfDir, perSource = 15).cache()
    // uniform 25-doc sources at this sf: rate must be 15e6/25 ppm
    assert(m15.filter(col("rate_ppm") =!= 600000L).count() === 0L)
    // identical set on a second run (pure function of doc_id)
    val again = DataQuality.mixSample(spark, sfDir, perSource = 15)
    assert(m15.select("doc_id").except(again.select("doc_id")).count() === 0L)
    assert(again.select("doc_id").except(m15.select("doc_id")).count() === 0L)
    // smaller budget selects a SUBSET: the bucket predicate is nested
    val m5 = DataQuality.mixSample(spark, sfDir, perSource = 5)
    assert(m5.select("doc_id").except(m15.select("doc_id")).count() === 0L)
    assert(m5.count() < m15.count())
  }

  test("fixed-point log2: exact at powers of two, within 0.087 bits, monotone") {
    import spark.implicits._
    val q10 = graft.Portable.log2q10Sql("x")
    val rows = spark.range(1, 200000).toDF("x")
      .select(col("x"), expr(q10).as("l"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { case (x, l) =>
      val err = l / 1024.0 - math.log(x.toDouble) / math.log(2.0)
      // chord-below-curve: the interpolation only ever UNDERSHOOTS,
      // by <= 0.0861 bits (log2(1+f)-f maximum) + 1/1024 (the floor)
      assert(err <= 1e-9 && err >= -0.0872, s"log2q10($x) = $l off by $err bits")
      if ((x & (x - 1)) == 0L)
        assert(l % 1024 == 0 && l / 1024 == java.lang.Long.numberOfTrailingZeros(x),
          s"power of two $x must be exact")
    }
    rows.sliding(2).foreach { case Array((_, a), (_, b)) => assert(a <= b) }
  }

  test("nb classifier: one engine-exact prediction per doc, labels from the train set") {
    val nb = TextOps.nbLangid(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
    assert(nb.count() === docs.count(), "exactly one prediction per document")
    assert(nb.select("doc_id").distinct().count() === docs.count())
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    val preds = nb.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(langs), s"predicted $preds outside label set $langs")
    // determinism: the trained model is a pure function of the corpus
    val again = TextOps.nbLangid(spark, sfDir)
    assert(nb.except(again).count() === 0L && again.except(nb).count() === 0L)
  }

  test("lm perplexity: integer NLL, bands partition, English scores closest to its own LM") {
    val lm = TextOps.lmPerplexity(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
    assert(lm.count() === docs.count())
    assert(lm.filter(col("nll_q10") < 0).count() === 0L,
      "smoothed bigram probability can never exceed 1 => NLL >= 0")
    assert(lm.filter(col("band") < 1 || col("band") > 3).count() === 0L)
    assert(lm.filter(col("avg_q10") =!= expr("nll_q10 div n_bigrams")).count() === 0L)
    // the LM is trained on English: en docs must average lower NLL
    val m = lm.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en").agg(avg("avg_q10").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) < m(false),
      s"en mean ${m(true)} must undercut non-en ${m(false)}")
  }

  test("gopher rules: verdict is the rule conjunction, gate is map-side only") {
    val g = TextOps.gopherRules(spark, sfDir).cache()
    assert(g.count() === Tables.documents(spark, sfDir).count())
    assert(g.filter(col("keep") =!= (col("r_len") && col("r_wordlen") && col("r_stop")))
      .count() === 0L)
    // the thresholds must actually split this corpus
    assert(g.filter(col("keep")).count() > 0L)
    assert(g.filter(!col("keep")).count() > 0L)
    // a structural pre-filter must not shuffle: zero exchanges
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextOps.gopherRules(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"gopherRules must be map-side:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("pagerank: integer mass stays bounded, ranks are a permutation, deterministic") {
    val pr = Dedup.sourceRank(spark, sfDir).cache()
    val n = pr.count()
    assert(n > 0)
    // truncating integer arithmetic only ever LOSES mass vs the q40
    // scale, and every node keeps at least the base term
    val s = 1099511627776L
    val total = pr.agg(sum("pr_q40")).collect()(0).getLong(0)
    val base = 15L * s / (100L * n)
    assert(total <= s, s"mass $total exceeds the q40 scale")
    assert(pr.filter(col("pr_q40") < base).count() === 0L)
    val ranks = pr.select("rnk").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq === (1L to n), "rnk must be a permutation")
    val again = Dedup.sourceRank(spark, sfDir)
    assert(pr.except(again).count() === 0L && again.except(pr).count() === 0L)
  }

  test("communities: labels are members, sizes partition the nodes, deterministic") {
    val cm = Dedup.communities(spark, sfDir).cache()
    val n = cm.count()
    assert(n > 0)
    // every node appears exactly once
    assert(cm.select("source").distinct().count() === n)
    // a community's label is one of its members (LPA labels are node names)
    val labels = cm.select("community").distinct().collect().map(_.getString(0)).toSet
    val nodes = cm.select("source").collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(nodes), "labels must be node names")
    // csize is consistent: sum over distinct communities = node count
    val sz = cm.select("community", "csize").distinct()
      .agg(sum("csize")).collect()(0).getLong(0)
    assert(sz === n, "community sizes must partition the node set")
    val again = Dedup.communities(spark, sfDir)
    assert(cm.except(again).count() === 0L && again.except(cm).count() === 0L)
  }

  test("window ranks: family invariants hold inside each partition") {
    val r = Olap.windowRanks(spark, sfDir).cache()
    assert(r.count() > 0)
    assert(r.filter(col("drnk") > col("rnk")).count() === 0L,
      "dense_rank can never exceed rank")
    assert(r.filter(col("quartile") < 1 || col("quartile") > 4).count() === 0L)
    assert(r.filter(col("prnk") < 0.0 || col("prnk") > 1.0).count() === 0L)
    assert(r.filter(col("cd") <= 0.0 || col("cd") > 1.0).count() === 0L)
    assert(r.filter(col("rnk") > 40).count() === 0L)
  }

  test("knn classify: one modal vote per probe, vote counts bounded by k") {
    val kc = Similarity.knnClassify(spark, sfDir, k = 5).cache()
    assert(kc.count() === 25L, "one row per probe")
    assert(kc.filter(col("votes") < 1 || col("votes") > 5).count() === 0L)
    assert(kc.filter(col("correct") =!= (col("label") === col("pred_label"))).count() === 0L)
    // the modal label must be drawn from the label alphabet
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("label").cast("long")).distinct()
    assert(kc.join(labels, kc("pred_label") === labels("label"), "left_anti").count() === 0L)
  }
}
