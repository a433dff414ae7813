package graft

import org.apache.spark.sql.functions._
import graft.operators.{DataQuality, Dedup, Olap, TextOps}

/** Round-8 additions: per-group regression, integer anomaly flags,
  * exact-count stratified sampling, fixed-point entropy/PMI, and
  * degree-ordered triangle counting. */
class Round8Spec extends SparkSpec {

  test("regression: slope/intercept pass through the group means and r2 = corr^2") {
    val reg = Olap.regression(spark, sfDir).collect()
    assert(reg.length === 3)
    // cross-check against a direct double computation per group
    val raw = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)").cast("bigint").cast("double").as("x"),
        col("l_extendedprice").cast("decimal(18,2)").multiply(100)
          .cast("bigint").cast("double").as("y"))
      .groupBy("l_returnflag")
      .agg(avg("x").as("mx"), avg("y").as("my"),
        covar_pop("x", "y").as("cov"), var_pop("x").as("vx"),
        corr("x", "y").as("r"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    reg.foreach { r =>
      val (mx, my, cov, vx, cr) = raw(r.getString(0))
      val slope = r.getDouble(2); val icept = r.getDouble(3); val r2 = r.getDouble(4)
      assert(math.abs(slope - cov / vx) < 1e-6 * math.abs(slope).max(1.0))
      // the fitted line passes through (x̄, ȳ)
      assert(math.abs((icept + slope * mx) - my) < 1e-3 * math.abs(my).max(1.0))
      assert(math.abs(r2 - cr * cr) < 1e-6)
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("semi join matches the inner-join-distinct formulation") {
    val semi = Olap.semiJoin(spark, sfDir)
    val viaInner = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey")).distinct(), "c_custkey")
      .select("c_custkey", "c_name", "c_mktsegment")
    assert(semi.count() > 0)
    assert(semi.exceptAll(viaInner).count() === 0)
    assert(viaInner.exceptAll(semi).count() === 0)
  }

  test("anomaly: the integer flag set is exactly the |z| > 3 set") {
    val flagged = Olap.anomaly(spark, sfDir)
      .select("event_id").collect().map(_.getLong(0)).toSet
    // recompute in doubles: population stats per event_type
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        col("value").cast("decimal(18,2)").multiply(100)
          .cast("bigint").cast("double").as("v"))
    val st = ev.groupBy("event_type")
      .agg(avg("v").as("mu"), stddev_pop("v").as("sd"))
    val viaDouble = ev.join(st, "event_type")
      .filter(abs(col("v") - col("mu")) > col("sd") * 3)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(flagged === viaDouble)
    assert(flagged.nonEmpty)
  }

  test("stratified sample: exact ceil(n*pct/100) rows per stratum, deterministic") {
    val pct = 5
    val got = DataQuality.stratifiedSample(spark, sfDir, pct)
      .groupBy("lang").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1) * pct + 99) / 100)).toMap
    assert(got === want)
    // determinism: the same doc_ids come back on a second run
    val a = DataQuality.stratifiedSample(spark, sfDir, pct)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = DataQuality.stratifiedSample(spark, sfDir, pct)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("token entropy: 0 <= ent <= log2(n_tok) + interpolation error") {
    val rows = TextOps.tokenEntropy(spark, sfDir)
      .withColumn("cap", expr(Portable.log2q10Sql("n_tok")))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val ent = r.getLong(2); val cap = r.getLong(3)
      // uniform distribution maxes entropy at log2(n); the piecewise
      // log2 can wobble ±88 q10 units around that bound
      assert(ent >= -176 && ent <= cap + 176,
        s"doc ${r.getLong(0)}: ent=$ent cap=$cap")
    }
    // a repeated-token doc has zero entropy: build one inline via the
    // same arithmetic (c = n case): log2q10(n) - n*log2q10(n) div n = 0
    val n = 7L
    val s = n * Portable.log2q10(n)
    assert(Portable.log2q10(n) - s / n === 0L)
  }

  test("pmi: counts behind a sampled pair are the true corpus counts") {
    val pmi = TextOps.pmiCollocations(spark, sfDir).cache()
    assert(pmi.count() > 0)
    val sample = pmi.orderBy(col("cxy").desc, col("w1"), col("w2")).first()
    val (w1, w2, cxy) = (sample.getString(0), sample.getString(1), sample.getLong(2))
    assert(cxy >= 5)
    // recount the bigram directly from normalized text
    val direct = Tables.documents(spark, sfDir)
      .select(split(expr(TextOps.normExpr), " ").as("tk"))
      .select(explode(expr(TextOps.ngramExpr(2))).as("g"))
      .filter(col("g") === s"$w1 $w2").count()
    assert(direct === cxy)
    pmi.unpersist()
  }

  test("moment stats: match the native skewness/kurtosis to float tolerance") {
    val got = Olap.momentStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5))).toMap
    val native = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)").cast("bigint").cast("double").as("x"))
      .groupBy("l_returnflag")
      .agg(skewness("x").as("sk"), kurtosis("x").as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet === native.keySet && got.nonEmpty)
    got.foreach { case (k, (sk, ku)) =>
      val (nsk, nku) = native(k)
      assert(math.abs(sk - nsk) < 1e-6, s"$k skew $sk vs $nsk")
      assert(math.abs(ku - nku) < 1e-6, s"$k kurt $ku vs $nku")
    }
  }

  test("chi2: contributions reproduce the textbook double formula; margins consistent") {
    val cells = Olap.chi2(spark, sfDir).collect()
    assert(cells.length > 1)
    val docs = Tables.documents(spark, sfDir)
    val nn = docs.count().toDouble
    val r = docs.groupBy("lang").count().collect()
      .map(x => x.getString(0) -> x.getLong(1).toDouble).toMap
    val c = docs.groupBy("source").count().collect()
      .map(x => x.getString(0) -> x.getLong(1).toDouble).toMap
    cells.foreach { row =>
      val (lang, src, o, contrib) =
        (row.getString(0), row.getString(1), row.getLong(2), row.getLong(3))
      val e = r(lang) * c(src) / nn
      val want = (o - e) * (o - e) / e * 1e6
      // integer floor of an exact rational vs the float formula
      assert(math.abs(contrib - want) <= math.max(1.0, want * 1e-9) + 1.0,
        s"cell ($lang,$src): $contrib vs $want")
    }
    // total cell count equals corpus size
    assert(cells.map(_.getLong(2)).sum === nn.toLong)
  }

  test("prefix-filtered jaccard equals the naive all-pairs join and prunes candidates") {
    val sh = Dedup.shingles(spark, sfDir).cache()
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val naive = sh.select(col("doc_id").as("doc_a"), col("s"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s")), "s")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(col("i") * 100 >= (col("na") + col("nb") - col("i")) * 60)
      .select("doc_a", "doc_b")
    val pfx = Dedup.jaccardPrefix(spark, sfDir).select("doc_a", "doc_b")
    assert(pfx.count() > 0)
    assert(pfx.exceptAll(naive).count() === 0 && naive.exceptAll(pfx).count() === 0,
      "prefix filtering must be lossless at the threshold")
    sh.unpersist()
  }

  test("bitmap overlap equals distinct-user intersection counts") {
    val got = Olap.bitmapOverlap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val u = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select("event_type", "user_id").distinct()
    val want = u.select(col("event_type").as("type_a"), col("user_id"))
      .join(u.select(col("event_type").as("type_b"), col("user_id")), "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want && got.nonEmpty)
  }

  test("triangles: counts match the brute-force 3-way edge join and sum % 3 == 0") {
    val e = Dedup.minhashPairs(spark, sfDir).cache()
    val tri = Dedup.triangles(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: (a<b), (b<c), (a<c) all edges
    val ab = e.select(col("doc_a").as("a"), col("doc_b").as("b"))
    val bc = e.select(col("doc_a").as("b"), col("doc_b").as("c"))
    val ac = e.select(col("doc_a").as("a"), col("doc_b").as("c"))
    val brute = ab.join(bc, "b").join(ac, Seq("a", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === brute)
    assert(tri.values.sum % 3 === 0)
    e.unpersist()
  }
}
