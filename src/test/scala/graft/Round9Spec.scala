package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Olap, TextOps}

/** Round-9 additions: attribution models, Pareto skyline, association
  * rules, TextRank, and k-core peeling. */
class Round9Spec extends SparkSpec {

  test("attribution: both models credit every purchase exactly once") {
    val att = Olap.attribution(spark, sfDir).collect()
    val models = att.map(_.getString(0)).distinct.sorted
    assert(models.sameElements(Array("first_touch", "last_touch")))
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
    val nPurch = purchases.count()
    val totCents = purchases
      .select(col("value").cast("decimal(18,2)").multiply(100)
        .cast("bigint").as("c"))
      .agg(sum("c")).collect()(0).getLong(0)
    Seq("first_touch", "last_touch").foreach { m =>
      val rows = att.filter(_.getString(0) == m)
      assert(rows.map(_.getLong(2)).sum === nPurch, s"$m purchase count")
      assert(rows.map(_.getLong(3)).sum === totCents, s"$m revenue")
      // channels are only ever touches or the direct bucket
      assert(rows.map(_.getString(1)).forall(Set("click", "view", "direct")))
    }
  }

  test("skyline: frontier points are exactly the non-dominated ones") {
    val sky = Olap.skyline(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    // naive O(n^2) reference on the small SF: a (size, price) point
    // survives iff no other part has size >= & price <= with one strict
    val pts = Tables.part(spark, sfDir)
      .select(col("p_size"),
        col("p_retailprice").cast("decimal(18,2)").multiply(100)
          .cast("bigint").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val naive = pts.filter { case (s, p) =>
      !pts.exists { case (s2, p2) =>
        s2 >= s && p2 <= p && (s2 > s || p2 < p) }
    }.toSet
    assert(sky === naive)
    // frontier is strictly monotone: bigger size => strictly higher price
    val sorted = sky.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((s1, p1), (s2, p2)) => assert(s1 < s2 && p1 < p2)
      case _ =>
    }
  }

  test("assoc rules: ppm metrics are consistent and thresholds hold") {
    val rules = Olap.assocRules(spark, sfDir).collect()
    assert(rules.nonEmpty)
    val n = Tables.lineitem(spark, sfDir)
      .select("l_orderkey").distinct().count()
    rules.foreach { r =>
      val (cab, sup, conf, lift) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(sup >= 5000L && conf >= 100000L)
      assert(sup === 1000000L * cab / n)
      assert(conf <= 1000000L) // confidence is a probability
      assert(lift > 0L)
    }
    // rules are directed: a→b and b→a both appear with equal support
    val bySup = rules.map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    bySup.foreach { case ((a, b), s) =>
      assert(bySup.get((b, a)).forall(_ === s))
    }
  }

  test("textrank: ranks are a permutation and mass stays near 2^40") {
    val tr = TextOps.textrank(spark, sfDir).collect()
    val n = tr.length
    assert(tr.map(_.getLong(2)).sorted.sameElements(1L to n.toLong))
    // total q40 mass is conserved up to damping leakage + integer
    // truncation: sum stays within [0.5, 1.0] of the 2^40 unit pool
    val mass = tr.map(_.getLong(1)).sum.toDouble / (1L << 40).toDouble
    assert(mass > 0.5 && mass <= 1.0 + 1e-9, s"mass=$mass")
    // every ranked word is a corpus token
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(expr(TextOps.normExpr), " ")).as("w"))
      .filter(col("w") =!= "").distinct().collect().map(_.getString(0)).toSet
    assert(tr.map(_.getString(0)).forall(vocab))
  }

  test("plan shapes: attribution shuffles once per side, assoc rules reuse the basket exchange, no cartesians") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // attribution: the event stream shuffles ONCE (user window);
      // everything after runs on channel-cardinality rows
      val att = Olap.attribution(spark, sfDir).queryExecution.executedPlan
      assert(!att.toString.contains("CartesianProduct"), att.toString)
      val attScans = att.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      assert(attScans.size <= 2, // union of two projections of ONE pass
        s"attribution re-scans events:\n$att")
      // assoc rules: both sides of the basket self-join are the same
      // subplan — ReuseExchange must dedup the shuffle
      val ar = Olap.assocRules(spark, sfDir).queryExecution.executedPlan
      assert(!ar.toString.contains("CartesianProduct"), ar.toString)
      assert(ar.toString.contains("ReusedExchange"),
        s"basket self-join must reuse one exchange:\n$ar")
      // skyline: no join at all — one aggregate + one tiny window
      val sk = Olap.skyline(spark, sfDir).queryExecution.executedPlan
      assert(!sk.toString.toLowerCase.contains("join"),
        s"skyline must not join:\n$sk")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ewma: first day passes through, later days stay inside the prefix envelope") {
    val rows = Olap.ewma(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val ordered = g.sortBy(_._2)
      assert(ordered.head._4 === ordered.head._3, "e1 = x1")
      ordered.inits.toSeq.reverse.drop(1).foreach { prefix =>
        val e = prefix.last._4
        val xs = prefix.map(_._3)
        // integer truncation only ever loses < 1 cent per step
        assert(e >= xs.min - prefix.length && e <= xs.max,
          s"ewma $e outside [${xs.min}, ${xs.max}]")
      }
    }
  }

  test("winsorize: clamped sum sits inside the [n*lo, n*hi] band and moves toward it") {
    val rows = Olap.winsorize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        col("value").cast("decimal(18,2)").multiply(100).cast("bigint").as("c"))
    rows.foreach { r =>
      val (t, n, raw, w) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val vals = ev.filter(col("event_type") === t).collect()
        .map(_.getLong(1)).sorted
      assert(n === vals.length && raw === vals.sum)
      // winsorized values stay within the observed value range bounds
      assert(w >= n * vals.min && w <= n * vals.max)
      // clamping only moves mass inward: per-type winsorized mean is
      // between the raw min and max
      assert(w / n >= vals.min && w / n <= vals.max)
    }
  }

  test("mode: one row per brand carrying that brand's true max count") {
    val m = Olap.modePerGroup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val brands = Tables.part(spark, sfDir).select("p_brand").distinct().count()
    assert(m.length === brands)
    val cnt = Tables.part(spark, sfDir)
      .groupBy("p_brand", "p_type").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    m.foreach { case (b, t, c) =>
      assert(cnt((b, t)) === c)
      val maxC = cnt.filter(_._1._1 == b).values.max
      assert(c === maxC, s"brand $b mode count $c != max $maxC")
    }
  }

  test("hits: normalized q40 mass, rank permutation, hubs subset of sources") {
    val h = Dedup.hits(spark, sfDir).collect()
    assert(h.nonEmpty)
    assert(h.map(_.getLong(2)).sorted.sameElements(1L to h.length.toLong))
    // renormalization caps total mass at S with only truncation loss
    val mass = h.map(_.getLong(1)).sum.toDouble / (1L << 40).toDouble
    assert(mass > 0.9 && mass <= 1.0 + 1e-9, s"mass=$mass")
    val sources = Tables.documents(spark, sfDir)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(h.map(_.getString(0)).forall(sources))
  }

  test("compression ratio: bounded, deterministic, and monotone under repetition") {
    val rows = TextOps.compressionRatio(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(rows.nonEmpty)
    rows.foreach { case (_, (raw, defl, ppm)) =>
      assert(raw > 0 && defl > 0)
      assert(ppm === 1000000L * defl / raw)
      assert(ppm < 2000000L, "deflate should never double a text")
    }
    // determinism across runs (fixed level, reused deflater)
    val again = TextOps.compressionRatio(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.foreach { case (id, (_, _, ppm)) => assert(again(id) === ppm) }
    // a highly repetitive corpus member compresses harder than average:
    // synthetic word-soup docs repeat a tiny vocabulary, so the best
    // ratio should sit well under the worst
    val ppms = rows.map(_._2._3)
    assert(ppms.min < ppms.max, "ratios should spread")
  }

  test("kcore: survivors come from the candidate graph and peeling only shrinks") {
    val core = Dedup.kcore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Dedup.minhashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg0 = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    // survivors are graph nodes whose INITIAL degree was already >= k
    core.keys.foreach { id => assert(deg0.getOrElse(id, 0L) >= 2L) }
    // residual degree never exceeds the initial degree
    core.foreach { case (id, d) => assert(d <= deg0(id) && d >= 1L) }
  }
}
