package graft

import org.apache.spark.sql.functions._
import graft.operators.{DataQuality, Dedup, Olap, TextOps}
import graft.sources.TxTable

/** Round-10 additions: conditional MERGE INTO, Holt linear trend,
  * MAD robust outliers, per-domain caps, n-gram novelty, and the
  * dedup cluster-size audit. */
class Round10Spec extends SparkSpec {

  test("holt: day one passes through, recursion replays driver-side") {
    val rows = Olap.holt(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, days) =>
      val sorted = days.sortBy(_._2)
      var l = 0L; var b = 0L
      sorted.zipWithIndex.foreach { case ((_, _, x, lv, tr, fc), i) =>
        if (i == 0) { l = x; b = 0L }
        else { val l2 = (x + l + b) / 2; b = ((l2 - l) + b) / 2; l = l2 }
        assert(lv === l && tr === b && fc === l + b)
      }
    }
  }

  test("mad: outlier flags match a naive recompute, median is an element") {
    val out = Olap.madOutliers(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val cents = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").multiply(100)
          .cast("bigint").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // percentile_disc(0.5): smallest element with cume_dist >= 0.5
    def med(xs: Array[Long]): Long = xs((xs.length + 1) / 2 - 1)
    out.foreach { case (p, m, mad, nOut, n) =>
      val xs = cents(p)
      assert(n === xs.length)
      assert(m === med(xs), s"median mismatch for $p")
      val devs = xs.map(x => math.abs(x - m)).sorted
      assert(mad === med(devs), s"MAD mismatch for $p")
      assert(nOut === xs.count(x => math.abs(x - m) > 3 * mad))
    }
  }

  test("domain cap: caps at the P90 of domain sizes, deterministic") {
    val capped = DataQuality.domainCap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val sizes = Tables.documents(spark, sfDir)
      .groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // percentile_disc(0.9): smallest element with cume_dist >= 0.9,
    // i.e. the ceil(0.9 n)-th of the sorted domain sizes
    val sorted = sizes.values.toArray.sorted
    val cap = sorted((9 * sorted.length + 9) / 10 - 1)
    val perSrc = capped.groupBy(_._2).view.mapValues(_.length).toMap
    perSrc.foreach { case (src, n) =>
      assert(n === math.min(sizes(src), cap), s"cap violated for $src")
    }
    // rk is a 1..n permutation within each source
    capped.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).sorted.sameElements(1L to g.length.toLong))
    }
    val again = DataQuality.domainCap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(capped.toSet === again.toSet)
  }

  test("ngram novelty: bounded ppm, earliest doc is fully novel") {
    val nov = TextOps.ngramNovelty(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(nov.nonEmpty)
    nov.foreach { case (_, n, novel, ppm) =>
      assert(novel >= 0 && novel <= n)
      assert(ppm === novel * 1000000L / n)
    }
    // the corpus' earliest doc can only ever see itself: every span's
    // first occurrence is it, so its novelty is exactly 1e6 ppm
    val firstDoc = nov.map(_._1).min
    val fd = nov.find(_._1 == firstDoc).get
    assert(fd._3 === fd._2 && fd._4 === 1000000L)
  }

  test("cluster sizes: histogram ties out against the cluster table") {
    val hist = Dedup.clusterSizes(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val clusters = Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = clusters.groupBy(_._2).values
      .groupBy(_.size).view.mapValues(_.size).toMap
    assert(hist.map(_._1).toSet === expect.keySet.map(_.toLong))
    hist.foreach { case (sz, nClusters, nDocs) =>
      assert(sz >= 2, "an edge-connected cluster has at least 2 docs")
      assert(nClusters === expect(sz.toInt).toLong)
      assert(nDocs === sz * nClusters)
    }
  }

  test("bpe fertility: sums tie out with per-doc encode, ratios bounded") {
    val fert = TextOps.bpeFertility(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(fert.nonEmpty)
    val enc = TextOps.bpeEncode(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(sum("n_words").as("w"), sum("n_tok").as("t"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    fert.foreach { case (lang, nDocs, words, tokens, chars, fppm, cppm) =>
      assert(nDocs > 0 && words >= nDocs)
      assert((words, tokens) === enc(lang), s"sums diverge for $lang")
      // a word is at least one token; a token is at most the word
      assert(tokens >= words)
      assert(fppm === tokens * 1000000L / words)
      assert(cppm === chars * 1000000L / tokens)
      assert(cppm >= 1000000L, "a BPE token is at least one char")
    }
  }

  test("asof forward: next click is the true successor within tolerance") {
    val tol = 3600000000L
    val got = Olap.asofForward(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // naive per-user recompute
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("t"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1),
        r.getString(2), r.getLong(3)))
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
      .view.mapValues(_.map(_._4).sorted).toMap
    val errors = ev.filter(_._3 == "error")
    assert(got.length === errors.length)
    val gotById = got.map(g => g._1 -> g._3).toMap
    errors.foreach { case (eid, user, _, t) =>
      val nxt = clicksByUser.getOrElse(user, Array.empty[Long])
        .find(_ >= t).getOrElse(-1L)
      val expect = if (nxt >= 0 && nxt - t <= tol) nxt else -1L
      assert(gotById(eid) === expect, s"error $eid")
    }
  }

  test("mergeInto: each clause fires on exactly its slice") {
    val root = tmpDir() + "/merge-tbl"
    import spark.implicits._
    val base = Seq((1L, 10L, 100.0), (2L, 11L, 200.0), (3L, 12L, 300.0),
      (9L, 13L, 900.0), (5L, 14L, 500.0))
      .toDF("k", "grp", "price")
    TxTable.append(base, root)
    // source: update k=3 (price x2), delete k=9, insert k=20 (passes
    // the s_grp gate) and k=21 (fails it), k=5 matched but update
    // condition false -> row untouched
    val src = Seq((3L, 12L, 600.0), (9L, 13L, 0.0), (5L, 14L, 500.0),
      (20L, 30L, 111.0), (21L, 31L, 222.0))
      .toDF("k", "grp", "price")
    TxTable.mergeInto(spark, root, src, Seq("k"),
      matchedUpdate = Map("price" -> "s_price"),
      matchedUpdateCond = Some("s_price <> price"),
      matchedDeleteCond = Some("k = 9"),
      notMatchedCond = Some("s_grp % 2 = 0"))
    val got = TxTable.read(spark, root).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("grp"),
        r.getAs[Double]("price"))).toSet
    assert(got === Set((1L, 10L, 100.0), (2L, 11L, 200.0),
      (3L, 12L, 600.0), (5L, 14L, 500.0), (20L, 30L, 111.0)))
    // duplicate source keys are a cardinality violation
    val dup = Seq((3L, 12L, 1.0), (3L, 12L, 2.0)).toDF("k", "grp", "price")
    intercept[IllegalArgumentException] {
      TxTable.mergeInto(spark, root, dup, Seq("k"))
    }
    // NULL-valued conditions must not fire their clause (IS TRUE
    // semantics): a NULL delete predicate keeps the row
    val root2 = tmpDir() + "/merge-null"
    TxTable.append(Seq((1L, 10L, 100.0)).toDF("k", "grp", "price"), root2)
    TxTable.mergeInto(spark, root2,
      Seq((1L, 10L, 150.0)).toDF("k", "grp", "price"), Seq("k"),
      matchedUpdate = Map("price" -> "s_price"),
      matchedDeleteCond = Some("cast(NULL as boolean)"))
    assert(TxTable.read(spark, root2).collect()
      .map(_.getAs[Double]("price")).toSeq === Seq(150.0))
  }
}
