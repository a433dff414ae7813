package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** `plans.TxStatsAggRewrite` — metadata-only count/min/max answered
  * from commit stats, with every bail-out path proven to fall back to
  * a correct scan. */
class StatsAggSpec extends SparkSpec {
  import spark.implicits._

  private def face(root: String) = spark.read.format("graft-tx").load(root)

  /** True when the optimized plan is stats-served (no scan leaf). */
  private def statsServed(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation])

  private def withFlag[T](v: String)(f: => T): T = {
    spark.conf.set(graft.plans.TxStatsAggRewrite.flagKey, v)
    try f finally
      spark.conf.unset(graft.plans.TxStatsAggRewrite.flagKey)
  }

  test("scalar count/min/max served from commit stats, exactly") {
    val root = tmpDir() + "/sagg"
    val df = (1L to 500L).map(k => (k, k * 3 % 101, s"v$k"))
      .toDF("k", "m", "v")
    TxTable.append(df.filter($"k" <= 250), root, statsCols = Seq("k", "m"))
    TxTable.append(df.filter($"k" > 250), root, statsCols = Seq("k", "m"))
    val agg = face(root).agg(count(lit(1)).as("cnt"),
      min($"k").as("mn"), max($"k").as("mx"),
      min($"m").as("m_mn"), max($"m").as("m_mx"))
    assert(statsServed(agg), agg.queryExecution.optimizedPlan.toString)
    val expect = withFlag("false") {
      val r = face(root).agg(count(lit(1)), min($"k"), max($"k"),
        min($"m"), max($"m")).head
      assert(!statsServed(face(root).agg(count(lit(1)).as("c"))))
      r
    }
    assert(agg.head.toSeq === expect.toSeq)
  }

  test("count(col) served from the null-count stat, null-exact") {
    val root = tmpDir() + "/cagg"
    // m is NULL on every 7th row — count(m) must subtract exactly
    // the per-dir n,m stats, never fall back to count(*)
    val df = (1L to 500L).map(k =>
      (k, if (k % 7 == 0) None else Some(k * 3 % 101))).toDF("k", "m")
    TxTable.append(df.filter($"k" <= 250), root, statsCols = Seq("k", "m"))
    TxTable.append(df.filter($"k" > 250), root, statsCols = Seq("k", "m"))
    val agg = face(root).agg(count($"m").as("cnt_m"),
      count(lit(1)).as("cnt"), count($"k").as("cnt_k"))
    assert(statsServed(agg), agg.queryExecution.optimizedPlan.toString)
    val expect = withFlag("false") { face(root).agg(count($"m"),
      count(lit(1)), count($"k")).head }
    assert(agg.head.toSeq === expect.toSeq)
    assert(agg.head.getLong(0) < agg.head.getLong(1),
      "the null-bearing column must count strictly below count(*)")
    // a column with NO null-count stat (string v) bails to the scan
    val root2 = tmpDir() + "/cagg2"
    TxTable.append((1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"),
      root2, statsCols = Seq("k"))
    val bail = face(root2).agg(count($"v").as("c"))
    assert(!statsServed(bail))
    assert(bail.head.getLong(0) === 10L)
    // grouped count(col) rides the same stat
    val root3 = tmpDir() + "/cagg3"
    val df3 = (1L to 400L).map(k =>
      (k, k % 5, if (k % 3 == 0) None else Some(k))).toDF("k", "b", "m")
    TxTable.appendPartitioned(df3, root3, "b", statsCols = Seq("k", "m"))
    val gagg = face(root3).groupBy($"b").agg(count($"m").as("cnt_m"))
    assert(statsServed(gagg), gagg.queryExecution.optimizedPlan.toString)
    val got = gagg.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val exp = withFlag("false") {
      face(root3).groupBy($"b").agg(count($"m").as("cnt_m"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(got === exp)
  }

  test("grouped partition counts served from stats; scan-exact") {
    val root = tmpDir() + "/pagg"
    val df = (1L to 400L).map(k => (k, k % 5)).toDF("k", "b")
    TxTable.appendPartitioned(df, root, "b", statsCols = Seq("k"))
    val agg = face(root).groupBy($"b").agg(count(lit(1)).as("cnt"),
      min($"k").as("mn"), max($"k").as("mx"))
    assert(statsServed(agg), agg.queryExecution.optimizedPlan.toString)
    val got = agg.collect().map(_.toSeq).sortBy(_.head.toString)
    val expect = withFlag("false") {
      face(root).groupBy($"b").agg(count(lit(1)).as("cnt"),
        min($"k").as("mn"), max($"k").as("mx"))
        .collect().map(_.toSeq).sortBy(_.head.toString)
    }
    assert(got === expect)
  }

  test("bails to the scan on MoR deltas, row-restricting options, and " +
    "non-stat columns — and the scan is still correct") {
    val root = tmpDir() + "/sagg-bail"
    TxTable.append((1L to 100L).map(k => (k, k * 2)).toDF("k", "v"), root,
      statsCols = Seq("k"))
    // a row-restricting reader option vetoes whole-table stats
    val ranged = spark.read.format("graft-tx")
      .option("colRange.k", "1,50").load(root)
      .agg(count(lit(1)).as("cnt"))
    assert(!statsServed(ranged))
    assert(ranged.head.getLong(0) === 50L)
    // min/max of a column without stats vetoes
    val nostat = face(root).agg(min($"v").as("mn"))
    assert(!statsServed(nostat))
    assert(nostat.head.getLong(0) === 2L)
    // an MoR delta entry vetoes (deltas supersede base rows)
    TxTable.mergeDelta(spark, root,
      Seq((1L, "U", 999L, 1L)).toDF("k", "op", "v", "seq"))
    val mor = face(root).agg(count(lit(1)).as("cnt"))
    assert(!statsServed(mor))
    assert(mor.head.getLong(0) === 100L)
  }

  test("NULLs in the group column veto the grouped rewrite") {
    val root = tmpDir() + "/pagg-null"
    // dir-clustered single value per dir, but with NULL rows hiding
    // inside: the `n,<col>` null-count stat must block the rewrite
    val d1 = Seq[(java.lang.Long, Long)]((1L, 10L), (1L, 11L), (null, 12L))
      .toDF("b", "k")
    val d2 = Seq[(java.lang.Long, Long)]((2L, 20L), (2L, 21L)).toDF("b", "k")
    TxTable.append(d1, root, statsCols = Seq("b", "k"))
    TxTable.append(d2, root, statsCols = Seq("b", "k"))
    val agg = face(root).groupBy($"b").agg(count(lit(1)).as("cnt"))
    assert(!statsServed(agg))
    val got = agg.collect().map(r =>
      (Option(r.get(0)).map(_.toString).getOrElse("null"), r.getLong(1)))
      .toSet
    assert(got === Set(("1", 2L), ("2", 2L), ("null", 1L)))
    // scalar count over the same table is still stats-served (NULLs
    // don't affect COUNT(*) exactness)
    assert(statsServed(face(root).agg(count(lit(1)).as("cnt"))))
  }

  test("column rename keeps the rewrite firing through the colmap") {
    val root = tmpDir() + "/sagg-ren"
    TxTable.append((1L to 64L).map(k => (k, k)).toDF("k", "v"), root,
      statsCols = Seq("k"))
    TxTable.renameColumn(spark, root, "k", "key")
    val agg = face(root).agg(min($"key").as("mn"), max($"key").as("mx"),
      count(lit(1)).as("cnt"))
    assert(statsServed(agg), agg.queryExecution.optimizedPlan.toString)
    assert(agg.head.toSeq === Seq(1L, 64L, 64L))
  }

  test("count(DISTINCT) served from a fresh exact analyze header") {
    val root = tmpDir() + "/ndvagg"
    val df = (1L to 500L).map(k => (k, k % 37)).toDF("k", "m")
    TxTable.append(df, root, statsCols = Seq("k", "m"))
    TxTable.analyze(spark, root, exact = true)
    val agg = face(root).agg(count_distinct($"m").as("ndv_m"),
      count(lit(1)).as("cnt"), min($"k").as("mn"))
    assert(statsServed(agg), agg.queryExecution.optimizedPlan.toString)
    assert(agg.head.toSeq === Seq(37L, 500L, 1L))
    // a metadata-only commit (rename) keeps the freshness proof: the
    // entry multiset is unchanged, so exactness survives
    TxTable.renameColumn(spark, root, "m", "m2")
    val renamed = face(root).agg(count_distinct($"m2").as("ndv"))
    assert(statsServed(renamed),
      renamed.queryExecution.optimizedPlan.toString)
    assert(renamed.head.getLong(0) === 37L)
  }

  test("count(DISTINCT) bails on stale, approximate, or grouped shapes") {
    val root = tmpDir() + "/ndvbail"
    val df = (1L to 200L).map(k => (k, k % 11)).toDF("k", "m")
    TxTable.append(df, root, statsCols = Seq("k", "m"))
    // approximate analyze: never substituted into an EXACT aggregate
    TxTable.analyze(spark, root)
    val approx = face(root).agg(count_distinct($"m").as("ndv"))
    assert(!statsServed(approx))
    assert(approx.head.getLong(0) === 11L)
    // exact but STALE (a data commit after the analyze): bails
    TxTable.analyze(spark, root, exact = true)
    TxTable.append(Seq((201L, 99L)).toDF("k", "m"), root,
      statsCols = Seq("k", "m"))
    val stale = face(root).agg(count_distinct($"m").as("ndv"))
    assert(!statsServed(stale))
    assert(stale.head.getLong(0) === 12L, "scan answer stays correct")
    // grouped distinct: the header is table-level — must scan
    TxTable.analyze(spark, root, exact = true)
    val grouped = face(root).groupBy($"m").agg(
      count_distinct($"k").as("ndv"))
    assert(!statsServed(grouped))
    assert(grouped.count() === 12L)
  }

  test("MULTI-KEY grouped counts served from the composite proof") {
    val root = tmpDir() + "/mkagg"
    val df = (1L to 400L).map(k => (k, k % 4, k % 3)).toDF("k", "b1", "b2")
    TxTable.appendPartitionedBy(df, root, Seq("b1", "b2"),
      statsCols = Seq("k"))
    val agg = face(root).groupBy($"b1", $"b2")
      .agg(count(lit(1)).as("cnt"), min($"k").as("mn"), max($"k").as("mx"))
    assert(statsServed(agg), agg.queryExecution.optimizedPlan.toString)
    val expect = withFlag("false") {
      face(root).groupBy($"b1", $"b2")
        .agg(count(lit(1)), min($"k"), max($"k"))
        .collect().map(_.toSeq).sortBy(_.mkString(","))
    }
    assert(agg.collect().map(_.toSeq).sortBy(_.mkString(",")) === expect)
  }

  test("STRING group key served from the sx exact-value stat") {
    val root = tmpDir() + "/sgagg"
    val days = (0 until 5).map(d => f"2026-08-$d%02d")
    val df = (1L to 300L).map(k => (k, days((k % 5).toInt)))
      .toDF("k", "day")
    TxTable.appendPartitioned(df, root, "day", statsCols = Seq("k"))
    val agg = face(root).groupBy($"day")
      .agg(count(lit(1)).as("cnt"), max($"k").as("mx"))
    assert(statsServed(agg), agg.queryExecution.optimizedPlan.toString)
    val expect = withFlag("false") {
      face(root).groupBy($"day").agg(count(lit(1)), max($"k"))
        .collect().map(_.toSeq).sortBy(_.head.toString)
    }
    assert(agg.collect().map(_.toSeq).sortBy(_.head.toString) === expect)
    // a plain append whose string column happens to be multi-valued
    // per dir must bail (no sx marker): scan stays correct
    val root2 = tmpDir() + "/sgagg2"
    TxTable.append(df, root2, statsCols = Seq("day"))
    val bail = face(root2).groupBy($"day").agg(count(lit(1)).as("cnt"))
    assert(!statsServed(bail))
    assert(bail.count() === 5L)
  }

  test("DATE group key served from the days-since-epoch stats") {
    val root = tmpDir() + "/dgagg"
    val df = (1L to 200L).map(k => (k, java.sql.Date.valueOf(
      java.time.LocalDate.of(2026, 7, (k % 4 + 1).toInt))))
      .toDF("k", "day")
    TxTable.appendPartitioned(df, root, "day", statsCols = Seq("k"))
    val agg = face(root).groupBy($"day")
      .agg(count(lit(1)).as("cnt"), min($"k").as("mn"))
    assert(statsServed(agg), agg.queryExecution.optimizedPlan.toString)
    val expect = withFlag("false") {
      face(root).groupBy($"day").agg(count(lit(1)), min($"k"))
        .collect().map(_.toSeq).sortBy(_.head.toString)
    }
    assert(agg.collect().map(_.toSeq).sortBy(_.head.toString) === expect)
  }

  test("grouped approx_count_distinct served from per-dir HLL blobs " +
    "under the opt-in flag") {
    val root = tmpDir() + "/andv"
    // 4 partitions; u has a KNOWN small distinct count per group so
    // the coupon-mode estimate is effectively exact
    val df = (1L to 400L).map(k => (k, k % 4, k % 40)).toDF("k", "b", "u")
    TxTable.appendPartitioned(df, root, "b", statsCols = Seq("u"))
    val q = () => face(root).groupBy($"b")
      .agg(approx_count_distinct($"u").as("andv"))
    // OFF by default: the estimator substitution is opt-in
    assert(!statsServed(q()), q().queryExecution.optimizedPlan.toString)
    spark.conf.set(graft.plans.TxStatsAggRewrite.approxNdvKey, "true")
    try {
      val served = q()
      assert(statsServed(served),
        served.queryExecution.optimizedPlan.toString)
      // each group holds exactly 10 distinct u values (k%40 within
      // k%4 fixed): the merged register estimate must round to 10
      val got = served.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === Map(0L -> 10L, 1L -> 10L, 2L -> 10L, 3L -> 10L),
        s"got $got")
      // the SCALAR form serves too (all dirs as one group)
      val scalar = face(root).agg(approx_count_distinct($"u").as("andv"))
      assert(statsServed(scalar),
        scalar.queryExecution.optimizedPlan.toString)
      assert(scalar.head.getLong(0) === 40L)
      // MULTI-KEY grouped approx NDV: the composite clustering proof
      // serves (b, s) groups the same way
      val root2 = tmpDir() + "/andv2"
      val df2 = (1L to 400L).map(k =>
        (k, k % 2, if (k % 4 < 2) "x" else "y", k % 40))
        .toDF("k", "b", "s", "u")
      TxTable.appendPartitionedBy(df2, root2, Seq("b", "s"),
        Seq("u"))
      val multi = spark.read.format("graft-tx").load(root2)
        .groupBy($"b", $"s")
        .agg(approx_count_distinct($"u").as("andv"))
      assert(statsServed(multi),
        multi.queryExecution.optimizedPlan.toString)
      val gotMulti = multi.collect()
        .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
      // per (b, s) cell: u = k % 40 over k ≡ cell (mod 4) → 10 each
      assert(gotMulti.size === 4 && gotMulti.values.forall(_ === 10L),
        s"got $gotMulti")
      // one sketch-less dir voids the serve — bails to the scan,
      // never an undercount
      TxTable.append(Seq((1000L, 9L, 999L)).toDF("k", "b", "u"), root)
      val mixed = face(root).groupBy($"b")
        .agg(approx_count_distinct($"u").as("andv"))
      assert(!statsServed(mixed),
        mixed.queryExecution.optimizedPlan.toString)
      assert(mixed.count() === 5L, "the scan answer stays correct")
    } finally
      spark.conf.unset(graft.plans.TxStatsAggRewrite.approxNdvKey)
  }

  test("group-count cap bails the grouped rewrite to the scan") {
    val root = tmpDir() + "/capagg"
    val df = (1L to 60L).map(k => (k, k % 6)).toDF("k", "b")
    TxTable.appendPartitioned(df, root, "b", statsCols = Seq("k"))
    val q = () => face(root).groupBy($"b").agg(count(lit(1)).as("cnt"))
    assert(statsServed(q()))
    spark.conf.set("spark.graft.statsAgg.maxGroups", "3")
    try {
      val capped = q()
      assert(!statsServed(capped),
        capped.queryExecution.optimizedPlan.toString)
      assert(capped.count() === 6L, "the scan answer stays correct")
    } finally spark.conf.unset("spark.graft.statsAgg.maxGroups")
  }
}
