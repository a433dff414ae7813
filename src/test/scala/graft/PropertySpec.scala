package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized equivalence properties for the custom kernels, sketches
  * and optimizer rewrites: scalacheck generators (fixed seed —
  * reproducible failures) produce a few hundred adversarial inputs,
  * and each property is ONE Spark comparison of the custom path
  * against a declarative/exact reference over all of them at once.
  */
class PropertySpec extends SparkSpec {

  private def draw[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
      val r = g.doPureApply(Gen.Parameters.default, s)
      (r.seed, Some(r.retrieve.get))
    }.drop(1).take(n).flatMap(_._2).toSeq

  test("hist_quantile / hist_quantile_cont bracket the exact percentile on random data") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val width = 16L
    val vals = draw(Gen.chooseNum(0L, 16L * 64 - 1), 500, 7L)
    val df = vals.toDF("v")
    val est = df.agg(
      expr(s"hist_sketch(v, ${width}L, 64)").as("h"))
      .selectExpr(
        "hist_quantile(h, 0.5, 16L) AS d50",
        "hist_quantile_cont(h, 0.5, 16L) AS c50",
        "hist_quantile(h, 0.95, 16L) AS d95",
        "hist_quantile_cont(h, 0.95, 16L) AS c95").collect()(0)
    val sorted = vals.sorted
    def exactDisc(p: Double): Long = {
      val target = math.max(1L, math.ceil(p * sorted.size).toLong)
      sorted(target.toInt - 1)
    }
    // disc readout = upper boundary of the exact value's bucket
    Seq(0.5 -> est.getLong(0), 0.95 -> est.getLong(2)).foreach {
      case (p, e) =>
        val x = exactDisc(p)
        assert(e > x && e - x <= width, s"p=$p: boundary $e vs exact $x")
        assert(e % width === 0)
    }
    // cont readout stays inside the interpolation's bracket
    Seq(est.getDouble(1), est.getDouble(3)).foreach { c =>
      assert(c > 0 && c <= 16.0 * 64, s"cont estimate $c out of range")
    }
    assert(est.getDouble(1) <= est.getDouble(3),
      "cont quantiles must be monotone in p")
  }

  test("snapshot-diff round-trip: applying changes() to the old snapshot yields the new one") {
    import spark.implicits._
    import graft.sources.TxTable
    // random keyed states for two merge commits
    val kv = Gen.listOfN(40, Gen.zip(Gen.chooseNum(1L, 25L), Gen.chooseNum(0, 999)))
    val (s1, s2) = (draw(kv, 1, 11L).head, draw(kv, 1, 13L).head)
    def asChanges(rows: Seq[(Long, Int)]) = rows.zipWithIndex
      .map { case ((k, v), i) => (k, "I", v.toDouble, i.toLong) }
      .toDF("k", "op", "v", "seq")
    val root = tmpDir() + "/tx-diff-prop"
    TxTable.merge(spark, root, asChanges(s1))
    TxTable.merge(spark, root, asChanges(s2))
    val prev = TxTable.read(spark, root, version = 1).as[(Long, Double)]
      .collect().toMap
    val cur = TxTable.read(spark, root, version = 2).as[(Long, Double)]
      .collect().toMap
    val feed = TxTable.changes(spark, root, fromV = 1, toV = 2)
      .select("op", "k", "v").as[(String, Long, Double)].collect()
    // replay the diff over prev: I/U set, D drops
    val replayed = feed.foldLeft(prev) { case (m, (op, k, v)) =>
      if (op == "D") m - k else m + (k -> v)
    }
    assert(replayed === cur,
      "the change feed must transform the old snapshot into the new one")
  }

  test("dedup cascade partitions the corpus: every doc gets exactly one verdict") {
    graft.functions.GraftFunctions.register(spark)
    val verdicts = graft.operators.Dedup.cascade(spark, sfDir)
    val total = graft.Tables.documents(spark, sfDir).count()
    assert(verdicts.count() === total, "one verdict per document")
    assert(verdicts.select("doc_id").distinct().count() === total,
      "no document may appear under two stages")
    val stages = verdicts.groupBy("stage").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages.keySet.subsetOf(Set("exact", "near", "semantic", "keep")))
    assert(stages.getOrElse("keep", 0L) > 0, "some documents must survive")
  }

  test("weighted reservoir: deterministic, k-bounded, and weight-respecting") {
    import spark.implicits._
    // two groups x 500 docs; in group "a" the first 50 ids carry weight
    // 50, the rest weight 1 — heavy rows should dominate the sample
    val rows = (0 until 1000).map { i =>
      val g = if (i < 500) "a" else "b"
      val w = if (i % 500 < 50) 50.0 else 1.0
      (g, i.toLong, w)
    }
    val df = rows.toDF("g", "id", "w")
    def sample() = graft.operators.Relational
      .weightedReservoirPerGroup(df, "g", "id", "w", k = 25)
      .select("g", "id").as[(String, Long)].collect().toSet
    val s1 = sample()
    // determinism across runs and partitionings
    val s2 = graft.operators.Relational
      .weightedReservoirPerGroup(df.repartition(13), "g", "id", "w", k = 25)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(s1 === s2, "the same rows must survive under any partitioning")
    assert(s1.count(_._1 == "a") === 25 && s1.count(_._1 == "b") === 25)
    // weight 50 vs 1 at 50-vs-450 population: heavy rows (expected
    // inclusion ~0.85 each under A-ES) must dominate the 25 survivors
    val heavy = s1.filter { case (_, id) => id % 500 < 50 }.size
    assert(heavy >= 30, s"heavy rows must dominate both samples, got $heavy/50")
  }

  test("array_dot_long equals the interpreted lambda on random arrays (nulls, length skews)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val arr = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        9 -> Gen.chooseNum(-10000L, 10000L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))))
    val pairs = draw(Gen.zip(arr, arr), 300, 1L)
    val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
      .withColumn("native", expr("array_dot_long(a, b)"))
      .withColumn("lambda", expr(
        "CASE WHEN size(a) = size(b) THEN aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) END"))
    val bad = df.filter(
      (col("native").isNull =!= col("lambda").isNull) ||
        (col("native").isNotNull && col("native") =!= col("lambda"))).count()
    assert(bad === 0L, "codegen dot product must match the lambda on every input")
  }

  test("band-join rewrite returns exactly the naive pairs on random keys and widths") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // keys bounded so the naive abs() itself cannot overflow
    val keys = draw(Gen.chooseNum(-1000000L, 1000000L), 150, 2L)
    val cs = Seq(1L, 7L, 1000L)
    val a = keys.toDF("ta")
    val b = keys.map(k => k + 3).toDF("tb")
    cs.foreach { c =>
      val got = a.join(b, expr(s"abs(ta - tb) <= ${c}L")).count()
      val expected = (for { x <- keys; y <- keys.map(_ + 3) if math.abs(x - y) <= c } yield 1).size.toLong
      assert(got === expected, s"C=$c")
    }
  }

  test("hist_sketch equals the exact bucketed histogram on random values") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val vals = draw(Gen.chooseNum(-500L, 5000L), 400, 3L)
    val df = vals.toDF("v")
    val sketch = df.agg(expr("hist_sketch(v, 100L, 16)")).collect()(0).getSeq[Long](0)
    val exact = df.selectExpr("least(15L, greatest(0L, v div 100)) AS b")
      .groupBy("b").count().collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    (0 until 16).foreach(i =>
      assert(sketch(i) === exact.getOrElse(i, 0L), s"bucket $i"))
  }

  test("cms_sketch never underestimates any value's true count") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val vals = draw(Gen.oneOf(Gen.alphaStr.map(_.take(6)), Gen.chooseNum(0, 30).map("v" + _)), 500, 4L)
      .filter(_.nonEmpty)
    val cms = vals.toDF("w").agg(expr("cms_sketch(w, 4, 32)")).collect()(0).getSeq[Long](0)
    vals.groupBy(identity).view.mapValues(_.size.toLong).foreach { case (w, n) =>
      val est = (0 until 4).map(r => cms(r * 32 + graft.plans.CmsSketch.cell(r, w, 32))).min
      assert(est >= n, s"'$w': est $est < exact $n")
    }
  }

  test("kmv_uniq estimate is exact below k and partition-invariant above it") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val vals = draw(Gen.chooseNum(0, 400), 600, 5L).map(i => s"u$i")
    val df = vals.toDF("u").selectExpr("md5(u) AS h")
    val est1 = df.coalesce(1).agg(expr("kmv_uniq(h, 64)").as("s"))
      .selectExpr("s.est").collect()(0).getDouble(0)
    val est32 = df.repartition(32).agg(expr("kmv_uniq(h, 64)").as("s"))
      .selectExpr("s.est").collect()(0).getDouble(0)
    assert(est1 === est32, "KMV must be insensitive to partitioning")
    val exact = vals.distinct.size
    assert(math.abs(est1 - exact) / exact < 0.5, s"est $est1 vs exact $exact")
    // below k: exact
    val small = vals.take(20).distinct
    val estSmall = small.toDF("u").selectExpr("md5(u) AS h")
      .agg(expr("kmv_uniq(h, 64)").as("s")).selectExpr("s.est").collect()(0).getDouble(0)
    assert(estSmall === small.size.toDouble)
  }

  test("pipeBinary framing round-trips arbitrary byte payloads through cat") {
    import spark.implicits._
    // adversarial payloads: arbitrary bytes incl. NUL/LF/CR, sizes
    // from empty to multi-KB — one pipe run over the whole batch
    val payload = Gen.chooseNum(0, 4096).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
    val payloads = draw(payload, 60, 7L).map(_.toArray)
    val df = spark.createDataset(payloads).toDF("payload").repartition(3)
    val back = graft.sources.Pipe.pipeBinary(spark, df, Seq("cat"))
      .collect().map(_.getAs[Array[Byte]](0).toSeq)
    val ord = Ordering.Implicits.seqOrdering[Seq, Byte]
    assert(back.sorted(ord) === payloads.map(_.toSeq).sorted(ord),
      "every frame must survive the external pipe bit-exactly")
  }
}
