package graft

import org.apache.spark.sql.SparkSession
import graft.functions.GraftExtensions

/** The cluster deployment path: `spark.sql.extensions=GraftExtensions`
  * (builder-time injection), as opposed to the runtime
  * `GraftFunctions.register` the operators call themselves. A fresh
  * SparkSession over the shared context proves every function, the
  * optimizer rule and the planner strategy arrive via the extension.
  */
class ExtensionsSpec extends SparkSpec {

  test("withExtensions injects functions, optimizer rule and strategy") {
    val base = spark // force the shared context up first
    assert(base.sparkContext != null)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne base, "a fresh session must have been built")
      // expressions resolve with NO runtime registration
      assert(s2.sql("SELECT array_dot_long(array(1L, 2L), array(3L, 4L)) d")
        .collect()(0).getLong(0) === 11L)
      assert(s2.sql("SELECT simhash32(array('a', 'b')) fp")
        .collect()(0).getString(0).length === 32)
      assert(s2.sql("SELECT minhash12(array('x', 'y', 'z')) mh")
        .collect()(0).getSeq[String](0).length === 12)
      assert(s2.sql("SELECT winnow_fp('hello world winnow') w")
        .collect()(0).getStruct(0).getInt(0) > 0)
      assert(s2.sql(
        "SELECT kmv_uniq(md5(cast(id as string)), 8).est FROM range(100)")
        .collect()(0).getDouble(0) > 10.0)
      // the optimizer rewrite fires on user-written lambda dot products
      val df = s2.range(3)
        .selectExpr("transform(sequence(1, 4), i -> id * i) AS a")
        .selectExpr("aggregate(zip_with(a, a, (x, y) -> x * y), 0L, (acc, x) -> acc + x) AS d")
      assert(df.queryExecution.optimizedPlan.toString.contains("array_dot_long"),
        df.queryExecution.optimizedPlan.toString)
      // the band-join rewrite fires on user SQL through the extension
      import s2.implicits._
      val a = Seq(1L, 15L).toDF("ta")
      val b = Seq(2L, 40L).toDF("tb")
      val band = a.join(b, org.apache.spark.sql.functions.expr("abs(ta - tb) <= 10L"))
      assert(band.queryExecution.optimizedPlan.toString.contains("_range_bin"),
        band.queryExecution.optimizedPlan.toString)
      assert(band.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        Set((1L, 2L)))
      // the planner strategy is present
      assert(s2.sessionState.planner.strategies.exists(
        _.getClass.getName.contains("LshTopKJoinStrategy")))
      // the percentile substitution arrives via the extension too:
      // disc AND cont forms fire under the flag, sketch readouts
      // resolve as SQL functions
      s2.conf.set("spark.graft.approxPercentile", "true")
      try {
        val pd = Seq(1L, 2L, 3L, 100L).toDF("v")
          .selectExpr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS p",
            "percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS c")
        val opt = pd.queryExecution.optimizedPlan.toString
        assert(opt.contains("hist_quantile") &&
          opt.contains("hist_quantile_cont"), opt)
        assert(s2.sql("SELECT hist_quantile(hist_sketch(v, 10L, 8), 0.5, 10L) q " +
          "FROM VALUES (5L), (7L) AS t(v)").collect()(0).getLong(0) === 10L)
      } finally s2.conf.unset("spark.graft.approxPercentile")
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
