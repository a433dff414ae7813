package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.TextOps

/** The compiled text-hash kernels (plans.TextHashExprs) must be
  * byte-for-byte equivalent to the relational formulations they
  * replaced — those formulations were oracle-proven against DuckDB in
  * round 1, so equivalence here transfers that proof.
  */
class TextHashSpec extends SparkSpec {

  private def docs: DataFrame = {
    GraftFunctions.register(spark)
    // real corpus + adversarial edge docs: empty text, whitespace-only,
    // single word, two words, punctuation-only (normalizes to empty)
    val edge = spark.createDataFrame(Seq(
      (90001L, ""), (90002L, "   "), (90003L, "word"),
      (90004L, "two words"), (90005L, "!!! ??? ..."),
      (90006L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")))
      .toDF("doc_id", "text")
    Tables.documents(spark, sfDir).select("doc_id", "text").unionByName(edge)
  }

  test("simhash32 kernel == explode+groupBy bit-majority formulation") {
    val d = docs
    // the round-1 relational form, verbatim
    val terms = (0 until 32).map { j =>
      val p = j / 4 + 1
      val dv = 1 << (j % 4)
      expr(s"(((instr('0123456789abcdef', substring(h, $p, 1)) - 1) div $dv) % 2) * 2 - 1")
        .as(s"t$j")
    }
    val bitSums = (0 until 32).map(j =>
      s"CASE WHEN sum(t$j) >= 0 THEN '1' ELSE '0' END")
    val relational = d
      .select(col("doc_id"), explode(split(expr(TextOps.normExpr), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), expr("md5(cast(tok as binary))").as("h"))
      .select(col("doc_id") +: terms: _*)
      .groupBy("doc_id")
      .agg(expr(s"concat(${bitSums.mkString(", ")})").as("fp"))
    val kernel = d
      .select(col("doc_id"), expr(s"simhash32(split(${TextOps.normExpr}, ' '))").as("fp"))
      .filter(col("fp").isNotNull)
    assert(kernel.count() === relational.count())
    assert(kernel.join(relational, Seq("doc_id", "fp")).count() === relational.count())
    // empty/punctuation-only docs vanish in both formulations
    assert(kernel.filter(col("doc_id").isin(90001L, 90002L, 90005L)).count() === 0)
  }

  test("minhash12 kernel == shingle-explode + 12×min formulation") {
    val d = docs
    val mhAggs = (0 until 12).map(k =>
      min(expr(s"md5(cast(concat('$k', ':', s) as binary))")).as(s"mh$k"))
    val relational = d
      .select(col("doc_id"), split(expr(TextOps.normExpr), " ").as("tk"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(tk) - 2, 1)),
          |  i -> concat_ws(' ', try_element_at(tk, i), try_element_at(tk, i + 1), try_element_at(tk, i + 2)))""".stripMargin)).as("s"))
      .groupBy("doc_id")
      .agg(mhAggs.head, mhAggs.tail: _*)
    val kernel = d
      .select(col("doc_id") +: (0 until 12).map(k =>
        expr(s"element_at(minhash12(split(${TextOps.normExpr}, ' ')), ${k + 1})").as(s"mh$k")): _*)
    val joinCols = "doc_id" +: (0 until 12).map(k => s"mh$k")
    assert(kernel.count() === relational.count())
    assert(kernel.join(relational, joinCols).count() === relational.count())
  }

  test("winnow_fp kernel == transform+slice+array_min formulation") {
    val d = docs
    val relational = d
      .select(col("doc_id"), expr(TextOps.normExpr).as("t"))
      .withColumn("hs", expr(
        "transform(sequence(1, greatest(length(t) - 9, 1)), i -> md5(cast(substring(t, i, 10) as binary)))"))
      .select(col("doc_id"),
        expr("size(array_distinct(transform(sequence(1, size(hs)), i -> array_min(slice(hs, i, least(8, size(hs) - i + 1))))))").as("n_fp"),
        expr("array_min(hs)").as("fp_min"))
    val kernel = d
      .select(col("doc_id"), expr(s"winnow_fp(${TextOps.normExpr})").as("w"))
      .select(col("doc_id"), col("w.n_fp").as("n_fp"), col("w.fp_min").as("fp_min"))
    assert(kernel.count() === relational.count())
    assert(kernel.join(relational, Seq("doc_id", "n_fp", "fp_min")).count() ===
      relational.count())
  }

  test("winnow_fp follows substring (code point) semantics on non-ASCII text") {
    GraftFunctions.register(spark)
    val d = spark.createDataFrame(Seq(
      (1L, "héllo wörld das ist ein längerer text für die prüfung"),
      (2L, "日本語のテキストです これはテストのための文章です"),
      (3L, "mixed ascii and ünïcödé characters across the window boundary")))
      .toDF("doc_id", "t")
    val relational = d
      .withColumn("hs", expr(
        "transform(sequence(1, greatest(length(t) - 9, 1)), i -> md5(cast(substring(t, i, 10) as binary)))"))
      .select(col("doc_id"),
        expr("size(array_distinct(transform(sequence(1, size(hs)), i -> array_min(slice(hs, i, least(8, size(hs) - i + 1))))))").as("n_fp"),
        expr("array_min(hs)").as("fp_min"))
    val kernel = d
      .select(col("doc_id"), expr("winnow_fp(t)").as("w"))
      .select(col("doc_id"), col("w.n_fp").as("n_fp"), col("w.fp_min").as("fp_min"))
    assert(kernel.join(relational, Seq("doc_id", "n_fp", "fp_min")).count() === 3)
  }

  test("dedupClusters: every candidate pair lands in one cluster, roots are minima") {
    import graft.operators.Dedup
    val labels = Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.minhashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus should contain near-dup candidates")
    pairs.foreach { case (a, b) =>
      assert(labels(a) === labels(b), s"pair ($a,$b) must share a cluster")
    }
    // each cluster's label is its minimum member
    labels.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min === c, s"cluster $c should be its min member")
    }
  }

  test("large-star/small-star components handle chain graphs past the propagation cap") {
    import spark.implicits._
    import graft.operators.Dedup
    // a 60-hop chain (diameter 59), a triangle, and a singleton pair:
    // min-label propagation at default caps would need 59 rounds
    val chain = (0L until 60L).sliding(2).map(s => (s(0), s(1))).toSeq
    val extra = Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L))
    val edges = (chain ++ extra).toDF("a", "b")
    val labels = Dedup.connectedComponentsStar(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 60L).foreach(n => assert(labels(n) === 0L, s"chain node $n"))
    Seq(100L, 101L, 102L).foreach(n => assert(labels(n) === 100L))
    assert(labels(200L) === 200L && labels(201L) === 200L)
    assert(labels.size === 60 + 3 + 2)
  }

  test("star components agree with min-label propagation on the real candidate graph") {
    import graft.operators.Dedup
    val pairs = Dedup.minhashPairs(spark, sfDir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val star = Dedup.connectedComponentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === prop)
  }

  test("kernels keep the projection inside whole-stage codegen and plan no exchange") {
    val d = Tables.documents(spark, sfDir)
    GraftFunctions.register(spark)
    val plan = d
      .select(col("doc_id"), expr(s"simhash32(split(${TextOps.normExpr}, ' '))").as("fp"))
      .filter(col("fp").isNotNull)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
