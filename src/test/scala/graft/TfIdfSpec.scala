package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TfIdfSpec extends SparkSpec {

  test("tfidf ranks rarer terms above common ones at equal tf") {
    val top = TextOps.tfidf(spark, sfDir)
    assert(top.count() > 0)
    // rank is dense 1..<=3 per doc and score non-increasing within doc
    val rows = top.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sortBy(-_).toSeq)
    }
  }

  test("bm25 ranks are dense, surrogates exact, deterministically ordered") {
    val r = TextOps.bm25(spark, sfDir, query = Seq("the", "data"))
    val rows = r.collect()   // (rk, doc_id, tf_sum, n_terms, dl)
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).sorted.toSeq === (1 to rows.length))
    rows.foreach { row =>
      assert(row.getLong(2) >= 1L)                          // tf_sum
      assert(row.getLong(3) >= 1L && row.getLong(3) <= 2L)  // n_terms
      assert(row.getLong(4) >= row.getLong(2))              // dl >= tf_sum
    }
    // deterministic: same plan twice → identical ranking
    val again = TextOps.bm25(spark, sfDir, query = Seq("the", "data")).collect()
    assert(rows.map(_.getLong(1)).toSeq === again.map(_.getLong(1)).toSeq)
  }

  test("bm25 length normalization: shorter doc outranks longer at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"), // short doc, one 'alpha'
      (2L, "alpha " + Seq.fill(50)("filler").mkString(" ")), // long doc, one 'alpha'
      (3L, "gamma delta")).toDF("doc_id", "text")
    val tmp = tmpDir() + "/bm25"
    docs.write.parquet(tmp + "/documents.parquet")
    val r = TextOps.bm25(spark, tmp, query = Seq("alpha")).collect()
    assert(r.map(_.getLong(1)).toSeq === Seq(1L, 2L))
  }
}
