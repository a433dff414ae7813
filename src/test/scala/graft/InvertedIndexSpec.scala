package graft

import org.apache.spark.sql.functions._

import graft.sources.{InvertedIndex, TxTable}

class InvertedIndexSpec extends SparkSpec {

  test("3 insert/delete/update batches converge to the full rebuild") {
    val root = tmpDir() + "/idx"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val d = col("doc_id")
    InvertedIndex.applyBatch(spark, root,
      docs.filter(d % 3 =!= 2).select(d, lit("I").as("op"), col("text")))
    InvertedIndex.applyBatch(spark, root,
      docs.filter(d % 3 =!= 2 && d % 5 === 0)
        .select(d, when(d % 2 === 0, lit("D")).otherwise(lit("U")).as("op"),
          concat(col("text"), lit(" zzupdated")).as("text")))
    InvertedIndex.applyBatch(spark, root,
      docs.filter(d % 3 === 2).select(d, lit("I").as("op"), col("text")))

    val finalDocs = docs
      .filter(!(d % 3 =!= 2 && d % 5 === 0 && d % 2 === 0))
      .select(d,
        when(d % 3 =!= 2 && d % 5 === 0 && d % 2 === 1,
          concat(col("text"), lit(" zzupdated")))
          .otherwise(col("text")).as("text"))
    val rebuild = InvertedIndex.postings(finalDocs)
      .groupBy("word")
      .agg(count(lit(1)).as("ndocs"), sum("tf").as("tf"),
        min("doc_id").as("first_doc"))

    val inc = InvertedIndex.summary(spark, root)
    assert(inc.count() === rebuild.count())
    assert(inc.exceptAll(rebuild).isEmpty && rebuild.exceptAll(inc).isEmpty,
      "maintained index diverged from the full rebuild")
    // updates really happened: the marker token is indexed
    val nUpdated = docs.filter(d % 3 =!= 2 && d % 5 === 0 && d % 2 === 1).count()
    assert(inc.filter(col("word") === "zzupdated").count() ===
      (if (nUpdated > 0) 1L else 0L))
    // deletes really happened: an even %5 doc from batch 1 is gone
    val deleted = docs.filter(d % 3 =!= 2 && d % 5 === 0 && d % 2 === 0)
      .select("doc_id").limit(1).collect()
    if (deleted.nonEmpty) {
      val gone = deleted(0).getLong(0)
      assert(TxTable.read(spark, root)
        .filter(col("doc_id") === gone).count() === 0L)
    }
  }

  test("lookupAll intersects posting lists; index compaction changes nothing") {
    val root = tmpDir() + "/idx3"
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha delta"),
      (3L, "beta alpha zeta"), (4L, "gamma delta"))
      .toDF("doc_id", "text")
    InvertedIndex.applyBatch(spark, root,
      docs.select(col("doc_id"), lit("I").as("op"), col("text")))
    def ids(terms: String*): Set[Long] =
      InvertedIndex.lookupAll(spark, root, terms)
        .collect().map(_.getLong(0)).toSet
    assert(ids("alpha") === Set(1L, 2L, 3L))
    assert(ids("alpha", "beta") === Set(1L, 3L))
    assert(ids("alpha", "beta", "gamma") === Set(1L))
    assert(ids("missingword") === Set.empty[Long])
    // deleting doc 3 removes it from every posting list
    InvertedIndex.applyBatch(spark, root,
      Seq((3L, "D", "")).toDF("doc_id", "op", "text"))
    assert(ids("alpha", "beta") === Set(1L))
    // compacting the postings table folds the deltas; retrieval and
    // the summary are unchanged (the periodic maintenance op)
    val sBefore = InvertedIndex.summary(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    graft.sources.TxTable.compactSnapshot(spark, root)
    assert(ids("alpha", "beta") === Set(1L))
    assert(InvertedIndex.summary(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      === sBefore)
  }

  test("maintenance cost is O(batch): one commit per batch, corpus untouched") {
    val root = tmpDir() + "/idx2"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val d = col("doc_id")
    val v1 = InvertedIndex.applyBatch(spark, root,
      docs.filter(d % 7 === 0).select(d, lit("I").as("op"), col("text")))
    assert(v1 === 1)
    // a tiny second batch commits exactly one delta version
    val v2 = InvertedIndex.applyBatch(spark, root,
      docs.filter(d % 7 === 1).limit(3)
        .select(d, lit("I").as("op"), col("text")))
    assert(v2 === 2)
    // the index table after two batches holds only the touched docs
    val indexed = TxTable.read(spark, root).select("doc_id").distinct()
    val expected = docs.filter(d % 7 === 0).count() + 3
    assert(indexed.count() <= expected)
  }
}
