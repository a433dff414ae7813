package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Incrementally maintained inverted index — the reference's
  * index-update pipeline (ref: src/contrib/index/src/java/org/apache/
  * hadoop/contrib/index/mapred/IIndexUpdater.java:31,
  * DocumentAndOp.java:1, IndexUpdateReducer.java:1: a stream of
  * INSERT/DELETE/UPDATE document operations folded into persisted
  * index shards) re-expressed on the TxTable substrate: postings are
  * a keyed transactional table and each document batch becomes one
  * atomic merge-on-read delta commit.
  *
  * Postings row = (word, doc_id, tf), key = (word, doc_id). One
  * op-batch maintains the index in O(changed docs):
  *   - pre-image: the changed doc_ids' existing postings are found by
  *     a BROADCAST semi-join of the (batch-scale) key set against the
  *     index — one index scan, no shuffle of the index, and the
  *     document CORPUS is never touched at all (the dedup-band-index
  *     discipline applied to retrieval);
  *   - new image: inserted/updated docs tokenize map-side from the
  *     batch's own text;
  *   - both land in ONE mergeDelta commit (old postings as 'D' at
  *     seq 0, new as 'I' at seq 1), so a torn maintenance run can't
  *     half-update the index and concurrent batches serialize through
  *     OCC.
  * Readers resolve latest-per-(word, doc_id); `compactSnapshot` folds
  * deltas periodically exactly as for any TxTable. At 100 TB the
  * per-batch cost is the batch's postings plus one linear index scan —
  * the corpus-scale rebuild happens once, at backfill.
  */
object InvertedIndex {

  /** (word, doc_id, tf) postings of a (doc_id, text) frame — map-side
    * explode + one batch-scale aggregate. */
  def postings(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(split(expr(TextOps.normExpr), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word", "doc_id").agg(count(lit(1)).as("tf"))

  /** Fold one document op-batch (doc_id, op ∈ I|U|D, text — ignored
    * for D) into the postings table at `root` as ONE atomic commit.
    * Returns the committed version. */
  def applyBatch(spark: SparkSession, root: String,
    batch: DataFrame): Int = {
    val keys = batch.select("doc_id").distinct()
    val removals =
      if (TxTable.latestVersion(spark, root) == 0)
        // backfill: nothing indexed yet, no pre-image to retract
        spark.range(0).select(lit("").as("word"), lit(0L).as("doc_id"),
          lit("D").as("op"), lit(0L).as("tf"), lit(0L).as("seq"))
          .filter(lit(false))
      else
        TxTable.read(spark, root)
          .join(broadcast(keys), Seq("doc_id"), "left_semi")
          .select(col("word"), col("doc_id"), lit("D").as("op"),
            col("tf"), lit(0L).as("seq"))
    val additions = postings(
      batch.filter(col("op") =!= "D").select("doc_id", "text"))
      .select(col("word"), col("doc_id"), lit("I").as("op"), col("tf"),
        lit(1L).as("seq"))
    TxTable.mergeDelta(spark, root,
      removals.unionByName(additions), keyCols = Seq("word", "doc_id"))
  }

  /** The maintained index aggregated to the same shape as the batch
    * `TextOps.invertedIndex` — per word: how many live docs contain
    * it, total occurrences, smallest containing doc. */
  def summary(spark: SparkSession, root: String): DataFrame =
    TxTable.read(spark, root)
      .groupBy("word")
      .agg(count(lit(1)).as("ndocs"), sum("tf").as("tf"),
        min("doc_id").as("first_doc"))

  /** Conjunctive (AND) retrieval over the maintained index: doc_ids
    * containing EVERY term in `terms`. A doc qualifies when it holds
    * |terms| DISTINCT matching words — the posting-list-intersection
    * plan at table scale (no per-term scan, no corpus read; the
    * reference re-runs this as a Lucene shard query, ref:
    * src/contrib/index/src/java/org/apache/hadoop/contrib/index/
    * lucene/ShardWriter.java:1). Small term lists land as a LITERAL
    * `word IN (...)` filter rather than a broadcast semi-join:
    * Catalyst pushes a literal predicate on the resolution window's
    * PARTITION key below the window and into the parquet scans
    * (PushedFilters carries the In), so a 2-term lookup reads the
    * matching row groups of the index, not a full resolve — filtering
    * whole (word, doc_id) groups commutes with latest-per-key
    * resolution, so the result is identical. A semi-join can't push
    * past the window, so huge term lists (where an In literal would
    * bloat the plan) keep it. */
  def lookupAll(spark: SparkSession, root: String,
    terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "lookupAll needs at least one term")
    import spark.implicits._
    val ts = terms.distinct
    val matched =
      if (ts.size <= 64)
        TxTable.read(spark, root).filter(col("word").isin(ts: _*))
      else
        TxTable.read(spark, root)
          .join(broadcast(ts.toDF("word")), Seq("word"), "left_semi")
    matched
      .groupBy("doc_id")
      .agg(count(lit(1)).as("_hits")) // postings are unique per (word, doc)
      .filter(col("_hits") === ts.size.toLong)
      .select("doc_id")
  }

  /** ORACLE-GATED retrieval exercise (q_inverted_index_lookup): after
    * the same 3-batch maintenance history as `gateQuery`, intersect
    * the posting lists of the two highest-frequency terms (tf desc,
    * word asc — a deterministic choice both engines derive). The
    * DuckDB oracle recomputes terms AND intersection from the final
    * document set — hash equality proves the maintained index answers
    * retrieval exactly as a from-scratch scan would. */
  def lookupGateQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = TxTable.scratchRoot("graft-invidx-q", dir)
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val d = col("doc_id")
    applyBatch(spark, root,
      docs.filter(d % 3 =!= 2).select(d, lit("I").as("op"), col("text")))
    applyBatch(spark, root,
      docs.filter(d % 3 =!= 2 && d % 5 === 0)
        .select(d,
          when(d % 2 === 0, lit("D")).otherwise(lit("U")).as("op"),
          concat(col("text"), lit(" zzupdated")).as("text")))
    applyBatch(spark, root,
      docs.filter(d % 3 === 2).select(d, lit("I").as("op"), col("text")))
    // 2-row readback: the query terms, picked deterministically from
    // the index itself (metadata-scale next to the corpus)
    val terms = summary(spark, root)
      .orderBy(col("tf").desc, col("word"))
      .limit(2).collect().map(_.getString(0)).toSeq
    lookupAll(spark, root, terms)
  }

  /** ORACLE-GATED incremental-maintenance exercise
    * (q_inverted_index_incremental): replay a deterministic 3-batch
    * document history against a fresh postings table —
    *   batch 1  backfill-inserts docs with doc_id % 3 ≠ 2;
    *   batch 2  among those, docs with doc_id % 5 = 0 are DELETED
    *            (even doc_id) or UPDATED with an appended marker
    *            token (odd doc_id);
    *   batch 3  late-arriving inserts (doc_id % 3 = 2) —
    * then summarize the maintained index. The DuckDB oracle computes
    * the same summary directly from the FINAL document set, so hash
    * equality proves three rounds of delta maintenance converge to
    * the full rebuild. */
  def gateQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = TxTable.scratchRoot("graft-invidx", dir)
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val d = col("doc_id")
    applyBatch(spark, root,
      docs.filter(d % 3 =!= 2).select(d, lit("I").as("op"), col("text")))
    applyBatch(spark, root,
      docs.filter(d % 3 =!= 2 && d % 5 === 0)
        .select(d,
          when(d % 2 === 0, lit("D")).otherwise(lit("U")).as("op"),
          concat(col("text"), lit(" zzupdated")).as("text")))
    applyBatch(spark, root,
      docs.filter(d % 3 === 2).select(d, lit("I").as("op"), col("text")))
    summary(spark, root)
  }
}
