package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication family for LLM training-data pipelines (SURVEY.md
  * §2.6): exact, MinHash+LSH, SimHash, n-gram Jaccard. The reference
  * has no direct analog — these are the operators a warehouse of its
  * scale runs as MapReduce chains today; each is expressed here as a
  * blocked/banded plan so no step is ever an all-pairs cross join.
  *
  * Portability: every hash is an md5 hex STRING (identical bytes in
  * Spark and DuckDB); min/majority/banding over strings and exact
  * integers only.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * One shuffle on the 16-byte hash regardless of document size. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(expr("md5(cast(text as binary))").as("h"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"))

  /** doc_id → distinct 3-word shingles of the normalized text. */
  def shingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(expr(TextOps.normExpr), " ").as("tk"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(tk) - 2, 1)),
          |  i -> concat_ws(' ', try_element_at(tk, i), try_element_at(tk, i + 1), try_element_at(tk, i + 2)))""".stripMargin)).as("s"))
      .distinct()

  /** MinHash signatures: 12 permutations approximated by md5(seed:shingle),
    * banded 4×3. Returns (doc_id, band, sig) — the LSH bucket keys. */
  def minhashBands(spark: SparkSession, dir: String): DataFrame =
    shingles(spark, dir)
      .select(col("doc_id"), col("s"), explode(expr("sequence(0, 11)")).as("k"))
      .groupBy("doc_id", "k")
      .agg(min(expr("md5(cast(concat(cast(k as string), ':', s) as binary))")).as("mh"))
      .groupBy(col("doc_id"), expr("k div 3").as("band"))
      .agg(expr(
        "md5(cast(array_join(transform(array_sort(collect_list(struct(k, mh))), x -> x.mh), '') as binary))")
        .as("sig"))

  /** Candidate near-dup pairs: docs sharing any LSH band bucket. The
    * self-join is on (band, sig) — bucket-local, never all-pairs. */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val b = minhashBands(spark, dir)
    val a = b.select(col("band"), col("sig"), col("doc_id").as("doc_a"))
    val c = b.select(col("band"), col("sig"), col("doc_id").as("doc_b"))
    a.join(c, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** SimHash: 32-bit fingerprint by bit-majority over token md5 bits.
    * The bit exprs are generated so Spark and the oracle share the
    * exact integer arithmetic (nibble value via instr on a hex
    * alphabet — no engine-specific hex casts). */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val bits = (0 until 32).map { j =>
      val p = j / 4 + 1   // md5 hex nibble position (1-based)
      val dv = 1 << (j % 4)
      s"""CASE WHEN sum((((instr('0123456789abcdef', substring(md5(cast(tok as binary)), $p, 1)) - 1) div $dv) % 2) * 2 - 1) >= 0 THEN '1' ELSE '0' END"""
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(expr(TextOps.normExpr), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id")
      .agg(expr(s"concat(${bits.mkString(", ")})").as("fp"))
  }

  /** Exact n-gram Jaccard on candidate pairs found through the shingle
    * inverted index (pairs must share >= 1 shingle; shingles occurring
    * in > 50 docs are dropped — the standard df-cut that bounds bucket
    * size under skew at 100 TB). Top-50 pairs by similarity. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val df = sh.groupBy("s").agg(countDistinct("doc_id").as("docfreq"))
      .filter(col("docfreq") <= 50)
    val sh2 = sh.join(df.select("s"), Seq("s"))
    val sz = sh2.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh2.select(col("s"), col("doc_id").as("doc_a"))
    val b = sh2.select(col("s"), col("doc_id").as("doc_b"))
    val inter = a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    val scored = inter
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("cast(i as double) / (na + nb - i)").as("jac"))
    val w = Window.orderBy(col("jac").desc, col("doc_a"), col("doc_b"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 50)
      .select("rk", "doc_a", "doc_b", "jac")
  }
}
