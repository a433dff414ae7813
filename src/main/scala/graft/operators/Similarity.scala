package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Embedding similarity: near-dup detection and approximate-nearest-
  * neighbor search over `embeddings.embedding: Array[Float]`
  * (SURVEY.md §2.6).
  *
  * All similarity math runs on per-dimension quantized integers
  * (round(x·1000)): integer dot products are exact and associative, so
  * results are bitwise identical across engines, partitionings and
  * scale factors — no float-summation-order hazards. The derived
  * cosine is a fixed sequence of IEEE ops on those exact integers.
  *
  * Scale: brute-force is the correctness baseline; the LSH variant
  * (8 random-hyperplane signs → 256 buckets) is the 100 TB path — the
  * probe side joins only its bucket, never the full corpus.
  */
object Similarity {

  /** vec_id, label, q (quantized ints), n2 (exact squared norm). */
  def quantized(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)   // codegen array_dot_long (plans.ArrayDotLong)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000, 0) as bigint))").as("q"))
      .withColumn("n2", expr("array_dot_long(q, q)"))
  }

  private val cosExpr =
    "cast(dot as double) / (sqrt(cast(n2a as double)) * sqrt(cast(n2b as double)))"

  /** Embedding-cosine near-dup: pairs blocked by label (the natural
    * cluster key; at 100 TB the block key is an LSH bucket), top-100
    * by exact cosine. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val q = quantized(spark, dir)
    val a = q.select(col("label"), col("vec_id").as("vec_a"), col("q").as("qa"), col("n2").as("n2a"))
    val b = q.select(col("label"), col("vec_id").as("vec_b"), col("q").as("qb"), col("n2").as("n2b"))
    val scored = a.join(b, Seq("label")).filter(col("vec_a") < col("vec_b"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("vec_a"), col("vec_b"), expr(cosExpr).as("cos"))
    // orderBy.limit → TakeOrderedAndProject (per-partition top-k +
    // merge); the rank window then runs over only the 100 survivors —
    // never a global window over all pairs.
    val top = scored
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b")).limit(100)
    val w = Window.orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
    top.withColumn("rk", row_number().over(w))
      .select("rk", "vec_a", "vec_b", "cos")
  }

  /** Brute-force cosine top-k: the exact baseline every ANN variant is
    * judged against. Probes broadcast against the corpus; ranking by
    * (cos desc, id) is fully deterministic. */
  def annBruteForce(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val q = quantized(spark, dir)
    val probes = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("q").as("qa"), col("n2").as("n2a"))
    val corpus = q.select(col("vec_id").as("nbr_id"), col("q").as("qb"), col("n2").as("n2b"))
    val scored = broadcast(probes).crossJoin(corpus)
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("nbr_id"), expr(cosExpr).as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "cos")
  }

  /** Per-vector symmetric int8 quantization: scale = max|x|/127,
    * code_j = round(x_j/scale) ∈ [-127, 127] — the 4× memory cut
    * (float32 → 1 byte/dim at rest) that makes a 10^11-vector corpus
    * fit a fleet's RAM. Codes are carried as longs here purely to feed
    * the codegen `array_dot_long` kernel; their VALUES are int8. The
    * per-vector scale cancels in cosine (dot·sa·sb over norms·sa·sb),
    * so int8 search needs no scale column at all and stays exactly as
    * deterministic as the full-precision path: pure integer dots.
    * Zero vectors code to all-zero (no divide-by-null). */
  def int8Codes(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
        expr("aggregate(embedding, cast(0.0 as double), " +
          "(m, x) -> greatest(m, abs(cast(x as double))))").as("mx"))
      .withColumn("q", expr("transform(embedding, x -> cast(" +
        "CASE WHEN mx = 0.0 THEN 0 " +
        "ELSE round(cast(x as double) * 127.0 / mx, 0) END as bigint))"))
      .withColumn("n2", expr("array_dot_long(q, q)"))
      .select("vec_id", "label", "q", "n2")
  }

  /** Brute-force top-k over int8 codes — the quantized twin of
    * `annBruteForce`, same broadcast-probe shape, scoring on 1-byte
    * codes. AnnSpec holds its recall@k against the full-precision
    * ranking; the oracle replays the identical quantize + rank. */
  def annInt8(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val q = int8Codes(spark, dir)
    val probes = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("q").as("qa"), col("n2").as("n2a"))
    val corpus = q.select(col("vec_id").as("nbr_id"), col("q").as("qb"), col("n2").as("n2b"))
    val scored = broadcast(probes).crossJoin(corpus)
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("nbr_id"), expr(cosExpr).as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "cos")
  }

  /** Materialize a CODEBOOK-scale frame (k centroid rows — metadata,
    * never corpus) into a LocalRelation. Iterative training must not
    * let round i's plan embed round i−1's whole lineage: every
    * broadcast subtree re-executes its plan, so a pure-lineage Lloyd
    * loop recomputes all prior rounds inside EACH consumer — the cost
    * doubles per round (the kcore/HITS lesson, guide §1.2: fix the
    * algorithm's pass structure first). A k×dim readback per round is
    * the standard k-means discipline (Spark MLlib collects centroids
    * every iteration) and is size-bounded by the codebook, not the
    * corpus. Values pass through bit-identical; rows are sorted so
    * the relation is deterministic. */
  private def codebook(df: DataFrame): DataFrame = {
    val rows = df.collect().sortBy(_.toString)
    val local = new java.util.ArrayList[org.apache.spark.sql.Row]()
    rows.foreach(local.add)
    df.sparkSession.createDataFrame(local, df.schema)
  }

  /** Lloyd's k-means over the quantized vectors — the training job the
    * IVF codebook stands in for. Each iteration is one broadcast
    * nearest-centroid assignment (k×N integer dots, map-side only)
    * plus one per-dimension mean aggregation; only the k-row CODEBOOK
    * ever reaches the driver (the MLlib k-means shape — see
    * [[codebook]]), so the same plan trains on 10^11 vectors with k
    * centroids broadcast. Centroids re-quantize to integers between
    * iterations to stay deterministic. */
  def trainCentroids(spark: SparkSession, dir: String,
    k: Int = 16, iters: Int = 3): DataFrame = {
    val q = quantized(spark, dir)
    var cent = codebook(q.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("q").as("qc")))
    for (_ <- 1 to iters) {
      val centN = cent.withColumn("n2c", expr("array_dot_long(qc, qc)"))
      val w = Window.partitionBy("vec_id").orderBy(col("dist2"), col("cid"))
      val assigned = q.crossJoin(broadcast(centN))
        .withColumn("dot", expr("array_dot_long(q, qc)"))
        .withColumn("dist2", col("n2") + col("n2c") - lit(2) * col("dot"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      cent = codebook(assigned
        .select(col("cid"), posexplode(col("q")).as(Seq("i", "e")))
        .groupBy("cid", "i").agg(avg("e").as("m"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(i, m))), x -> cast(round(x.m, 0) as bigint))").as("qc")))
    }
    cent
  }

  /** Mean within-cluster squared distance — the convergence metric. */
  def inertia(q: DataFrame, cent: DataFrame): Double = {
    val centN = cent.withColumn("n2c", expr("array_dot_long(qc, qc)"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist2"), col("cid"))
    q.crossJoin(broadcast(centN))
      .withColumn("dot", expr("array_dot_long(q, qc)"))
      .withColumn("dist2", col("n2") + col("n2c") - lit(2) * col("dot"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .agg(avg(col("dist2").cast("double"))).collect()(0).getDouble(0)
  }

  /** IVF (inverted-file) ANN: a small codebook of centroids partitions
    * the corpus into cells; a probe searches only its `nprobe` nearest
    * cells. Here the codebook is the first 16 vectors (deterministic
    * stand-in for a k-means training job — the assignment/search
    * machinery is identical); all scoring is exact integer cosine.
    * At 100 TB: centroids broadcast, assignment is one map-side pass,
    * the cell table is the partition key for the candidate join. */
  def annIvf(spark: SparkSession, dir: String, k: Int = 3, nprobe: Int = 2): DataFrame = {
    val q = quantized(spark, dir)
    val cent = q.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("q").as("qc"), col("n2").as("n2c"))
    def cellRank(vecs: DataFrame, idCol: String) = {
      val scored = vecs.crossJoin(broadcast(cent))
        .withColumn("dot", expr(s"array_dot_long(q, qc)"))
        .select(col(idCol), col("cid"),
          expr("cast(dot as double) / (sqrt(cast(n2 as double)) * sqrt(cast(n2c as double)))").as("ccos"))
      val w = Window.partitionBy(idCol).orderBy(col("ccos").desc, col("cid"))
      scored.withColumn("crn", row_number().over(w))
    }
    val assign = cellRank(q, "vec_id").filter(col("crn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
    val corpus = q.join(assign, "vec_id")
      .select(col("cell"), col("vec_id").as("nbr_id"), col("q").as("qb"), col("n2").as("n2b"))
    val probeCells = cellRank(q.filter(col("vec_id") < 5), "vec_id")
      .filter(col("crn") <= nprobe).select(col("vec_id").as("probe_id"), col("cid").as("cell"))
    val probes = q.select(col("vec_id").as("probe_id"), col("q").as("qa"), col("n2").as("n2a"))
    val scored = broadcast(probeCells.join(probes, "probe_id")).join(corpus, Seq("cell"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("nbr_id"), expr(cosExpr).as("cos")).distinct()
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "cos")
  }

  /** HYBRID RETRIEVAL — reciprocal-rank fusion of a lexical ranking
    * and a dense (embedding-cosine) ranking, the retrieval shape
    * modern curation uses to find "documents like these seeds"
    * (lexical catches exact terminology, dense catches paraphrase;
    * RRF needs no score calibration between the two). Kept
    * engine-exact end-to-end: the lexical score is the integer
    * rarity weight `10^6 div df` summed over SHARED DISTINCT words
    * (the q_tfidf discipline — no libm), and the fused score is
    * integer RRF `10^9 div (60 + rank)` summed over both rankings
    * (docs absent from the lexical list contribute 0), so the oracle
    * replays every rank bitwise. Scale shape: the lexical leg is a
    * word-key join bounded by document frequency (never doc pairs);
    * the dense leg is the broadcast-probe brute-force baseline —
    * swap in the IVF candidate set unchanged at 10^11 vectors. */
  /** Lexical leg of hybrid retrieval: integer rarity weights
    * (`10^6 div df`) summed over shared distinct words, ranked per
    * probe — a word-key join bounded by document frequency, never
    * doc pairs. */
  private def lexicalRank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val toks = docs.select(col("doc_id"), explode(expr(
      "array_distinct(filter(split(lower(text), ' '), x -> x <> ''))"))
      .as("word"))
    val dfreq = toks.groupBy("word").agg(count(lit(1)).as("df"))
    val weighted = toks.join(dfreq, "word")
      .withColumn("w", expr("1000000 div df"))
    val lex = weighted.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("word"), col("w"))
      .join(weighted.select(col("doc_id").as("nbr_id"), col("word")), "word")
      .filter(col("probe_id") =!= col("nbr_id"))
      .groupBy("probe_id", "nbr_id").agg(sum("w").as("lex"))
    val lw = Window.partitionBy("probe_id")
      .orderBy(col("lex").desc, col("nbr_id"))
    lex.withColumn("lr", row_number().over(lw))
      .select("probe_id", "nbr_id", "lr")
  }

  def hybridRetrieval(spark: SparkSession, dir: String,
    k: Int = 10): DataFrame = {
    val lexRank = lexicalRank(spark, dir)
    val q = quantized(spark, dir)
    val probes = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("q").as("qa"), col("n2").as("n2a"))
    val corpus = q.select(col("vec_id").as("nbr_id"), col("q").as("qb"), col("n2").as("n2b"))
    val dense = broadcast(probes).crossJoin(corpus)
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("nbr_id"), expr(cosExpr).as("cos"))
    val dw = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("nbr_id"))
    val denseRank = dense.withColumn("dr", row_number().over(dw))
      .select("probe_id", "nbr_id", "dr")
    // dense covers every (probe, nbr) pair, so it anchors the fusion;
    // lexical joins in where word overlap exists
    val fused = denseRank.join(lexRank, Seq("probe_id", "nbr_id"), "left")
      .withColumn("fused",
        expr("1000000000 div (60 + dr)") +
          when(col("lr").isNull, lit(0L))
            .otherwise(expr("1000000000 div (60 + lr)")))
    val fw = Window.partitionBy("probe_id")
      .orderBy(col("fused").desc, col("nbr_id"))
    fused.withColumn("rk", row_number().over(fw)).filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("nbr_id"),
        col("fused").cast("long").as("fused"))
  }

  /** [[hybridRetrieval]] with the dense leg drawn from the IVF
    * CANDIDATE set instead of the full corpus — the 100 TB form: the
    * dense ranking touches only vectors in the probe's `nprobe`
    * nearest cells (the [[annIvf]] discipline, deterministic
    * centroids and assignment), so neither leg ever scans all pairs.
    * Because the candidate set is bounded, the fusion is a FULL OUTER
    * join of the two rankings: a doc present in only one leg scores
    * that leg's RRF term alone — same integer arithmetic, oracle
    * replays every rank bitwise. */
  def hybridRetrievalIvf(spark: SparkSession, dir: String,
    k: Int = 10, nprobe: Int = 2): DataFrame = {
    val lexRank = lexicalRank(spark, dir)
    val q = quantized(spark, dir)
    val cent = q.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("q").as("qc"), col("n2").as("n2c"))
    def cellRank(vecs: DataFrame, idCol: String) = {
      val scored = vecs.crossJoin(broadcast(cent))
        .withColumn("dot", expr(s"array_dot_long(q, qc)"))
        .select(col(idCol), col("cid"),
          expr("cast(dot as double) / (sqrt(cast(n2 as double)) * " +
            "sqrt(cast(n2c as double)))").as("ccos"))
      val w = Window.partitionBy(idCol).orderBy(col("ccos").desc, col("cid"))
      scored.withColumn("crn", row_number().over(w))
    }
    val assign = cellRank(q, "vec_id").filter(col("crn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
    val corpus = q.join(assign, "vec_id").select(col("cell"),
      col("vec_id").as("nbr_id"), col("q").as("qb"), col("n2").as("n2b"))
    val probeCells = cellRank(q.filter(col("vec_id") < 5), "vec_id")
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("probe_id"), col("cid").as("cell"))
    val probes = q.select(col("vec_id").as("probe_id"),
      col("q").as("qa"), col("n2").as("n2a"))
    val dense = broadcast(probeCells.join(probes, "probe_id"))
      .join(corpus, Seq("cell"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("nbr_id"), expr(cosExpr).as("cos"))
      .distinct()
    val dw = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("nbr_id"))
    val denseRank = dense.withColumn("dr", row_number().over(dw))
      .select("probe_id", "nbr_id", "dr")
    val fused = denseRank
      .join(lexRank, Seq("probe_id", "nbr_id"), "full_outer")
      .withColumn("fused",
        when(col("dr").isNull, lit(0L))
          .otherwise(expr("1000000000 div (60 + dr)")) +
          when(col("lr").isNull, lit(0L))
            .otherwise(expr("1000000000 div (60 + lr)")))
    val fw = Window.partitionBy("probe_id")
      .orderBy(col("fused").desc, col("nbr_id"))
    fused.withColumn("rk", row_number().over(fw)).filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("nbr_id"),
        col("fused").cast("long").as("fused"))
  }

  /** FILTERED ANN — top-k under an attribute predicate (the
    * "retrieve only same-language / same-split neighbors" query every
    * curation pipeline runs): the predicate applies INSIDE the IVF
    * candidate join — candidates are (probe's nprobe cells) ∩
    * (label = probe's label) — so k survivors are k REAL results.
    * Post-filtering an unfiltered top-k instead under-fills whenever
    * the filter is selective (retrieve 3, filter to 0), which is why
    * real vector stores push predicates into the index scan; here the
    * filter column simply rides the inverted file as metadata and
    * becomes one more join-side conjunct — zero extra shuffles over
    * [[annIvf]]. Same deterministic codebook; exact integer cosine. */
  def annIvfFiltered(spark: SparkSession, dir: String, k: Int = 3,
    nprobe: Int = 2): DataFrame = {
    val q = quantized(spark, dir)
    val cent = q.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("q").as("qc"), col("n2").as("n2c"))
    def cellRank(vecs: DataFrame, idCol: String) = {
      val scored = vecs.crossJoin(broadcast(cent))
        .withColumn("dot", expr(s"array_dot_long(q, qc)"))
        .select(col(idCol), col("cid"),
          expr("cast(dot as double) / (sqrt(cast(n2 as double)) * sqrt(cast(n2c as double)))").as("ccos"))
      val w = Window.partitionBy(idCol).orderBy(col("ccos").desc, col("cid"))
      scored.withColumn("crn", row_number().over(w))
    }
    val assign = cellRank(q, "vec_id").filter(col("crn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
    val corpus = q.join(assign, "vec_id")
      .select(col("cell"), col("label").as("nbr_label"),
        col("vec_id").as("nbr_id"), col("q").as("qb"), col("n2").as("n2b"))
    val probeCells = cellRank(q.filter(col("vec_id") < 5), "vec_id")
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("probe_id"), col("cid").as("cell"))
    val probes = q.select(col("vec_id").as("probe_id"), col("label"),
      col("q").as("qa"), col("n2").as("n2a"))
    val scored = broadcast(probeCells.join(probes, "probe_id"))
      .join(corpus, Seq("cell"))
      .filter(col("probe_id") =!= col("nbr_id") &&
        col("nbr_label") === col("label"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("nbr_id"), expr(cosExpr).as("cos"))
      .distinct()
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "cos")
  }

  /** Product quantization with asymmetric distance (Jégou et al.
    * 2011): the 64-dim space splits into m=4 16-dim subspaces, each
    * with its own 16-centroid sub-codebook (deterministic stand-in:
    * the first 16 vectors' subvectors); every corpus vector encodes to
    * 4 sub-codes (argmin exact integer euclidean, cid tie-break) —
    * 4 bytes/vector at rest, the compression step BEYOND int8 that
    * lets a 10^12-vector corpus keep its index in memory. Search is
    * ADC: the probe computes one exact distance-squared table to all
    * 64 sub-centroids (4×16 integer d², map-side vs the broadcast
    * codebook), and every candidate's approximate distance is the SUM
    * of 4 table lookups — never a full-vector dot against the corpus.
    * All distances are EXACT integers over the quantized grid, so
    * encode, tables, and ranking replay bitwise in any engine
    * (q_ann_pq is oracle-gated end-to-end). */
  def annPq(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val q = quantized(spark, dir)
    val m = 4
    val sub = 16
    // (id, s, subvector, its squared norm) for any vector set
    def subVecs(df: DataFrame, idCol: String): DataFrame = df
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> " +
          s"struct(s AS s, slice(q, s * $sub + 1, $sub) AS sv))")).as("x"))
      .select(col(idCol), col("x.s").as("s"), col("x.sv").as("sv"))
      .withColumn("n2s", expr("array_dot_long(sv, sv)"))
    val cent = subVecs(q.filter(col("vec_id") < 16), "vec_id")
      .select(col("vec_id").as("cid"), col("s"),
        col("sv").as("cv"), col("n2s").as("n2c"))
    // encode: per (vector, subspace) the nearest sub-centroid
    val wEnc = Window.partitionBy("vec_id", "s")
      .orderBy(col("d2"), col("cid"))
    val codes = subVecs(q, "vec_id").join(broadcast(cent), Seq("s"))
      .withColumn("d2",
        col("n2s") + col("n2c") - lit(2L) * expr("array_dot_long(sv, cv)"))
      .withColumn("rn", row_number().over(wEnc)).filter(col("rn") === 1)
      .select(col("vec_id").as("nbr_id"), col("s"), col("cid").as("code"))
    // ADC tables: probe × all sub-centroids, exact integer d² each
    val table = subVecs(q.filter(col("vec_id") < 5), "vec_id")
      .join(broadcast(cent), Seq("s"))
      .select(col("vec_id").as("probe_id"), col("s"), col("cid"),
        (col("n2s") + col("n2c") -
          lit(2L) * expr("array_dot_long(sv, cv)")).as("pd2"))
    // candidate distance = Σ_s table[s][code[s]] — 4 lookups, no dots
    val scored = codes
      .join(broadcast(table),
        codes("s") === table("s") && codes("code") === table("cid"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .groupBy("probe_id", "nbr_id").agg(sum("pd2").as("approx_d2"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("approx_d2"), col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "approx_d2")
  }

  /** IVF-PQ — the canonical billion-scale composition (FAISS's
    * workhorse index): the COARSE quantizer (IVF cells) restricts each
    * probe to its nprobe nearest cells' members, and the FINE
    * quantizer (PQ codes + ADC tables) scores those candidates with 4
    * integer table lookups each — so a search touches neither the
    * full corpus NOR any full-width vector. Memory per vector: one
    * cell id + 4 sub-codes. Both quantizers are the deterministic
    * stand-ins used by their standalone operators, every distance is
    * an exact integer, and the composition is oracle-gated end-to-end
    * (q_ann_ivfpq). */
  def annIvfPq(spark: SparkSession, dir: String, k: Int = 5,
    nprobe: Int = 2): DataFrame = {
    val q = quantized(spark, dir)
    // coarse: cosine cell assignment against the first-16 codebook
    val coarse = q.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("q").as("qc"), col("n2").as("n2c"))
    def cellRank(vecs: DataFrame, idCol: String) = {
      val scored = vecs.crossJoin(broadcast(coarse))
        .withColumn("dot", expr("array_dot_long(q, qc)"))
        .select(col(idCol), col("cid"),
          expr("cast(dot as double) / (sqrt(cast(n2 as double)) * sqrt(cast(n2c as double)))").as("ccos"))
      val w = Window.partitionBy(idCol).orderBy(col("ccos").desc, col("cid"))
      scored.withColumn("crn", row_number().over(w))
    }
    val assign = cellRank(q, "vec_id").filter(col("crn") === 1)
      .select(col("vec_id").as("nbr_id"), col("cid").as("cell"))
    val probeCells = cellRank(q.filter(col("vec_id") < 5), "vec_id")
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("probe_id"), col("cid").as("cell"))
    val cand = broadcast(probeCells).join(assign, Seq("cell"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .select("probe_id", "nbr_id").distinct()
    // fine: PQ sub-codes for the corpus, ADC tables for the probes
    val m = 4
    val sub = 16
    def subVecs(df: DataFrame, idCol: String): DataFrame = df
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> " +
          s"struct(s AS s, slice(q, s * $sub + 1, $sub) AS sv))")).as("x"))
      .select(col(idCol), col("x.s").as("s"), col("x.sv").as("sv"))
      .withColumn("n2s", expr("array_dot_long(sv, sv)"))
    val cent = subVecs(q.filter(col("vec_id") < 16), "vec_id")
      .select(col("vec_id").as("cid"), col("s"),
        col("sv").as("cv"), col("n2s").as("n2c"))
    val wEnc = Window.partitionBy("vec_id", "s").orderBy(col("d2"), col("cid"))
    val codes = subVecs(q, "vec_id").join(broadcast(cent), Seq("s"))
      .withColumn("d2",
        col("n2s") + col("n2c") - lit(2L) * expr("array_dot_long(sv, cv)"))
      .withColumn("rn", row_number().over(wEnc)).filter(col("rn") === 1)
      .select(col("vec_id").as("nbr_id"), col("s"), col("cid").as("code"))
    val table = subVecs(q.filter(col("vec_id") < 5), "vec_id")
      .join(broadcast(cent), Seq("s"))
      .select(col("vec_id").as("probe_id"), col("s"), col("cid"),
        (col("n2s") + col("n2c") -
          lit(2L) * expr("array_dot_long(sv, cv)")).as("pd2"))
    // ADC over the candidate set only
    val scored = cand.join(codes, Seq("nbr_id"))
      .join(broadcast(table),
        Seq("probe_id", "s")).filter(col("cid") === col("code"))
      .groupBy("probe_id", "nbr_id").agg(sum("pd2").as("approx_d2"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("approx_d2"), col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "approx_d2")
  }

  /** RESIDUAL IVF-PQ — what production IVF-PQ actually encodes: PQ
    * codes of the residual v − centroid(cell(v)), not of v itself.
    * Residuals concentrate near the origin, so a fixed sub-codebook
    * quantizes them with far less error than raw vectors — the recall
    * refinement on top of `annIvfPq`. Residuals are element-wise
    * integer subtractions over the quantized grid, so every distance
    * stays an exact integer and the full pipeline (assign → residual →
    * encode → per-probed-cell ADC tables → candidate scoring) replays
    * bitwise in the oracle (q_ann_ivfpq_res). The probe builds one ADC
    * table PER PROBED CELL (its residual differs per cell) — nprobe ×
    * m × 16 integer d² entries, still map-side against the broadcast
    * codebooks. Residual sub-codebook: the residual subvectors of
    * vectors 16..31 w.r.t. their own cells (deterministic stand-in for
    * the trained fine codebook). */
  def annIvfPqResidual(spark: SparkSession, dir: String, k: Int = 5,
    nprobe: Int = 2): DataFrame = {
    val q = quantized(spark, dir)
    val coarse = q.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("q").as("qc"), col("n2").as("n2c"))
    def cellRank(vecs: DataFrame, idCol: String) = {
      val scored = vecs.crossJoin(broadcast(coarse))
        .withColumn("dot", expr("array_dot_long(q, qc)"))
        .select(col(idCol), col("cid"), col("q"),
          expr("cast(dot as double) / (sqrt(cast(n2 as double)) * sqrt(cast(n2c as double)))").as("ccos"))
      val w = Window.partitionBy(idCol).orderBy(col("ccos").desc, col("cid"))
      scored.withColumn("crn", row_number().over(w))
    }
    // residual of each vector w.r.t. a cell's centroid
    def withResidual(df: DataFrame): DataFrame = df
      .join(broadcast(coarse.select(col("cid"), col("qc"))), Seq("cid"))
      .withColumn("res", expr("zip_with(q, qc, (x, y) -> x - y)"))
    val assign = cellRank(q, "vec_id").filter(col("crn") === 1)
      .select(col("vec_id"), col("cid"), col("q"))
    // residual sub-codebook from vectors 16..31 (their own cells)
    val m = 4
    val sub = 16
    def subSplit(df: DataFrame, cols: Seq[String]): DataFrame = df
      .select(cols.map(col) :+ explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> " +
          s"struct(s AS s, slice(res, s * $sub + 1, $sub) AS sv))")).as("x"): _*)
      .select(cols.map(col) :+ col("x.s").as("s") :+ col("x.sv").as("sv"): _*)
      .withColumn("n2s", expr("array_dot_long(sv, sv)"))
    val fineCent = subSplit(
      withResidual(assign.filter(col("vec_id") >= 16 && col("vec_id") < 32)),
      Seq("vec_id"))
      .select((col("vec_id") - 16).as("fcid"), col("s"),
        col("sv").as("cv"), col("n2s").as("n2c"))
    // encode every corpus vector's own-cell residual
    val wEnc = Window.partitionBy("vec_id", "s").orderBy(col("d2"), col("fcid"))
    val codes = subSplit(withResidual(assign), Seq("vec_id", "cid"))
      .join(broadcast(fineCent), Seq("s"))
      .withColumn("d2",
        col("n2s") + col("n2c") - lit(2L) * expr("array_dot_long(sv, cv)"))
      .withColumn("rn", row_number().over(wEnc)).filter(col("rn") === 1)
      .select(col("vec_id").as("nbr_id"), col("cid").as("cell"),
        col("s"), col("fcid").as("code"))
    // probe: residual PER PROBED CELL → one ADC table per (probe, cell)
    val probeCells = cellRank(q.filter(col("vec_id") < 5), "vec_id")
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("probe_id"), col("cid"), col("q"))
    val table = subSplit(withResidual(probeCells), Seq("probe_id", "cid"))
      .join(broadcast(fineCent), Seq("s"))
      .select(col("probe_id"), col("cid").as("cell"), col("s"), col("fcid"),
        (col("n2s") + col("n2c") -
          lit(2L) * expr("array_dot_long(sv, cv)")).as("pd2"))
    // candidates = members of the probe's probed cells; score = Σ_s
    // table[probe, cell(nbr), s, code(nbr, s)]
    val scored = codes
      .join(broadcast(table),
        codes("cell") === table("cell") && codes("s") === table("s") &&
          codes("code") === table("fcid"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .groupBy("probe_id", "nbr_id").agg(sum("pd2").as("approx_d2"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("approx_d2"), col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "approx_d2")
  }

  /** FULLY TRAINED residual IVF-PQ — the production index build,
    * end-to-end: the coarse codebook comes from Lloyd iterations
    * (`trainCentroids`, euclidean objective), vectors residual-encode
    * against their TRAINED cell centroid, and each of the m=4
    * subspaces trains its OWN 16-entry sub-codebook by per-subspace
    * Lloyd over the residual subvectors (seeded with vectors 16..31's
    * residuals, the same seed the untrained stand-in uses — so the
    * recall delta measures exactly what training buys). Both training
    * loops are deterministic on the quantized integers (exact integer
    * sums/dots, one IEEE division per mean, half-away-from-zero
    * re-quantization), so the ENTIRE build — coarse Lloyd → assign →
    * residual → fine Lloyd per subspace → encode → per-probed-cell ADC
    * → candidate ranking — replays bitwise as unrolled CTEs in the
    * oracle (q_ann_pq_trained). At 100 TB: training runs on a sample
    * or the corpus itself with k centroids broadcast per iteration,
    * encode is one map-side pass, and search touches only probed
    * cells' 4-byte codes. */
  def annPqTrained(spark: SparkSession, dir: String, k: Int = 5,
    nprobe: Int = 2, iters: Int = 2): DataFrame = {
    val q = quantized(spark, dir)
    val coarse = trainCentroids(spark, dir, 16, iters)
      .withColumn("n2c", expr("array_dot_long(qc, qc)"))
    // euclidean cell ranking — consistent with the training objective
    def cellRank(vecs: DataFrame, idCol: String) = {
      val scored = vecs.crossJoin(broadcast(coarse))
        .withColumn("dot", expr("array_dot_long(q, qc)"))
        .withColumn("dist2", col("n2") + col("n2c") - lit(2L) * col("dot"))
        .select(col(idCol), col("cid"), col("q"), col("dist2"))
      val w = Window.partitionBy(idCol).orderBy(col("dist2"), col("cid"))
      scored.withColumn("crn", row_number().over(w))
    }
    def withResidual(df: DataFrame): DataFrame = df
      .join(broadcast(coarse.select(col("cid"), col("qc"))), Seq("cid"))
      .withColumn("res", expr("zip_with(q, qc, (x, y) -> x - y)"))
    val assign = cellRank(q, "vec_id").filter(col("crn") === 1)
      .select(col("vec_id"), col("cid"), col("q"))
    val m = 4
    val sub = 16
    def subSplit(df: DataFrame, cols: Seq[String]): DataFrame = df
      .select(cols.map(col) :+ explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> " +
          s"struct(s AS s, slice(res, s * $sub + 1, $sub) AS sv))")).as("x"): _*)
      .select(cols.map(col) :+ col("x.s").as("s") :+ col("x.sv").as("sv"): _*)
      .withColumn("n2s", expr("array_dot_long(sv, sv)"))
    // per-subspace fine training: each s runs its own Lloyd loop over
    // the residual subvectors (ONE plan covers all 4 subspaces — s is
    // just a grouping column, so "4 independent trainings" cost one
    // broadcast-assign + one mean-agg per iteration)
    val resSub = subSplit(withResidual(assign), Seq("vec_id"))
    // each round's m×16 sub-codebook is a CODEBOOK-scale readback
    // (see [[codebook]]): without it, round i's broadcast subtree
    // re-executes rounds 1..i−1 — and the encode/probe/ADC consumers
    // below would each replay the whole fine training again
    var fine = codebook(resSub.filter(col("vec_id") >= 16 && col("vec_id") < 32)
      .select((col("vec_id") - 16).as("fcid"), col("s"), col("sv").as("cv")))
    for (_ <- 1 to iters) {
      val fn = fine.withColumn("n2c", expr("array_dot_long(cv, cv)"))
      val wf = Window.partitionBy("vec_id", "s").orderBy(col("d2"), col("fcid"))
      val assigned = resSub.join(broadcast(fn), Seq("s"))
        .withColumn("d2",
          col("n2s") + col("n2c") - lit(2L) * expr("array_dot_long(sv, cv)"))
        .withColumn("rn", row_number().over(wf)).filter(col("rn") === 1)
      fine = codebook(assigned
        .select(col("fcid"), col("s"), posexplode(col("sv")).as(Seq("i", "e")))
        .groupBy("fcid", "s", "i").agg(avg("e").as("mm"))
        .groupBy("fcid", "s")
        .agg(expr("transform(array_sort(collect_list(struct(i, mm))), " +
          "x -> cast(round(x.mm, 0) as bigint))").as("cv")))
    }
    val fineCent = fine
      .select(col("fcid"), col("s"), col("cv"),
        expr("array_dot_long(cv, cv)").as("n2c"))
    // encode every corpus vector's own-cell residual w/ the trained books
    val wEnc = Window.partitionBy("vec_id", "s").orderBy(col("d2"), col("fcid"))
    val codes = subSplit(withResidual(assign), Seq("vec_id", "cid"))
      .join(broadcast(fineCent), Seq("s"))
      .withColumn("d2",
        col("n2s") + col("n2c") - lit(2L) * expr("array_dot_long(sv, cv)"))
      .withColumn("rn", row_number().over(wEnc)).filter(col("rn") === 1)
      .select(col("vec_id").as("nbr_id"), col("cid").as("cell"),
        col("s"), col("fcid").as("code"))
    // probe: residual PER PROBED CELL → one ADC table per (probe, cell)
    val probeCells = cellRank(q.filter(col("vec_id") < 5), "vec_id")
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("probe_id"), col("cid"), col("q"))
    val table = subSplit(withResidual(probeCells), Seq("probe_id", "cid"))
      .join(broadcast(fineCent), Seq("s"))
      .select(col("probe_id"), col("cid").as("cell"), col("s"), col("fcid"),
        (col("n2s") + col("n2c") -
          lit(2L) * expr("array_dot_long(sv, cv)")).as("pd2"))
    val scored = codes
      .join(broadcast(table),
        codes("cell") === table("cell") && codes("s") === table("s") &&
          codes("code") === table("fcid"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .groupBy("probe_id", "nbr_id").agg(sum("pd2").as("approx_d2"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("approx_d2"), col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "approx_d2")
  }

  /** Recall@k vs the exact-L2 baseline of an arbitrary approximate
    * result (probe_id, nbr_id rows) — the shared measurement loop. */
  def recallVsExact(spark: SparkSession, dir: String,
    approx: DataFrame, k: Int = 5): Double = {
    val exact = annBruteForceL2(spark, dir, k).select("probe_id", "nbr_id")
    val hits = exact.join(approx.select("probe_id", "nbr_id"),
      Seq("probe_id", "nbr_id"), "left_semi").count()
    hits.toDouble / exact.count()
  }

  /** Exact L2 brute-force top-k (integer d² = n2a + n2b − 2·dot) —
    * the baseline PQ recall is measured against. */
  def annBruteForceL2(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val q = quantized(spark, dir)
    val probes = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("q").as("qa"), col("n2").as("n2a"))
    val corpus = q.select(col("vec_id").as("nbr_id"), col("q").as("qb"), col("n2").as("n2b"))
    val scored = broadcast(probes).crossJoin(corpus)
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("d2",
        col("n2a") + col("n2b") - lit(2L) * expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("nbr_id"), col("d2"))
    val w = Window.partitionBy("probe_id").orderBy(col("d2"), col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "d2")
  }

  /** Recall@k of the PQ/ADC index vs the exact-L2 baseline — the
    * tuning loop for the compressed index (subspace count and
    * codebook size are chosen by measured recall); both sides are
    * integer-deterministic, so the measurement is oracle-gated. */
  def annPqRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val exact = annBruteForceL2(spark, dir, k).select("probe_id", "nbr_id")
    val approx = annPq(spark, dir, k)
      .select(col("probe_id"), col("nbr_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("probe_id", "nbr_id"), "left")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("probe_id"), col("k"), col("hits"),
        expr("hits * 100 div k").as("recall_pct"))
  }

  /** IVF with the cell index PERSISTED in the transactional table —
    * the ANN twin of `Dedup.incrementalNearIndexed`: at 100 TB the
    * per-vector cell assignment (a k×N dot-product pass over the whole
    * corpus) is computed once at index-build time and every search
    * reads the (vec_id, cell) table instead of recomputing it; index
    * updates ride the same atomic-commit protocol (a new batch's
    * assignments append; readers never see a torn index). Probe-side
    * cell ranking is per-query work and stays fresh. Same relation as
    * `annIvf` — q_ann_ivf_indexed shares its oracle. */
  def annIvfIndexed(spark: SparkSession, dir: String,
    k: Int = 3, nprobe: Int = 2): DataFrame = {
    // index table on the cluster's scratch FS (graft.Scratch) — a
    // driver-local tmpdir index would be invisible to executors
    val root = graft.Scratch.freshRoot(spark, "graft-ivfindex", dir)
    val q = quantized(spark, dir)
    // index build (in production: once per corpus backfill/batch)
    graft.sources.TxTable.append(
      ivfCellRank(q, "vec_id", ivfCent(q)).filter(col("crn") === 1)
        .select(col("vec_id"), col("cid").as("cell")),
      root, statsCols = Seq("vec_id"))
    ivfIndexSearch(spark, q, root, k, nprobe)
  }

  /** INCREMENTALLY MAINTAINED cell index (q_ann_ivf_incremental):
    * the backfill assigns 9/10 of the corpus; the "nightly" batch
    * assigns ONLY its own vectors (batch × broadcast-centroid — at
    * 10^11 vectors the incremental cost is the batch, never the
    * corpus) and lands as a second atomic append commit. Cell
    * assignment depends only on the fixed centroids, so the
    * two-commit index answers searches identically to the full
    * rebuild — which is exactly what the shared q_ann_ivf oracle
    * hash-checks. The band-index/aggview maintenance discipline
    * applied to retrieval's vector face. */
  def annIvfIncremental(spark: SparkSession, dir: String,
    k: Int = 3, nprobe: Int = 2): DataFrame = {
    val root = graft.Scratch.freshRoot(spark, "graft-ivfincr", dir)
    val q = quantized(spark, dir)
    val cent = ivfCent(q)
    def assignOf(vecs: DataFrame): DataFrame =
      ivfCellRank(vecs, "vec_id", cent).filter(col("crn") === 1)
        .select(col("vec_id"), col("cid").as("cell"))
    graft.sources.TxTable.append(
      assignOf(q.filter(col("vec_id") % 10 =!= 0)),
      root, statsCols = Seq("vec_id"))
    graft.sources.TxTable.append(
      assignOf(q.filter(col("vec_id") % 10 === 0)), root)
    ivfIndexSearch(spark, q, root, k, nprobe)
  }

  /** First-16 stand-in centroids (the deterministic cell structure
    * the indexed faces share). */
  private def ivfCent(q: DataFrame): DataFrame =
    q.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("q").as("qc"),
        col("n2").as("n2c"))

  private def ivfCellRank(vecs: DataFrame, idCol: String,
    cent: DataFrame): DataFrame = {
    val scored = vecs.crossJoin(broadcast(cent))
      .withColumn("dot", expr(s"array_dot_long(q, qc)"))
      .select(col(idCol), col("cid"),
        expr("cast(dot as double) / (sqrt(cast(n2 as double)) * sqrt(cast(n2c as double)))").as("ccos"))
    val w = Window.partitionBy(idCol).orderBy(col("ccos").desc, col("cid"))
    scored.withColumn("crn", row_number().over(w))
  }

  /** nprobe-cell search over a PERSISTED assignment table — shared by
    * the one-shot and incremental index faces. */
  private def ivfIndexSearch(spark: SparkSession, q: DataFrame,
    root: String, k: Int, nprobe: Int): DataFrame = {
    val cent = ivfCent(q)
    val assign = graft.sources.TxTable.read(spark, root)
    val corpus = q.join(assign, "vec_id")
      .select(col("cell"), col("vec_id").as("nbr_id"), col("q").as("qb"), col("n2").as("n2b"))
    val probeCells = ivfCellRank(q.filter(col("vec_id") < 5), "vec_id", cent)
      .filter(col("crn") <= nprobe).select(col("vec_id").as("probe_id"), col("cid").as("cell"))
    val probes = q.select(col("vec_id").as("probe_id"), col("q").as("qa"), col("n2").as("n2a"))
    val scored = broadcast(probeCells.join(probes, "probe_id")).join(corpus, Seq("cell"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("nbr_id"), expr(cosExpr).as("cos")).distinct()
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "cos")
  }

  /** IVF search over a TRAINED codebook: `trainCentroids`' Lloyd
    * iterations feed the cell structure instead of the first-16
    * stand-in. Cell assignment is euclidean argmin — consistent with
    * the training objective — while candidate scoring stays exact
    * integer cosine. Training is deterministic (exact integer sums,
    * one IEEE division per mean, half-away-from-zero re-quantization),
    * so the DuckDB oracle replays the same iterations as unrolled CTEs
    * and the whole pipeline hash-matches (q_ann_ivf_trained). */
  def annIvfTrained(spark: SparkSession, dir: String,
    k: Int = 3, nprobe: Int = 2, iters: Int = 2): DataFrame = {
    val q = quantized(spark, dir)
    val cent = trainCentroids(spark, dir, 16, iters)
      .withColumn("n2c", expr("array_dot_long(qc, qc)"))
    def cellRank(vecs: DataFrame, idCol: String) = {
      val scored = vecs.crossJoin(broadcast(cent))
        .withColumn("dot", expr("array_dot_long(q, qc)"))
        .withColumn("dist2", col("n2") + col("n2c") - lit(2) * col("dot"))
        .select(col(idCol), col("cid"), col("dist2"))
      val w = Window.partitionBy(idCol).orderBy(col("dist2"), col("cid"))
      scored.withColumn("crn", row_number().over(w))
    }
    val assign = cellRank(q, "vec_id").filter(col("crn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
    val corpus = q.join(assign, "vec_id")
      .select(col("cell"), col("vec_id").as("nbr_id"), col("q").as("qb"), col("n2").as("n2b"))
    val probeCells = cellRank(q.filter(col("vec_id") < 5), "vec_id")
      .filter(col("crn") <= nprobe).select(col("vec_id").as("probe_id"), col("cid").as("cell"))
    val probes = q.select(col("vec_id").as("probe_id"), col("q").as("qa"), col("n2").as("n2a"))
    val scored = broadcast(probeCells.join(probes, "probe_id")).join(corpus, Seq("cell"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("nbr_id"), expr(cosExpr).as("cos")).distinct()
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "cos")
  }

  /** ±1 component of hyperplane `p` at (1-based) dimension `i`: parity
    * of the first hex digit of md5("p_i"). Computed ONCE on the driver
    * at plan-build time — the DuckDB oracle replays the identical
    * derivation in SQL, so buckets hash-match. */
  private def hyperplaneSign(p: Int, i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_${i}".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) % 2 == 0) 1L else -1L
  }

  /** Random-hyperplane LSH bucket per vector: 8 deterministic pseudo-
    * hyperplanes with ±1 components derived from md5 parity; the
    * bucket is the 8-char sign string. Integer dot → exact sign.
    *
    * The 8 hyperplanes are emitted as literal bigint arrays and each
    * sign is one codegen `array_dot_long` — the whole signature pass is
    * a single map-side projection (no explode, no shuffle; previously
    * this was a 512-rows-per-vector posexplode plus TWO groupBy
    * shuffles). Returns the input with a `bucket` column appended, so
    * callers need no join back onto `q`. */
  def hyperplaneBuckets(q: DataFrame, dim: Int = 64): DataFrame = {
    val sig = concat((0 until 8).map { p =>
      val h = (1 to dim).map(i => s"${hyperplaneSign(p, i)}L").mkString(",")
      expr(s"CASE WHEN array_dot_long(q, array($h)) >= 0 THEN '1' ELSE '0' END")
    }: _*)
    // the hyperplanes are dim-length literals and array_dot_long is
    // NULL on length mismatch, which the sign CASE would silently read
    // as '0' — collapsing every wrong-dimension vector into one bucket.
    // Fail loudly instead: a caller with 16-dim media embeddings must
    // pass dim = 16.
    val guarded = when(size(col("q")) === dim, sig).otherwise(
      raise_error(concat(lit(s"hyperplaneBuckets: expected $dim-dim vectors, got "),
        size(col("q")).cast("string"))))
    q.withColumn("bucket", guarded)
  }

  /** ANN via LSH buckets: probes only score candidates in their own
    * bucket (1/256 of the corpus in expectation). */
  def annLsh(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val qb = hyperplaneBuckets(quantized(spark, dir))
    val probes = qb.filter(col("vec_id") < 5)
      .select(col("bucket"), col("vec_id").as("probe_id"), col("q").as("qa"), col("n2").as("n2a"))
    val corpus = qb
      .select(col("bucket"), col("vec_id").as("nbr_id"), col("q").as("qb"), col("n2").as("n2b"))
    val scored = broadcast(probes).join(corpus, Seq("bucket"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("nbr_id"), expr(cosExpr).as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "cos")
  }

  /** Multi-probe LSH (Lv et al. 2007): each probe searches its exact
    * bucket PLUS the 8 single-bit-flip neighbors — the buckets a
    * near-neighbor most likely fell into when one hyperplane sign
    * disagreed. Recall rises toward brute force WITHOUT growing the
    * corpus index (the classic multi-probe trade: more probe lookups
    * instead of more hash tables). The 9× fan-out is probe-side only —
    * probes stay broadcast, the corpus still keeps one bucket per
    * vector and matches each probe through at most one bucket, so
    * candidates stay duplicate-free with no distinct. */
  def annLshMultiProbe(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val qb = hyperplaneBuckets(quantized(spark, dir))
    val probes = qb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("q").as("qa"),
        col("n2").as("n2a"),
        explode(expr(
          "concat(array(bucket), transform(sequence(1, 8), i -> " +
            "concat(substring(bucket, 1, i - 1), " +
            "CASE WHEN substring(bucket, i, 1) = '1' THEN '0' ELSE '1' END, " +
            "substring(bucket, i + 1))))")).as("bucket"))
    val corpus = qb
      .select(col("bucket"), col("vec_id").as("nbr_id"), col("q").as("qb"), col("n2").as("n2b"))
    val scored = broadcast(probes).join(corpus, Seq("bucket"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("nbr_id"), expr(cosExpr).as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "cos")
  }

  /** ANN quality measurement — recall@k of the LSH index against the
    * exact brute-force baseline, per probe. THE tuning loop for any
    * approximate index (bands/hyperplanes/nprobe are chosen by
    * measured recall, not hope); both sides are deterministic here so
    * the measurement itself sits under the oracle gate. Integer
    * percent via exact division keeps it engine-portable. */
  def annRecall(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val exact = annBruteForce(spark, dir, k).select("probe_id", "nbr_id")
    val approx = annLsh(spark, dir, k)
      .select(col("probe_id"), col("nbr_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("probe_id", "nbr_id"), "left")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("probe_id"), col("k"), col("hits"),
        expr("hits * 100 div k").as("recall_pct"))
  }

  /** Binary (1-bit) quantization ANN: every vector compresses to its
    * per-dimension SIGN BITS packed into ceil(d/64) longs — 64 dims
    * fit ONE 8-byte word, a 32× memory cut vs float32, the form that
    * lets a 10^12-vector corpus sit in a fleet's RAM. Candidate
    * generation scans signatures by Hamming distance (XOR + popcount:
    * one fused ALU op per 64 dims, vs 64 multiplies for a dot), keeps
    * the `cand` hamming-closest per probe, then re-ranks only those by
    * exact integer cosine — the standard binary-quantize-then-rescore
    * retrieval shape. Probes broadcast; the corpus is scanned once,
    * map-side, and only `cand` rows per probe reach the rerank.
    * Deterministic ties: (hamming, nbr_id) then (cos desc, nbr_id).
    * ref: src/contrib/index build pipeline motivates sub-byte postings
    * (hadoop-20-warehouse contrib/index). */
  def annBinary(spark: SparkSession, dir: String, k: Int = 5,
    cand: Int = 50): DataFrame = {
    val q = quantized(spark, dir)
    // bit j of word w is set iff component (w*64 + j) > 0; slice past
    // the array end zip_withs to null ⇒ bit 0, so any d works
    val packed = q.withColumn("sig", expr(
      "transform(sequence(0, (size(q) - 1) div 64), w -> " +
        "aggregate(zip_with(slice(q, w * 64 + 1, 64), sequence(0, 63), " +
        "(v, j) -> IF(v is not null and v > 0, " +
        "shiftleft(cast(1 as bigint), cast(j as int)), cast(0 as bigint))), " +
        "cast(0 as bigint), (acc, x) -> acc | x))"))
    val probes = packed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("sig").as("sa"),
        col("q").as("qa"), col("n2").as("n2a"))
    val corpus = packed.select(col("vec_id").as("nbr_id"),
      col("sig").as("sb"), col("q").as("qb"), col("n2").as("n2b"))
    val ham = broadcast(probes).crossJoin(corpus)
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("ham", expr(
        "aggregate(zip_with(sa, sb, (x, y) -> bit_count(x ^ y)), 0, (a, b) -> a + b)"))
    val wc = Window.partitionBy("probe_id").orderBy(col("ham"), col("nbr_id"))
    val kept = ham.withColumn("cr", row_number().over(wc))
      .filter(col("cr") <= cand)
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("nbr_id"), col("ham"),
        expr(cosExpr).as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    kept.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("probe_id", "rk", "nbr_id", "ham", "cos")
  }

  /** SemDeDup (Abbas et al. 2023) — semantic deduplication, the
    * embedding-space stage of a training-data pipeline: cluster the
    * corpus, then WITHIN each cluster drop every vector that scores
    * cos > τ against an earlier-id vector, keeping one representative
    * per semantic-duplicate group. The cluster blocking is the whole
    * point at scale: pairs exist only inside a cell (SemDeDup's k-means
    * blocks), never across the corpus — the all-pairs cost is bounded
    * by the largest cell, and the verdict is a per-vector EXISTS.
    * Deterministic first-16 codebook matches `annIvf` (swap in
    * `trainCentroids` for the production build); verdict columns are
    * integers (earlier-similar-neighbor count) so the whole relation
    * hash-gates. */
  def semDedup(spark: SparkSession, dir: String,
    tau: Double = 0.35): DataFrame = {
    val q = quantized(spark, dir)
    val cent = q.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("q").as("qc"), col("n2").as("n2c"))
    val scored = q.crossJoin(broadcast(cent))
      .withColumn("dot", expr("array_dot_long(q, qc)"))
      .select(col("vec_id"), col("cid"),
        expr("cast(dot as double) / (sqrt(cast(n2 as double)) * sqrt(cast(n2c as double)))").as("ccos"))
    val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
    val assign = scored.withColumn("crn", row_number().over(w))
      .filter(col("crn") === 1).select(col("vec_id"), col("cid").as("cell"))
    val vecs = q.join(assign, "vec_id")
    val late = vecs.select(col("cell"), col("vec_id"),
      col("q").as("qa"), col("n2").as("n2a"))
    val early = vecs.select(col("cell"), col("vec_id").as("prev_id"),
      col("q").as("qb"), col("n2").as("n2b"))
    val simPrev = late.join(early, Seq("cell"))
      .filter(col("prev_id") < col("vec_id"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .filter(expr("cast(dot as double) / (sqrt(cast(n2a as double)) * " +
        s"sqrt(cast(n2b as double))) > $tau"))
      .groupBy("vec_id").agg(count(lit(1)).as("n_prev_sim"))
    assign.join(simPrev, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("n_prev_sim"), lit(0L)).as("n_prev_sim"),
        (coalesce(col("n_prev_sim"), lit(0L)) > 0).as("is_dup"))
  }

  /** KNN majority-vote classification over the int8 codes — the
    * label-propagation step embedding pipelines run (assign a weak
    * label to new documents from their nearest labeled neighbors).
    * Per probe: top-k neighbors by int8 cosine (pure integer dots via
    * the codegen `array_dot_long` kernel, deterministic nbr_id
    * tie-break), then the modal neighbor label (vote-count desc,
    * label asc on ties) — an all-integer vote, so predictions are
    * engine-exact. Same broadcast-probe shape as `annInt8`: the
    * labeled corpus never shuffles; per-probe state is k rows.
    * Composes with the IVF/PQ candidate generators for the 10^11-row
    * corpus (swap the brute-force candidate set; the vote is
    * unchanged). */
  def knnClassify(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val q = int8Codes(spark, dir)
    val probes = q.filter(col("vec_id") < 25)
      .select(col("vec_id").as("probe_id"), col("label").as("label"),
        col("q").as("qa"), col("n2").as("n2a"))
    val corpus = q.select(col("vec_id").as("nbr_id"),
      col("label").as("nbr_label"), col("q").as("qb"), col("n2").as("n2b"))
    val scored = broadcast(probes).crossJoin(corpus)
      .filter(col("probe_id") =!= col("nbr_id"))
      .withColumn("dot", expr("array_dot_long(qa, qb)"))
      .select(col("probe_id"), col("label"), col("nbr_id"),
        col("nbr_label"), expr(cosExpr).as("cos"))
    val wk = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    val top = scored.withColumn("rk", row_number().over(wk)).filter(col("rk") <= k)
    val votes = top.groupBy("probe_id", "label", "nbr_label")
      .agg(count(lit(1)).as("votes"))
    val wv = Window.partitionBy("probe_id")
      .orderBy(col("votes").desc, col("nbr_label"))
    votes.withColumn("vr", row_number().over(wv)).filter(col("vr") === 1)
      .select(col("probe_id").as("vec_id"), col("label").cast("long").as("label"),
        col("nbr_label").cast("long").as("pred_label"), col("votes"),
        (col("nbr_label") === col("label")).as("correct"))
  }

  /** annLsh through the custom whole-operator plan
    * (plans.LshTopKJoin): identical semantics and oracle, but the
    * bucket join, exact scoring and per-probe top-k selection are fused
    * into one physical operator — the candidate-pair set never reaches
    * a window's sort+shuffle. */
  def annLshNative(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val qb = hyperplaneBuckets(quantized(spark, dir))
    val probes = qb.filter(col("vec_id") < 5)
      .select(col("bucket"), col("vec_id").as("probe_id"), col("q"), col("n2"))
    val corpus = qb
      .select(col("bucket"), col("vec_id").as("nbr_id"), col("q"), col("n2"))
    graft.plans.LshTopKJoin(probes, corpus, k)
  }
}
