package graft

import scala.util.chaining._

/** DuckDB oracle SQL, one entry per SparkEntry.queries key.
  *
  * Portability contract (SURVEY.md §5): every derived double is the
  * cast of an exact decimal/integer computation (or a single IEEE
  * division of such), hash values are md5 hex strings, orderings carry
  * deterministic tiebreakers — so DuckDB and Spark produce bitwise-
  * identical values without any tolerance.
  */
object Oracles {

  private val rev =
    "cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (cast(1 AS DECIMAL(18,2)) - cast(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  val relational: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  $rev AS sum_disc_price,
         |  cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-06-30 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_stats" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  cast(max(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
        |  cast(min(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
        |  cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  max(o_orderstatus) AS max_status, min(o_orderstatus) AS min_status
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_agg_uniq" ->
      """SELECT event_type, count(DISTINCT user_id) AS uniq_users, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q_agg_histogram" ->
      """WITH freq AS (
        |  SELECT l_returnflag, l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, count(*) AS nvals, min(cnt) AS cmin, max(cnt) AS cmax,
        |  cast(sum(cnt) AS DOUBLE)/count(*) AS cavg,
        |  cast(median(cnt) AS DOUBLE) AS cmedian,
        |  sqrt(cast(sum(cnt*cnt) AS DOUBLE)/count(*)
        |       - (cast(sum(cnt) AS DOUBLE)/count(*)) * (cast(sum(cnt) AS DOUBLE)/count(*))) AS cstd
        |FROM freq GROUP BY l_returnflag""".stripMargin,

    "q_agg_highcard" ->
      """SELECT l_orderkey, cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,

    "q_secondary_sort" ->
      """SELECT o_custkey, rn, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 3""".stripMargin,

    "q_sort_global" ->
      """SELECT rk, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        |  FROM lineitem) t WHERE rk <= 100""".stripMargin,

    // TeraValidate: violations must be zero on correctly sorted
    // output; total_rows and the order-independent decimal checksum
    // are partition-independent, so the oracle reproduces them without
    // knowing the range bounds.
    "q_sort_validate" -> {
      val nib = Portable.uint32Sql("md5(rec)")
      s"""WITH r AS (SELECT concat_ws('|', l_orderkey, l_linenumber,
         |    cast(round(l_extendedprice * 100, 0) AS BIGINT)) rec FROM lineitem)
         |SELECT count(*) AS total_rows, cast(0 AS BIGINT) AS order_violations,
         |  cast(cast(sum(cast($nib AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
         |FROM r""".stripMargin
    },

    "q_sample_interval" ->
      """SELECT rn, o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders) t
        |WHERE rn % 100 = 1""".stripMargin,

    // deterministic per-group reservoir: hash order is a pure function
    // of doc_id, so both engines keep the identical k rows per lang
    "q_reservoir_group" -> {
      val hash = Portable.uint32Sql("md5(cast(doc_id AS VARCHAR))")
      s"""SELECT lang, doc_id, n_chars, rk FROM (
         |  SELECT lang, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY lang ORDER BY $hash, doc_id) AS rk
         |  FROM documents) t
         |WHERE rk <= 3""".stripMargin
    },

    // weighted A-ES reservoir in integer log2q10 space: the identical
    // BIGINT key Relational.weightedReservoirPerGroup sorts on
    "q_reservoir_weighted" -> {
      val hash = Portable.uint32Sql("md5(cast(doc_id AS VARCHAR))")
      val lq = Portable.log2q10Sql(s"2 * ($hash) + 1", "//")
      s"""SELECT lang, doc_id, n_chars, rk FROM (
         |  SELECT lang, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY (($lq - 33792) * 1048576) // n_chars DESC, doc_id) AS rk
         |  FROM documents) t
         |WHERE rk <= 3""".stripMargin
    },

    "q_total_order_bucket" ->
      """SELECT bucket, count(*) AS n,
        |  cast(min(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
        |  cast(max(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
        |FROM (SELECT o_totalprice, o_orderkey,
        |        ntile(32) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket FROM orders) t
        |GROUP BY bucket""".stripMargin,

    // seeded deterministic shuffle (Relational.deterministicShuffle):
    // position = rank under md5(seed:id) — the hash is engine-portable,
    // so the oracle recomputes the identical permutation
    "q_shuffle_deterministic" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY md5('s42:' || doc_id), doc_id)
        |    AS BIGINT) AS pos
        |FROM documents""".stripMargin,

    // token-budget shards (Relational.shardByBudget): contiguous
    // shards of >=16384 tokens in doc_id order; shard = floor of the
    // PRECEDING cumulative token count over the budget
    "q_shard_budget" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tok,
        |    sum(tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, tok, CAST((cum - tok) // 16384 AS BIGINT) AS shard
        |FROM c""".stripMargin,

    "q_topk_per_group" ->
      """SELECT p_brand, rk, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) t WHERE rk <= 3""".stripMargin,

    "q_join_star" ->
      s"""SELECT n_name, $rev AS revenue, count(*) AS n
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' GROUP BY n_name""".stripMargin,

    "q_join_bigbig" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS month, $rev AS revenue, count(*) AS n
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY strftime(o_orderdate, '%Y-%m')""".stripMargin,

    "q_join_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,

    "q_join_override" ->
      """SELECT c_custkey, coalesce(v, c_acctbal) AS bal,
        |  CASE WHEN k IS NULL THEN 'base' ELSE 'override' END AS src_tag
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey AS k, cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM orders GROUP BY 1) u ON c_custkey = u.k""".stripMargin,

    "q_join_bloom" ->
      """SELECT l_returnflag, count(*) AS n,
        |  cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 45)
        |GROUP BY l_returnflag""".stripMargin,

    "q_field_selection" ->
      """SELECT f[3] AS flag, f[4] AS status, count(*) AS n FROM (
        |  SELECT string_split(concat_ws(',', l_orderkey, l_linenumber, l_returnflag, l_linestatus), ',') AS f
        |  FROM lineitem) t GROUP BY 1, 2""".stripMargin,

    "q_chain" ->
      """SELECT l_suppkey,
        |  CASE WHEN sum_qty >= 8000 THEN 'high' WHEN sum_qty >= 6000 THEN 'mid' ELSE 'low' END AS tier,
        |  sum_qty
        |FROM (SELECT l_suppkey, cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |      FROM lineitem WHERE l_quantity > 10 GROUP BY 1) t""".stripMargin,

    "q_multi_input_union" ->
      """SELECT 'customer' AS src, c_custkey AS id, c_name AS name, c_acctbal AS bal FROM customer
        |UNION ALL
        |SELECT 'supplier' AS src, s_suppkey AS id, s_name AS name, s_acctbal AS bal FROM supplier""".stripMargin,

    "q_zorder" -> {
      val z = (0 until 21).map(i =>
        s"(((l_partkey >> $i) % 2) << ${2 * i}) + (((l_suppkey >> $i) % 2) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH zt AS (SELECT l_partkey, l_suppkey, $z AS z FROM lineitem)
         |SELECT z // 65536 AS zbucket, count(*) AS n,
         |  min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         |  min(l_suppkey) AS smin, max(l_suppkey) AS smax
         |FROM zt GROUP BY 1""".stripMargin
    },

    "q_multi_output_assign" ->
      """SELECT o_orderpriority AS part_key, count(*) AS n,
        |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_date
        |FROM orders GROUP BY 1""".stripMargin,
  )

  /** DuckDB twin of TextOps.normExpr (regexp_replace needs the 'g'
    * flag; Spark replaces all occurrences by default). */
  private val norm =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  private val enStop = "'the', 'a', 'of', 'and', 'to', 'in', 'is'"

  /** The full 3-round BPE training loop as CTEs: count pairs → adopt
    * best (freq desc, lexicographic) → non-overlapping (l ≠ r)
    * set-based rewrite. Exposes b1..b3 (adopted merges) and t3 (the
    * final per-word tokenization) — shared by the train and encode
    * oracles so the replayed trainer cannot drift between them. */
  private val bpeTrainedCte: String = {
    def round(k: Int): String =
      s"""n$k AS (SELECT word, wc, i, tok,
         |  lead(tok) OVER (PARTITION BY word ORDER BY i) nxt FROM t${k - 1}),
         |b$k AS (SELECT l, r, freq FROM (
         |  SELECT tok l, nxt r, cast(sum(wc) AS BIGINT) freq FROM n$k
         |  WHERE nxt IS NOT NULL AND tok <> nxt GROUP BY 1, 2
         |  ORDER BY freq DESC, l, r LIMIT 1) z$k),
         |m$k AS (SELECT word, wc, i, tok, b.l, b.r,
         |  (tok = b.l AND nxt = b.r) m_here FROM n$k CROSS JOIN b$k b),
         |g$k AS (SELECT word, wc, i, tok, l, r, m_here,
         |  coalesce(lag(m_here) OVER (PARTITION BY word ORDER BY i), false) m_prev
         |  FROM m$k),
         |a$k AS (SELECT word, wc, i,
         |  CASE WHEN m_here THEN l || r ELSE tok END tok
         |  FROM g$k WHERE NOT m_prev),
         |t$k AS (SELECT word, wc,
         |  row_number() OVER (PARTITION BY word ORDER BY i) i, tok FROM a$k)""".stripMargin
    s"""WITH tk AS (SELECT unnest(string_split($norm, ' ')) word FROM documents),
       |w AS (SELECT word, count(*) wc FROM tk WHERE word <> '' GROUP BY 1),
       |ix AS (SELECT word, wc, unnest(generate_series(1, length(word))) i FROM w),
       |t0 AS (SELECT word, wc, i, substring(word, i, 1) tok FROM ix),
       |${round(1)},
       |${round(2)},
       |${round(3)}""".stripMargin
  }

  val text: Map[String, String] = Map(
    // duplicated token-span (8-gram) detection: the corpus-wide span
    // fingerprint count joined back per doc; ppm is exact integer //
    "q_dedup_spans" ->
      s"""WITH nt AS (SELECT doc_id, string_split($norm, ' ') tk FROM documents),
         |ix AS (SELECT doc_id, tk, unnest(generate_series(1, greatest(len(tk) - 7, 1))) i FROM nt),
         |gr AS (SELECT doc_id, substring(md5(concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3],
         |         tk[i+4], tk[i+5], tk[i+6], tk[i+7])), 1, 16) h FROM ix),
         |c AS (SELECT h, count(*) c FROM gr GROUP BY 1),
         |j AS (SELECT doc_id, c.c FROM gr JOIN c USING (h)),
         |a AS (SELECT doc_id, count(*) n_spans,
         |        cast(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) dup_spans
         |      FROM j GROUP BY 1)
         |SELECT doc_id, n_spans, dup_spans,
         |  cast(dup_spans * 1000000 // n_spans AS BIGINT) AS dup_ppm
         |FROM a""".stripMargin,

    // BPE merge candidates: char-pair frequencies weighted by word
    // counts over the vocabulary table, deterministic (freq, pair) rank
    "q_bpe_merges" ->
      s"""WITH t AS (SELECT unnest(string_split($norm, ' ')) word FROM documents),
         |w AS (SELECT word, count(*) wc FROM t WHERE word <> '' GROUP BY 1),
         |ix AS (SELECT word, wc, unnest(generate_series(1, greatest(length(word) - 1, 1))) i FROM w),
         |p AS (SELECT substring(word, i, 2) pair, wc FROM ix),
         |f AS (SELECT pair, cast(sum(wc) AS BIGINT) freq FROM p
         |      WHERE length(pair) = 2 GROUP BY 1)
         |SELECT rk, pair, freq FROM (
         |  SELECT *, row_number() OVER (ORDER BY freq DESC, pair) rk FROM f) z
         |WHERE rk <= 30""".stripMargin,

    // the full BPE training loop, unrolled: 3 rounds of
    // count-pairs → adopt best (freq desc, lexicographic) → rewrite
    // tokenization with the non-overlapping (l ≠ r) set-based merge
    "q_bpe_train" ->
      s"""$bpeTrainedCte
         |SELECT 1 AS iter, l, r, freq FROM b1
         |UNION ALL SELECT 2, l, r, freq FROM b2
         |UNION ALL SELECT 3, l, r, freq FROM b3""".stripMargin,

    // Gopher-style structural quality rules: exact-integer stats
    // (mean word length in centi-chars) => engine-identical verdicts
    "q_gopher_rules" ->
      s"""WITH t AS (SELECT doc_id, $norm nrm FROM documents),
         |m AS (SELECT doc_id, nrm, string_split(nrm, ' ') tk FROM t),
         |s AS (SELECT doc_id, len(tk) n_tokens,
         |  (length(nrm) - (len(tk) - 1)) * 100 // len(tk) avg_len_c,
         |  len(list_filter(tk, x -> x IN ($enStop))) stop_hits FROM m)
         |SELECT doc_id, cast(n_tokens AS BIGINT) AS n_tokens,
         |  cast(avg_len_c AS BIGINT) AS avg_len_c,
         |  cast(stop_hits AS BIGINT) AS stop_hits,
         |  n_tokens BETWEEN 20 AND 100000 AS r_len,
         |  avg_len_c BETWEEN 390 AND 510 AS r_wordlen,
         |  stop_hits >= 2 AS r_stop,
         |  (n_tokens BETWEEN 20 AND 100000)
         |    AND (avg_len_c BETWEEN 390 AND 510) AND stop_hits >= 2 AS keep
         |FROM s""".stripMargin,

    // integer PageRank over the source co-syndication graph: edges =
    // shared distinct 8-gram span fingerprints, 5 unrolled iterations
    // in fixed-point q40 — every step BIGINT, engine-exact
    "q_pagerank" -> {
      val S = "1099511627776"
      def iter(i: Int): String =
        s"""c$i AS (SELECT ed.v, cast(sum((p.pr * ed.w) // st.s) AS BIGINT) agg
           |  FROM p${i - 1} p JOIN ed ON ed.u = p.v JOIN st ON st.u = ed.u
           |  GROUP BY 1),
           |p$i AS (SELECT no.v, bb.b + (85 * coalesce(c$i.agg, 0)) // 100 pr
           |  FROM no CROSS JOIN bb LEFT JOIN c$i ON c$i.v = no.v)""".stripMargin
      s"""WITH nt AS (SELECT source, string_split($norm, ' ') tk FROM documents),
         |ix AS (SELECT source, tk,
         |  unnest(generate_series(1, greatest(len(tk) - 7, 1))) i FROM nt),
         |gr AS (SELECT DISTINCT source, substring(md5(concat_ws(' ', tk[i],
         |  tk[i+1], tk[i+2], tk[i+3], tk[i+4], tk[i+5], tk[i+6], tk[i+7])),
         |  1, 16) h FROM ix),
         |und AS (SELECT a.source u, b.source v, count(*) w FROM gr a
         |  JOIN gr b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2),
         |ed AS (SELECT u, v, w FROM und UNION ALL SELECT v, u, w FROM und),
         |st AS (SELECT u, cast(sum(w) AS BIGINT) s FROM ed GROUP BY 1),
         |no AS (SELECT DISTINCT source v FROM documents),
         |nn AS (SELECT count(*) n FROM no),
         |bb AS (SELECT (15 * $S) // (100 * n) b, $S // n pz FROM nn),
         |p0 AS (SELECT v, bb.pz pr FROM no CROSS JOIN bb),
         |${(1 to 5).map(iter).mkString(",\n")}
         |SELECT v AS source, pr AS pr_q40,
         |  row_number() OVER (ORDER BY pr DESC, v) rnk FROM p5""".stripMargin
        // ed/st feed every round — staged CTEs stop per-round
        // re-evaluation of the fingerprint self-join at scaled rungs
        .pipe(sql => materialize(sql, Seq("gr", "und", "ed", "st", "no") ++
          (0 to 5).map(i => s"p$i"): _*))
    },

    // synchronous label propagation over the same projected source
    // graph: 3 unrolled rounds, argmax neighbor-label weight with
    // lexicographic tie-break — deterministic, engine-exact
    "q_communities" -> {
      // each round references its predecessor 2-3 times; staged
      // (MATERIALIZED) CTEs keep the 10x-rung replay in bounded RAM
      // (default inlining re-evaluates the full prefix per reference)
      def round(i: Int): String =
        s"""s$i AS (SELECT ed.u, l.lab, cast(sum(ed.w) AS BIGINT) s
           |  FROM ed JOIN l${i - 1} l ON ed.v = l.v GROUP BY 1, 2),
           |b$i AS (SELECT u, lab FROM (SELECT u, lab,
           |  row_number() OVER (PARTITION BY u ORDER BY s DESC, lab) rn
           |  FROM s$i) t WHERE rn = 1),
           |l$i AS (SELECT p.v, coalesce(b$i.lab, p.lab) lab
           |  FROM l${i - 1} p LEFT JOIN b$i ON b$i.u = p.v)""".stripMargin
      s"""WITH nt AS (SELECT source, string_split($norm, ' ') tk FROM documents),
         |ix AS (SELECT source, tk,
         |  unnest(generate_series(1, greatest(len(tk) - 7, 1))) i FROM nt),
         |gr AS (SELECT DISTINCT source, substring(md5(concat_ws(' ', tk[i],
         |  tk[i+1], tk[i+2], tk[i+3], tk[i+4], tk[i+5], tk[i+6], tk[i+7])),
         |  1, 16) h FROM ix),
         |und AS (SELECT a.source u, b.source v, count(*) w FROM gr a
         |  JOIN gr b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2),
         |ed AS (SELECT u, v, w FROM und UNION ALL SELECT v, u, w FROM und),
         |no AS (SELECT DISTINCT source v FROM documents),
         |l0 AS (SELECT v, v lab FROM no),
         |${(1 to 3).map(round).mkString(",\n")},
         |sz AS (SELECT lab, count(*) csize FROM l3 GROUP BY 1)
         |SELECT l3.v AS source, l3.lab AS community, sz.csize
         |FROM l3 JOIN sz USING (lab)""".stripMargin
    }.pipe(sql => materialize(sql, "gr", "und", "ed", "l0", "s1", "b1",
      "l1", "s2", "b2", "l2", "s3", "b3", "l3")),

    // trained Naive Bayes language classifier: Laplace-smoothed token
    // counts over the md5 train split, every weight a fixed-point q10
    // integer (exact bit-length log2 + linear interpolation), so the
    // per-doc score sums are order-free BIGINTs — engine-exact argmax
    "q_nb_langid" -> {
      val bucket = Portable.uint32Sql("md5(cast(doc_id AS VARCHAR))")
      def l2(x: String) = Portable.log2q10Sql(x, "//")
      s"""WITH d AS (SELECT doc_id, lang, text, $bucket % 100 bk FROM documents),
         |t AS (SELECT doc_id, lang, bk, unnest(string_split($norm, ' ')) word FROM d),
         |tt AS (SELECT * FROM t WHERE word <> ''),
         |tr AS (SELECT * FROM tt WHERE bk < 80),
         |cls AS (SELECT lang, word, count(*) cnt FROM tr GROUP BY 1, 2),
         |tot AS (SELECT lang, count(*) tot FROM tr GROUP BY 1),
         |vo AS (SELECT DISTINCT word FROM tr),
         |vs AS (SELECT count(*) v FROM vo),
         |pr AS (SELECT lang, count(*) nd FROM d WHERE bk < 80 GROUP BY 1),
         |nn AS (SELECT cast(sum(nd) AS BIGINT) n FROM pr),
         |mo AS (SELECT lang cand, word, ${l2("cnt + 1")} w FROM cls),
         |ba AS (SELECT tot.lang cand, ${l2("tot + v")} base,
         |         ${l2("nd")} - ${l2("n")} AS prior
         |       FROM tot JOIN pr ON pr.lang = tot.lang CROSS JOIN vs CROSS JOIN nn),
         |iv AS (SELECT tt.doc_id, tt.word FROM tt JOIN vo ON tt.word = vo.word),
         |nv AS (SELECT doc_id, count(*) n_iv FROM iv GROUP BY 1),
         |su AS (SELECT doc_id, cand, cast(sum(w) AS BIGINT) sw
         |       FROM iv JOIN mo USING (word) GROUP BY 1, 2),
         |gr AS (SELECT dd.doc_id, dd.lang, ba.cand, ba.base, ba.prior
         |       FROM documents dd CROSS JOIN ba),
         |sc AS (SELECT g.doc_id, g.lang, g.cand,
         |         coalesce(su.sw, 0) - coalesce(nv.n_iv, 0) * g.base + g.prior score_q10
         |       FROM gr g LEFT JOIN nv ON nv.doc_id = g.doc_id
         |         LEFT JOIN su ON su.doc_id = g.doc_id AND su.cand = g.cand)
         |SELECT doc_id, lang, cand AS pred_lang, cast(score_q10 AS BIGINT) score_q10
         |FROM (SELECT *, row_number() OVER (
         |        PARTITION BY doc_id ORDER BY score_q10 DESC, cand) rk FROM sc) z
         |WHERE rk = 1""".stripMargin
    },

    // bigram-LM perplexity bands: Laplace bigram LM on the English
    // train slice, per-doc NLL in q10 integers, equal-width bands
    // from the global min/max — no global sort, fully integer
    "q_lm_perplexity" -> {
      val bucket = Portable.uint32Sql("md5(cast(doc_id AS VARCHAR))")
      def l2(x: String) = Portable.log2q10Sql(x, "//")
      s"""WITH d AS (SELECT doc_id, lang, text, $bucket % 100 bk FROM documents),
         |nt AS (SELECT doc_id, lang, bk,
         |         list_filter(string_split($norm, ' '), x -> x <> '') tk FROM d),
         |ix AS (SELECT doc_id, lang, bk, tk,
         |         unnest(generate_series(1, greatest(len(tk) - 1, 1))) i FROM nt),
         |gr AS (SELECT doc_id, lang, bk, tk[i] w1,
         |         concat_ws(' ', tk[i], tk[i+1]) g FROM ix),
         |tr AS (SELECT * FROM gr WHERE lang = 'en' AND bk < 80),
         |bg AS (SELECT g, count(*) cb FROM tr GROUP BY 1),
         |un AS (SELECT w1, count(*) cu FROM tr GROUP BY 1),
         |vs AS (SELECT count(DISTINCT w1) v FROM tr),
         |ll AS (SELECT gr.doc_id,
         |         ${l2("coalesce(cb, 0) + 1")} - ${l2("coalesce(cu, 0) + v")} ll
         |       FROM gr LEFT JOIN bg USING (g) LEFT JOIN un USING (w1) CROSS JOIN vs),
         |a AS (SELECT doc_id, count(*) n_bigrams, cast(-sum(ll) AS BIGINT) nll_q10
         |      FROM ll GROUP BY 1),
         |b AS (SELECT *, nll_q10 // n_bigrams avg_q10 FROM a),
         |mm AS (SELECT min(avg_q10) mn, max(avg_q10) mx FROM b)
         |SELECT doc_id, n_bigrams, nll_q10, cast(avg_q10 AS BIGINT) avg_q10,
         |  cast(1 + least(2, (avg_q10 - mn) * 3 // (mx - mn + 1)) AS BIGINT) band
         |FROM b CROSS JOIN mm""".stripMargin
    },

    // encode under the trained vocab: per-word token counts from the
    // round-3 tokenization state, summed per document through the
    // corpus word list — the exact replay of TextOps.bpeEncode
    "q_bpe_encode" ->
      s"""$bpeTrainedCte,
         |vt AS (SELECT word, cast(count(*) AS BIGINT) n_tok FROM t3 GROUP BY word),
         |dw AS (SELECT doc_id, unnest(string_split($norm, ' ')) word FROM documents)
         |SELECT doc_id, cast(count(*) AS BIGINT) n_words,
         |  cast(sum(v.n_tok) AS BIGINT) n_tok
         |FROM dw JOIN vt v USING (word) WHERE word <> '' GROUP BY doc_id""".stripMargin,

    "q_wordcount" ->
      s"""SELECT word, count(*) AS cnt FROM (
         |  SELECT unnest(string_split($norm, ' ')) AS word FROM documents) t
         |WHERE word <> '' GROUP BY word""".stripMargin,

    "q_grep" ->
      """SELECT m, count(*) AS cnt FROM (
        |  SELECT unnest(regexp_extract_all(text, 's[a-z]+')) AS m FROM documents) t
        |GROUP BY m""".stripMargin,

    // the whole-archive read-back (Compaction.harGateQuery): every
    // document staged as one file, bin-packed, and recovered through
    // readAll — the oracle recomputes the per-file facts directly
    "q_har_readall" ->
      """SELECT doc_id, strlen(text) AS byte_len, md5(text) AS h
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin,

    // the synthetic-MP4 header walk (Media.videoMetaGateQuery): the
    // oracle recomputes the deterministic container facts the builder
    // wrote into each box tree
    "q_video_meta" ->
      """SELECT doc_id, 'isom' AS brand,
        |  (doc_id % 3600) + 1 AS duration_ms,
        |  320 + (doc_id % 4) * 160 AS width,
        |  180 + (doc_id % 4) * 90 AS height,
        |  CAST(strlen(text) % 500 + 1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,

    // bin-packed OPTIMIZE (TxTable.optimizeGateQuery): packing is
    // content-preserving, so the oracle is the plain table
    "q_txtable_optimize" ->
      """SELECT l_orderkey, l_linenumber,
        |  cast(cast(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty
        |FROM lineitem""".stripMargin,

    // metadata-only scalar aggregate (TxTable.statsAggGateQuery):
    // the engine answers count/min/max from commit stats with zero
    // data I/O; the oracle recomputes them by scanning — equality
    // proves the stats are exact, not merely sound
    "q_txtable_stats_agg" ->
      """SELECT count(*) AS cnt, count(l_partkey) AS cnt_pkey,
        |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey,
        |  min(l_partkey) AS min_pkey, max(l_partkey) AS max_pkey
        |FROM lineitem""".stripMargin,

    // ANALYZE + DESCRIBE STATISTICS (TxTable.analyzeGateQuery): NDV
    // from the analyze commit header, nulls/min/max from per-dir
    // commit stats, all metadata-only; the oracle recomputes each by
    // scanning — equality proves the recorded statistics (what the V2
    // SupportsReportStatistics face hands the CBO) are exact
    "q_txtable_analyze" ->
      """SELECT col_name, ndv, nulls, min_v, max_v FROM (
        |  SELECT 'o_orderkey' AS col_name,
        |    count(DISTINCT o_orderkey) AS ndv,
        |    count(*) - count(o_orderkey) AS nulls,
        |    min(o_orderkey) AS min_v, max(o_orderkey) AS max_v
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey',
        |    count(DISTINCT o_custkey),
        |    count(*) - count(o_custkey),
        |    min(o_custkey), max(o_custkey)
        |  FROM orders) t""".stripMargin,

    // COUNT(DISTINCT) from the exact analyze header
    // (TxTable.countDistinctGateQuery): the whole aggregate is served
    // from commit metadata; the oracle's full-scan DISTINCT proves
    // the substitute exact
    "q_txtable_count_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS ndv_cust, count(*) AS cnt,
        |  min(o_orderkey) AS min_okey, max(o_orderkey) AS max_okey
        |FROM orders""".stripMargin,

    // metadata-only GROUP BY the composite partition key
    // (TxTable.partCountsGateQuery): per-(bucket, bucket2)
    // count/min/max from the partitioned snapshot's per-dir stats
    // alone — the two-key rollup over the multi-key clustering proof
    "q_txtable_part_counts" ->
      """SELECT o_orderkey % 8 AS bucket, o_orderkey % 3 AS bucket2,
        |  count(*) AS cnt,
        |  min(o_orderkey) AS min_okey, max(o_orderkey) AS max_okey
        |FROM orders
        |GROUP BY bucket, bucket2""".stripMargin,

    // metadata-only GROUP BY a STRING partition key
    // (TxTable.partCountsStrGateQuery): per-priority counts from the
    // sx exact-value dir stats — the date/category-string layout
    "q_txtable_part_counts_str" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |  min(o_orderkey) AS min_okey, max(o_orderkey) AS max_okey
        |FROM orders
        |GROUP BY o_orderpriority""".stripMargin,

    // partitioned STREAMING ingest (TxTable.streamPartGateQuery): the
    // stream's rename-promoted table must hold exactly raw orders
    "q_txtable_stream_part" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |  min(o_orderkey) AS min_okey, max(o_orderkey) AS max_okey
        |FROM orders
        |GROUP BY o_orderpriority""".stripMargin,

    // storage-partitioned join (TxTable.spjGateQuery): the engine
    // joins two co-clustered tables with ZERO Exchange via the V2
    // KeyGroupedPartitioning face; the bucket key is derived from
    // custkey so the oracle is the plain equi-join
    "q_txtable_spj" ->
      """SELECT o_orderkey, o_custkey, c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // HASH-BUCKETED storage-partitioned join (bucketSpjGateQuery):
    // both sides murmur3-bucketed 16 ways on the raw custkey (a
    // high-cardinality key identity partitioning cannot co-locate);
    // the gate itself requires zero Exchange, so the oracle is the
    // plain equi-join — hash equality proves the bucket routing
    // loses and invents no rows
    "q_txtable_bucket_spj" ->
      """SELECT o_orderkey, o_custkey, c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // ONE-SIDED-SHUFFLE bucketed join (bucketSpjShuffleGateQuery):
    // only orders is bucketed; the plain customer side shuffles INTO
    // the layout via the V2 bucket function (the gate requires exactly
    // one Exchange), so the oracle is again the plain equi-join —
    // hash equality proves the shuffled side routed to the right
    // buckets (a mis-hash loses matches silently)
    "q_txtable_bucket_spj_shuffle" ->
      """SELECT o_orderkey, o_custkey, c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // composite-key storage-partitioned join (TxTable.spj2GateQuery):
    // both sides clustered on (custkey%8, custkey%3); the bucket-key
    // equalities are implied by the custkey equality, so the oracle
    // is the same logical join
    "q_txtable_spj2" ->
      """SELECT o_orderkey, o_custkey, c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // SQL-first storage-partitioned join (TxTable.sqlPartSpjGateQuery):
    // both sides CREATE TABLE ... PARTITIONED BY + INSERT INTO in pure
    // SQL, joined zero-Exchange through the KeyGroupedPartitioning
    // face; the bucket key derives from custkey, so the oracle is the
    // plain equi-join
    "q_txtable_sql_spj" ->
      """SELECT o_orderkey, o_custkey, c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // SQL maintenance surface (TxTable.sqlMaintGateQuery): CALL
    // analyze / optimize_compact / vacuum are answer-preserving, so
    // the oracle is the plain per-customer rollup of the four loads
    // (= the whole table)
    "q_txtable_sql_maint" ->
      """SELECT o_custkey AS cust, count(*) AS cnt,
        |  max(o_orderkey) AS max_k
        |FROM orders GROUP BY o_custkey""".stripMargin,

    // SQL column evolution replay (TxTable.addColGateQuery): orders
    // loaded without price, ADD COLUMNS (price), a priced INSERT of
    // shifted keys, then an UPDATE filling price on a slice of the
    // pre-ADD rows — the oracle composes the three states
    "q_txtable_addcol" ->
      """WITH o AS (SELECT o_orderkey k, o_custkey cust,
        |    cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) price
        |  FROM orders),
        |mx AS (SELECT max(k) m FROM o),
        |base AS (SELECT k, cust, CAST(NULL AS DOUBLE) price FROM o
        |         UNION ALL
        |         SELECT o.k + mx.m, cust, price FROM o, mx)
        |SELECT k, cust,
        |  CASE WHEN k % 10 = 0 AND k <= (SELECT m FROM mx)
        |       THEN cust * 1.0 ELSE price END AS price
        |FROM base""".stripMargin,

    // partition-scoped INSERT OVERWRITE replay
    // (TxTable.overwritePartGateQuery): full load, then month 3
    // statically reloaded (even customers, doubled price) and months
    // 5/6 dynamically reloaded (cust%3=0, tripled price) — the oracle
    // is the three loads composed relationally
    "q_txtable_overwrite_part" ->
      """WITH src AS (SELECT o_orderkey k, o_custkey cust,
        |    cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) price,
        |    CAST(month(o_orderdate) AS INT) om FROM orders)
        |SELECT k, cust, price, om FROM src WHERE om NOT IN (3, 5, 6)
        |UNION ALL
        |SELECT k, cust, price * 2 AS price, CAST(3 AS INT) AS om
        |FROM src WHERE om = 3 AND cust % 2 = 0
        |UNION ALL
        |SELECT k, cust, price * 3 AS price, om
        |FROM src WHERE om IN (5, 6) AND cust % 3 = 0""".stripMargin,

    // STRING-key partition overwrite twin: month-string layout
    // ('01'..'12'), static PARTITION (om = '03') + dynamic '05'/'06'
    "q_txtable_overwrite_part_str" ->
      """WITH src AS (SELECT o_orderkey k, o_custkey cust,
        |    cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) price,
        |    strftime(o_orderdate, '%m') om FROM orders)
        |SELECT k, cust, price, om FROM src
        |WHERE om NOT IN ('03', '05', '06')
        |UNION ALL
        |SELECT k, cust, price * 2 AS price, '03' AS om
        |FROM src WHERE om = '03' AND cust % 2 = 0
        |UNION ALL
        |SELECT k, cust, price * 3 AS price, om
        |FROM src WHERE om IN ('05', '06') AND cust % 3 = 0""".stripMargin,

    // SHOW PARTITIONS: the metadata-only tuple + row tallies must
    // equal the relational group-by over the same load
    "q_txtable_show_parts" ->
      """SELECT 'om=' || strftime(o_orderdate, '%m') AS "partition",
        |  count(*) AS num_rows
        |FROM orders GROUP BY 1""".stripMargin,

    // CBO join reorder over catalog tables (TxTable.cboJoinGateQuery):
    // the reordered (small-first) plan must compute exactly the
    // written-order answer
    "q_txtable_cbo_join" ->
      """SELECT n_name, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    // STRING-key storage-partitioned join (TxTable.spjStrGateQuery):
    // both sides clustered on the derived string bucket; the bucket
    // equality is implied by the custkey equality
    "q_txtable_spj_str" ->
      """SELECT o_orderkey, o_custkey, c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // STRING-RANGE static prune on the SPJ face
    // (TxTable.spjStrRangeGateQuery): the Spark side reads only the
    // 12 in-range month partitions; the oracle replays the rollup
    // over raw orders — hash equality proves the prune lost nothing
    "q_txtable_spj_str_range" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS cnt, CAST(sum(o_orderkey) AS BIGINT) AS sum_okey
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m') >= '1997-01'
        |  AND strftime(o_orderdate, '%Y-%m') < '1998-01'
        |GROUP BY 1""".stripMargin,

    // VALUE-column filter pushdown on the SPJ face
    // (TxTable.spjValueGateQuery): the price predicate rides to the
    // parquet readers as a FilterCompat predicate, the custkey
    // residue stays above the scan; the oracle replays both over raw
    // orders — hash equality proves pushdown subtracted only I/O
    "q_txtable_spj_value" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS cnt, CAST(sum(o_orderkey) AS BIGINT) AS sum_okey
        |FROM orders
        |WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        |    > 100000.0
        |  AND o_custkey % 10 = 0
        |GROUP BY 1""".stripMargin,

    // POSITIONAL-DELETE sidecars (TxTable.pdeleteGateQuery): two
    // stacked scattered deletes commit (file, position) sidecars;
    // reads anti-join them away. The oracle replays both predicates
    // as filters over raw lineitem (SQL DELETE semantics: only rows
    // where the predicate IS TRUE go)
    "q_txtable_pdelete" ->
      """SELECT l_orderkey % 10 AS bucket, count(*) AS cnt,
        |  sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE))
        |    AS sum_qty
        |FROM lineitem
        |WHERE NOT (l_partkey % 100 = 0) AND NOT (l_partkey % 100 = 7)
        |GROUP BY 1""".stripMargin,

    // SQL time travel on the catalog face
    // (TxTable.timeTravelSqlGateQuery): FOR VERSION AS OF 1 over a
    // catalog table whose v2 appended garbage; the oracle replays
    // v1's content from raw orders — hash equality proves the pinned
    // read serves exactly the old snapshot
    "q_txtable_timetravel_sql" ->
      """SELECT o_orderpriority AS prio, count(*) AS cnt,
        |  CAST(sum(o_custkey) AS BIGINT) AS sum_ckey
        |FROM orders GROUP BY 1""".stripMargin,

    // METADATA-GROUPED APPROX COUNT(DISTINCT)
    // (TxTable.groupedNdvGateQuery): the Spark side answers
    // approx_count_distinct per partition from merged per-dir HLL
    // register blobs with zero data I/O, then checks each estimate
    // against the exact count within 5%; the oracle replays the
    // exact counts and the always-true tolerance flag
    "q_txtable_grouped_ndv" ->
      """SELECT o_orderpriority AS prio,
        |  count(DISTINCT o_custkey) AS exact_cnt,
        |  CAST(1 AS BOOLEAN) AS ok
        |FROM orders GROUP BY 1""".stripMargin,

    // manifest-include metadata packing (TxTable.manifestGateQuery):
    // striped appends under a tiny rollover, a bounded delete of the
    // first stripe, then a read through the manifest expansion — the
    // oracle is the table minus the deleted stripe
    "q_txtable_manifest" ->
      """SELECT l_orderkey, l_linenumber,
        |  cast(cast(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_orderkey > (SELECT max(l_orderkey) // 8 FROM lineitem)""".stripMargin,

    // string-stats dir skipping (TxTable.stringPruneGateQuery): the
    // engine reads a priority band through per-dir string min/max;
    // the oracle is the plain filter — equality proves pruning
    // skipped dirs, never rows
    "q_txtable_string_prune" ->
      """SELECT o_orderkey, o_orderpriority AS prio
        |FROM orders
        |WHERE o_orderpriority >= '1-URGENT'
        |  AND o_orderpriority <= '2-HIGH'""".stripMargin,

    // the rename/drop evolution replay (TxTable.renameGateQuery):
    // latest = all orders under the renamed column, left-joined with
    // the even-key half (v1's content) under its historical name
    "q_txtable_rename" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT b.k, b.cents AS amount, h.cents AS v_old
        |FROM base b
        |LEFT JOIN (SELECT k, cents FROM base WHERE k % 2 = 0) h
        |  ON b.k = h.k""".stripMargin,

    // the FINAL document set after the deterministic 3-batch I/U/D
    // history InvertedIndex.gateQuery replays (batch 2 deletes even
    // doc_id%5=0 docs and appends a marker token to odd ones) — the
    // oracle rebuilds from scratch what the engine maintained
    // incrementally
    // conjunctive retrieval over the maintained index: docs holding
    // BOTH of the two highest-tf terms of the final document set
    // (tf desc, word asc — the engine derives the same pair from the
    // index summary)
    "q_inverted_index_lookup" ->
      s"""WITH final_docs AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 <> 2 AND doc_id % 5 = 0 AND doc_id % 2 = 1
         |         THEN text || ' zzupdated' ELSE text END AS text
         |  FROM documents
         |  WHERE NOT (doc_id % 3 <> 2 AND doc_id % 5 = 0 AND doc_id % 2 = 0)),
         |toks AS (
         |  SELECT doc_id, unnest(string_split($norm, ' ')) AS word
         |  FROM final_docs),
         |toks2 AS (SELECT doc_id, word FROM toks WHERE word <> ''),
         |top2 AS (
         |  SELECT word FROM toks2 GROUP BY word
         |  ORDER BY count(*) DESC, word LIMIT 2)
         |SELECT doc_id FROM toks2
         |WHERE word IN (SELECT word FROM top2)
         |GROUP BY doc_id
         |HAVING count(DISTINCT word) = (SELECT count(*) FROM top2)""".stripMargin,

    "q_inverted_index_incremental" ->
      s"""WITH final_docs AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 <> 2 AND doc_id % 5 = 0 AND doc_id % 2 = 1
         |         THEN text || ' zzupdated' ELSE text END AS text
         |  FROM documents
         |  WHERE NOT (doc_id % 3 <> 2 AND doc_id % 5 = 0 AND doc_id % 2 = 0))
         |SELECT word, count(DISTINCT doc_id) AS ndocs, count(*) AS tf,
         |  min(doc_id) AS first_doc
         |FROM (SELECT doc_id, unnest(string_split($norm, ' ')) AS word
         |      FROM final_docs) t
         |WHERE word <> '' GROUP BY word""".stripMargin,

    "q_inverted_index" ->
      s"""SELECT word, count(DISTINCT doc_id) AS ndocs, count(*) AS tf, min(doc_id) AS first_doc
         |FROM (SELECT doc_id, unnest(string_split($norm, ' ')) AS word FROM documents) t
         |WHERE word <> '' GROUP BY word""".stripMargin,

    "q_text_langid" ->
      s"""WITH t AS (SELECT doc_id, string_split($norm, ' ') toks FROM documents),
         |h AS (SELECT doc_id,
         |  len(list_filter(toks, t -> t IN ($enStop))) en_hits,
         |  len(list_filter(toks, t -> t IN ('le', 'la', 'de', 'et', 'un', 'les', 'des'))) fr_hits,
         |  len(list_filter(toks, t -> t IN ('el', 'la', 'de', 'y', 'un', 'los', 'en'))) es_hits,
         |  len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und', 'ein', 'von', 'zu'))) de_hits
         |FROM t)
         |SELECT doc_id, en_hits, fr_hits, es_hits, de_hits,
         |  CASE WHEN en_hits >= fr_hits AND en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
         |       WHEN fr_hits >= es_hits AND fr_hits >= de_hits THEN 'fr'
         |       WHEN es_hits >= de_hits THEN 'es' ELSE 'de' END AS pred_lang
         |FROM h""".stripMargin,

    "q_text_quality" ->
      s"""WITH b AS (SELECT doc_id, text, $norm nrm FROM documents),
         |c AS (SELECT doc_id, text, nrm,
         |  len(list_filter(string_split(nrm, ' '), x -> x <> '')) n_tokens,
         |  len(list_filter(string_split(nrm, ' '), x -> x IN ($enStop))) en_hits FROM b),
         |d AS (SELECT *, greatest(n_tokens, 1) nt1 FROM c)
         |SELECT doc_id, n_tokens,
         |  cast(length(nrm) - (n_tokens - 1) AS DOUBLE) / nt1 AS avg_tok_len,
         |  cast(en_hits AS DOUBLE) / nt1 AS stop_ratio,
         |  cast(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) AS digit_ratio,
         |  cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) AS punct_ratio,
         |  cast(en_hits AS DOUBLE) / nt1 * 0.5 + least(cast(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5 AS score
         |FROM d""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens
        |FROM documents""".stripMargin,

    "q_text_fingerprint" ->
      s"""WITH nt AS (SELECT doc_id, $norm t FROM documents),
         |pos AS (SELECT doc_id, t, unnest(generate_series(1, greatest(length(t) - 9, 1))) i FROM nt),
         |kg AS (SELECT doc_id, i, md5(substring(t, i, 10)) h FROM pos),
         |mw AS (SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) minh FROM kg)
         |SELECT doc_id, count(DISTINCT minh) AS n_fp, min(minh) AS fp_min FROM mw GROUP BY doc_id""".stripMargin,

    "q_text_redact" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+')) AS n_emails,
        |  len(regexp_extract_all(text, '[0-9]{7,}')) AS n_longnums,
        |  len(regexp_extract_all(text, 'https?://[^ ]+')) AS n_urls,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
        |    'https?://[^ ]+', '<URL>', 'g'),
        |    '[0-9]{7,}', '<NUM>', 'g') AS clean
        |FROM documents""".stripMargin,

    "q_text_chunks" ->
      s"""WITH nt AS (SELECT doc_id, list_filter(string_split($norm, ' '), x -> x <> '') tk FROM documents),
         |nz AS (SELECT doc_id, tk FROM nt WHERE len(tk) > 0),
         |wi AS (SELECT doc_id, tk,
         |    unnest(generate_series(0, cast(greatest(ceil((len(tk) - 64) / 48.0), 0) AS INTEGER))) w
         |  FROM nz)
         |SELECT doc_id, cast(w AS INTEGER) AS chunk_no,
         |  cast(len(tk[w * 48 + 1 : w * 48 + 64]) AS INTEGER) AS n_tokens,
         |  substring(md5(array_to_string(tk[w * 48 + 1 : w * 48 + 64], ' ')), 1, 16) AS chunk_sig
         |FROM wi""".stripMargin,

    "q_text_repetition" ->
      s"""WITH nt AS (SELECT doc_id, string_split($norm, ' ') tk FROM documents),
         |ix AS (SELECT doc_id, tk, unnest(generate_series(1, greatest(len(tk) - 2, 1))) i FROM nt),
         |gr AS (SELECT doc_id, concat_ws(' ', tk[i], tk[i+1], tk[i+2]) g FROM ix),
         |c AS (SELECT doc_id, g, count(*) c FROM gr GROUP BY 1, 2),
         |a AS (SELECT doc_id, max(c) top_cnt, cast(sum(c) AS BIGINT) n_grams FROM c GROUP BY 1)
         |SELECT doc_id, top_cnt, n_grams,
         |  cast(top_cnt * 1000000 // n_grams AS BIGINT) AS rep_ppm
         |FROM a""".stripMargin,

    // BM25: the libm-dependent ln() score orders but is never emitted —
    // the hashed columns are the rank plus exact integers (tf_sum,
    // n_terms, dl). Exact ties resolve via doc_id identically in both
    // engines; distinct scores within ln's few-ulp cross-libm slack
    // could in principle flip, a vanishingly-rare residual accepted
    // for a hash-checkable BM25 (see TextOps.bm25).
    "q_bm25" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split($norm, ' ')) word FROM documents),
         |tk AS (SELECT doc_id, word FROM t WHERE word <> ''),
         |dl AS (SELECT doc_id, count(*) dl FROM tk GROUP BY 1),
         |st AS (SELECT avg(cast(dl AS DOUBLE)) avgdl FROM dl),
         |nd AS (SELECT count(*) n_docs FROM documents),
         |tf AS (SELECT doc_id, word, count(*) tf FROM tk
         |       WHERE word IN ('spark', 'data', 'system') GROUP BY 1, 2),
         |df AS (SELECT word, count(DISTINCT doc_id) df FROM tf GROUP BY 1),
         |sc AS (SELECT t.doc_id,
         |    sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         |        * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))) score,
         |    cast(sum(tf) AS BIGINT) tf_sum, count(*) n_terms, max(dl.dl) dl
         |  FROM tf t JOIN df USING (word) JOIN dl ON t.doc_id = dl.doc_id, st, nd
         |  GROUP BY t.doc_id)
         |SELECT rk, doc_id, tf_sum, n_terms, dl FROM (
         |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) rk FROM sc) z
         |WHERE rk <= 20""".stripMargin,

    // bigram rarity: per-occurrence 10^6 // corpus_count, summed and
    // averaged per doc — all exact integers
    "q_text_bigram_rarity" ->
      s"""WITH nt AS (SELECT doc_id, string_split($norm, ' ') tk FROM documents),
         |ix AS (SELECT doc_id, tk, unnest(generate_series(1, greatest(len(tk) - 1, 1))) i FROM nt),
         |gr AS (SELECT doc_id, concat_ws(' ', tk[i], tk[i+1]) g FROM ix),
         |c AS (SELECT g, count(*) c FROM gr GROUP BY 1),
         |j AS (SELECT doc_id, 1000000 // c.c r FROM gr JOIN c USING (g)),
         |a AS (SELECT doc_id, count(*) n_bigrams, cast(sum(r) AS BIGINT) rarity_sum FROM j GROUP BY 1)
         |SELECT doc_id, n_bigrams, rarity_sum,
         |  cast(rarity_sum // n_bigrams AS BIGINT) AS rarity_avg
         |FROM a""".stripMargin,

    // decontamination: LEFT join of training shingles vs the distinct
    // eval-set shingles; count(hit) counts non-null = shared shingles
    "q_decontaminate" ->
      s"""WITH nt AS (SELECT doc_id, string_split($norm, ' ') tk FROM documents),
         |ix AS (SELECT doc_id, tk, unnest(generate_series(1, greatest(len(tk) - 2, 1))) i FROM nt),
         |sh AS (SELECT DISTINCT doc_id, concat_ws(' ', tk[i], tk[i+1], tk[i+2]) s FROM ix),
         |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id < 25),
         |tr AS (SELECT doc_id, sh.s, CASE WHEN ev.s IS NOT NULL THEN 1 END hit
         |       FROM sh LEFT JOIN ev ON sh.s = ev.s WHERE doc_id >= 25)
         |SELECT doc_id, cast(count(hit) AS BIGINT) AS n_shared,
         |  count(hit) > 0 AS contaminated
         |FROM tr GROUP BY 1""".stripMargin,

    // sequence packing: first-fit by doc_id, seq = tokens_before div
    // budget — the oracle's single window replays the distributed
    // range-partition + offsets prefix sum exactly
    "q_pack_sequences" ->
      s"""WITH d AS (SELECT doc_id,
         |    cast(len(list_filter(string_split($norm, ' '), x -> x <> '')) AS BIGINT) n
         |  FROM documents),
         |c AS (SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id) cum FROM d)
         |SELECT cast((cum - n) // 2048 AS BIGINT) AS seq_id, count(*) AS n_docs,
         |  cast(sum(n) AS BIGINT) AS seq_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1""".stripMargin,

    "q_tfidf" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split($norm, ' ')) word FROM documents),
         |tf AS (SELECT doc_id, word, count(*) tf FROM t WHERE word <> '' GROUP BY 1, 2),
         |df AS (SELECT word, count(*) df FROM tf GROUP BY 1),
         |s AS (SELECT doc_id, word, tf * 1000000 // df score FROM tf JOIN df USING (word))
         |SELECT doc_id, rk, word, score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) rk FROM s) z
         |WHERE rk <= 3""".stripMargin,

    // signed feature hashing: slot = uint32(md5(tok)) mod 1024, sign
    // from the next hash bit; exact integer weights, cancelled slots drop
    "q_feature_hash" -> {
      val h = Portable.uint32Sql("md5(tok)")
      s"""WITH t AS (SELECT doc_id, unnest(string_split($norm, ' ')) tok FROM documents),
         |f AS (SELECT doc_id, ($h) % 1024 AS slot,
         |    CASE WHEN (($h) // 1024) % 2 = 0 THEN 1 ELSE -1 END sgn
         |  FROM t WHERE tok <> '')
         |SELECT doc_id, slot, cast(sum(sgn) AS BIGINT) AS w
         |FROM f GROUP BY 1, 2 HAVING sum(sgn) <> 0""".stripMargin
    },
  )

  /** Shared CTE prefix: distinct 3-word shingles per doc. */
  private val shingleCte =
    s"""WITH nt AS (SELECT doc_id, string_split($norm, ' ') tk FROM documents),
       |ix AS (SELECT doc_id, tk, unnest(generate_series(1, greatest(len(tk) - 2, 1))) i FROM nt),
       |sh AS (SELECT DISTINCT doc_id, concat_ws(' ', tk[i], tk[i+1], tk[i+2]) s FROM ix)""".stripMargin

  private val minhashCte =
    s"""$shingleCte,
       |ks AS (SELECT doc_id, s, unnest(generate_series(0, 11)) k FROM sh),
       |mh AS (SELECT doc_id, k, min(md5(k || ':' || s)) mh FROM ks GROUP BY 1, 2),
       |band AS (SELECT doc_id, k // 3 band, md5(string_agg(mh, '' ORDER BY k)) sig FROM mh GROUP BY 1, 2)""".stripMargin

  /** Stage a replay: mark the named CTEs MATERIALIZED so DuckDB
    * computes each once instead of re-inlining its whole upstream
    * chain at every reference. The deep multi-stage oracles
    * (dedup cascade, residual IVF-PQ) reference mid-stage CTEs 2-3
    * times each; default inlining re-evaluates the full prefix per
    * reference, which exhausted oracle RAM at the sf1 rung. Purely a
    * replay-plan hint — results are identical. */
  private def materialize(sql: String, ctes: String*): String =
    ctes.foldLeft(sql) { (s, c) =>
      s.replaceAll(s"\\b$c AS \\(", s"$c AS MATERIALIZED (")
    }

  private def simhashBitsSql(divOp: (Int) => String): String =
    (0 until 32).map { j =>
      val p = j / 4 + 1
      val dv = 1 << (j % 4)
      s"CASE WHEN sum((((instr('0123456789abcdef', substring(md5(tok), $p, 1)) - 1) ${divOp(dv)}) % 2) * 2 - 1) >= 0 THEN '1' ELSE '0' END"
    }.mkString(", ")

  private lazy val simhashFpSql =
    s"""SELECT doc_id, concat(${simhashBitsSql(dv => s"// $dv")}) AS fp
       |FROM (SELECT doc_id, unnest(string_split($norm, ' ')) tok FROM documents) t
       |WHERE tok <> '' GROUP BY doc_id""".stripMargin

  /** Transitive-closure components over the minhash-band candidate
    * pairs — shared by the label-propagation and star-alternation
    * variants, which compute the identical relation. */
  private lazy val clusterRootsCte =
    s"""${minhashCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |pairs AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
       |  FROM band a JOIN band b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |e AS (SELECT doc_a a, doc_b b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
       |r AS (SELECT a, b FROM e UNION SELECT r.a, e2.b FROM r JOIN e e2 ON r.b = e2.a),
       |roots AS (SELECT a AS doc_id, least(a, min(b)) AS cluster FROM r GROUP BY a)""".stripMargin

  private lazy val clustersSql =
    s"""$clusterRootsCte
       |SELECT doc_id, cluster, doc_id = cluster AS keep FROM roots""".stripMargin

  val dedup: Map[String, String] = Map(
    "q_dedup_exact" ->
      "SELECT md5(text) AS h, count(*) AS n_copies, min(doc_id) AS keep_id FROM documents GROUP BY 1",

    // incremental ingest dedup: novel batch content = batch-unique
    // hashes with no exact match in the corpus (bloom prefilter on the
    // Spark side is result-transparent, so the oracle is a plain anti)
    "q_dedup_incremental" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
        |corpus AS (SELECT h FROM d WHERE doc_id % 10 <> 0),
        |batch AS (SELECT h, min(doc_id) AS doc_id FROM d
        |          WHERE doc_id % 10 = 0 GROUP BY h)
        |SELECT doc_id, h FROM batch
        |WHERE h NOT IN (SELECT h FROM corpus)""".stripMargin,

    "q_dedup_minhash" ->
      s"$minhashCte\nSELECT doc_id, band, sig FROM band",

    // replays incrementalNear: batch docs (doc_id % 10 = 0) sharing NO
    // band bucket with the corpus — novel means EVERY band misses, so
    // the hit set is computed per doc (EXCEPT), not per band row
    "q_dedup_incremental_near" ->
      s"""$minhashCte,
         |cb AS (SELECT DISTINCT band, sig FROM band WHERE doc_id % 10 <> 0),
         |bb AS (SELECT doc_id, band, sig FROM band WHERE doc_id % 10 = 0)
         |SELECT DISTINCT doc_id FROM bb
         |EXCEPT
         |SELECT DISTINCT b.doc_id FROM bb b
         |JOIN cb ON cb.band = b.band AND cb.sig = b.sig""".stripMargin,

    // the persisted-band-index ingest path must compute the identical
    // novelty set as the recompute path
    "q_dedup_incremental_indexed" ->
      s"""$minhashCte,
         |cb AS (SELECT DISTINCT band, sig FROM band WHERE doc_id % 10 <> 0),
         |bb AS (SELECT doc_id, band, sig FROM band WHERE doc_id % 10 = 0)
         |SELECT DISTINCT doc_id FROM bb
         |EXCEPT
         |SELECT DISTINCT b.doc_id FROM bb b
         |JOIN cb ON cb.band = b.band AND cb.sig = b.sig""".stripMargin,

    // the staged cascade: each stage sees only the previous stage's
    // survivors, so every doc is charged to the cheapest catching stage
    "q_dedup_cascade" -> materialize(
      s"""$minhashCte,
         |hx AS (SELECT doc_id, md5(text) h FROM documents),
         |km AS (SELECT h, min(doc_id) keep_id FROM hx GROUP BY h),
         |exd AS (SELECT doc_id FROM hx JOIN km USING (h) WHERE doc_id > keep_id),
         |s1 AS (SELECT doc_id FROM hx JOIN km USING (h) WHERE doc_id = keep_id),
         |b1 AS (SELECT b.doc_id, b.band, b.sig FROM band b JOIN s1 USING (doc_id)),
         |nr AS (SELECT DISTINCT a.doc_id FROM b1 a JOIN b1 b
         |  ON a.band = b.band AND a.sig = b.sig AND b.doc_id < a.doc_id),
         |s2 AS (SELECT doc_id FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM nr)),
         |qv AS (SELECT vec_id, label,
         |  list_transform(embedding, x -> cast(round(cast(x AS DOUBLE) * 1000, 0) AS BIGINT)) q
         |  FROM embeddings JOIN s2 ON vec_id = doc_id),
         |nv AS (SELECT vec_id, label, q,
         |  list_dot_product(list_transform(q, x -> cast(x AS DOUBLE)),
         |                   list_transform(q, x -> cast(x AS DOUBLE))) n2 FROM qv),
         |sem AS (SELECT DISTINCT a.vec_id AS doc_id FROM nv a JOIN nv b
         |  ON a.label = b.label AND b.vec_id < a.vec_id
         |  WHERE list_dot_product(list_transform(a.q, x -> cast(x AS DOUBLE)),
         |          list_transform(b.q, x -> cast(x AS DOUBLE)))
         |        / (sqrt(a.n2) * sqrt(b.n2)) >= 0.35)
         |SELECT doc_id, 'exact' AS stage FROM exd
         |UNION ALL SELECT doc_id, 'near' FROM nr
         |UNION ALL SELECT doc_id, 'semantic' FROM sem
         |UNION ALL SELECT doc_id, 'keep' FROM s2
         |  WHERE doc_id NOT IN (SELECT doc_id FROM sem)""".stripMargin,
      "band", "hx", "km", "s1", "b1", "nr", "s2", "nv", "sem"),

    "q_dedup_minhash_pairs" ->
      s"""$minhashCte
         |SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
         |FROM band a JOIN band b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""".stripMargin,

    "q_dedup_simhash" -> simhashFpSql,

    "q_dedup_simhash_pairs" -> {
      val valExpr = (0 until 32).map(j =>
        s"(CASE WHEN substring(fp, ${j + 1}, 1) = '1' THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
        .mkString(" + ")
      s"""WITH sh AS ($simhashFpSql),
         |v AS (SELECT doc_id, $valExpr AS v FROM sh),
         |bl AS (SELECT doc_id, v, unnest(generate_series(0, 3)) k FROM v),
         |b2 AS (SELECT doc_id, v, k, (v >> (k * 8)) % 256 blk FROM bl),
         |cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b, a.v va, b.v vb
         |  FROM b2 a JOIN b2 b ON a.k = b.k AND a.blk = b.blk AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, cast(bit_count(xor(va, vb)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(va, vb)) <= 3""".stripMargin
    },

    "q_dedup_clusters" -> clustersSql,

    // cluster-canonical selection: per near-dup cluster keep the
    // best member by the exact integer quality surrogate
    // stopword_hits*10^6 + n_tokens (doc_id tie-break)
    "q_dedup_canonical" ->
      s"""$clusterRootsCte,
         |qual AS (SELECT doc_id,
         |    cast(len(list_filter(tk0, t -> t IN ($enStop))) AS BIGINT) * 1000000
         |      + len(tk0) q
         |  FROM (SELECT doc_id, string_split($norm, ' ') tk0 FROM documents) z),
         |j AS (SELECT roots.doc_id, roots.cluster, qual.q
         |      FROM roots JOIN qual ON qual.doc_id = roots.doc_id),
         |canon AS (SELECT cluster, doc_id canonical_id FROM (
         |    SELECT cluster, doc_id,
         |      row_number() OVER (PARTITION BY cluster ORDER BY q DESC, doc_id) rn
         |    FROM j) zz WHERE rn = 1)
         |SELECT j.doc_id, j.cluster, canon.canonical_id,
         |  j.doc_id = canon.canonical_id AS keep
         |FROM j JOIN canon ON canon.cluster = j.cluster""".stripMargin,

    // the star-alternation variant computes the identical relation, so
    // it is checked against the identical transitive-closure oracle
    "q_dedup_clusters_star" -> clustersSql,

    "q_dedup_containment" ->
      s"""$shingleCte,
         |dfq AS (SELECT s FROM (SELECT s, count(DISTINCT doc_id) c FROM sh GROUP BY 1) t WHERE c <= 20),
         |sh2 AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfq USING (s)),
         |sz AS (SELECT doc_id, count(*) n FROM sh2 GROUP BY 1),
         |inter AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) i
         |          FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |sc AS (SELECT doc_a, doc_b, cast(i * 1000000 // least(x.n, y.n) AS BIGINT) cont_ppm
         |       FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id)
         |SELECT rk, doc_a, doc_b, cont_ppm FROM (
         |  SELECT *, row_number() OVER (ORDER BY cont_ppm DESC, doc_a, doc_b) rk FROM sc) t
         |WHERE rk <= 50""".stripMargin,

    "q_dedup_jaccard" ->
      s"""$shingleCte,
         |dfq AS (SELECT s FROM (SELECT s, count(DISTINCT doc_id) c FROM sh GROUP BY 1) t WHERE c <= 20),
         |sh2 AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfq USING (s)),
         |sz AS (SELECT doc_id, count(*) n FROM sh2 GROUP BY 1),
         |inter AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) i
         |          FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |sc AS (SELECT doc_a, doc_b, cast(i AS DOUBLE) / (x.n + y.n - i) jac
         |       FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id)
         |SELECT rk, doc_a, doc_b, jac FROM (
         |  SELECT *, row_number() OVER (ORDER BY jac DESC, doc_a, doc_b) rk FROM sc) t
         |WHERE rk <= 50""".stripMargin,
  )

  /** Shared CTE: quantized embeddings (exact integer components). */
  private val quantCte =
    """WITH q AS (SELECT vec_id, label,
      |  list_transform(embedding, x -> cast(round(cast(x AS DOUBLE) * 1000, 0) AS BIGINT)) q
      |FROM embeddings),
      |n AS (SELECT vec_id, label, q,
      |  list_dot_product(list_transform(q, x -> cast(x AS DOUBLE)), list_transform(q, x -> cast(x AS DOUBLE))) n2
      |FROM q)""".stripMargin

  private val dotSql =
    "list_dot_product(list_transform(a.q, x -> cast(x AS DOUBLE)), list_transform(b.q, x -> cast(x AS DOUBLE)))"

  val similarity: Map[String, String] = Map(
    "q_dedup_embedding" ->
      s"""$quantCte,
         |p AS (SELECT a.vec_id vec_a, b.vec_id vec_b, $dotSql dot, a.n2 n2a, b.n2 n2b
         |      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT rk, vec_a, vec_b, cos FROM (
         |  SELECT vec_a, vec_b, dot / (sqrt(n2a) * sqrt(n2b)) cos,
         |    row_number() OVER (ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, vec_a, vec_b) rk
         |  FROM p) t WHERE rk <= 100""".stripMargin,

    "q_ann_bruteforce" ->
      s"""$quantCte,
         |p AS (SELECT a.vec_id probe_id, b.vec_id nbr_id, $dotSql dot, a.n2 n2a, b.n2 n2b
         |      FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id)
         |SELECT probe_id, rk, nbr_id, cos FROM (
         |  SELECT probe_id, nbr_id, dot / (sqrt(n2a) * sqrt(n2b)) cos,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) rk
         |  FROM p) t WHERE rk <= 5""".stripMargin,

    // int8 symmetric quantization: per-vector scale max|x|/127 cancels
    // in cosine, so ranking is pure integer dots over the 1-byte codes
    "q_ann_int8" ->
      """WITH mx AS (SELECT vec_id,
        |  list_max(list_transform(embedding, x -> abs(cast(x AS DOUBLE)))) mx,
        |  embedding FROM embeddings),
        |c AS (SELECT vec_id,
        |  list_transform(embedding, x -> CASE WHEN mx = 0 THEN 0
        |    ELSE cast(round(cast(x AS DOUBLE) * 127.0 / mx, 0) AS BIGINT) END) q
        |  FROM mx),
        |n AS (SELECT vec_id, q,
        |  list_dot_product(list_transform(q, x -> cast(x AS DOUBLE)),
        |                   list_transform(q, x -> cast(x AS DOUBLE))) n2 FROM c),
        |p AS (SELECT a.vec_id probe_id, b.vec_id nbr_id,
        |      list_dot_product(list_transform(a.q, x -> cast(x AS DOUBLE)),
        |                       list_transform(b.q, x -> cast(x AS DOUBLE))) dot,
        |      a.n2 n2a, b.n2 n2b
        |      FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id)
        |SELECT probe_id, rk, nbr_id, cos FROM (
        |  SELECT probe_id, nbr_id, dot / (sqrt(n2a) * sqrt(n2b)) cos,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) rk
        |  FROM p) t WHERE rk <= 5""".stripMargin,

    // KNN majority-vote classification over the replayed int8 codes:
    // top-5 by int8 cosine (nbr_id tie-break), modal neighbor label
    // (votes desc, label asc) — all-integer vote, engine-exact
    "q_knn_classify" ->
      """WITH mx AS (SELECT vec_id, label,
        |  list_max(list_transform(embedding, x -> abs(cast(x AS DOUBLE)))) mx,
        |  embedding FROM embeddings),
        |c AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CASE WHEN mx = 0 THEN 0
        |    ELSE cast(round(cast(x AS DOUBLE) * 127.0 / mx, 0) AS BIGINT) END) q
        |  FROM mx),
        |n AS (SELECT vec_id, label, q,
        |  list_dot_product(list_transform(q, x -> cast(x AS DOUBLE)),
        |                   list_transform(q, x -> cast(x AS DOUBLE))) n2 FROM c),
        |p AS (SELECT a.vec_id probe_id, a.label AS label, b.vec_id nbr_id,
        |      b.label nbr_label,
        |      list_dot_product(list_transform(a.q, x -> cast(x AS DOUBLE)),
        |                       list_transform(b.q, x -> cast(x AS DOUBLE))) dot,
        |      a.n2 n2a, b.n2 n2b
        |      FROM n a JOIN n b ON a.vec_id < 25 AND b.vec_id <> a.vec_id),
        |tk AS (SELECT probe_id, label, nbr_label FROM (
        |  SELECT probe_id, label, nbr_label,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) rk
        |  FROM p) t WHERE rk <= 5),
        |v AS (SELECT probe_id, label, nbr_label, count(*) votes
        |      FROM tk GROUP BY 1, 2, 3)
        |SELECT probe_id AS vec_id, cast(label AS BIGINT) AS label,
        |  cast(nbr_label AS BIGINT) AS pred_label,
        |  cast(votes AS BIGINT) votes, nbr_label = label AS correct
        |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
        |        ORDER BY votes DESC, nbr_label) vr FROM v) z
        |WHERE vr = 1""".stripMargin,

    // SemDeDup: cluster-blocked semantic dedup — cell assignment is
    // the replayed IVF argmax, the verdict an earlier-similar count
    "q_semdedup" ->
      s"""$quantCte,
         |cent AS (SELECT vec_id cid, q qc, n2 n2c FROM n WHERE vec_id < 16),
         |ar AS (SELECT n.vec_id, cent.cid,
         |    list_dot_product(list_transform(n.q, x -> cast(x AS DOUBLE)), list_transform(cent.qc, x -> cast(x AS DOUBLE)))
         |      / (sqrt(n.n2) * sqrt(cent.n2c)) ccos
         |  FROM n CROSS JOIN cent),
         |rk AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) crn FROM ar),
         |assign AS (SELECT vec_id, cid cell FROM rk WHERE crn = 1),
         |sp AS (SELECT la.vec_id, cast(count(*) AS BIGINT) n_prev_sim
         |  FROM assign la JOIN assign ea ON ea.cell = la.cell AND ea.vec_id < la.vec_id
         |  JOIN n a ON a.vec_id = la.vec_id JOIN n b ON b.vec_id = ea.vec_id
         |  WHERE $dotSql / (sqrt(a.n2) * sqrt(b.n2)) > 0.35
         |  GROUP BY 1)
         |SELECT a.vec_id, a.cell,
         |  coalesce(sp.n_prev_sim, 0) n_prev_sim,
         |  coalesce(sp.n_prev_sim, 0) > 0 is_dup
         |FROM assign a LEFT JOIN sp ON sp.vec_id = a.vec_id""".stripMargin,

    // binary (sign-bit) quantization: hamming distance = number of
    // dimensions whose signs differ — the oracle counts it
    // semantically (list compare) while the engine computes the same
    // number via packed XOR+popcount, proving the bit kernel right
    "q_ann_binary" ->
      s"""$quantCte,
         |hm AS (SELECT a.vec_id probe_id, b.vec_id nbr_id,
         |       len(list_filter(list_zip(a.q, b.q), p -> (p[1] > 0) <> (p[2] > 0))) ham
         |       FROM q a JOIN q b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         |cand AS (SELECT probe_id, nbr_id, ham FROM (
         |  SELECT probe_id, nbr_id, ham,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY ham, nbr_id) cr
         |  FROM hm) z WHERE cr <= 50),
         |sc AS (SELECT c.probe_id, c.nbr_id, c.ham, $dotSql dot, a.n2 n2a, b.n2 n2b
         |       FROM cand c JOIN n a ON a.vec_id = c.probe_id JOIN n b ON b.vec_id = c.nbr_id)
         |SELECT probe_id, rk, nbr_id, ham, cos FROM (
         |  SELECT probe_id, nbr_id, ham, dot / (sqrt(n2a) * sqrt(n2b)) cos,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) rk
         |  FROM sc) t WHERE rk <= 5""".stripMargin,

    "q_ann_lsh" ->
      s"""$quantCte,
         |ex AS (SELECT vec_id, unnest(q) e, generate_subscripts(q, 1) i FROM q),
         |sg AS (SELECT vec_id, p, sum(CASE WHEN (instr('0123456789abcdef', substring(md5(p || '_' || i), 1, 1)) - 1) % 2 = 0 THEN e ELSE -e END) d
         |       FROM ex, (SELECT unnest(generate_series(0, 7)) p) ps GROUP BY 1, 2),
         |bk AS (SELECT vec_id, string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) bucket FROM sg GROUP BY 1),
         |cand AS (SELECT pb.vec_id probe_id, cb.vec_id nbr_id
         |         FROM bk pb JOIN bk cb ON pb.bucket = cb.bucket AND pb.vec_id < 5 AND cb.vec_id <> pb.vec_id),
         |sc AS (SELECT c.probe_id, c.nbr_id, $dotSql dot, a.n2 n2a, b.n2 n2b
         |       FROM cand c JOIN n a ON a.vec_id = c.probe_id JOIN n b ON b.vec_id = c.nbr_id)
         |SELECT probe_id, rk, nbr_id, cos FROM (
         |  SELECT probe_id, nbr_id, dot / (sqrt(n2a) * sqrt(n2b)) cos,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) rk
         |  FROM sc) t WHERE rk <= 3""".stripMargin,
  )

  /** Multi-probe: probe buckets = exact + 8 single-bit flips; the
    * corpus keeps one bucket per vector so candidates stay unique. */
  val annMultiProbe: Map[String, String] = Map(
    "q_ann_multiprobe" ->
      s"""$quantCte,
         |ex AS (SELECT vec_id, unnest(q) e, generate_subscripts(q, 1) i FROM q),
         |sg AS (SELECT vec_id, p, sum(CASE WHEN (instr('0123456789abcdef', substring(md5(p || '_' || i), 1, 1)) - 1) % 2 = 0 THEN e ELSE -e END) d
         |       FROM ex, (SELECT unnest(generate_series(0, 7)) p) ps GROUP BY 1, 2),
         |bk AS (SELECT vec_id, string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) bucket FROM sg GROUP BY 1),
         |pbk AS (SELECT vec_id, bucket FROM bk WHERE vec_id < 5
         |        UNION ALL
         |        SELECT vec_id, substring(bucket, 1, i - 1)
         |          || CASE WHEN substring(bucket, i, 1) = '1' THEN '0' ELSE '1' END
         |          || substring(bucket, i + 1)
         |        FROM bk, (SELECT unnest(generate_series(1, 8)) i) fs
         |        WHERE vec_id < 5),
         |cand AS (SELECT pb.vec_id probe_id, cb.vec_id nbr_id
         |         FROM pbk pb JOIN bk cb ON pb.bucket = cb.bucket AND cb.vec_id <> pb.vec_id),
         |sc AS (SELECT c.probe_id, c.nbr_id, $dotSql dot, a.n2 n2a, b.n2 n2b
         |       FROM cand c JOIN n a ON a.vec_id = c.probe_id JOIN n b ON b.vec_id = c.nbr_id)
         |SELECT probe_id, rk, nbr_id, cos FROM (
         |  SELECT probe_id, nbr_id, dot / (sqrt(n2a) * sqrt(n2b)) cos,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) rk
         |  FROM sc) t WHERE rk <= 3""".stripMargin,
  )

  /** The custom-physical-operator path computes the same relation as
    * q_ann_lsh, so it is checked against the identical oracle. */
  val similarityNative: Map[String, String] = Map(
    "q_ann_lsh_native" -> similarity("q_ann_lsh"),

    // recall@3 of LSH vs brute force: both sides replayed from the
    // same verified CTE fragments, joined per probe
    "q_ann_recall" ->
      s"""$quantCte,
         |bp AS (SELECT a.vec_id probe_id, b.vec_id nbr_id, $dotSql dot, a.n2 n2a, b.n2 n2b
         |       FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         |brute AS (SELECT probe_id, nbr_id FROM (
         |  SELECT probe_id, nbr_id,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) rk
         |  FROM bp) t WHERE rk <= 3),
         |ex AS (SELECT vec_id, unnest(q) e, generate_subscripts(q, 1) i FROM q),
         |sg AS (SELECT vec_id, p, sum(CASE WHEN (instr('0123456789abcdef', substring(md5(p || '_' || i), 1, 1)) - 1) % 2 = 0 THEN e ELSE -e END) d
         |       FROM ex, (SELECT unnest(generate_series(0, 7)) p) ps GROUP BY 1, 2),
         |bk AS (SELECT vec_id, string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) bucket FROM sg GROUP BY 1),
         |cand AS (SELECT pb.vec_id probe_id, cb.vec_id nbr_id
         |         FROM bk pb JOIN bk cb ON pb.bucket = cb.bucket AND pb.vec_id < 5 AND cb.vec_id <> pb.vec_id),
         |sc AS (SELECT c.probe_id, c.nbr_id, $dotSql dot, a.n2 n2a, b.n2 n2b
         |       FROM cand c JOIN n a ON a.vec_id = c.probe_id JOIN n b ON b.vec_id = c.nbr_id),
         |lsh AS (SELECT probe_id, nbr_id FROM (
         |  SELECT probe_id, nbr_id,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) rk
         |  FROM sc) t WHERE rk <= 3)
         |SELECT b.probe_id, count(*) AS k,
         |  cast(sum(CASE WHEN l.nbr_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |  cast(sum(CASE WHEN l.nbr_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 100 // count(*) AS recall_pct
         |FROM brute b LEFT JOIN lsh l
         |  ON b.probe_id = l.probe_id AND b.nbr_id = l.nbr_id
         |GROUP BY 1""".stripMargin)

  /** KMV sketch oracle: the k-th smallest md5 hash is a data property,
    * so the estimate is reproduced exactly by a rank window; uint32 of
    * the hash prefix via portable nibble arithmetic (exact in BIGINT),
    * numerator 255*2^32 is an exact double, one IEEE division. */
  val sketches: Map[String, String] = {
    val nib = Portable.uint32Sql("kth")
    Map("q_sketch_kmv" ->
      s"""WITH d AS (SELECT DISTINCT event_type, md5(cast(user_id AS VARCHAR)) h
         |           FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) rn FROM d),
         |s AS (SELECT event_type, count(*) n, max(CASE WHEN rn = 256 THEN h END) kth FROM r GROUP BY 1)
         |SELECT event_type,
         |  CASE WHEN n < 256 THEN cast(n AS DOUBLE)
         |       ELSE (255.0 * 4294967296.0) / cast(greatest(1, $nib) AS DOUBLE) END AS est_uniq,
         |  CASE WHEN n >= 256 THEN kth END AS kth_hash
         |FROM s""".stripMargin,

      // the ApproxDistinctRewrite output: the same k-th-order-statistic
      // replay, floored to BIGINT (floor, never a double→int cast —
      // the engines' casts round differently, floor is exact)
      "q_approx_distinct" ->
        s"""WITH d AS (SELECT DISTINCT event_type, md5(cast(user_id AS VARCHAR)) h
           |           FROM events WHERE user_id IS NOT NULL),
           |r AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) rn FROM d),
           |s AS (SELECT event_type, count(*) n, max(CASE WHEN rn = 256 THEN h END) kth FROM r GROUP BY 1)
           |SELECT event_type,
           |  cast(floor(CASE WHEN n < 256 THEN cast(n AS DOUBLE)
           |       ELSE (255.0 * 4294967296.0) / cast(greatest(1, $nib) AS DOUBLE) END) AS BIGINT)
           |    AS uniq_users_est
           |FROM s""".stripMargin,

      // KMV per CUBE cell: one replay per grouping level (a row feeds
      // all four levels, so each level re-derives its own distinct
      // hash set and k-th order statistic), unioned with the same
      // ALL/-1 subtotal markers the Spark cube emits.
      "q_sketch_cube" ->
        s"""WITH d AS (SELECT DISTINCT event_type, epoch_us(ts) // 86400000000 % 7 AS dow,
           |             md5(cast(user_id AS VARCHAR)) h
           |           FROM events WHERE user_id IS NOT NULL),
           |r1 AS (SELECT event_type, dow, h, row_number() OVER (PARTITION BY event_type, dow ORDER BY h) rn FROM d),
           |s1 AS (SELECT event_type, dow, count(*) n, max(CASE WHEN rn = 256 THEN h END) kth FROM r1 GROUP BY 1, 2),
           |d2 AS (SELECT DISTINCT event_type, h FROM d),
           |r2 AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) rn FROM d2),
           |s2 AS (SELECT event_type, count(*) n, max(CASE WHEN rn = 256 THEN h END) kth FROM r2 GROUP BY 1),
           |d3 AS (SELECT DISTINCT dow, h FROM d),
           |r3 AS (SELECT dow, h, row_number() OVER (PARTITION BY dow ORDER BY h) rn FROM d3),
           |s3 AS (SELECT dow, count(*) n, max(CASE WHEN rn = 256 THEN h END) kth FROM r3 GROUP BY 1),
           |d4 AS (SELECT DISTINCT h FROM d),
           |r4 AS (SELECT h, row_number() OVER (ORDER BY h) rn FROM d4),
           |s4 AS (SELECT count(*) n, max(CASE WHEN rn = 256 THEN h END) kth FROM r4),
           |u AS (
           |  SELECT event_type AS etype, cast(dow AS BIGINT) AS dow, n, kth FROM s1
           |  UNION ALL SELECT event_type, cast(-1 AS BIGINT), n, kth FROM s2
           |  UNION ALL SELECT 'ALL', cast(dow AS BIGINT), n, kth FROM s3
           |  UNION ALL SELECT 'ALL', cast(-1 AS BIGINT), n, kth FROM s4)
           |SELECT etype, dow,
           |  CASE WHEN n < 256 THEN cast(n AS DOUBLE)
           |       ELSE (255.0 * 4294967296.0) / cast(greatest(1, $nib) AS DOUBLE) END AS est_uniq,
           |  CASE WHEN n >= 256 THEN kth END AS kth_hash
           |FROM u""".stripMargin,

      // Sketch set algebra: union/intersection estimates. The oracle
      // computes the same k-min sketches from raw data — valid because
      // KMV truncation commutes with union and membership below the
      // union's k-th hash implies membership in the side sketches.
      "q_sketch_ops" -> {
        val nibU = Portable.uint32Sql("kth_u")
        s"""WITH d AS (SELECT DISTINCT event_type, md5(cast(user_id AS VARCHAR)) h FROM events
           |           WHERE user_id IS NOT NULL AND event_type IN ('click', 'view')),
           |ka AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM d WHERE event_type = 'click') t WHERE rn <= 256),
           |kb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM d WHERE event_type = 'view') t WHERE rn <= 256),
           |u AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb) t),
           |ku AS (SELECT h, rn FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM u) t WHERE rn <= 256),
           |st AS (SELECT count(*) nu, max(CASE WHEN rn = 256 THEN h END) kth_u FROM ku),
           |ic AS (SELECT count(*) inter_cnt FROM ku
           |       WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
           |ao AS (SELECT count(*) aonly_cnt FROM ku
           |       WHERE h IN (SELECT h FROM ka) AND h NOT IN (SELECT h FROM kb)),
           |fin AS (SELECT nu, inter_cnt, aonly_cnt,
           |    CASE WHEN nu < 256 THEN cast(nu AS DOUBLE)
           |         ELSE (255.0 * 4294967296.0) / cast(greatest(1, $nibU) AS DOUBLE) END est_union
           |  FROM st, ic, ao)
           |SELECT cast(nu AS BIGINT) AS nu, cast(inter_cnt AS BIGINT) AS inter_cnt,
           |  cast(aonly_cnt AS BIGINT) AS aonly_cnt, est_union,
           |  (cast(inter_cnt AS DOUBLE) / least(256, nu)) * est_union AS est_inter,
           |  (cast(aonly_cnt AS DOUBLE) / least(256, nu)) * est_union AS est_diff
           |FROM fin""".stripMargin
      },

      // Fixed-boundary histogram quantiles: the oracle rebuilds the
      // identical integer-cent histogram with a grouped count (empty
      // buckets change nothing — the first bucket reaching rank r is
      // always non-empty) and derives the same boundary estimates.
      "q_sketch_percentiles" ->
        """WITH v AS (SELECT l_returnflag,
          |    cast(round(l_extendedprice * 100, 0) AS BIGINT) cents FROM lineitem),
          |bk AS (SELECT l_returnflag, least(greatest(cents // 262144, 0), 63) b FROM v),
          |h AS (SELECT l_returnflag, b, count(*) c FROM bk GROUP BY 1, 2),
          |cu AS (SELECT l_returnflag, b,
          |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY b) cum,
          |    sum(c) OVER (PARTITION BY l_returnflag) n FROM h)
          |SELECT l_returnflag, cast(n AS BIGINT) AS n,
          |  cast(min(CASE WHEN cum >= (n * 25 + 99) // 100 THEN (b + 1) * 262144 END) AS BIGINT) AS p25,
          |  cast(min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN (b + 1) * 262144 END) AS BIGINT) AS p50,
          |  cast(min(CASE WHEN cum >= (n * 75 + 99) // 100 THEN (b + 1) * 262144 END) AS BIGINT) AS p75,
          |  cast(min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN (b + 1) * 262144 END) AS BIGINT) AS p95
          |FROM cu GROUP BY 1, 2""".stripMargin,

      // Count-min sketch: the oracle rebuilds the identical 4×1024
      // md5-cell counter table with a grouped count and reads the same
      // probe cells; min over rows = the point estimate.
      "q_sketch_cms" -> {
        val nibH = Portable.uint32Sql("h")
        s"""WITH t AS (SELECT unnest(string_split($norm, ' ')) word FROM documents),
           |tk AS (SELECT word FROM t WHERE word <> ''),
           |rs AS (SELECT unnest(generate_series(0, 3)) r),
           |tc AS (SELECT r, md5(r || ':' || word) h FROM tk, rs),
           |cells AS (SELECT r, ($nibH) % 1024 cell, count(*) c FROM tc GROUP BY 1, 2),
           |pr AS (SELECT unnest(['the', 'data', 'spark', 'xylophone']) word),
           |ph AS (SELECT word, r, md5(r || ':' || word) h FROM pr, rs),
           |pc AS (SELECT word, r, ($nibH) % 1024 cell FROM ph),
           |est AS (SELECT word, cast(min(coalesce(c, 0)) AS BIGINT) est
           |        FROM pc LEFT JOIN cells USING (r, cell) GROUP BY 1),
           |ex AS (SELECT word, count(*) exact FROM tk
           |       WHERE word IN ('the', 'data', 'spark', 'xylophone') GROUP BY 1)
           |SELECT word, est, cast(coalesce(exact, 0) AS BIGINT) AS exact
           |FROM est LEFT JOIN ex USING (word)""".stripMargin
      })
  }

  val annIvf: Map[String, String] = Map(
    // hybrid RRF with the dense leg bounded to the IVF candidate set
    // (Similarity.hybridRetrievalIvf): candidates from the probe's 2
    // nearest cells, FULL OUTER fusion — a doc in only one leg scores
    // that leg's RRF term alone
    "q_hybrid_retrieval_ivf" ->
      s"""$quantCte,
         |toks AS (SELECT doc_id, unnest(list_distinct(
         |    list_filter(string_split(lower(text), ' '), x -> x <> ''))) word
         |  FROM documents),
         |dfreq AS (SELECT word, count(*) df FROM toks GROUP BY word),
         |wt AS (SELECT doc_id, t.word, 1000000 // df w
         |  FROM toks t JOIN dfreq USING (word)),
         |lex AS (SELECT p.doc_id probe_id, d.doc_id nbr_id,
         |    sum(p.w) lex
         |  FROM wt p JOIN wt d ON p.word = d.word
         |    AND p.doc_id < 5 AND d.doc_id <> p.doc_id
         |  GROUP BY 1, 2),
         |lr AS (SELECT probe_id, nbr_id, row_number() OVER (
         |    PARTITION BY probe_id ORDER BY lex DESC, nbr_id) lr FROM lex),
         |cent AS (SELECT vec_id cid, q qc, n2 n2c FROM n WHERE vec_id < 16),
         |ar AS (SELECT n.vec_id, cent.cid,
         |    list_dot_product(list_transform(n.q, x -> cast(x AS DOUBLE)), list_transform(cent.qc, x -> cast(x AS DOUBLE)))
         |      / (sqrt(n.n2) * sqrt(cent.n2c)) ccos
         |  FROM n CROSS JOIN cent),
         |crk AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) crn FROM ar),
         |assign AS (SELECT vec_id, cid cell FROM crk WHERE crn = 1),
         |pc AS (SELECT vec_id probe_id, cid cell FROM crk WHERE vec_id < 5 AND crn <= 2),
         |cand AS (SELECT DISTINCT pc.probe_id, a.vec_id nbr_id
         |  FROM pc JOIN assign a ON a.cell = pc.cell AND a.vec_id <> pc.probe_id),
         |dense AS (SELECT c.probe_id, c.nbr_id, $dotSql dot, a.n2 n2a, b.n2 n2b
         |  FROM cand c JOIN n a ON a.vec_id = c.probe_id JOIN n b ON b.vec_id = c.nbr_id),
         |dr AS (SELECT probe_id, nbr_id, row_number() OVER (
         |    PARTITION BY probe_id
         |    ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) dr
         |  FROM dense),
         |f AS (SELECT coalesce(dr.probe_id, lr.probe_id) probe_id,
         |    coalesce(dr.nbr_id, lr.nbr_id) nbr_id,
         |    coalesce(1000000000 // (60 + dr.dr), 0) +
         |      coalesce(1000000000 // (60 + lr.lr), 0) fused
         |  FROM dr FULL OUTER JOIN lr
         |    ON lr.probe_id = dr.probe_id AND lr.nbr_id = dr.nbr_id)
         |SELECT probe_id, rk, nbr_id, CAST(fused AS BIGINT) fused FROM (
         |  SELECT probe_id, nbr_id, fused, row_number() OVER (
         |    PARTITION BY probe_id ORDER BY fused DESC, nbr_id) rk
         |  FROM f) t WHERE rk <= 10""".stripMargin,

    "q_ann_ivf" ->
      s"""$quantCte,
         |cent AS (SELECT vec_id cid, q qc, n2 n2c FROM n WHERE vec_id < 16),
         |ar AS (SELECT n.vec_id, cent.cid,
         |    list_dot_product(list_transform(n.q, x -> cast(x AS DOUBLE)), list_transform(cent.qc, x -> cast(x AS DOUBLE)))
         |      / (sqrt(n.n2) * sqrt(cent.n2c)) ccos
         |  FROM n CROSS JOIN cent),
         |rk AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) crn FROM ar),
         |assign AS (SELECT vec_id, cid cell FROM rk WHERE crn = 1),
         |pc AS (SELECT vec_id probe_id, cid cell FROM rk WHERE vec_id < 5 AND crn <= 2),
         |cand AS (SELECT DISTINCT pc.probe_id, a.vec_id nbr_id
         |  FROM pc JOIN assign a ON a.cell = pc.cell AND a.vec_id <> pc.probe_id),
         |sc AS (SELECT c.probe_id, c.nbr_id, $dotSql dot, a.n2 n2a, b.n2 n2b
         |  FROM cand c JOIN n a ON a.vec_id = c.probe_id JOIN n b ON b.vec_id = c.nbr_id)
         |SELECT probe_id, rk, nbr_id, cos FROM (
         |  SELECT probe_id, nbr_id, dot / (sqrt(n2a) * sqrt(n2b)) cos,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) rk
         |  FROM sc) t WHERE rk <= 3""".stripMargin,
  )

  /** Filtered IVF: identical cells, the label predicate joins into
    * the candidate set BEFORE ranking (matching the engine's
    * in-index pre-filter). */
  val annFiltered: Map[String, String] = Map(
    "q_ann_filtered" ->
      s"""$quantCte,
         |cent AS (SELECT vec_id cid, q qc, n2 n2c FROM n WHERE vec_id < 16),
         |ar AS (SELECT n.vec_id, cent.cid,
         |    list_dot_product(list_transform(n.q, x -> cast(x AS DOUBLE)), list_transform(cent.qc, x -> cast(x AS DOUBLE)))
         |      / (sqrt(n.n2) * sqrt(cent.n2c)) ccos
         |  FROM n CROSS JOIN cent),
         |rk AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) crn FROM ar),
         |assign AS (SELECT vec_id, cid cell FROM rk WHERE crn = 1),
         |pc AS (SELECT vec_id probe_id, cid cell FROM rk WHERE vec_id < 5 AND crn <= 2),
         |cand AS (SELECT DISTINCT pc.probe_id, a.vec_id nbr_id
         |  FROM pc JOIN assign a ON a.cell = pc.cell AND a.vec_id <> pc.probe_id
         |  JOIN n pl ON pl.vec_id = pc.probe_id
         |  JOIN n nl ON nl.vec_id = a.vec_id AND nl.label = pl.label),
         |sc AS (SELECT c.probe_id, c.nbr_id, $dotSql dot, a.n2 n2a, b.n2 n2b
         |  FROM cand c JOIN n a ON a.vec_id = c.probe_id JOIN n b ON b.vec_id = c.nbr_id)
         |SELECT probe_id, rk, nbr_id, cos FROM (
         |  SELECT probe_id, nbr_id, dot / (sqrt(n2a) * sqrt(n2b)) cos,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) rk
         |  FROM sc) t WHERE rk <= 3""".stripMargin,
  )

  /** Hybrid retrieval: integer RRF over the lexical (10^6 div df
    * shared-word weight) and dense (int-cosine brute force) rankings
    * — both ranks replay exactly, so the fusion is hash-gated. */
  val hybridRetrieval: Map[String, String] = Map(
    "q_hybrid_retrieval" ->
      s"""$quantCte,
         |toks AS (SELECT doc_id, unnest(list_distinct(
         |    list_filter(string_split(lower(text), ' '), x -> x <> ''))) word
         |  FROM documents),
         |dfreq AS (SELECT word, count(*) df FROM toks GROUP BY word),
         |wt AS (SELECT doc_id, t.word, 1000000 // df w
         |  FROM toks t JOIN dfreq USING (word)),
         |lex AS (SELECT p.doc_id probe_id, d.doc_id nbr_id,
         |    sum(p.w) lex
         |  FROM wt p JOIN wt d ON p.word = d.word
         |    AND p.doc_id < 5 AND d.doc_id <> p.doc_id
         |  GROUP BY 1, 2),
         |lr AS (SELECT probe_id, nbr_id, row_number() OVER (
         |    PARTITION BY probe_id ORDER BY lex DESC, nbr_id) lr FROM lex),
         |dense AS (SELECT a.vec_id probe_id, b.vec_id nbr_id,
         |    $dotSql dot, a.n2 n2a, b.n2 n2b
         |  FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         |dr AS (SELECT probe_id, nbr_id, row_number() OVER (
         |    PARTITION BY probe_id
         |    ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) dr
         |  FROM dense),
         |f AS (SELECT dr.probe_id, dr.nbr_id,
         |    (1000000000 // (60 + dr.dr)) +
         |      coalesce(1000000000 // (60 + lr.lr), 0) fused
         |  FROM dr LEFT JOIN lr
         |    ON lr.probe_id = dr.probe_id AND lr.nbr_id = dr.nbr_id)
         |SELECT probe_id, rk, nbr_id, CAST(fused AS BIGINT) fused FROM (
         |  SELECT probe_id, nbr_id, fused, row_number() OVER (
         |    PARTITION BY probe_id ORDER BY fused DESC, nbr_id) rk
         |  FROM f) t WHERE rk <= 10""".stripMargin,
  )

  /** The persisted-cell-index search computes the identical relation
    * as the recompute path, so it shares q_ann_ivf's oracle. */
  lazy val annIvfIndexed: Map[String, String] =
    Map("q_ann_ivf_indexed" -> annIvf("q_ann_ivf"),
      // cell assignment depends only on the fixed centroids, so the
      // incrementally-built (two-commit) index computes the identical
      // relation as the one-shot build and the recompute
      "q_ann_ivf_incremental" -> annIvf("q_ann_ivf"))

  /** PQ sub-CTEs shared by the search and its recall measurement. */
  private val pqCte =
    s"""ss AS (SELECT unnest(generate_series(0, 3)) s),
       |sv AS (SELECT vec_id, s,
       |  q[(s * 16 + 1):(s * 16 + 16)] sv FROM q, ss),
       |svn AS (SELECT vec_id, s, sv,
       |  list_dot_product(list_transform(sv, x -> cast(x AS DOUBLE)),
       |                   list_transform(sv, x -> cast(x AS DOUBLE))) n2s
       |  FROM sv),
       |cent AS (SELECT vec_id cid, s, sv cv, n2s n2c FROM svn WHERE vec_id < 16),
       |enc AS (SELECT vec_id nbr_id, s, cid code FROM (
       |  SELECT v.vec_id, v.s, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id, v.s ORDER BY
       |      (v.n2s + c.n2c - 2 * list_dot_product(
       |        list_transform(v.sv, x -> cast(x AS DOUBLE)),
       |        list_transform(c.cv, x -> cast(x AS DOUBLE)))), c.cid) rn
       |  FROM svn v JOIN cent c ON v.s = c.s) t WHERE rn = 1),
       |tab AS (SELECT p.vec_id probe_id, p.s, c.cid,
       |    (p.n2s + c.n2c - 2 * list_dot_product(
       |      list_transform(p.sv, x -> cast(x AS DOUBLE)),
       |      list_transform(c.cv, x -> cast(x AS DOUBLE)))) pd2
       |  FROM svn p JOIN cent c ON p.s = c.s WHERE p.vec_id < 5),
       |sc AS (SELECT t.probe_id, e.nbr_id, sum(t.pd2) approx_d2
       |  FROM enc e JOIN tab t ON t.s = e.s AND t.cid = e.code
       |    AND t.probe_id <> e.nbr_id
       |  GROUP BY 1, 2),
       |pq AS (SELECT probe_id, rk, nbr_id, approx_d2 FROM (
       |  SELECT probe_id, nbr_id, cast(approx_d2 AS BIGINT) approx_d2,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY approx_d2, nbr_id) rk
       |  FROM sc) t WHERE rk <= 5)""".stripMargin

  /** Product quantization + ADC: 4 subspaces × 16 sub-centroids (the
    * first 16 vectors' subvectors); encode by exact integer argmin,
    * score candidates as the sum of 4 distance-table lookups. Every
    * distance is an exact integer over the quantized grid. */
  val annPq: Map[String, String] = Map(
    // IVF-PQ composition: coarse cells restrict candidates, ADC scores
    // them — the same cell SQL as q_ann_ivf and the same enc/tab CTEs
    // as q_ann_pq
    "q_ann_ivfpq" ->
      s"""$quantCte,
         |ccent AS (SELECT vec_id cid, q qc, n2 n2c FROM n WHERE vec_id < 16),
         |ar AS (SELECT n.vec_id, ccent.cid,
         |    list_dot_product(list_transform(n.q, x -> cast(x AS DOUBLE)), list_transform(ccent.qc, x -> cast(x AS DOUBLE)))
         |      / (sqrt(n.n2) * sqrt(ccent.n2c)) ccos
         |  FROM n CROSS JOIN ccent),
         |crk AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) crn FROM ar),
         |assign AS (SELECT vec_id, cid cell FROM crk WHERE crn = 1),
         |pcells AS (SELECT vec_id probe_id, cid cell FROM crk WHERE vec_id < 5 AND crn <= 2),
         |cand AS (SELECT DISTINCT pcells.probe_id, a.vec_id nbr_id
         |  FROM pcells JOIN assign a ON a.cell = pcells.cell
         |    AND a.vec_id <> pcells.probe_id),
         |$pqCte,
         |sc2 AS (SELECT c.probe_id, c.nbr_id, sum(t.pd2) approx_d2
         |  FROM cand c
         |  JOIN enc e ON e.nbr_id = c.nbr_id
         |  JOIN tab t ON t.probe_id = c.probe_id AND t.s = e.s AND t.cid = e.code
         |  GROUP BY 1, 2)
         |SELECT probe_id, rk, nbr_id, approx_d2 FROM (
         |  SELECT probe_id, nbr_id, cast(approx_d2 AS BIGINT) approx_d2,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY approx_d2, nbr_id) rk
         |  FROM sc2) t WHERE rk <= 5""".stripMargin,

    // residual IVF-PQ: PQ over v − centroid(cell(v)); every distance
    // decomposes to element-level integer arithmetic, so no list ops —
    // subvector d² is a GROUP BY over (i-1)//16
    "q_ann_ivfpq_res" -> materialize(
      s"""$quantCte,
         |ccent AS (SELECT vec_id cid, q qc, n2 n2c FROM n WHERE vec_id < 16),
         |ar AS (SELECT n.vec_id, ccent.cid,
         |    list_dot_product(list_transform(n.q, x -> cast(x AS DOUBLE)), list_transform(ccent.qc, x -> cast(x AS DOUBLE)))
         |      / (sqrt(n.n2) * sqrt(ccent.n2c)) ccos
         |  FROM n CROSS JOIN ccent),
         |crk AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) crn FROM ar),
         |assign AS (SELECT vec_id, cid cell FROM crk WHERE crn = 1),
         |pcells AS (SELECT vec_id probe_id, cid cell FROM crk WHERE vec_id < 5 AND crn <= 2),
         |qe AS (SELECT vec_id, generate_subscripts(q, 1) i, unnest(q) e FROM q),
         |rese AS (SELECT v.vec_id, a.cell, v.i, v.e - c.e re
         |  FROM qe v JOIN assign a USING (vec_id)
         |  JOIN qe c ON c.vec_id = a.cell AND c.i = v.i),
         |fce AS (SELECT vec_id - 16 fcid, i, re FROM rese
         |  WHERE vec_id >= 16 AND vec_id < 32),
         |encd AS (SELECT r.vec_id, r.cell, (r.i - 1) // 16 s, f.fcid,
         |    sum((r.re - f.re) * (r.re - f.re)) d2
         |  FROM rese r JOIN fce f ON f.i = r.i GROUP BY 1, 2, 3, 4),
         |encr AS (SELECT vec_id nbr_id, cell, s, fcid code FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, fcid) rn
         |  FROM encd) z WHERE rn = 1),
         |prese AS (SELECT p.probe_id, p.cell, v.i, v.e - c.e re
         |  FROM pcells p JOIN qe v ON v.vec_id = p.probe_id
         |  JOIN qe c ON c.vec_id = p.cell AND c.i = v.i),
         |tabr AS (SELECT pr.probe_id, pr.cell, (pr.i - 1) // 16 s, f.fcid,
         |    sum((pr.re - f.re) * (pr.re - f.re)) pd2
         |  FROM prese pr JOIN fce f ON f.i = pr.i GROUP BY 1, 2, 3, 4),
         |scr AS (SELECT t.probe_id, e.nbr_id, sum(t.pd2) approx_d2
         |  FROM encr e JOIN tabr t ON t.cell = e.cell AND t.s = e.s
         |    AND t.fcid = e.code
         |  WHERE t.probe_id <> e.nbr_id GROUP BY 1, 2)
         |SELECT probe_id, rk, nbr_id, approx_d2 FROM (
         |  SELECT probe_id, nbr_id, cast(approx_d2 AS BIGINT) approx_d2,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY approx_d2, nbr_id) rk
         |  FROM scr) t WHERE rk <= 5""".stripMargin,
      "q", "n", "crk", "qe", "rese", "fce"),

    "q_ann_pq_recall" ->
      s"""$quantCte,
         |$pqCte,
         |ex AS (SELECT probe_id, nbr_id FROM (
         |  SELECT a.vec_id probe_id, b.vec_id nbr_id,
         |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |      (a.n2 + b.n2 - 2 * $dotSql), b.vec_id) rk
         |  FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id) t
         |  WHERE rk <= 5)
         |SELECT cast(e.probe_id AS BIGINT) AS probe_id,
         |  cast(count(*) AS BIGINT) AS k,
         |  cast(sum(CASE WHEN p.nbr_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS hits,
         |  cast(sum(CASE WHEN p.nbr_id IS NULL THEN 0 ELSE 1 END) * 100
         |    // count(*) AS BIGINT) AS recall_pct
         |FROM ex e LEFT JOIN pq p
         |  ON p.probe_id = e.probe_id AND p.nbr_id = e.nbr_id
         |GROUP BY e.probe_id""".stripMargin,

    "q_ann_pq" ->
      s"""$quantCte,
         |ss AS (SELECT unnest(generate_series(0, 3)) s),
         |sv AS (SELECT vec_id, s,
         |  q[(s * 16 + 1):(s * 16 + 16)] sv FROM q, ss),
         |svn AS (SELECT vec_id, s, sv,
         |  list_dot_product(list_transform(sv, x -> cast(x AS DOUBLE)),
         |                   list_transform(sv, x -> cast(x AS DOUBLE))) n2s
         |  FROM sv),
         |cent AS (SELECT vec_id cid, s, sv cv, n2s n2c FROM svn WHERE vec_id < 16),
         |enc AS (SELECT vec_id nbr_id, s, cid code FROM (
         |  SELECT v.vec_id, v.s, c.cid,
         |    row_number() OVER (PARTITION BY v.vec_id, v.s ORDER BY
         |      (v.n2s + c.n2c - 2 * list_dot_product(
         |        list_transform(v.sv, x -> cast(x AS DOUBLE)),
         |        list_transform(c.cv, x -> cast(x AS DOUBLE)))), c.cid) rn
         |  FROM svn v JOIN cent c ON v.s = c.s) t WHERE rn = 1),
         |tab AS (SELECT p.vec_id probe_id, p.s, c.cid,
         |    (p.n2s + c.n2c - 2 * list_dot_product(
         |      list_transform(p.sv, x -> cast(x AS DOUBLE)),
         |      list_transform(c.cv, x -> cast(x AS DOUBLE)))) pd2
         |  FROM svn p JOIN cent c ON p.s = c.s WHERE p.vec_id < 5),
         |sc AS (SELECT t.probe_id, e.nbr_id, sum(t.pd2) approx_d2
         |  FROM enc e JOIN tab t ON t.s = e.s AND t.cid = e.code
         |    AND t.probe_id <> e.nbr_id
         |  GROUP BY 1, 2)
         |SELECT probe_id, rk, nbr_id, approx_d2 FROM (
         |  SELECT probe_id, nbr_id, cast(approx_d2 AS BIGINT) approx_d2,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY approx_d2, nbr_id) rk
         |  FROM sc) t WHERE rk <= 5""".stripMargin,
  )

  /** Trained-codebook IVF: Lloyd's iterations are deterministic on the
    * quantized integers (exact sums, one IEEE division per mean,
    * half-away-from-zero rounding in both engines), so training is
    * replayed as unrolled CTEs — assignment by euclidean argmin,
    * centroid update by per-dimension rounded mean — and the search
    * matches bitwise. */
  val annIvfTrained: Map[String, String] = {
    val iters = 2
    def dotD(a: String, b: String) =
      s"list_dot_product(list_transform($a, x -> cast(x AS DOUBLE)), list_transform($b, x -> cast(x AS DOUBLE)))"
    val iterCtes = (1 to iters).map { i =>
      val prev = s"cent${i - 1}"
      s"""asg$i AS (SELECT vec_id, cid FROM (
         |  SELECT n.vec_id, c.cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      n.n2 + ${dotD("c.qc", "c.qc")} - 2 * ${dotD("n.q", "c.qc")}, c.cid) rn
         |  FROM n CROSS JOIN $prev c) t WHERE rn = 1),
         |up$i AS (SELECT cid, di, cast(round(avg(e), 0) AS BIGINT) m FROM (
         |  SELECT a.cid, unnest(n.q) e, generate_subscripts(n.q, 1) di
         |  FROM n JOIN asg$i a USING (vec_id)) t GROUP BY 1, 2),
         |cent$i AS (SELECT cid, list(m ORDER BY di) qc FROM up$i GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    Map("q_ann_ivf_trained" ->
      s"""$quantCte,
         |cent0 AS (SELECT vec_id cid, q qc FROM n WHERE vec_id < 16),
         |$iterCtes,
         |centf AS (SELECT cid, qc, ${dotD("qc", "qc")} n2c FROM cent$iters),
         |ar AS (SELECT n.vec_id, c.cid, n.n2 + c.n2c - 2 * ${dotD("n.q", "c.qc")} dist2
         |       FROM n CROSS JOIN centf c),
         |rk AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) crn FROM ar),
         |assign AS (SELECT vec_id, cid cell FROM rk WHERE crn = 1),
         |pc AS (SELECT vec_id probe_id, cid cell FROM rk WHERE vec_id < 5 AND crn <= 2),
         |cand AS (SELECT DISTINCT pc.probe_id, a.vec_id nbr_id
         |  FROM pc JOIN assign a ON a.cell = pc.cell AND a.vec_id <> pc.probe_id),
         |sc AS (SELECT c.probe_id, c.nbr_id, $dotSql dot, a.n2 n2a, b.n2 n2b
         |  FROM cand c JOIN n a ON a.vec_id = c.probe_id JOIN n b ON b.vec_id = c.nbr_id)
         |SELECT probe_id, rk, nbr_id, cos FROM (
         |  SELECT probe_id, nbr_id, dot / (sqrt(n2a) * sqrt(n2b)) cos,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY dot / (sqrt(n2a) * sqrt(n2b)) DESC, nbr_id) rk
         |  FROM sc) t WHERE rk <= 3""".stripMargin)
  }

  /** Fully trained residual IVF-PQ: coarse Lloyd (the q_ann_ivf_trained
    * CTEs), residuals vs the TRAINED centroids, then per-subspace
    * Lloyd over residual subvectors — all element-wise integer
    * arithmetic plus the same deterministic rounded-mean updates, so
    * both training loops unroll as CTEs and the search replays
    * bitwise. */
  val annPqTrained: Map[String, String] = {
    val iters = 2
    def dotD(a: String, b: String) =
      s"list_dot_product(list_transform($a, x -> cast(x AS DOUBLE)), list_transform($b, x -> cast(x AS DOUBLE)))"
    val coarseCtes = (1 to iters).map { i =>
      val prev = s"cent${i - 1}"
      s"""asg$i AS (SELECT vec_id, cid FROM (
         |  SELECT n.vec_id, c.cid,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      n.n2 + ${dotD("c.qc", "c.qc")} - 2 * ${dotD("n.q", "c.qc")}, c.cid) rn
         |  FROM n CROSS JOIN $prev c) t WHERE rn = 1),
         |up$i AS (SELECT cid, di, cast(round(avg(e), 0) AS BIGINT) m FROM (
         |  SELECT a.cid, unnest(n.q) e, generate_subscripts(n.q, 1) di
         |  FROM n JOIN asg$i a USING (vec_id)) t GROUP BY 1, 2),
         |cent$i AS (SELECT cid, list(m ORDER BY di) qc FROM up$i GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val fineCtes = (1 to iters).map { i =>
      val prev = s"fce${i - 1}"
      s"""fd$i AS (SELECT r.vec_id, f.s, f.fcid,
         |    sum((r.re - f.ce) * (r.re - f.ce)) d2
         |  FROM rese r JOIN $prev f ON f.i = r.i GROUP BY 1, 2, 3),
         |fa$i AS (SELECT vec_id, s, fcid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, fcid) rn
         |  FROM fd$i) z WHERE rn = 1),
         |fce$i AS (SELECT a.fcid, a.s, r.i, cast(round(avg(r.re), 0) AS BIGINT) ce
         |  FROM rese r JOIN fa$i a ON a.vec_id = r.vec_id
         |    AND a.s = (r.i - 1) // 16
         |  GROUP BY 1, 2, 3)""".stripMargin
    }.mkString(",\n")
    Map("q_ann_pq_trained" ->
      s"""$quantCte,
         |cent0 AS (SELECT vec_id cid, q qc FROM n WHERE vec_id < 16),
         |$coarseCtes,
         |centf AS (SELECT cid, qc, ${dotD("qc", "qc")} n2c FROM cent$iters),
         |ar AS (SELECT n.vec_id, c.cid, n.n2 + c.n2c - 2 * ${dotD("n.q", "c.qc")} dist2
         |       FROM n CROSS JOIN centf c),
         |rk AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) crn FROM ar),
         |assign AS (SELECT vec_id, cid cell FROM rk WHERE crn = 1),
         |pcells AS (SELECT vec_id probe_id, cid cell FROM rk WHERE vec_id < 5 AND crn <= 2),
         |ce AS (SELECT cid, generate_subscripts(qc, 1) i, unnest(qc) e FROM cent$iters),
         |qe AS (SELECT vec_id, generate_subscripts(q, 1) i, unnest(q) e FROM q),
         |rese AS (SELECT v.vec_id, a.cell, v.i, v.e - c.e re
         |  FROM qe v JOIN assign a USING (vec_id)
         |  JOIN ce c ON c.cid = a.cell AND c.i = v.i),
         |fce0 AS (SELECT vec_id - 16 fcid, (i - 1) // 16 s, i, re ce FROM rese
         |  WHERE vec_id >= 16 AND vec_id < 32),
         |$fineCtes,
         |encd AS (SELECT r.vec_id, r.cell, f.s, f.fcid,
         |    sum((r.re - f.ce) * (r.re - f.ce)) d2
         |  FROM rese r JOIN fce$iters f ON f.i = r.i GROUP BY 1, 2, 3, 4),
         |encr AS (SELECT vec_id nbr_id, cell, s, fcid code FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, fcid) rn
         |  FROM encd) z WHERE rn = 1),
         |prese AS (SELECT p.probe_id, p.cell, v.i, v.e - c.e re
         |  FROM pcells p JOIN qe v ON v.vec_id = p.probe_id
         |  JOIN ce c ON c.cid = p.cell AND c.i = v.i),
         |tabr AS (SELECT pr.probe_id, pr.cell, f.s, f.fcid,
         |    sum((pr.re - f.ce) * (pr.re - f.ce)) pd2
         |  FROM prese pr JOIN fce$iters f ON f.i = pr.i GROUP BY 1, 2, 3, 4),
         |scr AS (SELECT t.probe_id, e.nbr_id, sum(t.pd2) approx_d2
         |  FROM encr e JOIN tabr t ON t.cell = e.cell AND t.s = e.s
         |    AND t.fcid = e.code
         |  WHERE t.probe_id <> e.nbr_id GROUP BY 1, 2)
         |SELECT probe_id, rk, nbr_id, approx_d2 FROM (
         |  SELECT probe_id, nbr_id, cast(approx_d2 AS BIGINT) approx_d2,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY approx_d2, nbr_id) rk
         |  FROM scr) t WHERE rk <= 5""".stripMargin)
  }

  val streamingAndMisc: Map[String, String] = Map(
    // sliding-window KMV: duration = 2×slide → every event is in
    // exactly two windows (off ∈ {0,1}); per window the same rank-
    // window k-th-hash replay as q_sketch_kmv, k=64
    "q_sketch_window" -> {
      val nibW = Portable.uint32Sql("kth")
      s"""WITH ev AS (SELECT epoch_us(ts) t, md5(cast(user_id AS VARCHAR)) h
         |            FROM events WHERE user_id IS NOT NULL),
         |w AS (SELECT (t // 300000000 - ofs) * 300000000 ws, h
         |      FROM ev, (SELECT unnest(generate_series(0, 1)) ofs) o),
         |d AS (SELECT DISTINCT ws, h FROM w),
         |r AS (SELECT ws, h, row_number() OVER (PARTITION BY ws ORDER BY h) rn FROM d),
         |s AS (SELECT ws, count(*) n, max(CASE WHEN rn = 64 THEN h END) kth FROM r GROUP BY 1)
         |SELECT strftime(make_timestamp(cast(ws AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS wstart,
         |  CASE WHEN n < 64 THEN cast(n AS DOUBLE)
         |       ELSE (63.0 * 4294967296.0) / cast(greatest(1, $nibW) AS DOUBLE) END AS est_uniq,
         |  CASE WHEN n >= 64 THEN kth END AS kth_hash
         |FROM s""".stripMargin
    },

    "q_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
        |  count(*) AS n, cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_sessionize" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) tsus FROM events),
        |f AS (SELECT user_id, event_id, tsus,
        |  CASE WHEN lag(tsus) OVER w IS NULL OR tsus - lag(tsus) OVER w > 1800000000 THEN 1 ELSE 0 END flag
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tsus, event_id)),
        |s AS (SELECT user_id, tsus, sum(flag) OVER (PARTITION BY user_id ORDER BY tsus, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sess FROM f)
        |SELECT user_id, cast(sess AS BIGINT) AS sess, count(*) AS n_events,
        |  strftime(make_timestamp(min(tsus)), '%Y-%m-%d %H:%M:%S') AS sstart,
        |  strftime(make_timestamp(max(tsus)), '%Y-%m-%d %H:%M:%S') AS send
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q_session_window" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) tsus FROM events),
        |f AS (SELECT user_id, event_id, tsus,
        |  CASE WHEN lag(tsus) OVER w IS NULL OR tsus - lag(tsus) OVER w >= 1800000000 THEN 1 ELSE 0 END flag
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tsus, event_id)),
        |s AS (SELECT user_id, tsus, sum(flag) OVER (PARTITION BY user_id ORDER BY tsus, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sess FROM f)
        |SELECT user_id, count(*) AS n_events,
        |  strftime(make_timestamp(min(tsus)), '%Y-%m-%d %H:%M:%S') AS sstart,
        |  strftime(make_timestamp(max(tsus)), '%Y-%m-%d %H:%M:%S') AS send
        |FROM s GROUP BY user_id, sess""".stripMargin,

    "q_pipe_upper" ->
      "SELECT doc_id, upper(substring(regexp_replace(text, '[^ -~]', '', 'g'), 1, 60)) AS up FROM documents",

    // the awk reducer sums bigint-cast quantities over the key-grouped
    // stream — equivalent to a plain SQL group-sum
    "q_pipe_reduce" ->
      """SELECT l_returnflag, cast(sum(cast(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1""".stripMargin,

    // binary-framed pipe is an identity transport (cat): hashing the
    // payloads back must equal hashing the table's own UTF-8 bytes
    "q_pipe_binary" ->
      "SELECT md5(text) AS h, count(*) AS n FROM documents GROUP BY 1",

    // the TxTable merge-on-read pipeline (two delta commits split on a
    // seq boundary + broadcast-anti-join read resolution) must equal a
    // plain global latest-per-key window over the same change stream
    "q_txtable_mor" ->
      """WITH c AS (SELECT o_custkey AS k,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'D'
        |       WHEN o_orderkey % 3 = 0 THEN 'U' ELSE 'I' END AS op,
        |  o_totalprice AS v, o_orderkey AS seq FROM orders),
        |w AS (SELECT k, op, v,
        |  row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn FROM c)
        |SELECT k, v FROM w WHERE rn = 1 AND op <> 'D'""".stripMargin,

    // the incrementally-maintained aggregate view must equal the full
    // GROUP BY over the final resolved base — three rounds of delta
    // maintenance converge to the recompute
    "q_txtable_aggview" ->
      """WITH c AS (SELECT o_custkey AS k,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'D'
        |       WHEN o_orderkey % 3 = 0 THEN 'U' ELSE 'I' END AS op,
        |  o_custkey % 50 AS g,
        |  cast(round(o_totalprice * 100, 0) AS BIGINT) AS v,
        |  o_orderkey AS seq FROM orders),
        |w AS (SELECT k, op, g, v,
        |  row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn FROM c),
        |b AS (SELECT g, v FROM w WHERE rn = 1 AND op <> 'D')
        |SELECT g, cast(sum(v) AS BIGINT) AS sum_v, count(*) AS n_rows
        |FROM b GROUP BY g""".stripMargin,

    // the z-optimized table's pruned box read must equal the plain
    // filter — pruning may skip dirs, never rows
    "q_txtable_zopt" ->
      """WITH b AS (SELECT max(o_orderkey) mo, max(o_custkey) mc FROM orders)
        |SELECT o_orderkey, o_custkey,
        |  cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders, b
        |WHERE o_custkey <= mc // 4 AND o_orderkey <= mo // 4""".stripMargin,

    // STRING-dim z-order (TxTable.zorderStrGateQuery): a
    // (day-string, custkey) layout read back through a mixed
    // strRange × colRange box — the oracle is the plain filter
    "q_txtable_zorder_str" ->
      """WITH b AS (SELECT max(o_custkey) mc FROM orders)
        |SELECT o_orderkey, o_custkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS day
        |FROM orders, b
        |WHERE o_custkey <= mc // 4
        |  AND strftime(o_orderdate, '%Y-%m-%d')
        |      BETWEEN '1996-01-01' AND '1996-12-31'""".stripMargin,

    // incremental z-order: generation-layered layout, same plain-
    // filter oracle as the full rewrite — hash equality proves the
    // tail-only rewrite preserved content across both generations
    "q_txtable_zopt_incr" ->
      """WITH b AS (SELECT max(o_orderkey) mo, max(o_custkey) mc FROM orders)
        |SELECT o_orderkey, o_custkey,
        |  cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders, b
        |WHERE o_custkey <= mc // 4 AND o_orderkey <= mo // 4""".stripMargin,

    // 3-dim z-order box read: the plain filter — hash equality proves
    // the clustered rewrite preserved content and pruning never
    // dropped rows
    "q_txtable_zopt3" ->
      """WITH b AS (SELECT max(l_orderkey) mo, max(l_partkey) mp,
        |  max(l_suppkey) ms FROM lineitem)
        |SELECT l_orderkey, l_partkey, l_suppkey,
        |  cast(cast(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty
        |FROM lineitem, b
        |WHERE l_partkey <= mp // 2 AND l_suppkey <= ms // 2
        |  AND l_orderkey <= mo // 2""".stripMargin,

    // CoW DELETE: the metadata-only quarter drop composed with the
    // bounded mod-7 predicate — what survives both
    "q_txtable_delete" ->
      """WITH b AS (SELECT max(o_orderkey) m, max(o_orderkey) // 4 + 1 q
        |           FROM orders)
        |SELECT o_orderkey, o_custkey,
        |  cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders, b
        |WHERE NOT (o_orderkey <= q - 1)
        |  AND NOT (o_orderkey % 7 = 0 AND o_orderkey <= m // 2)""".stripMargin,

    // CoW UPDATE: bounded SET price = price * 2 (IEEE-exact doubling)
    "q_txtable_update" ->
      """WITH b AS (SELECT max(o_orderkey) m FROM orders)
        |SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 5 = 0 AND o_orderkey <= m // 2
        |       THEN cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) * 2
        |       ELSE cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        |  END AS price
        |FROM orders, b""".stripMargin,

    "q_media_meta" ->
      """SELECT doc_id, strlen(text) AS byte_len, substring(md5(text), 1, 8) AS sig,
        |  (strlen(text) + 255) // 256 AS n_chunks,
        |  CASE WHEN substring(text, 5, 4) = 'ftyp' THEN 'mp4' ELSE 'raw' END
        |    AS container
        |FROM documents""".stripMargin,

    // the TxTable change feed: two delta commits (split on the seq
    // midpoint) replay verbatim with their version tags; the trailing
    // compaction is content-preserving and contributes NO rows
    "q_txtable_changes" ->
      """WITH c AS (SELECT o_custkey AS k,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'D'
        |       WHEN o_orderkey % 3 = 0 THEN 'U' ELSE 'I' END AS op,
        |  o_totalprice AS v, o_orderkey AS seq FROM orders),
        |m AS (SELECT max(seq) // 2 AS mid FROM c),
        |u AS (SELECT k, op, v, seq,
        |    CASE WHEN seq <= (SELECT mid FROM m) THEN 1 ELSE 2 END AS ver
        |  FROM c),
        |w AS (SELECT ver, k, op, v,
        |  row_number() OVER (PARTITION BY ver, k ORDER BY seq DESC) AS rn
        |  FROM u)
        |SELECT k, op, v, cast(ver AS BIGINT) AS commit_version
        |FROM w WHERE rn = 1""".stripMargin,

    // the SQL route to the same feed (CREATE TEMP VIEW ... USING
    // graft-tx OPTIONS (readChangeFeed, startingVersion '1')) must
    // replay the identical change set — same oracle as
    // q_txtable_changes by construction
    "q_txtable_changes_sql" ->
      """WITH c AS (SELECT o_custkey AS k,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'D'
        |       WHEN o_orderkey % 3 = 0 THEN 'U' ELSE 'I' END AS op,
        |  o_totalprice AS v, o_orderkey AS seq FROM orders),
        |m AS (SELECT max(seq) // 2 AS mid FROM c),
        |u AS (SELECT k, op, v, seq,
        |    CASE WHEN seq <= (SELECT mid FROM m) THEN 1 ELSE 2 END AS ver
        |  FROM c),
        |w AS (SELECT ver, k, op, v,
        |  row_number() OVER (PARTITION BY ver, k ORDER BY seq DESC) AS rn
        |  FROM u)
        |SELECT k, op, v, cast(ver AS BIGINT) AS commit_version
        |FROM w WHERE rn = 1""".stripMargin,
  )

  val olap: Map[String, String] = Map(
    // frequent item pairs: A-priori item prune (support >= 30), basket
    // self-join, pair support >= 3 — the oracle runs the identical SQL
    "q_itemsets" ->
      """WITH li AS (SELECT l_orderkey ok, l_partkey pk FROM lineitem),
        |f AS (SELECT pk FROM li GROUP BY pk HAVING count(*) >= 30),
        |fl AS (SELECT ok, pk FROM li WHERE pk IN (SELECT pk FROM f))
        |SELECT a.pk AS pa, b.pk AS pb, count(*) AS support
        |FROM fl a JOIN fl b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,

    "q_cdc_merge" ->
      """WITH base AS (SELECT c_custkey k, cast(c_acctbal AS DECIMAL(18,2)) bal FROM customer),
        |agg AS (SELECT o_custkey, sum(cast(o_totalprice AS DECIMAL(18,2))) v FROM orders GROUP BY 1),
        |ch AS (SELECT CASE WHEN o_custkey % 13 = 0 THEN o_custkey + 10000000 ELSE o_custkey END k,
        |    CASE WHEN cast(v * 100 AS BIGINT) % 7 = 0 THEN 'D'
        |         WHEN o_custkey % 13 = 0 THEN 'I' ELSE 'U' END op, v
        |  FROM agg)
        |SELECT coalesce(b.k, c.k) AS c_custkey,
        |  cast(coalesce(c.v, b.bal) AS DOUBLE) AS bal,
        |  coalesce(c.op, 'keep') AS src_op
        |FROM base b FULL OUTER JOIN ch c ON b.k = c.k
        |WHERE c.op IS NULL OR c.op <> 'D'""".stripMargin,

    "q_scd2" ->
      """WITH v AS (SELECT o_custkey, o_orderpriority, o_orderdate,
        |    row_number() OVER w AS "version", lead(o_orderdate) OVER w nxt
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |SELECT o_custkey, "version", o_orderpriority,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  coalesce(strftime(nxt, '%Y-%m-%d'), 'current') AS valid_to
        |FROM v""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
        |  cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
        |  cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
        |  cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
        |  cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |  coalesce(lag(o_orderkey, 1) OVER w, -1) AS prev_key,
        |  coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_key,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  row_number() OVER w AS seq
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    // the complete rank family: deterministic (price, key) tie-break;
    // percent_rank/cume_dist are single IEEE divisions of exact ints
    "q_window_ranks" ->
      """WITH o AS (SELECT o_orderpriority, o_orderkey,
        |  cast(o_totalprice AS DECIMAL(18,2)) p FROM orders),
        |r AS (SELECT o_orderpriority, o_orderkey,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  percent_rank() OVER w AS prnk, cume_dist() OVER w AS cd,
        |  ntile(4) OVER w AS quartile
        |FROM o WINDOW w AS (PARTITION BY o_orderpriority ORDER BY p DESC, o_orderkey))
        |SELECT * FROM r WHERE rnk <= 40""".stripMargin,

    "q_corr_stats" ->
      """WITH b AS (SELECT l_returnflag,
        |    cast(cast(l_quantity AS DECIMAL(18,2)) AS BIGINT) x,
        |    cast(cast(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) y
        |  FROM lineitem),
        |s AS (SELECT l_returnflag, count(*) n,
        |    cast(sum(x) AS DOUBLE) sx, cast(sum(y) AS DOUBLE) sy,
        |    cast(sum(x * y) AS DOUBLE) sxy,
        |    cast(sum(x * x) AS DOUBLE) sxx, cast(sum(y * y) AS DOUBLE) syy
        |  FROM b GROUP BY 1)
        |SELECT l_returnflag, n,
        |  sxy / n - (sx / n) * (sy / n) AS covar_pop,
        |  (sxy / n - (sx / n) * (sy / n)) /
        |    (sqrt(sxx / n - (sx / n) * (sx / n)) * sqrt(syy / n - (sy / n) * (sy / n))) AS corr
        |FROM s""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  cast(sum(cast(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS rt
        |FROM orders""".stripMargin,

    // Replays ApproxPercentileRewrite's estimate exactly: the same
    // integer histogram (width 2^21 = 2097152 cents, 64 buckets, zero
    // clamp) and the same ceil(p*n) rank walk, reading the first
    // bucket's upper boundary. ceil over binary64 products matches
    // Spark's math.ceil bitwise.
    "q_approx_percentile" ->
      """WITH v AS (SELECT o_orderpriority,
        |    cast(round(o_totalprice * 100, 0) AS BIGINT) cents FROM orders),
        |bk AS (SELECT o_orderpriority,
        |    least(greatest(cents // 2097152, 0), 63) b FROM v),
        |h AS (SELECT o_orderpriority, b, count(*) c FROM bk GROUP BY 1, 2),
        |cu AS (SELECT o_orderpriority, b,
        |    sum(c) OVER (PARTITION BY o_orderpriority ORDER BY b) cum,
        |    sum(c) OVER (PARTITION BY o_orderpriority) n FROM h)
        |SELECT o_orderpriority,
        |  cast(min(CASE WHEN cum >= ceiling(0.5 * n) THEN (b + 1) * 2097152 END) AS BIGINT) AS p50,
        |  cast(min(CASE WHEN cum >= ceiling(0.9 * n) THEN (b + 1) * 2097152 END) AS BIGINT) AS p90,
        |  cast(min(CASE WHEN cum >= ceiling(0.99 * n) THEN (b + 1) * 2097152 END) AS BIGINT) AS p99,
        |  cast(max(n) AS BIGINT) AS n
        |FROM cu GROUP BY o_orderpriority""".stripMargin,

    // the interpolating twin: pos = p*(n-1) in binary64, linear
    // interpolation between the boundary values at ranks floor(pos)+1
    // and floor(pos)+2 -- identical IEEE ops in both engines
    "q_approx_percentile_cont" ->
      """WITH v AS (SELECT o_orderpriority,
        |    cast(round(o_totalprice * 100, 0) AS BIGINT) cents FROM orders),
        |bk AS (SELECT o_orderpriority,
        |    least(greatest(cents // 2097152, 0), 63) b FROM v),
        |h AS (SELECT o_orderpriority, b, count(*) c FROM bk GROUP BY 1, 2),
        |cu AS (SELECT o_orderpriority, b,
        |    sum(c) OVER (PARTITION BY o_orderpriority ORDER BY b) cum,
        |    sum(c) OVER (PARTITION BY o_orderpriority) n FROM h),
        |est AS (SELECT o_orderpriority, n,
        |  cast(floor(cast(0.5 AS DOUBLE) * cast(n - 1 AS DOUBLE)) AS BIGINT) + 1 r50,
        |  cast(0.5 AS DOUBLE) * cast(n - 1 AS DOUBLE)
        |    - floor(cast(0.5 AS DOUBLE) * cast(n - 1 AS DOUBLE)) f50,
        |  cast(floor(cast(0.9 AS DOUBLE) * cast(n - 1 AS DOUBLE)) AS BIGINT) + 1 r90,
        |  cast(0.9 AS DOUBLE) * cast(n - 1 AS DOUBLE)
        |    - floor(cast(0.9 AS DOUBLE) * cast(n - 1 AS DOUBLE)) f90
        |  FROM (SELECT DISTINCT o_orderpriority, n FROM cu) t),
        |bnd AS (SELECT e.o_orderpriority, e.n, e.f50, e.f90,
        |  min(CASE WHEN cum >= r50 THEN (b + 1) * 2097152 END) v50lo,
        |  min(CASE WHEN cum >= least(r50 + 1, e.n) THEN (b + 1) * 2097152 END) v50hi,
        |  min(CASE WHEN cum >= r90 THEN (b + 1) * 2097152 END) v90lo,
        |  min(CASE WHEN cum >= least(r90 + 1, e.n) THEN (b + 1) * 2097152 END) v90hi
        |  FROM est e JOIN cu USING (o_orderpriority)
        |  GROUP BY 1, 2, 3, 4)
        |SELECT o_orderpriority,
        |  CASE WHEN f50 = 0 THEN cast(v50lo AS DOUBLE)
        |    ELSE cast(v50lo AS DOUBLE)
        |      + f50 * (cast(v50hi AS DOUBLE) - cast(v50lo AS DOUBLE)) END AS p50,
        |  CASE WHEN f90 = 0 THEN cast(v90lo AS DOUBLE)
        |    ELSE cast(v90lo AS DOUBLE)
        |      + f90 * (cast(v90hi AS DOUBLE) - cast(v90lo AS DOUBLE)) END AS p90,
        |  cast(n AS BIGINT) AS n
        |FROM bnd""".stripMargin,

    "q_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_disc(o_totalprice, 0.5) AS p50,
        |  quantile_disc(o_totalprice, 0.9) AS p90,
        |  quantile_disc(o_totalprice, 0.99) AS p99
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_join_salted" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS month, $rev AS revenue, count(*) AS n
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY strftime(o_orderdate, '%Y-%m')""".stripMargin,

    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) t FROM events WHERE user_id IS NOT NULL),
        |s1 AS (SELECT user_id, min(t) t1 FROM ev WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT ev.user_id, min(t) t2 FROM ev JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND t > t1 AND t <= t1 + 86400000000 GROUP BY 1),
        |s3 AS (SELECT ev.user_id, min(t) t3 FROM ev JOIN s2 USING (user_id)
        |       WHERE event_type = 'click' AND t > t2 AND t <= t2 + 86400000000 GROUP BY 1),
        |s4 AS (SELECT ev.user_id, min(t) t4 FROM ev JOIN s3 USING (user_id)
        |       WHERE event_type = 'purchase' AND t > t3 AND t <= t3 + 86400000000 GROUP BY 1)
        |SELECT stage, count(*) AS n_users FROM (
        |  SELECT CASE WHEN t4 IS NOT NULL THEN 4 WHEN t3 IS NOT NULL THEN 3
        |              WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS stage
        |  FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |       LEFT JOIN s4 USING (user_id)) t
        |GROUP BY stage""".stripMargin,

    "q_retention" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS day
        |            FROM events WHERE user_id IS NOT NULL),
        |cohort AS (SELECT user_id, min(day) cohort_day FROM ev WHERE event_type = 'signup' GROUP BY 1),
        |active AS (SELECT DISTINCT user_id, day FROM ev)
        |SELECT cohort_day, day - cohort_day AS day_offset, count(DISTINCT user_id) AS n_users
        |FROM active JOIN cohort USING (user_id)
        |WHERE day >= cohort_day
        |GROUP BY 1, 2""".stripMargin,

    "q_json_extract" ->
      """WITH e AS (SELECT event_type,
        |             cast(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, count(*) AS n, count(DISTINCT k) AS n_distinct_k,
        |  cast(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
        |FROM e GROUP BY 1""".stripMargin,

    "q_set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE strftime(o_orderdate, '%Y-%m') = '1995-01'),
        |b AS (SELECT DISTINCT o_custkey FROM orders
        |      WHERE strftime(o_orderdate, '%Y-%m') = '1995-02')
        |SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM a INTERSECT SELECT * FROM b) t
        |UNION ALL
        |SELECT 'except', count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b) t
        |UNION ALL
        |SELECT 'union', count(*) FROM (SELECT * FROM a UNION SELECT * FROM b) t""".stripMargin,

    // spine per key via unnest(generate_series) (correlated lateral
    // generate_series is unsupported in DuckDB 1.0 — SELECT-list unnest
    // is the portable form); LOCF = last_value IGNORE NULLS.
    "q_gapfill" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |              cast(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |daily AS (SELECT event_type, day, count(*) AS n_events,
        |            cast(sum(cents) AS BIGINT) AS cents FROM ev GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(day) d0, max(day) d1 FROM daily GROUP BY 1),
        |spine AS (SELECT event_type, unnest(generate_series(d0, d1)) AS day FROM bounds)
        |SELECT event_type, day,
        |  cast(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
        |  cast(CASE WHEN d.n_events IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap,
        |  last_value(d.cents IGNORE NULLS)
        |    OVER (PARTITION BY event_type ORDER BY day) AS cents_locf
        |FROM spine s LEFT JOIN daily d USING (event_type, day)""".stripMargin,

    "q_moving_avg" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |              cast(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |daily AS (SELECT event_type, day, cast(sum(cents) AS BIGINT) AS cents,
        |            count(*) AS n_events FROM ev GROUP BY 1, 2)
        |SELECT event_type, day, cents,
        |  cast(sum(cents) OVER w AS BIGINT) AS cents_7d,
        |  cast(sum(cents) OVER w AS DOUBLE) / cast(sum(n_events) OVER w AS DOUBLE)
        |    AS avg_event_cents_7d
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    // full recompute — proves the Spark side's partial-merge
    // (base + delta) equals aggregation from scratch
    "q_incr_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  cast(cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total,
        |  cast(cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
        |    / cast(count(*) AS DOUBLE) AS avg_price
        |FROM orders GROUP BY 1""".stripMargin,

    "q_event_paths" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        |            FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT user_id, event_type,
        |        row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn FROM ev),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 8 GROUP BY 1),
        |c AS (SELECT path, count(*) AS n_users FROM p GROUP BY 1)
        |SELECT rk, path, n_users FROM (
        |  SELECT *, row_number() OVER (ORDER BY n_users DESC, path) rk FROM c) t
        |WHERE rk <= 20""".stripMargin,

    // the naive O(n^2) cross join the Spark side's FastSS deletion-
    // neighborhood blocking avoids
    "q_fuzzy_names" ->
      """WITH v AS (SELECT DISTINCT c_name AS name FROM customer),
        |p AS (SELECT a.name AS name_a, b.name AS name_b FROM v a JOIN v b
        |      ON a.name < b.name AND levenshtein(a.name, b.name) = 1)
        |SELECT rk, name_a, name_b FROM (
        |  SELECT *, row_number() OVER (ORDER BY name_a, name_b) rk FROM p) t
        |WHERE rk <= 50""".stripMargin,

    // one UNION ALL branch per column, mirroring the one-pass wide
    // aggregate; min/max normalized identically (decimal for doubles,
    // formatted timestamps). n_distinct replays the KMV estimate the
    // Spark side computes by default: distinct md5 of the PORTABLE
    // rendering, 256th-smallest hash, (k-1)*2^32/uint32(kth) —
    // identical double division in both engines.
    "q_profile" -> profileSql(exact = false),

    // the exact-multi-distinct variant (profile(exact = true)):
    // plain count(DISTINCT) per column
    "q_profile_exact" -> profileSql(exact = true),

    "q_dq_checks" ->
      """SELECT 'orders_pk_duplicates' AS check_name,
        |  cast(coalesce(sum(c - 1), 0) AS BIGINT) AS violations
        |FROM (SELECT o_orderkey, count(*) c FROM orders GROUP BY 1 HAVING count(*) > 1) t
        |UNION ALL
        |SELECT 'orders_orphan_custkey', count(*) FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'lineitem_orphan_orderkey', count(*) FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'orders_null_custkey', count(*) FROM orders WHERE o_custkey IS NULL
        |UNION ALL
        |SELECT 'orders_nonpositive_price', count(*) FROM orders WHERE o_totalprice <= 0
        |UNION ALL
        |SELECT 'lineitem_shipdate_before_epoch', count(*) FROM lineitem
        |  WHERE l_shipdate IS NOT NULL AND l_shipdate < TIMESTAMP '1990-01-01'""".stripMargin,

    "q_sample_hash" -> {
      val bucket = Portable.uint32Sql("md5(cast(o_orderkey AS VARCHAR))")
      s"""WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice,
         |             $bucket % 100 AS bucket FROM orders)
         |SELECT o_orderkey, o_custkey, bucket,
         |  cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
         |FROM o WHERE bucket < 5""".stripMargin
    },

    // domain-balanced mixing: integer-ppm per-source keep rates +
    // the portable md5 bucket — both engines derive identical rates
    // and identical membership
    "q_mix_sample" -> {
      val bucket = Portable.uint32Sql("md5(cast(doc_id AS VARCHAR))")
      s"""WITH r AS (SELECT source,
         |  least(1000000, 15 * 1000000 // count(*)) rate_ppm
         |  FROM documents GROUP BY 1),
         |d AS (SELECT doc_id, source, $bucket % 1000000 b FROM documents)
         |SELECT doc_id, d.source, cast(rate_ppm AS BIGINT) rate_ppm
         |FROM d JOIN r USING (source) WHERE b < rate_ppm""".stripMargin
    },

    // temperature mixing (alpha = 1/2): integer weights floor(sqrt(c))
    // (IEEE sqrt is correctly rounded), integer weight sum (order-
    // free), integer ppm allocation — engine-identical end to end
    "q_mix_temperature" -> {
      val bucket = Portable.uint32Sql("md5(cast(doc_id AS VARCHAR))")
      s"""WITH w AS (SELECT source, count(*) c,
         |  cast(floor(sqrt(cast(count(*) AS DOUBLE))) AS BIGINT) w
         |  FROM documents GROUP BY 1),
         |sw AS (SELECT sum(w) sw FROM w),
         |r AS (SELECT source,
         |  least(1000000, 200 * 1000000 * w // (sw * c)) rate_ppm
         |  FROM w, sw),
         |d AS (SELECT doc_id, source, $bucket % 1000000 b FROM documents)
         |SELECT doc_id, d.source, cast(rate_ppm AS BIGINT) rate_ppm
         |FROM d JOIN r USING (source) WHERE b < rate_ppm""".stripMargin
    },

    // deterministic stratified split audit: assignment is a pure
    // function of doc_id, so both engines reproduce it exactly
    "q_split_assign" -> {
      val bucket = Portable.uint32Sql("md5(cast(doc_id AS VARCHAR))")
      s"""WITH d AS (SELECT lang, n_chars, $bucket % 100 AS bucket
         |           FROM documents)
         |SELECT lang,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n_docs, cast(sum(n_chars) AS BIGINT) AS chars
         |FROM d GROUP BY 1, 2""".stripMargin
    },

    // power-of-2 length histogram; floor(log2) as exact integer
    // bit-length on both engines (IEEE ln() is not portable)
    "q_length_buckets" ->
      """SELECT cast(length(bin(greatest(n_chars, 1))) - 1 AS BIGINT) AS len_bucket,
        |  count(*) AS n_docs, cast(sum(n_chars) AS BIGINT) AS chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1""".stripMargin,

    "q_range_join" ->
      """WITH e AS (SELECT event_id eid, epoch_us(ts) te FROM events WHERE event_type = 'error'),
        |c AS (SELECT epoch_us(ts) tc FROM events WHERE event_type = 'click')
        |SELECT eid, count(tc) AS n_nearby
        |FROM e LEFT JOIN c ON abs(te - tc) <= 300000000
        |GROUP BY eid""".stripMargin,

    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) tsus,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END is_click
        |  FROM events WHERE event_type IN ('click', 'error')),
        |m AS (SELECT event_id, user_id, tsus, is_click,
        |  max(CASE WHEN is_click = 1 THEN tsus END) OVER (
        |    PARTITION BY user_id ORDER BY tsus, is_click DESC, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) last_click
        |FROM ev)
        |SELECT event_id, user_id, tsus, coalesce(last_click, -1) AS last_click
        |FROM m WHERE is_click = 0""".stripMargin,
  )

  /** Round-8 additions: moment statistics, integer anomaly flags,
    * exact-count stratified sampling, fixed-point entropy/PMI text
    * scores, degree-ordered triangle counting. */
  val round8: Map[String, String] = Map(
    "q_regression" ->
      """WITH b AS (SELECT l_returnflag,
        |    cast(cast(l_quantity AS DECIMAL(18,2)) AS BIGINT) x,
        |    cast(cast(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) y
        |  FROM lineitem),
        |s AS (SELECT l_returnflag, count(*) n,
        |    cast(sum(x) AS DOUBLE) sx, cast(sum(y) AS DOUBLE) sy,
        |    cast(sum(x * y) AS DOUBLE) sxy,
        |    cast(sum(x * x) AS DOUBLE) sxx, cast(sum(y * y) AS DOUBLE) syy
        |  FROM b GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (sxy / n - (sx / n) * (sy / n)) / (sxx / n - (sx / n) * (sx / n)) AS slope,
        |  sy / n - ((sxy / n - (sx / n) * (sy / n)) /
        |            (sxx / n - (sx / n) * (sx / n))) * (sx / n) AS intercept,
        |  ((sxy / n - (sx / n) * (sy / n)) * (sxy / n - (sx / n) * (sy / n))) /
        |    ((sxx / n - (sx / n) * (sx / n)) * (syy / n - (sy / n) * (sy / n))) AS r2
        |FROM s""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""".stripMargin,

    // z² > 9 decided as (n·x − s)² > 9·(n·ss − s²) in exact 128-bit
    // integers (HUGEINT here, decimal(38,0) on the Spark side)
    "q_anomaly" ->
      """WITH ev AS (SELECT event_id, event_type,
        |    cast(cast(value AS DECIMAL(18,2)) * 100 AS BIGINT) v FROM events),
        |st AS (SELECT event_type, cast(count(*) AS HUGEINT) n,
        |    sum(cast(v AS HUGEINT)) s,
        |    sum(cast(v AS HUGEINT) * cast(v AS HUGEINT)) ss
        |  FROM ev GROUP BY 1)
        |SELECT event_id, event_type, v AS val_cents
        |FROM ev JOIN st USING (event_type)
        |WHERE (n * v - s) * (n * v - s) > 9 * (n * ss - s * s)""".stripMargin,

    "q_sample_stratified" -> {
      val bucket = Portable.uint32Sql("md5(cast(doc_id AS VARCHAR))")
      s"""WITH b AS (SELECT doc_id, lang, $bucket % 1000000 b FROM documents),
         |c AS (SELECT lang, count(*) n_stratum FROM b GROUP BY 1),
         |t AS (SELECT lang, (n_stratum * 5 + 99) // 100 target,
         |    CASE WHEN n_stratum <= 10000 THEN 1000000 ELSE 100000 END thr FROM c),
         |f AS (SELECT doc_id, lang, target,
         |    row_number() OVER (PARTITION BY lang ORDER BY b, doc_id) rn
         |  FROM b JOIN t USING (lang) WHERE b < thr)
         |SELECT doc_id, lang, rn FROM f WHERE rn <= target""".stripMargin
    },

    "q_text_entropy" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split($norm, ' ')) word FROM documents),
         |c AS (SELECT doc_id, word, count(*) c FROM tok WHERE word <> '' GROUP BY 1, 2),
         |a AS (SELECT doc_id, cast(sum(c) AS BIGINT) n_tok,
         |    cast(sum(c * ${Portable.log2q10Sql("c", "//")}) AS BIGINT) s_q10
         |  FROM c GROUP BY 1)
         |SELECT doc_id, n_tok,
         |  ${Portable.log2q10Sql("n_tok", "//")} - s_q10 // n_tok AS ent_q10
         |FROM a""".stripMargin,

    "q_text_pmi" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split($norm, ' ')) word FROM documents),
         |uni AS (SELECT word, count(*) cw FROM tok WHERE word <> '' GROUP BY 1),
         |nt AS (SELECT doc_id, string_split($norm, ' ') tk FROM documents),
         |ix AS (SELECT doc_id, tk, unnest(generate_series(1, greatest(len(tk) - 1, 1))) i FROM nt),
         |gr AS (SELECT tk[i] w1, tk[i+1] w2 FROM ix
         |  WHERE tk[i] IS NOT NULL AND tk[i] <> ''
         |    AND tk[i+1] IS NOT NULL AND tk[i+1] <> ''),
         |big AS (SELECT w1, w2, count(*) cxy FROM gr GROUP BY 1, 2 HAVING count(*) >= 5),
         |tot AS (SELECT count(*) nn FROM gr)
         |SELECT w1, w2, cxy,
         |  ${Portable.log2q10Sql("cxy * nn", "//")} -
         |    ${Portable.log2q10Sql("c1 * c2", "//")} AS pmi_q10
         |FROM big
         |JOIN (SELECT word w1, cw c1 FROM uni) u1 USING (w1)
         |JOIN (SELECT word w2, cw c2 FROM uni) u2 USING (w2), tot""".stripMargin,

    "q_moment_stats" ->
      """WITH b AS (SELECT l_returnflag,
        |    cast(cast(l_quantity AS DECIMAL(18,2)) AS BIGINT) x FROM lineitem),
        |s AS (SELECT l_returnflag, count(*) n,
        |    cast(sum(x) AS DOUBLE) s1, cast(sum(x * x) AS DOUBLE) s2,
        |    cast(sum(x * x * x) AS DOUBLE) s3,
        |    cast(sum(x * x * x * x) AS DOUBLE) s4
        |  FROM b GROUP BY 1)
        |SELECT l_returnflag, n, s1 / n AS mean,
        |  s2 / n - (s1 / n) * (s1 / n) AS var_pop,
        |  (s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n)) /
        |  (sqrt(s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) AS skewness,
        |  (s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n) - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) /
        |  ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3 AS kurtosis
        |FROM s""".stripMargin,

    // χ² = Σ contrib_micro / 10⁶; each contribution is an exact
    // 128-bit integer division, so the per-cell table hash-gates
    "q_chi2" ->
      """WITH cells AS (SELECT lang, source, count(*) o FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, count(*) r FROM documents GROUP BY 1),
        |c AS (SELECT source, count(*) c FROM documents GROUP BY 1),
        |t AS (SELECT count(*) nn FROM documents)
        |SELECT lang, source, o,
        |  cast((cast(o AS HUGEINT) * nn - cast(r AS HUGEINT) * c)
        |     * (cast(o AS HUGEINT) * nn - cast(r AS HUGEINT) * c)
        |     * 1000000 // (cast(nn AS HUGEINT) * r * c) AS BIGINT) AS contrib_micro
        |FROM cells JOIN r USING (lang) JOIN c USING (source), t""".stripMargin,

    // the prefix-filtered join must equal the NAIVE all-pairs
    // formulation — the oracle is the completeness proof, not a
    // replay of the algorithm
    "q_jaccard_prefix" ->
      s"""$shingleCte,
         |sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b, cast(i AS DOUBLE) / (x.n + y.n - i) jac
         |FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
         |WHERE i * 100 >= (x.n + y.n - i) * 60""".stripMargin,

    "q_bitmap_overlap" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events
        |           WHERE user_id IS NOT NULL)
        |SELECT a.event_type type_a, b.event_type type_b, count(*) n_overlap
        |FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2""".stripMargin,

    // e/o are each referenced twice over the band self-join; staged
    // (MATERIALIZED) CTEs keep the 10x-rung replay in bounded RAM
    "q_triangles" -> materialize(
      s"""$minhashCte,
         |e AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
         |  FROM band a JOIN band b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |deg AS (SELECT id, count(*) deg FROM (
         |    SELECT doc_a id FROM e UNION ALL SELECT doc_b id FROM e) u GROUP BY 1),
         |o AS (SELECT CASE WHEN da.deg <= db.deg THEN doc_a ELSE doc_b END s,
         |             CASE WHEN da.deg <= db.deg THEN doc_b ELSE doc_a END d
         |  FROM e JOIN deg da ON e.doc_a = da.id JOIN deg db ON e.doc_b = db.id),
         |wdg AS (SELECT o1.s, o1.d v, o2.d w FROM o o1 JOIN o o2
         |  ON o1.s = o2.s AND o1.d < o2.d),
         |tr AS (SELECT s a, v b, w c FROM wdg JOIN e
         |  ON least(v, w) = e.doc_a AND greatest(v, w) = e.doc_b),
         |n AS (SELECT a id FROM tr UNION ALL SELECT b FROM tr UNION ALL SELECT c FROM tr)
         |SELECT id AS doc_id, count(*) n_tri FROM n GROUP BY 1""".stripMargin,
      "e", "deg", "o", "wdg", "tr"),

    // first/last-touch attribution: running first/last over the
    // strictly-preceding per-user frame; revenue in exact cents
    "q_attribution" ->
      """WITH ev AS (SELECT user_id, ts, event_id, event_type,
        |    cast(cast(value AS DECIMAL(18,2)) * 100 AS BIGINT) cents,
        |    CASE WHEN event_type IN ('click','view') THEN event_type END touch
        |  FROM events),
        |att AS (SELECT event_type, cents,
        |    first_value(touch IGNORE NULLS) OVER w first_touch,
        |    last_value(touch IGNORE NULLS) OVER w last_touch
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p AS (SELECT * FROM att WHERE event_type = 'purchase'),
        |u AS (SELECT 'first_touch' model, coalesce(first_touch, 'direct') channel,
        |             cents FROM p
        |      UNION ALL
        |      SELECT 'last_touch', coalesce(last_touch, 'direct'), cents FROM p)
        |SELECT model, channel, count(*) purchases,
        |  cast(sum(cents) AS BIGINT) rev_cents
        |FROM u GROUP BY 1, 2""".stripMargin,

    // 2-D skyline collapsed to the per-size price frontier: a size
    // survives iff its min price undercuts every strictly larger size's
    "q_skyline" ->
      """WITH cand AS (SELECT p_size,
        |    min(cast(cast(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)) min_cents
        |  FROM part GROUP BY 1)
        |SELECT p_size, min_cents FROM (
        |  SELECT p_size, min_cents,
        |    min(min_cents) OVER (ORDER BY p_size DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) best_larger
        |  FROM cand)
        |WHERE best_larger IS NULL OR min_cents < best_larger""".stripMargin,

    // directed association rules a→b over order×brand baskets;
    // support/confidence/lift in integer ppm (lift via HUGEINT ≡
    // Spark's decimal(38,0) path)
    "q_assoc_rules" ->
      """WITH baskets AS (SELECT DISTINCT l_orderkey ok, p_brand item
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT count(DISTINCT ok) n_baskets FROM baskets),
        |ic AS (SELECT item, count(*) c FROM baskets GROUP BY 1),
        |pr AS (SELECT a.item a, b.item b, count(*) cab
        |  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.item <> b.item
        |  GROUP BY 1, 2)
        |SELECT a, b, cab,
        |  (1000000 * cab) // n_baskets support_ppm,
        |  (1000000 * cab) // ca.c conf_ppm,
        |  cast((1000000 * cast(cab AS HUGEINT) * n_baskets)
        |       // (cast(ca.c AS HUGEINT) * cb.c) AS BIGINT) lift_ppm
        |FROM pr, n
        |JOIN ic ca ON pr.a = ca.item
        |JOIN ic cb ON pr.b = cb.item
        |WHERE (1000000 * cab) // n_baskets >= 5000
        |  AND (1000000 * cab) // ca.c >= 100000""".stripMargin,

    // winsorized revenue: clamp to the exact discrete [p01, p99] band
    "q_winsorize" ->
      """WITH ev AS (SELECT event_type,
        |    cast(cast(value AS DECIMAL(18,2)) * 100 AS BIGINT) cents FROM events),
        |b AS (SELECT event_type, quantile_disc(cents, 0.01) lo,
        |             quantile_disc(cents, 0.99) hi FROM ev GROUP BY 1)
        |SELECT event_type, count(*) n, cast(sum(cents) AS BIGINT) raw_cents,
        |  cast(sum(least(greatest(cents, lo), hi)) AS BIGINT) winsor_cents
        |FROM ev JOIN b USING (event_type) GROUP BY 1""".stripMargin,

    // per-group mode with lexicographic tiebreak
    "q_mode" ->
      """WITH c AS (SELECT p_brand, p_type, count(*) c FROM part GROUP BY 1, 2),
        |r AS (SELECT p_brand, p_type, c, row_number()
        |  OVER (PARTITION BY p_brand ORDER BY c DESC, p_type) rn FROM c)
        |SELECT p_brand, p_type AS mode_type, c FROM r WHERE rn = 1""".stripMargin,

    // integer EWMA (α=1/4 dyadic): e1 = x1, e_i = (x_i + 3e) // 4 —
    // replayed as a recursive CTE stepping the per-type day index
    // (values are positive cents, so trunc-div ≡ floor-div)
    // CUSUM via the parallel-prefix closed form replayed as plain
    // windows: s = P - min(0, running-min P); threshold = 3x mean
    // absolute deviation, all integer cents
    "q_cusum" ->
      """WITH daily AS (SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    cast(sum(cast(cast(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |         AS BIGINT) cents
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, cast(sum(cents) // count(*) AS BIGINT) tgt,
        |    count(*) n FROM daily GROUP BY 1),
        |dd AS (SELECT d.event_type, d.day, d.cents, d.cents - t.tgt AS dv, t.n
        |  FROM daily d JOIN t USING (event_type)),
        |hh AS (SELECT event_type, cast((3 * sum(abs(dv))) // max(n) AS BIGINT) h
        |  FROM dd GROUP BY 1),
        |p1 AS (SELECT event_type, day, cents,
        |    cast(sum(dv) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) p
        |  FROM dd),
        |p2 AS (SELECT event_type, day, cents, p,
        |    cast(min(p) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) rm
        |  FROM p1)
        |SELECT p2.event_type, day, cents,
        |  p - least(0, rm) AS cusum_cents,
        |  (p - least(0, rm)) > hh.h AS alarm
        |FROM p2 JOIN hh USING (event_type)""".stripMargin,

    "q_ewma" ->
      """WITH RECURSIVE daily AS (SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    cast(sum(cast(cast(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |         AS BIGINT) cents
        |  FROM events GROUP BY 1, 2),
        |ix AS (SELECT event_type, day, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) i
        |  FROM daily),
        |ew AS (SELECT event_type, day, cents, i, cents AS e FROM ix WHERE i = 1
        |  UNION ALL
        |  SELECT ix.event_type, ix.day, ix.cents, ix.i, (ix.cents + 3 * ew.e) // 4
        |  FROM ix JOIN ew ON ix.event_type = ew.event_type AND ix.i = ew.i + 1)
        |SELECT event_type, day, cents, e AS ewma_cents FROM ew""".stripMargin,

    // TextRank: q40 integer PageRank over adjacent-token co-occurrence
    // (the word-graph twin of q_pagerank's source graph)
    "q_textrank" -> {
      val S = "1099511627776"
      def iter(i: Int): String =
        s"""c$i AS (SELECT ed.v, cast(sum((p.pr * ed.w) // st.s) AS BIGINT) agg
           |  FROM p${i - 1} p JOIN ed ON ed.u = p.v JOIN st ON st.u = ed.u
           |  GROUP BY 1),
           |p$i AS (SELECT no.v, bb.b + (85 * coalesce(c$i.agg, 0)) // 100 pr
           |  FROM no CROSS JOIN bb LEFT JOIN c$i ON c$i.v = no.v)""".stripMargin
      s"""WITH nt AS (SELECT string_split($norm, ' ') tk FROM documents),
         |pp AS (SELECT tk[i] x, tk[i+1] y FROM (
         |    SELECT tk, unnest(generate_series(1, len(tk) - 1)) i
         |    FROM nt WHERE len(tk) >= 2)),
         |pf AS (SELECT least(x, y) u, greatest(x, y) v FROM pp
         |  WHERE x <> '' AND y <> '' AND x <> y),
         |und AS (SELECT u, v, count(*) w FROM pf GROUP BY 1, 2),
         |ed AS (SELECT u, v, w FROM und UNION ALL SELECT v, u, w FROM und),
         |st AS (SELECT u, cast(sum(w) AS BIGINT) s FROM ed GROUP BY 1),
         |no AS (SELECT DISTINCT tok v FROM (
         |    SELECT unnest(string_split($norm, ' ')) tok FROM documents)
         |  WHERE tok <> ''),
         |nn AS (SELECT count(*) n FROM no),
         |bb AS (SELECT (15 * $S) // (100 * n) b, $S // n pz FROM nn),
         |p0 AS (SELECT v, bb.pz pr FROM no CROSS JOIN bb),
         |${(1 to 5).map(iter).mkString(",\n")}
         |SELECT v AS word, pr AS pr_q40,
         |  row_number() OVER (ORDER BY pr DESC, v) rnk FROM p5""".stripMargin
        // same staging as q_pagerank, over the word graph
        .pipe(sql => materialize(sql, Seq("und", "ed", "st", "no") ++
          (0 to 5).map(i => s"p$i"): _*))
    },

    // HITS over the bipartite source↔fingerprint graph: q40 integer
    // renormalized mutual recursion, 3 unrolled rounds (HUGEINT sums
    // ≡ Spark's decimal(38,0))
    "q_hits" -> {
      val S = "1099511627776"
      def round(i: Int): String =
        s"""ar$i AS (SELECT g, sum(cast(h${i - 1}.hs AS HUGEINT)) araw
           |  FROM gr JOIN h${i - 1} USING (source) GROUP BY 1),
           |as$i AS (SELECT sum(araw) asum FROM ar$i),
           |au$i AS (SELECT g, cast(($S * araw) // asum AS BIGINT) au
           |  FROM ar$i, as$i),
           |hr$i AS (SELECT source, sum(cast(au AS HUGEINT)) hraw
           |  FROM gr JOIN au$i USING (g) GROUP BY 1),
           |hs$i AS (SELECT sum(hraw) hsum FROM hr$i),
           |h$i AS (SELECT source, cast(($S * hraw) // hsum AS BIGINT) hs
           |  FROM hr$i, hs$i)""".stripMargin
      s"""WITH nt AS (SELECT source, string_split($norm, ' ') tk FROM documents),
         |ix AS (SELECT source, tk,
         |  unnest(generate_series(1, greatest(len(tk) - 7, 1))) i FROM nt),
         |gr AS (SELECT DISTINCT source, substring(md5(concat_ws(' ', tk[i],
         |  tk[i+1], tk[i+2], tk[i+3], tk[i+4], tk[i+5], tk[i+6], tk[i+7])),
         |  1, 16) g FROM ix),
         |h0 AS (SELECT DISTINCT source, cast(1 AS BIGINT) hs FROM gr),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT source, hs AS hub_q40,
         |  row_number() OVER (ORDER BY hs DESC, source) rnk FROM h3""".stripMargin
        // gr feeds h0 plus two joins per round and every round's
        // tables chain — staged CTEs keep the 10x replay in bounded RAM
        .pipe(sql => materialize(sql, Seq("gr", "h0") ++
          (1 to 3).flatMap(i => Seq(s"ar$i", s"au$i", s"hr$i", s"h$i")): _*))
    },

    // k-core peeling, 4 unrolled rounds at k=2 over the minhash-band
    // candidate graph; survivors + residual degree. Every e_i is
    // MATERIALIZED: each round references its parent 4× (two degree
    // legs + two semi filters), so default CTE inlining would blow up
    // 4^rounds re-evaluations of the band join.
    "q_kcore" -> {
      def round(i: Int): String =
        s"""d$i AS MATERIALIZED (SELECT id, count(*) deg FROM (
           |    SELECT doc_a id FROM e${i - 1} UNION ALL SELECT doc_b FROM e${i - 1}) u
           |  GROUP BY 1),
           |k$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg >= 2),
           |e$i AS MATERIALIZED (SELECT doc_a, doc_b FROM e${i - 1}
           |  WHERE doc_a IN (SELECT id FROM k$i)
           |    AND doc_b IN (SELECT id FROM k$i))""".stripMargin
      s"""$minhashCte,
         |e0 AS MATERIALIZED (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
         |  FROM band a JOIN band b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |${(1 to 4).map(round).mkString(",\n")}
         |SELECT id AS doc_id, count(*) deg FROM (
         |  SELECT doc_a id FROM e4 UNION ALL SELECT doc_b FROM e4) u
         |GROUP BY 1""".stripMargin
    },
  )

  /** q_profile / q_profile_exact oracle: one UNION ALL branch per
    * orders column. `exact = false` replays the Spark side's default
    * KMV distinct estimate — distinct md5 of the PORTABLE per-row
    * rendering (decimal(18,2) for doubles, second-formatted
    * timestamps, plain casts otherwise), 256th-smallest hash,
    * (k-1)·2³² / uint32(kth prefix), identical IEEE division in both
    * engines. `exact = true` is plain count(DISTINCT). */
  private def profileSql(exact: Boolean): String = {
    // (name, per-row render for hashing, min/max render template)
    val cols = Seq(
      ("o_orderkey", "cast(o_orderkey AS VARCHAR)",
        (a: String) => s"cast($a AS VARCHAR)"),
      ("o_custkey", "cast(o_custkey AS VARCHAR)",
        (a: String) => s"cast($a AS VARCHAR)"),
      ("o_orderstatus", "o_orderstatus", (a: String) => a),
      ("o_totalprice", "cast(cast(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)",
        (a: String) => s"cast(cast($a AS DECIMAL(18,2)) AS VARCHAR)"),
      ("o_orderdate", "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')",
        (a: String) => s"strftime($a, '%Y-%m-%d %H:%M:%S')"),
      ("o_orderpriority", "o_orderpriority", (a: String) => a))
    val nib = Portable.uint32Sql("kth")
    cols.map { case (name, render, mm) =>
      val nd =
        if (exact) s"count(DISTINCT $name)"
        else
          s"""(SELECT cast(floor(CASE WHEN n < 256 THEN cast(n AS DOUBLE)
             |    ELSE (255.0 * 4294967296.0) / cast(greatest(1, $nib) AS DOUBLE) END) AS BIGINT)
             |  FROM (SELECT count(*) n, max(CASE WHEN rn = 256 THEN h END) kth
             |        FROM (SELECT h, row_number() OVER (ORDER BY h) rn
             |              FROM (SELECT DISTINCT md5($render) h FROM orders
             |                    WHERE $name IS NOT NULL) d) r) s)""".stripMargin
      s"""SELECT '$name' AS column_name, count(*) AS n_rows,
         |  count(*) - count($name) AS n_null,
         |  $nd AS n_distinct,
         |  ${mm(s"min($name)")} AS min_value,
         |  ${mm(s"max($name)")} AS max_value
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  val round9: Map[String, String] = Map(
    // Holt's linear trend (double exponential smoothing), α = β = 1/2
    // dyadic, floor division — the exact integer recursion twin of
    // Olap.holt, replayed day-by-day via the recursive CTE
    "q_holt" ->
      """WITH RECURSIVE daily AS (SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    cast(sum(cast(cast(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |         AS BIGINT) cents
        |  FROM events GROUP BY 1, 2),
        |ix AS (SELECT event_type, day, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) i
        |  FROM daily),
        |h AS (SELECT event_type, day, cents, i, cents AS l,
        |    cast(0 AS BIGINT) AS b FROM ix WHERE i = 1
        |  UNION ALL
        |  SELECT ix.event_type, ix.day, ix.cents, ix.i,
        |    (ix.cents + h.l + h.b) // 2,
        |    ((ix.cents + h.l + h.b) // 2 - h.l + h.b) // 2
        |  FROM ix JOIN h ON ix.event_type = h.event_type AND ix.i = h.i + 1)
        |SELECT event_type, day, cents, l AS level_cents, b AS trend_cents,
        |  l + b AS forecast_cents FROM h""".stripMargin,

    // robust outlier screen: exact integer median + MAD per priority
    // (quantile_disc = percentile_disc element selection, proven
    // portable by q_percentiles)
    "q_mad" ->
      """WITH o AS (SELECT o_orderpriority,
        |    cast(cast(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) c
        |  FROM orders),
        |m AS (SELECT o_orderpriority, quantile_disc(c, 0.5) med_cents
        |      FROM o GROUP BY 1),
        |d AS (SELECT o.o_orderpriority, c, med_cents,
        |        abs(c - med_cents) dev
        |      FROM o JOIN m USING (o_orderpriority)),
        |md AS (SELECT o_orderpriority, quantile_disc(dev, 0.5) mad_cents
        |       FROM d GROUP BY 1)
        |SELECT d.o_orderpriority, min(med_cents) AS med_cents,
        |  min(mad_cents) AS mad_cents,
        |  cast(sum(CASE WHEN dev > 3 * mad_cents THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_outliers,
        |  count(*) AS n
        |FROM d JOIN md USING (o_orderpriority) GROUP BY 1""".stripMargin,

    // per-domain cap at the P90 of domain sizes, portable md5-rank
    // survivor order
    "q_domain_cap" -> {
      val h = Portable.uint32Sql("md5(cast(doc_id AS VARCHAR))")
      s"""WITH sz AS (SELECT source, count(*) n_src FROM documents GROUP BY 1),
         |cap AS (SELECT quantile_disc(n_src, 0.9) cap FROM sz),
         |d AS (SELECT doc_id, source, $h h FROM documents),
         |r AS (SELECT doc_id, source,
         |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) rk
         |      FROM d)
         |SELECT doc_id, source, cast(rk AS BIGINT) rk
         |FROM r, cap WHERE rk <= cap""".stripMargin
    },

    // per-doc 8-gram novelty: spans whose corpus-wide first occurrence
    // (min doc_id) is this doc, as ppm of the doc's spans
    "q_ngram_novelty" ->
      s"""WITH nt AS (SELECT doc_id, string_split($norm, ' ') tk FROM documents),
         |ix AS (SELECT doc_id, tk,
         |    unnest(generate_series(1, greatest(len(tk) - 7, 1))) i FROM nt),
         |gr AS (SELECT doc_id, substring(md5(concat_ws(' ', tk[i], tk[i+1],
         |         tk[i+2], tk[i+3], tk[i+4], tk[i+5], tk[i+6], tk[i+7])), 1, 16) h
         |       FROM ix),
         |f AS (SELECT h, min(doc_id) fd FROM gr GROUP BY 1),
         |a AS (SELECT doc_id, count(*) n_grams,
         |        cast(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS BIGINT) novel
         |      FROM gr JOIN f USING (h) GROUP BY 1)
         |SELECT doc_id, n_grams, novel,
         |  cast(novel * 1000000 // n_grams AS BIGINT) AS novel_ppm
         |FROM a""".stripMargin,

    // dedup audit: near-dup component size histogram over the same
    // transitive-closure roots as q_dedup_clusters
    "q_dedup_cluster_sizes" ->
      s"""$clusterRootsCte,
         |sz AS (SELECT cluster, count(*) s FROM roots GROUP BY 1)
         |SELECT s AS cluster_size, count(*) AS n_clusters,
         |  cast(sum(s) AS BIGINT) AS n_docs
         |FROM sz GROUP BY 1""".stripMargin,

    // tokenizer fertility: per-lang token/word/char ratios under the
    // 3-round trained BPE vocabulary
    "q_bpe_fertility" ->
      s"""$bpeTrainedCte,
         |vt AS (SELECT word, cast(count(*) AS BIGINT) n_tok FROM t3 GROUP BY word),
         |dw AS (SELECT doc_id, unnest(string_split($norm, ' ')) word FROM documents),
         |j AS (SELECT dw.doc_id, dw.word, v.n_tok
         |      FROM dw JOIN vt v USING (word) WHERE word <> ''),
         |l AS (SELECT doc_id, lang FROM documents)
         |SELECT lang, cast(count(DISTINCT j.doc_id) AS BIGINT) n_docs,
         |  count(*) words, cast(sum(n_tok) AS BIGINT) tokens,
         |  cast(sum(length(word)) AS BIGINT) chars,
         |  cast(sum(n_tok) * 1000000 // count(*) AS BIGINT) fertility_ppm,
         |  cast(sum(length(word)) * 1000000 // sum(n_tok) AS BIGINT)
         |    chars_per_token_ppm
         |FROM j JOIN l USING (doc_id) GROUP BY lang""".stripMargin,

    // forward as-of with tolerance: next click at-or-after each error,
    // -1 past the hour window
    "q_asof_forward" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) tsus,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END is_click
        |  FROM events WHERE event_type IN ('click', 'error')),
        |m AS (SELECT event_id, user_id, tsus, is_click,
        |  min(CASE WHEN is_click = 1 THEN tsus END) OVER (
        |    PARTITION BY user_id ORDER BY tsus, is_click, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nc
        |FROM ev)
        |SELECT event_id, user_id, tsus,
        |  CASE WHEN nc IS NOT NULL AND nc - tsus <= 3600000000
        |       THEN nc ELSE -1 END AS next_click
        |FROM m WHERE is_click = 0""".stripMargin,

    // nearest (two-sided) as-of: the same window pair, closest side
    // wins, ties backward; a same-microsecond click is a forward
    // match by the is_click sort position
    "q_asof_nearest" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) tsus,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END is_click
        |  FROM events WHERE event_type IN ('click', 'error')),
        |m AS (SELECT event_id, user_id, tsus, is_click,
        |  min(CASE WHEN is_click = 1 THEN tsus END) OVER (
        |    PARTITION BY user_id ORDER BY tsus, is_click, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nc,
        |  max(CASE WHEN is_click = 1 THEN tsus END) OVER (
        |    PARTITION BY user_id ORDER BY tsus, is_click, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pc
        |FROM ev),
        |d AS (SELECT event_id, user_id, tsus,
        |  CASE WHEN nc IS NOT NULL AND nc - tsus <= 3600000000
        |       THEN nc - tsus END dn,
        |  CASE WHEN pc IS NOT NULL AND tsus - pc <= 3600000000
        |       THEN tsus - pc END dp, nc, pc
        |FROM m WHERE is_click = 0)
        |SELECT event_id, user_id, tsus,
        |  CASE WHEN dp IS NOT NULL AND (dn IS NULL OR dp <= dn) THEN pc
        |       WHEN dn IS NOT NULL THEN nc ELSE -1 END AS nearest_click,
        |  CASE WHEN dp IS NOT NULL AND (dn IS NULL OR dp <= dn) THEN 'P'
        |       WHEN dn IS NOT NULL THEN 'N' ELSE '-' END AS side
        |FROM d""".stripMargin,

    // bloom-index point lookup: the probe set replayed arithmetically
    // (13 evenly spaced keys); the bloom only skips IO, so the result
    // is the plain IN-filter
    "q_txtable_bloom" ->
      """WITH mx AS (SELECT greatest(max(o_orderkey) // 13, 1) step
        |           FROM orders),
        |p AS (SELECT i * step AS k
        |      FROM generate_series(1, 13) t(i), mx)
        |SELECT o_orderkey, o_custkey,
        |  cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) price
        |FROM orders JOIN p ON o_orderkey = k""".stripMargin,

    // conditional MERGE INTO: update (tripled price via s_price <>
    // price), delete (key ≡ 0 mod 9), insert (shifted keys gated by
    // even custkey) — each branch replayed relationally
    "q_txtable_merge" ->
      """WITH t AS (SELECT o_orderkey, o_custkey,
        |    cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) price
        |  FROM orders),
        |mx AS (SELECT max(o_orderkey) m FROM t),
        |s AS (SELECT o_orderkey, o_custkey, price * 3 AS price FROM t
        |      WHERE o_orderkey % 3 = 0
        |      UNION ALL
        |      SELECT t.o_orderkey + mx.m, o_custkey, price FROM t, mx
        |      WHERE o_orderkey % 10 = 0),
        |upd AS (SELECT t.o_orderkey, t.o_custkey,
        |          CASE WHEN s.price <> t.price THEN s.price ELSE t.price END
        |            AS price
        |        FROM t JOIN s USING (o_orderkey)
        |        WHERE NOT (t.o_orderkey % 9 = 0)),
        |tonly AS (SELECT t.* FROM t
        |          WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s)),
        |ins AS (SELECT s.* FROM s
        |        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM t)
        |          AND o_custkey % 2 = 0)
        |SELECT * FROM upd UNION ALL SELECT * FROM tonly
        |UNION ALL SELECT * FROM ins""".stripMargin,

    // SQL row-level DML replay: range DELETE, modulo DELETE, UPDATE,
    // three-branch MERGE, INSERT INTO — each statement as one CTE
    // layer over the previous table state (integer division via //,
    // matching Scala's maxK / 10)
    "q_txtable_sql_dml" ->
      """WITH o AS (SELECT o_orderkey k, o_custkey cust,
        |    cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) price
        |  FROM orders),
        |mx AS (SELECT max(k) m FROM o),
        |t1 AS (SELECT o.* FROM o, mx WHERE NOT (k <= m // 10)),
        |t2 AS (SELECT * FROM t1 WHERE NOT (k % 10 = 3)),
        |t3 AS (SELECT k, cust,
        |         CASE WHEN k % 10 = 4 THEN price * 2 ELSE price END price
        |       FROM t2),
        |s AS (SELECT k, cust, price FROM o WHERE k % 10 = 5
        |      UNION ALL
        |      SELECT o.k + mx.m, cust, price FROM o, mx WHERE k % 10 = 6),
        |mrg AS (SELECT t3.k, t3.cust,
        |          CASE WHEN s.k IS NOT NULL THEN -1.0 ELSE t3.price END price
        |        FROM t3 LEFT JOIN s ON t3.k = s.k
        |        WHERE NOT (s.k IS NOT NULL AND s.cust % 2 = 0)
        |        UNION ALL
        |        SELECT s.k, s.cust, s.price FROM s LEFT JOIN t3
        |          ON s.k = t3.k WHERE t3.k IS NULL),
        |fin AS (SELECT * FROM mrg
        |        UNION ALL
        |        SELECT s.k + 2 * mx.m, cust, price FROM s, mx
        |        WHERE s.k % 10 = 5 AND s.cust % 3 = 0)
        |SELECT * FROM fin""".stripMargin,

    // merge-on-read twin: identical statements under
    // spark.graft.dml.positional - sidecars + insert dir must land the
    // SAME table state, so the oracle text is the same replay
    "q_txtable_sql_dml_mor" ->
      """WITH o AS (SELECT o_orderkey k, o_custkey cust,
        |    cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) price
        |  FROM orders),
        |mx AS (SELECT max(k) m FROM o),
        |t1 AS (SELECT o.* FROM o, mx WHERE NOT (k <= m // 10)),
        |t2 AS (SELECT * FROM t1 WHERE NOT (k % 10 = 3)),
        |t3 AS (SELECT k, cust,
        |         CASE WHEN k % 10 = 4 THEN price * 2 ELSE price END price
        |       FROM t2),
        |s AS (SELECT k, cust, price FROM o WHERE k % 10 = 5
        |      UNION ALL
        |      SELECT o.k + mx.m, cust, price FROM o, mx WHERE k % 10 = 6),
        |mrg AS (SELECT t3.k, t3.cust,
        |          CASE WHEN s.k IS NOT NULL THEN -1.0 ELSE t3.price END price
        |        FROM t3 LEFT JOIN s ON t3.k = s.k
        |        WHERE NOT (s.k IS NOT NULL AND s.cust % 2 = 0)
        |        UNION ALL
        |        SELECT s.k, s.cust, s.price FROM s LEFT JOIN t3
        |          ON s.k = t3.k WHERE t3.k IS NULL),
        |fin AS (SELECT * FROM mrg
        |        UNION ALL
        |        SELECT s.k + 2 * mx.m, cust, price FROM s, mx
        |        WHERE s.k % 10 = 5 AND s.cust % 3 = 0)
        |SELECT * FROM fin""".stripMargin,

    // MERGE WITH SCHEMA EVOLUTION: one merge whose source carries an
    // extra `score` column; the oracle replays the evolved merge —
    // unmatched target rows read the landed column as NULL (graft's
    // null-fill over pre-ADD files), matched rows take UPDATE SET *,
    // source-only keys take INSERT *
    "q_txtable_merge_evolve" ->
      """WITH o AS (SELECT o_orderkey k, o_custkey cust,
        |    cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) price
        |  FROM orders),
        |mx AS (SELECT max(k) m FROM o),
        |s AS (SELECT k, cust, price * 3 price,
        |        cast(cust % 97 AS DOUBLE) / 10 score
        |      FROM o WHERE k % 3 = 0
        |      UNION ALL
        |      SELECT o.k + mx.m, cust, price,
        |        cast(cust % 89 AS DOUBLE) / 100
        |      FROM o, mx WHERE k % 10 = 0),
        |upd AS (SELECT o.k,
        |          CASE WHEN s.k IS NOT NULL THEN s.cust ELSE o.cust END cust,
        |          CASE WHEN s.k IS NOT NULL THEN s.price ELSE o.price
        |            END price,
        |          s.score score
        |        FROM o LEFT JOIN s ON o.k = s.k),
        |ins AS (SELECT s.k, s.cust, s.price, s.score
        |        FROM s LEFT JOIN o ON s.k = o.k WHERE o.k IS NULL)
        |SELECT k, cust, price, score FROM upd
        |UNION ALL SELECT k, cust, price, score FROM ins""".stripMargin,

    // named snapshot refs: evens loaded, tagged 'base', overwritten
    // with odds, vacuumed to 1 retained version — the 'base' leg only
    // answers because the tag protected the swept snapshot
    "q_txtable_tag" ->
      """WITH o AS (SELECT o_orderkey k, o_custkey cust,
        |    cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) price
        |  FROM orders)
        |SELECT 'now' AS snap, k, cust, price FROM o WHERE k % 2 = 1
        |UNION ALL
        |SELECT 'base' AS snap, k, cust, price FROM o
        |WHERE k % 2 = 0""".stripMargin,

    // CREATE OR REPLACE ... AS SELECT: evens CTAS'd, odds replace them
    // under a different column set; the 'old' leg reads VERSION AS OF
    // 1 — content swap, schema swap and history retention in one hash
    "q_txtable_replace" ->
      """WITH o AS (SELECT o_orderkey k, o_custkey cust,
        |    cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) price
        |  FROM orders)
        |SELECT 'new' AS snap, k, cust, price * 2 AS total FROM o
        |WHERE k % 2 = 1
        |UNION ALL
        |SELECT 'old' AS snap, k, cust, price AS total FROM o
        |WHERE k % 2 = 0""".stripMargin,

    // ADD COLUMNS ... DEFAULT: pre-ADD rows read the defaults, the
    // INSERT supplies its own values, the UPDATE rewrites through the
    // default-filling DML readers, optimize_compact folds mixed dirs
    "q_txtable_addcol_default" ->
      """WITH o AS (SELECT o_orderkey k, o_custkey cust,
        |    cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) price
        |  FROM orders),
        |mx AS (SELECT max(k) m FROM o),
        |t0 AS (SELECT k, cust, price, 'base' AS src,
        |         CAST(0.25 AS DOUBLE) AS bonus FROM o
        |       UNION ALL
        |       SELECT o.k + mx.m, cust, price, 'load2',
        |         CAST(cust % 10 AS DOUBLE) / 10
        |       FROM o, mx WHERE k % 5 = 0)
        |SELECT k, cust,
        |  CASE WHEN k % 10 = 4 THEN price * 2 ELSE price END price,
        |  src, bonus FROM t0""".stripMargin,

    // the gate's rejected writes (violating INSERT / append) must NOT
    // appear; the valid load and the post-DROP sentinel must
    "q_txtable_check" ->
      """WITH o AS (SELECT o_orderkey k, o_custkey cust,
        |    cast(cast(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) price
        |  FROM orders),
        |mx AS (SELECT max(k) m FROM o)
        |SELECT k, cust, price FROM o
        |UNION ALL
        |SELECT o.k + mx.m, cust, price FROM o, mx WHERE k % 7 = 0
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
        |  CAST(-1.0 AS DOUBLE)""".stripMargin)

  def all: Map[String, String] =
    relational ++ text ++ dedup ++ similarity ++ annMultiProbe ++
      similarityNative ++ sketches ++
      annIvf ++ annFiltered ++ hybridRetrieval ++ annIvfIndexed ++ annPq ++
      annIvfTrained ++ annPqTrained ++
      streamingAndMisc ++ olap ++ round8 ++ round9
}
