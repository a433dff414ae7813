package graft

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

    "q_total_order_bucket" ->
      """SELECT bucket, count(*) AS n,
        |  cast(min(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
        |  cast(max(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
        |FROM (SELECT o_totalprice, o_orderkey,
        |        ntile(32) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket FROM orders) t
        |GROUP BY bucket""".stripMargin,

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

    "q_multi_output_assign" ->
      """SELECT o_orderpriority AS part_key, count(*) AS n,
        |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_date
        |FROM orders GROUP BY 1""".stripMargin,
  )

  def all: Map[String, String] = relational
}
