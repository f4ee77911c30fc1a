package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.CoreQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2
  * instantiated on the driver testdata; [[oracleSql]] holds the DuckDB
  * ANSI equivalent (same column names, same ORDER BY, same rounding) for
  * the hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's signature analytic: deterministic arg-max ("best
    * year per series", `report_processor.py:164-166`) over grouped sums.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.argMaxBestYear(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_sum"      -> (CoreQueries.aggSum _),
    "q_argmax"       -> (CoreQueries.argMaxBestYear _),
    "q_global_stats" -> (CoreQueries.globalStats _),
    "q_proj_filter"  -> (CoreQueries.projFilter _),
    "q_range_filter" -> (CoreQueries.rangeFilter _),
    "q_left_join"    -> (CoreQueries.leftJoinEnrich _),
    "q_anti_join"    -> (CoreQueries.antiJoin _),
    "q_distinct"     -> (CoreQueries.distinctVals _),
    "q_topk"         -> (CoreQueries.topK _),
    "q_set_except"   -> (CoreQueries.setExcept _),
    "q_window"       -> (CoreQueries.windowFuncs _),
    "q_rollup"       -> (CoreQueries.rollupAgg _),
    "q_star_join"    -> (CoreQueries.starJoin _)
  )

  /** DuckDB oracles — same column names, same total ORDER BY, same
    * rounding as the Spark plans (hash compare is exact).
    */
  def oracleSql: Map[String, String] = Map(
    "q_agg_sum" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price,
        | round(avg(l_discount), 6) AS avg_disc, count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_argmax" ->
      """SELECT l_suppkey, ship_year, total_qty FROM (
        |  SELECT l_suppkey, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |         sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY 1, 2)
        |QUALIFY row_number() OVER (
        |  PARTITION BY l_suppkey ORDER BY total_qty DESC, ship_year ASC) = 1
        |ORDER BY l_suppkey""".stripMargin,
    "q_global_stats" ->
      """SELECT round(avg(o_totalprice), 4) AS mean_price,
        | round(stddev_samp(o_totalprice), 4) AS stddev_price,
        | count(o_totalprice) AS n,
        | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01'
        |  AND TIMESTAMP '1997-12-31'""".stripMargin,
    "q_proj_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE trim(l_returnflag) = 'R' AND trim(l_linestatus) = 'F'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_range_filter" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(year(o_orderdate) AS BIGINT) AS o_year, o_totalprice
        |FROM orders WHERE year(o_orderdate) BETWEEN 1996 AND 1998
        |ORDER BY o_orderkey""".stripMargin,
    "q_left_join" ->
      """SELECT c_custkey, c_name, n_orders, total_spent
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_orders,
        |         round(sum(o_totalprice), 2) AS total_spent
        |  FROM orders GROUP BY 1) ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |  AND year(o.o_orderdate) = 1995)
        |ORDER BY c_custkey""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY 1, 2""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_set_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |WHERE year(o_orderdate) >= 1999
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |WHERE year(o_orderdate) < 1999
        |ORDER BY custkey""".stripMargin,
    "q_window" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(row_number() OVER w AS BIGINT) AS order_rank,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | round(sum(o_totalprice) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |   AS running_spend
        |FROM orders
        |WINDOW w AS (
        |  PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
