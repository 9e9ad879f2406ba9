package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sql.SpjCompiler

/** SURVEY §2.1 rows 14-15: the reference SPJ dialect end-to-end — parsed by
  * graft.sql.SpjParser, planned by SpjCompiler (greedy stats-based join
  * order + broadcast hints), executed by Spark.
  */
object SqlPack {

  /** Dialect text in the reference grammar (cf. reference
    * test-queries/query8.sql shape: join chain + range selection +
    * GROUPBY + aggregate).
    */
  val q14Text: String =
    """SELECT CUSTOMER.c_mktsegment, MAX(ORDERS.o_totalprice),
      |       COUNT(ORDERS.o_orderkey), SUM(ORDERS.o_totalprice),
      |       AVG(ORDERS.o_totalprice), MIN(ORDERS.o_totalprice)
      |FROM CUSTOMER, ORDERS, NATION
      |WHERE CUSTOMER.c_custkey = ORDERS.o_custkey,
      |      CUSTOMER.c_nationkey = NATION.n_nationkey,
      |      ORDERS.o_totalprice < "400000", NATION.n_nationkey != "7"
      |GROUPBY CUSTOMER.c_mktsegment
      |ORDERBY CUSTOMER.c_mktsegment""".stripMargin

  private val q14 = Relational.Q(
    "q14_spj_sql",
    (s, dir) => SpjCompiler.run(s, dir, q14Text),
    Some("""SELECT c_mktsegment AS customer_c_mktsegment,
              MAX(o_totalprice) AS max_orders_o_totalprice,
              COUNT(o_orderkey) AS count_orders_o_orderkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                AS sum_orders_o_totalprice,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                / COUNT(o_totalprice) AS avg_orders_o_totalprice,
              MIN(o_totalprice) AS min_orders_o_totalprice
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_totalprice < 400000 AND n_nationkey <> 7
            GROUP BY 1 ORDER BY 1"""))

  /** query10.sql's shape (4-way chain + range + string selection +
    * ORDERBY) on the TPC-H tables — the second driver-oracle-checked
    * compiler path beside q14 (SpjGoldenSpec proves the reference's own
    * 16 queries against an ANSI evaluation; these two pin the same
    * compiler against DuckDB).
    */
  val q32Text: String =
    """SELECT NATION.n_name, ORDERS.o_orderkey, ORDERS.o_totalprice
      |FROM REGION, NATION, CUSTOMER, ORDERS
      |WHERE REGION.r_regionkey = NATION.n_regionkey,
      |      NATION.n_nationkey = CUSTOMER.c_nationkey,
      |      CUSTOMER.c_custkey = ORDERS.o_custkey,
      |      ORDERS.o_totalprice > "300000", REGION.r_name = "ASIA"
      |ORDERBY ORDERS.o_orderkey""".stripMargin

  private val q32 = Relational.Q(
    "q32_spj_chain",
    (s, dir) => SpjCompiler.run(s, dir, q32Text),
    Some("""SELECT n_name AS nation_n_name,
              o_orderkey AS orders_o_orderkey,
              o_totalprice AS orders_o_totalprice
            FROM region
            JOIN nation ON r_regionkey = n_regionkey
            JOIN customer ON n_nationkey = c_nationkey
            JOIN orders ON c_custkey = o_custkey
            WHERE o_totalprice > 300000 AND r_name = 'ASIA'
            ORDER BY o_orderkey"""))

  /** query9/query_distinct's DISTINCT shape (+ ORDERBY for a
    * deterministic compare).
    */
  val q33Text: String =
    """SELECT DISTINCT CUSTOMER.c_mktsegment
      |FROM CUSTOMER
      |ORDERBY CUSTOMER.c_mktsegment""".stripMargin

  private val q33 = Relational.Q(
    "q33_spj_distinct",
    (s, dir) => SpjCompiler.run(s, dir, q33Text),
    Some("""SELECT DISTINCT c_mktsegment AS customer_c_mktsegment
            FROM customer ORDER BY 1"""))

  val all: Seq[Relational.Q] = Seq(q14, q32, q33)
}
