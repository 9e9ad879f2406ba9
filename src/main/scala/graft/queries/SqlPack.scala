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

  val all: Seq[Relational.Q] = Seq(q14)
}
