package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational surface — every capability of the reference engine
  * (chung-ming/SPJ-Query-Engine, /root/reference) re-expressed Spark-first.
  *
  * Reference analogs (cited per query below):
  *  - Scan/Project       -> src/qp/operators/Scan.java, Project.java
  *  - Select(Condition)  -> src/qp/operators/Select.java, utils/Condition.java
  *  - NestedJoin/BlockNestedJoin/HashJoin -> src/qp/operators/ Join classes
  *  - Distinct/GroupBy/OrderBy -> src/qp/operators/{Distinct,GroupBy,OrderBy}.java
  *
  * Design rules (SURVEY.md §5):
  *  - declarative DataFrame plans only; Catalyst/Tungsten pick physical ops
  *  - filters/projections must reach the parquet scan (PushedFilters/ReadSchema)
  *  - every query ends in a deterministic ORDER BY over ALL projected columns
  *    so driver-side hashing is order-stable (ties are identical rows)
  *  - float aggregates go through exact decimal accumulation so Spark's and
  *    DuckDB's summation order cannot diverge (SURVEY.md §6)
  */
object Relational {

  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Harness-boundary digest for array/struct-valued columns. The driver's
    * verify harness sorts result frames with pandas, which cannot sort (or
    * hash) numpy-array cells — an `array<int>` column at the query boundary
    * crashes the compare before any rows are counted (the r8 t30/t31
    * failure class). EVERY query that produces an array keeps the array in
    * its ops-layer API but ships `harnessDigest(col)` (+ a `size` column)
    * across the harness boundary instead — the t22 chunk-md5 convention,
    * made a single shared helper so the crash class cannot recur. The cast
    * renders Spark's canonical `[1, 2, 3]` form; md5 of that string is
    * deterministic for fixed content and order.
    */
  def harnessDigest(c: Column): Column = md5(c.cast("string"))

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact decimal sum cast back to double: identical in Spark and DuckDB
    * regardless of partial-aggregation order. Map-side partial aggregation
    * still applies (decimal sum is associative and exact).
    */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  // ---------------------------------------------------------------------
  // §2.1 rows 1-13, 16, 17
  // ---------------------------------------------------------------------

  private val q01 = Q(
    "q01_scan_project",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice"),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
            FROM lineitem ORDER BY 1, 2, 3"""))

  // All six comparison ops of the reference dialect (<, >, <=, >=, =, !=) as
  // one conjunction — reference: src/qp/utils/Condition.java operator codes.
  private val q02 = Q(
    "q02_filter_range",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 5 && col("l_quantity") <= 45 &&
          col("l_discount") > 0.01 && col("l_tax") < 0.07 &&
          col("l_linenumber") =!= 3 && col("l_returnflag") === "N")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
            FROM lineitem
            WHERE l_quantity >= 5 AND l_quantity <= 45 AND l_discount > 0.01
              AND l_tax < 0.07 AND l_linenumber <> 3 AND l_returnflag = 'N'
            ORDER BY 1, 2, 3, 4"""))

  // String-literal equality selection — reference test-queries/query2.sql
  // (CUSTOMER.gender="1").
  private val q03 = Q(
    "q03_filter_string",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderstatus") =!= "F")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey", "o_custkey", "o_orderstatus"),
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus
            FROM orders
            WHERE o_orderpriority = '1-URGENT' AND o_orderstatus <> 'F'
            ORDER BY 1, 2, 3"""))

  // 2-way equi join — reference src/qp/operators/HashJoin.java; here AQE
  // picks broadcast-hash (customer is the small build side at any SF where
  // it fits) or shuffled hash/sort-merge beyond the threshold.
  private val q04 = Q(
    "q04_hash_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", "o_orderkey", "c_name", "o_totalprice")
    },
    Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            ORDER BY c_custkey, o_orderkey, c_name, o_totalprice"""))

  // 3-way chain — reference test-queries/query4/5. region and nation are
  // tiny at every SF: Catalyst broadcasts them, so the chain is two
  // broadcast joins with zero shuffle of the fact side.
  private val q05 = Q(
    "q05_join3",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
        .orderBy("c_custkey", "n_name", "r_name")
    },
    Some("""SELECT c_custkey, n_name, r_name
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            ORDER BY c_custkey, n_name, r_name"""))

  // 4-way join + range filter + sort — reference test-queries/query10.sql
  // (CUSTOMER x CART x CARTDETAILS x BILL with amount range + ORDERBY).
  private val q06 = Q(
    "q06_join4_filter_sort",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .filter(o("o_totalprice") > 500.0 && o("o_totalprice") < 5000.0)
        .select(col("n_name"), col("c_custkey"), col("o_orderkey"),
          col("l_linenumber"), col("l_extendedprice"))
        .orderBy("o_orderkey", "l_linenumber", "n_name", "c_custkey",
          "l_extendedprice")
    },
    Some("""SELECT n_name, c_custkey, o_orderkey, l_linenumber, l_extendedprice
            FROM lineitem
            JOIN orders   ON l_orderkey  = o_orderkey
            JOIN customer ON o_custkey   = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE o_totalprice > 500.0 AND o_totalprice < 5000.0
            ORDER BY o_orderkey, l_linenumber, n_name, c_custkey,
                     l_extendedprice"""))

  // Pure inequality join — reference NestedJoin with a non-equi Condition
  // (src/qp/operators/NestedJoin.java). Spark: BroadcastNestedLoopJoin with
  // the 25-row nation side broadcast; output bounded by 25 * |supplier|.
  private val q07 = Q(
    "q07_nonequi_join",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      sup.join(broadcast(n), sup("s_nationkey") < n("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_nationkey")
        .orderBy("s_suppkey", "s_nationkey", "n_nationkey")
    },
    Some("""SELECT s_suppkey, s_nationkey, n_nationkey
            FROM supplier JOIN nation ON s_nationkey < n_nationkey
            ORDER BY 1, 2, 3"""))

  // Cross product — reference NestedJoin with no condition.
  private val q08 = Q(
    "q08_cross_join",
    (s, dir) =>
      t(s, dir, "region").crossJoin(broadcast(t(s, dir, "nation")))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name"),
    Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
            ORDER BY 1, 2"""))

  // DISTINCT — reference src/qp/operators/Distinct.java does an external
  // sort-dedup; Spark uses partial (map-side) hash aggregation instead, so
  // only distinct values shuffle.
  private val q09 = Q(
    "q09_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
            ORDER BY 1, 2"""))

  // GROUP BY with all five reference aggregates (MAX MIN SUM COUNT AVG —
  // parser.cup attribute rule + src/qp/operators/Project.java aggregates).
  // Sums/avgs use exact decimal accumulation for oracle stability.
  private val q10 = Q(
    "q10_groupby_agg",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
              MIN(l_quantity) AS min_qty,
              MAX(l_quantity) AS max_qty,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
              COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY 1, 2"""))

  // Global (ungrouped) aggregate — reference Project with aggregates and no
  // GROUPBY clause.
  private val q11 = Q(
    "q11_global_agg",
    (s, dir) =>
      t(s, dir, "orders")
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price")),
    Some("""SELECT COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
              MIN(o_totalprice) AS min_price,
              MAX(o_totalprice) AS max_price
            FROM orders"""))

  // Join + GROUPBY + MAX — reference test-queries/query8.sql
  // (SELECT gender, MAX(amount) ... GROUPBY gender).
  private val q12 = Q(
    "q12_join_groupby",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .filter(o("o_totalprice") < 100000.0)
        .groupBy("c_mktsegment")
        .agg(
          max("o_totalprice").as("max_price"),
          dsum(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
              MAX(o_totalprice) AS max_price,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
              COUNT(*) AS n
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_totalprice < 100000.0
            GROUP BY c_mktsegment ORDER BY 1"""))

  // Multi-column ORDER BY incl. DESC — reference src/qp/operators/OrderBy
  // (external merge sort); Spark: sampled range partitioning + per-partition
  // sort, fully parallel.
  private val q13 = Q(
    "q13_orderby",
    (s, dir) =>
      t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc, col("c_name")),
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
            ORDER BY c_acctbal DESC, c_custkey ASC, c_name"""))

  // Semi/anti join — beyond the reference surface (SURVEY §2.1 row 16):
  // customers with no high-value order. LeftAnti shuffles only the key
  // column; the filter on the probe side is pushed to its scan.
  private val q15 = Q(
    "q15_anti_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey", "c_name")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_totalprice > 400000.0)
            ORDER BY 1, 2"""))

  // Window rank — beyond the reference surface (SURVEY §2.1 row 17):
  // top-3 orders per customer. Single shuffle on the partition key.
  private val q16 = Q(
    "q16_window_rank",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk", "o_orderkey", "o_totalprice")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
              FROM orders) WHERE rk <= 3
            ORDER BY o_custkey, rk, o_orderkey, o_totalprice"""))

  // Semi join — the EXISTS dual of q15: customers with at least one
  // urgent open order. Like anti, only the key column of the probe side
  // shuffles and duplicates never multiply the output.
  private val q17 = Q(
    "q17_semi_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey", "c_mktsegment")
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT'
                            AND o_orderstatus = 'O')
            ORDER BY 1, 2"""))

  // Left outer join — beyond the reference surface (inner-only engine):
  // each customer with their big orders, or one null-extended row when
  // they have none. Keys coalesced to sentinels so both engines order
  // null-extended rows identically. The probe-side filter sits in the
  // join's ON semantics (prefiltered input), so it cannot drop unmatched
  // customers the way a WHERE after the join would.
  private val q18 = Q(
    "q18_outer_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .select(col("c_custkey"),
          coalesce(col("o_orderkey"), lit(-1L)).as("o_key"),
          coalesce(col("o_totalprice"), lit(0.0)).as("o_price"))
        .orderBy("c_custkey", "o_key", "o_price")
    },
    Some("""SELECT c_custkey, coalesce(o_orderkey, -1) AS o_key,
              coalesce(o_totalprice, 0.0) AS o_price
            FROM customer LEFT JOIN orders
              ON o_custkey = c_custkey AND o_totalprice > 450000.0
            ORDER BY 1, 2, 3"""))

  // Explicit GROUPING SETS complete the grouping family (q21 ROLLUP is
  // the prefix lattice, q27 CUBE the full one): two disjoint one-column
  // marginals + the grand total, with grouping() markers disambiguating
  // subtotal rows from genuine NULL groups. Plans as the same ONE
  // Expand -> ONE partial aggregation as ROLLUP/CUBE — 3 sets, never a
  // scan per set.
  private val q35 = Q(
    "q35_grouping_sets",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                      coalesce(o_orderpriority, 'ALL') AS priority,
                      grouping(o_orderstatus) AS g_status,
                      grouping(o_orderpriority) AS g_priority,
                      COUNT(*) AS n,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                        AS DOUBLE) AS total
               FROM orders_gs
               GROUP BY GROUPING SETS ((o_orderstatus),
                 (o_orderpriority), ())
               ORDER BY 3, 4, 1, 2""")
    },
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              grouping(o_orderstatus) AS g_status,
              grouping(o_orderpriority) AS g_priority,
              COUNT(*) AS n,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                AS total
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            ORDER BY 3, 4, 1, 2"""))

  // FULL OUTER completes the join family (inner/left/semi/anti are q04/
  // q18/q17/q15): rich customers FULL OUTER big spenders — both
  // unmatched sides survive null-extended, keys coalesce into one total
  // column. The aggregate runs BEFORE the join (partial-agg'd, narrow
  // rows through the outer join's exchange, never raw orders).
  private val q34 = Q(
    "q34_full_outer",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000.0)
        .select(col("c_custkey"), col("c_acctbal"))
      val o = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("spend"))
        .filter(col("spend") > 1400000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("c_acctbal"), lit(0.0)).as("acctbal"),
          coalesce(col("spend"), lit(0.0)).as("spend"))
        .orderBy("custkey")
    },
    Some("""WITH rich AS (SELECT c_custkey, c_acctbal FROM customer
              WHERE c_acctbal > 9000.0),
            big AS (SELECT o_custkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                  AS spend
              FROM orders GROUP BY o_custkey
              HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                AS DOUBLE) > 1400000.0)
            SELECT coalesce(c_custkey, o_custkey) AS custkey,
              coalesce(c_acctbal, 0.0) AS acctbal,
              coalesce(spend, 0.0) AS spend
            FROM rich FULL OUTER JOIN big ON c_custkey = o_custkey
            ORDER BY 1"""))

  // UNION ALL + aggregate — party counts per nation across two entity
  // tables. Spark's union is by position (UNION ALL); the groupBy gives
  // the distinct-union semantics a report wants while keeping counts.
  private val q19 = Q(
    "q19_union",
    (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .unionByName(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .groupBy("nk").agg(count(lit(1)).as("n"))
        .orderBy("nk"),
    Some("""SELECT nk, COUNT(*) AS n
            FROM (SELECT c_nationkey AS nk FROM customer
                  UNION ALL SELECT s_nationkey FROM supplier)
            GROUP BY 1 ORDER BY 1"""))

  // INTERSECT / EXCEPT — customers partitioned by whether they placed a
  // big order. Set ops distinct both sides then plan as left-semi /
  // left-anti joins: only the key column shuffles.
  private val q20 = Q(
    "q20_intersect_except",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey").as("k")).distinct()
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey").as("k")).distinct()
      c.intersect(o).withColumn("tag", lit("both"))
        .unionByName(c.except(o).withColumn("tag", lit("no_big_order")))
        .select("tag", "k")
        .orderBy("tag", "k")
    },
    Some("""WITH c AS (SELECT DISTINCT c_custkey AS k FROM customer),
              o AS (SELECT DISTINCT o_custkey AS k FROM orders
                    WHERE o_totalprice > 400000.0)
            SELECT 'both' AS tag, k FROM (SELECT k FROM c INTERSECT SELECT k FROM o)
            UNION ALL
            SELECT 'no_big_order' AS tag, k
            FROM (SELECT k FROM c EXCEPT SELECT k FROM o)
            ORDER BY 1, 2"""))

  // ROLLUP: hierarchical subtotals in ONE pass — the Expand operator
  // replicates each input row per grouping set BEFORE the partial
  // aggregation, so the plan still has exactly one exchange (of partially
  // aggregated narrow rows), not one scan per level. Subtotal NULLs are
  // coalesced to a sentinel on BOTH engines: no NULL-ordering divergence
  // (Spark sorts nulls first, DuckDB last) and a deterministic ORDER BY.
  private val q21 = Q(
    "q21_rollup",
    (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls"),
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
              COALESCE(l_linestatus, 'ALL') AS ls,
              COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY 1, 2"""))

  // Correlated scalar subqueries: parts priced strictly above their type's
  // average. Written as SQL against the session catalog — this exercises
  // Catalyst's decorrelation (RewriteCorrelatedScalarSubquery): both
  // subqueries collapse into ONE per-type partial aggregation joined back,
  // never a per-row re-scan (the nested-loop a naive engine would run).
  // Exactness: the avg comparison is cross-multiplied into decimal
  // price*count > sum — no division, no float divergence.
  private val q22 = Q(
    "q22_scalar_subquery",
    (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part")
      s.sql("""SELECT p.p_partkey, p.p_type, p.p_retailprice
               FROM part p
               WHERE CAST(p.p_retailprice AS DECIMAL(18,6))
                     * (SELECT COUNT(*) FROM part p2
                        WHERE p2.p_type = p.p_type)
                   > (SELECT SUM(CAST(p2.p_retailprice AS DECIMAL(18,6)))
                      FROM part p2 WHERE p2.p_type = p.p_type)
               ORDER BY p.p_partkey""")
    },
    Some("""SELECT p.p_partkey, p.p_type, p.p_retailprice
            FROM part p
            WHERE CAST(p.p_retailprice AS DECIMAL(18,6))
                  * (SELECT COUNT(*) FROM part p2
                     WHERE p2.p_type = p.p_type)
                > (SELECT SUM(CAST(p2.p_retailprice AS DECIMAL(18,6)))
                   FROM part p2 WHERE p2.p_type = p.p_type)
            ORDER BY p.p_partkey"""))

  // Aggregate window FRAME (q16 covers ranking): 3-row moving sum of each
  // customer's order totals in date order. One exchange on o_custkey, one
  // sort within partitions; the frame is a running scan, not a self-join.
  // o_orderdate is ms-precision TIMESTAMP_NTZ parquet; unix_millis needs
  // TIMESTAMP, and the session TZ is pinned UTC in Bench/Verify so the
  // NTZ→TZ cast is a stable identity on the epoch value. The orderkey
  // tiebreak makes the frame contents (hence sums) deterministic.
  private val q23 = Q(
    "q23_moving_window",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"),
          sum(col("o_totalprice").cast(DecimalType(18, 6))).over(w)
            .cast("double").as("mov_sum3"),
          count(lit(1)).over(w).as("n_in_frame"))
        .orderBy("o_custkey", "o_orderkey", "order_ms", "mov_sum3",
          "n_in_frame")
    },
    Some("""SELECT o_custkey, o_orderkey,
              epoch_ms(o_orderdate) AS order_ms,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w
                   AS DOUBLE) AS mov_sum3,
              COUNT(*) OVER w AS n_in_frame
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            ORDER BY o_custkey, o_orderkey, order_ms, mov_sum3, n_in_frame"""))

  // NOT IN over a nullable subquery — null-aware anti join. q15's left_anti
  // is the two-valued version; NOT IN carries SQL's three-valued logic: one
  // NULL in the subquery empties the result, a NULL outer key never
  // qualifies. Spark plans the single-column case as a broadcast hash join
  // in null-aware mode (NAAJ) — semantics spec'd on tiny data in OpsSpec,
  // plan shape asserted in PlanSpec. o_custkey holds no NULLs here, so the
  // result is the anti-join answer — but the ENGINE can't know that
  // (parquet fields are nullable) and must run the null-aware plan.
  private val q24 = Q(
    "q24_not_in_null",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT c_custkey, c_name FROM customer
               WHERE c_custkey NOT IN
                 (SELECT o_custkey FROM orders
                  WHERE o_totalprice > 450000.0)
               ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders
               WHERE o_totalprice > 450000.0)
            ORDER BY c_custkey"""))

  // PIVOT: per-day event counts spread into one column per event type.
  // The pivot VALUES are given explicitly, so Spark skips the extra
  // distinct-values discovery job and plans ONE partial-aggregated
  // groupBy(day) — each pivot cell is a filtered count, exactly the
  // CASE-sum formulation the oracle uses. Absent (day, type) cells are
  // NULL from pivot-count; coalesced to 0 on both engines.
  private val q25 = Q(
    "q25_pivot",
    (s, dir) => {
      val types = Seq("view", "click", "purchase", "signup", "error")
      t(s, dir, "events")
        // day as yyyy-MM-dd STRING: a DATE column round-trips differently
        // through the two engines' result frames (date vs midnight
        // datetime), and the hash compare is textual
        .select(to_date(col("ts")).cast("string").as("day"),
          col("event_type"))
        .groupBy("day")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("day") +: types.map(tp =>
          coalesce(col(tp), lit(0L)).as(s"n_$tp")): _*)
        .orderBy("day")
    },
    Some("""SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
              CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
              CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click,
              CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase,
              CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signup,
              CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_error
            FROM events GROUP BY 1 ORDER BY 1"""))

  // Pattern-match selection: LIKE prefix / contains / negated prefix.
  // Spark pushes StartsWith and StringContains into the parquet scan
  // (PlanSpec-asserted) — at 100 TB a prefix predicate prunes row groups
  // via min/max stats exactly like a range predicate, so LIKE 'x%' is a
  // scan-level filter, not a post-scan regex pass.
  private val q26 = Q(
    "q26_like_prefix",
    (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_type").like("STAND%") &&
          col("p_name").like("%bolt%") && !col("p_name").like("red%"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name, p_type FROM part
            WHERE p_type LIKE 'STAND%' AND p_name LIKE '%bolt%'
              AND p_name NOT LIKE 'red%'
            ORDER BY p_partkey"""))

  // CUBE: all 2^k grouping-set combinations in the same one-Expand-one-
  // aggregation plan as q21's ROLLUP (4 sets here vs rollup's 3) — the
  // missing combination is the (NULL, linestatus) marginal. Same sentinel
  // coalescing for NULL-ordering stability.
  private val q27 = Q(
    "q27_cube",
    (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls"),
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
              COALESCE(l_linestatus, 'ALL') AS ls,
              COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
            FROM lineitem
            GROUP BY CUBE(l_returnflag, l_linestatus)
            ORDER BY 1, 2"""))

  // Bag-semantics set ops: EXCEPT ALL / INTERSECT ALL keep multiplicity
  // (q19/q20 are set-semantics). Spark plans both as a count-compare over
  // ONE aggregation + generate (replicate min/diff counts) — no join of
  // the raw rows, no distinct collapse. Oracle: DuckDB's native ALL ops.
  private val q28 = Q(
    "q28_bag_setops",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_quantity") <= 30.0).select("l_suppkey")
      val b = li.filter(col("l_quantity") >= 20.0).select("l_suppkey")
      a.exceptAll(b).groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_except"))
        .join(
          a.intersectAll(b).groupBy("l_suppkey")
            .agg(count(lit(1)).as("n_intersect")),
          Seq("l_suppkey"), "full_outer")
        .select(col("l_suppkey"),
          coalesce(col("n_except"), lit(0L)).as("n_except"),
          coalesce(col("n_intersect"), lit(0L)).as("n_intersect"))
        .orderBy("l_suppkey")
    },
    Some("""WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_quantity <= 30.0),
              b AS (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 20.0),
              e AS (SELECT l_suppkey, COUNT(*) AS n_except
                    FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
                    GROUP BY 1),
              i AS (SELECT l_suppkey, COUNT(*) AS n_intersect
                    FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
                    GROUP BY 1)
            SELECT COALESCE(e.l_suppkey, i.l_suppkey) AS l_suppkey,
              COALESCE(n_except, 0) AS n_except,
              COALESCE(n_intersect, 0) AS n_intersect
            FROM e FULL OUTER JOIN i ON e.l_suppkey = i.l_suppkey
            ORDER BY 1"""))

  // Value-based RANGE window frame (q23's ROWS frame counts rows; RANGE
  // bounds by ORDER-key VALUE): each order's trailing-7-day spend per
  // customer. Value-based frames are tie-insensitive — every row with the
  // same key gets the same frame, so no tiebreak column is needed for
  // determinism. Same single exchange + in-partition sort shape as q23.
  private val q29 = Q(
    "q29_range_window",
    (s, dir) => {
      val day = unix_millis(col("o_orderdate").cast("timestamp"))
        .divide(lit(86400000L)).cast("long")
      val w = Window.partitionBy("o_custkey").orderBy("order_day")
        .rangeBetween(-6, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), day.as("order_day"),
          col("o_totalprice"))
        .select(col("o_custkey"), col("o_orderkey"), col("order_day"),
          sum(col("o_totalprice").cast(DecimalType(18, 6))).over(w)
            .cast("double").as("spend_7d"),
          count(lit(1)).over(w).as("n_orders_7d"))
        .orderBy("o_custkey", "o_orderkey", "order_day", "spend_7d",
          "n_orders_7d")
    },
    Some("""SELECT o_custkey, o_orderkey,
              epoch_ms(o_orderdate) // 86400000 AS order_day,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w
                   AS DOUBLE) AS spend_7d,
              COUNT(*) OVER w AS n_orders_7d
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY
                           epoch_ms(o_orderdate) // 86400000
                         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            ORDER BY o_custkey, o_orderkey, order_day, spend_7d,
              n_orders_7d"""))

  // UNPIVOT (q25's inverse): wide metric columns melt into (metric,
  // value) rows — plans as ONE Expand (k output rows per input row,
  // no shuffle, no join), the same operator family grouping sets use.
  // Values cast to a common double type (UNPIVOT requires it) and the
  // metric labels are the column names in both engines.
  private val q37 = Q(
    "q37_unpivot",
    (s, dir) => t(s, dir, "customer")
      .select(col("c_custkey"),
        col("c_nationkey").cast("double").as("nationkey"),
        col("c_acctbal").cast("double").as("acctbal"))
      .unpivot(Array(col("c_custkey")),
        Array(col("nationkey"), col("acctbal")), "metric", "value")
      .orderBy("c_custkey", "metric"),
    Some("""SELECT c_custkey, metric, value FROM (
              SELECT c_custkey,
                CAST(c_nationkey AS DOUBLE) AS nationkey,
                CAST(c_acctbal AS DOUBLE) AS acctbal
              FROM customer)
            UNPIVOT (value FOR metric IN (nationkey, acctbal))
            ORDER BY c_custkey, metric"""))

  // Offset window functions complete the window family (q16 ranking,
  // q23 ROWS frame, q29 RANGE frame): lag/lead fetch the previous/next
  // order in each customer's sequence, first_value anchors the series —
  // all three share ONE (exchange, sort) pair: same partition key and
  // order, so Catalyst plans a single Window operator, never one per
  // function. Key-tiebroken ordering, sentinel-coalesced edges.
  private val q36 = Q(
    "q36_lead_lag",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .select(col("o_custkey"), col("o_orderkey"),
          coalesce(lag("o_orderkey", 1).over(w), lit(-1L)).as("prev_key"),
          coalesce(lead("o_orderkey", 1).over(w), lit(-1L)).as("next_key"),
          first("o_orderkey").over(w).as("first_key"),
          coalesce(lag("o_totalprice", 1).over(w), lit(0.0))
            .as("prev_price"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
              coalesce(lag(o_orderkey, 1) OVER w, -1) AS prev_key,
              coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_key,
              first_value(o_orderkey) OVER w AS first_key,
              coalesce(lag(o_totalprice, 1) OVER w, 0.0) AS prev_price
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey"""))

  // Distribution-rank window functions complete the ranking family (q16
  // row_number, q36 offsets): ntile buckets, percent_rank, cume_dist —
  // all three share ONE (partition key, sort order), so Catalyst plans a
  // SINGLE Window operator: one exchange + one in-partition sort, never
  // one per function (PlanSpec-asserted). The order key (acctbal,
  // custkey) is unique per partition, so tie handling cannot diverge
  // between engines; the rank divisions ((rank-1)/(n-1), peers/n) are
  // single IEEE divisions on integer inputs — bit-identical in DuckDB.
  private val q38 = Q(
    "q38_ntile_dist",
    (s, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal", "c_custkey")
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        .select(col("c_custkey"), col("c_nationkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("c_nationkey", "c_custkey")
    },
    Some("""SELECT c_custkey, c_nationkey,
              ntile(4) OVER w AS quartile,
              percent_rank() OVER w AS pct_rank,
              cume_dist() OVER w AS cume
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey
                         ORDER BY c_acctbal, c_custkey)
            ORDER BY c_nationkey, c_custkey"""))

  // Correlated EXISTS / NOT EXISTS predicate subqueries in SQL — q15/q17
  // are the DataFrame-level semi/anti joins; this is the SQL spelling,
  // decorrelated by Catalyst (RewritePredicateSubquery) into ONE semi and
  // ONE anti join against a shared filtered orders scan — never a per-row
  // re-scan. The correlated predicate carries an inequality
  // (o_totalprice > c_acctbal * 2) on top of the key equality, so the
  // rewrite must fold a non-equi conjunct into the join condition.
  private val q31 = Q(
    "q31_exists_subquery",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT c_custkey, c_name FROM customer c
               WHERE EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > c.c_acctbal * 2)
                 AND NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_orderpriority = '1-URGENT'
                                   AND o.o_totalprice > 400000.0)
               ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > c.c_acctbal * 2)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT'
                                AND o.o_totalprice > 400000.0)
            ORDER BY c_custkey"""))

  // Top-k selection: ORDER BY + LIMIT plans as TakeOrderedAndProject —
  // each partition keeps only k rows and the driver merges partition
  // winners, so no global sort of the input ever materializes (the same
  // plan shape t06's heavy hitters relies on, here as the bare
  // relational capability). Deterministic under ties via the full
  // key (price, orderkey, linenumber).
  private val q30 = Q(
    "q30_topk",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(20),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
            FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
            LIMIT 20"""))

  // Recursive CTE — Spark 4's native WITH RECURSIVE (UnionLoop): walk
  // each customer's ancestor chain in the implicit binary hierarchy
  // (parent(k) = k div 2) and roll account balances up to the top three
  // levels — the iterative-closure capability class (org hierarchies,
  // BOM rollups, graph reachability) that fixed-depth self-joins can't
  // express. Execution is driver-COORDINATED but data-DISTRIBUTED: each
  // iteration is one narrow project+filter over the previous step's
  // rows (no shuffle inside the loop), depth is log2(max key) — ~24
  // iterations even at 15M customers — and the aggregate below the
  // loop is an ordinary hash-agg with map-side partials. Balances
  // accumulate as exact decimals (the dsum convention), counts and
  // node ids are pure integers, so DuckDB's WITH RECURSIVE matches
  // bit-for-bit.
  private val q39 = Q(
    "q39_recursive_cte",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql("""WITH RECURSIVE chain AS (
                 SELECT c_custkey AS node, c_custkey AS anc,
                        c_acctbal AS bal
                 FROM customer
                 UNION ALL
                 SELECT node, anc div 2, bal FROM chain WHERE anc > 1
               )
               SELECT anc, COUNT(*) AS n_desc,
                 CAST(SUM(CAST(bal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
               FROM chain WHERE anc <= 7
               GROUP BY anc ORDER BY anc""")
    },
    Some("""WITH RECURSIVE chain AS (
              SELECT c_custkey AS node, c_custkey AS anc,
                     c_acctbal AS bal
              FROM customer
              UNION ALL
              SELECT node, anc // 2, bal FROM chain WHERE anc > 1
            )
            SELECT anc, COUNT(*) AS n_desc,
              CAST(SUM(CAST(bal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
            FROM chain WHERE anc <= 7
            GROUP BY anc ORDER BY anc"""))

  // ANSI FILTER-clause conditional aggregation: several differently-
  // filtered aggregates in ONE grouping pass — the spelling that makes
  // "overall + conditional" stats a single HashAggregate (each FILTER
  // predicate evaluates per input row inside the agg) instead of the
  // self-join or CASE pyramid it replaces. Counts are exact longs; the
  // filtered sum accumulates as exact decimal (dsum convention); a
  // group where no row passes yields NULL in both engines.
  private val q40 = Q(
    "q40_filtered_agg",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT c_mktsegment,
                 COUNT(*) AS n_orders,
                 COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                   FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
                   AS urgent_total
               FROM customer JOIN orders ON c_custkey = o_custkey
               GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    Some("""SELECT c_mktsegment,
              COUNT(*) AS n_orders,
              COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
                AS urgent_total
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // LATERAL correlated subquery with ORDER BY + LIMIT — the top-N-per-
  // row spelling (each customer's 2 priciest orders). Catalyst
  // DECORRELATES the per-row subquery into a set-based plan (a ranked
  // window over one join — never an orders re-scan per customer), the
  // same rewrite class as q22/q31's subqueries; LATERAL's inner-join
  // semantics drop order-less customers. Deterministic under ties via
  // the (price desc, orderkey) sort.
  private val q41 = Q(
    "q41_lateral_topn",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
               FROM customer c, LATERAL (
                 SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
               ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")
    },
    Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
            FROM customer c, LATERAL (
              SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
            ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey"""))

  // ANSI LISTAGG / ordered string aggregation (SQL:2016 T625): the CSV
  // of order keys per priority in NUMERIC order — collect_list →
  // array_sort on the longs, cast to string only inside the transform
  // (sorting rendered strings would order "10" before "9"); the
  // aggregation itself stays a hash agg with map-side partials, the
  // sort is per-group over collected values, never a global sort
  private val q42 = Q(
    "q42_listagg",
    (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 200)
        .groupBy("o_orderpriority")
        .agg(concat_ws(",",
            transform(array_sort(collect_list(col("o_orderkey"))),
              x => x.cast("string"))).as("keys_csv"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
              string_agg(CAST(o_orderkey AS VARCHAR), ','
                ORDER BY o_orderkey) AS keys_csv,
              COUNT(*) AS n
            FROM orders WHERE o_orderkey < 200
            GROUP BY 1 ORDER BY 1"""))

  private val q43 = Q(
    "q43_merge_upsert",
    // SQL:2003 MERGE / CDC-apply: a change batch (update / insert /
    // delete arms + a SUPERSEDED stale version that last-writer-wins
    // must discard) applied to the customer dimension —
    // Warehouse.latestByVersion collapse then applyChanges full-outer
    // CASE; balances in integer cents so every arm is hash-exact
    (s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_mktsegment"),
          round(col("c_acctbal") * 100).cast("long").as("bal_c"))
      val spend = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("spend_c"))
      val upd = cust
        .join(spend, col("c_custkey") === col("o_custkey"))
        .filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_mktsegment"),
          (col("bal_c") + col("spend_c")).as("bal_c"),
          lit(false).as("deleted"), lit(2L).as("ver"))
      val stale = upd // an earlier CDC version the collapse must drop
        .withColumn("bal_c", lit(-1L)).withColumn("ver", lit(1L))
      val ins = spend.filter(col("o_custkey") % 3 === 1)
        .select((col("o_custkey") + 1000000L).as("c_custkey"),
          concat(lit("Customer#new"), col("o_custkey").cast("string"))
            .as("c_name"),
          lit(0).cast("int").as("c_nationkey"),
          lit("NEWSEG").as("c_mktsegment"),
          col("spend_c").as("bal_c"),
          lit(false).as("deleted"), lit(2L).as("ver"))
      val del = cust.filter(col("c_custkey") % 3 === 2)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_mktsegment"), col("bal_c"),
          lit(true).as("deleted"), lit(2L).as("ver"))
      val latest = graft.ops.Warehouse.latestByVersion(
        upd.unionByName(stale).unionByName(ins).unionByName(del),
        Seq("c_custkey"), "ver").drop("ver")
      graft.ops.Warehouse.applyChanges(cust, latest,
          Seq("c_custkey"), "deleted")
        .orderBy("c_custkey")
    },
    Some("""WITH cust AS (SELECT c_custkey, c_name, c_nationkey,
                c_mktsegment,
                CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
              FROM customer),
            spend AS (SELECT o_custkey,
                CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS spend_c
              FROM orders GROUP BY 1),
            upd AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
                bal_c + spend_c AS bal_c, false AS deleted, 2 AS ver
              FROM cust JOIN spend ON c_custkey = o_custkey
              WHERE c_custkey % 3 = 0),
            stale AS (SELECT c_custkey, c_name, c_nationkey,
                c_mktsegment, -1 AS bal_c, false AS deleted, 1 AS ver
              FROM upd),
            ins AS (SELECT o_custkey + 1000000 AS c_custkey,
                'Customer#new' || CAST(o_custkey AS VARCHAR) AS c_name,
                0 AS c_nationkey, 'NEWSEG' AS c_mktsegment,
                spend_c AS bal_c, false AS deleted, 2 AS ver
              FROM spend WHERE o_custkey % 3 = 1),
            del AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
                bal_c, true AS deleted, 2 AS ver
              FROM cust WHERE c_custkey % 3 = 2),
            chg AS (SELECT * FROM upd UNION ALL SELECT * FROM stale
              UNION ALL SELECT * FROM ins UNION ALL SELECT * FROM del),
            latest AS (SELECT c_custkey, c_name, c_nationkey,
                c_mktsegment, bal_c, deleted
              FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey
                  ORDER BY ver DESC) AS rn FROM chg)
              WHERE rn = 1)
            SELECT
              COALESCE(l.c_custkey, t.c_custkey) AS c_custkey,
              CASE WHEN l.c_custkey IS NOT NULL
                THEN l.c_name ELSE t.c_name END AS c_name,
              CAST(CASE WHEN l.c_custkey IS NOT NULL
                THEN l.c_nationkey ELSE t.c_nationkey END
                AS INTEGER) AS c_nationkey,
              CASE WHEN l.c_custkey IS NOT NULL
                THEN l.c_mktsegment ELSE t.c_mktsegment END
                AS c_mktsegment,
              CAST(CASE WHEN l.c_custkey IS NOT NULL
                THEN l.bal_c ELSE t.bal_c END AS BIGINT) AS bal_c
            FROM cust t FULL JOIN latest l USING (c_custkey)
            WHERE NOT COALESCE(l.deleted, false)
            ORDER BY c_custkey"""))

  private val q44 = Q(
    "q44_percentile",
    // exact distributed PERCENTILE_CONT via rank arithmetic — the
    // EXACT twin of t39's approximate histogram quantiles. Spark's
    // percentile() and DuckDB's quantile_cont() both interpolate in
    // floats with engine-specific accumulation, so neither is oracle-
    // safe; this computes the same linear interpolation exactly:
    // cents-quantized values, target offset (n-1)*p split into integer
    // quotient/remainder base 100, and the interpolated value as the
    // exact long v_lo*(100-rem) + v_hi*rem over ONE final IEEE
    // division by 10000. Ties need no tiebreak: equal cents at
    // adjacent ranks interpolate to themselves.
    (s, dir) => {
      val base = t(s, dir, "lineitem").select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("c"))
      val w = Window.partitionBy("l_returnflag").orderBy("c")
      val ranked = base
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
      def pct(p: Int): Column = {
        // Column./ is double division; floor() recovers the exact
        // integer quotient (values far below 2^53)
        val lo = floor((col("n") - 1) * p / 100).cast("long") + 1
        val rem = (col("n") - 1) * p % 100
        val vlo = max(when(col("rn") === lo, col("c")))
        val vhi = max(when(col("rn") === lo + 1, col("c")))
        ((vlo * (lit(100) - max(rem)) +
          coalesce(vhi, vlo) * max(rem)).cast("double") / 10000.0)
      }
      ranked.groupBy("l_returnflag")
        .agg(max(col("n")).as("n_rows"),
          pct(25).as("p25"), pct(50).as("p50"), pct(75).as("p75"))
        .orderBy("l_returnflag")
    },
    Some("""WITH base AS (SELECT l_returnflag,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS c
              FROM lineitem),
            ranked AS (SELECT l_returnflag, c,
                row_number() OVER (PARTITION BY l_returnflag ORDER BY c)
                  AS rn,
                COUNT(*) OVER (PARTITION BY l_returnflag) AS n
              FROM base)
            SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_rows,
              CAST(MAX(CASE WHEN rn = (n-1)*25//100 + 1 THEN c END)
                  * (100 - MAX((n-1)*25%100))
                + COALESCE(MAX(CASE WHEN rn = (n-1)*25//100 + 2
                    THEN c END),
                  MAX(CASE WHEN rn = (n-1)*25//100 + 1 THEN c END))
                  * MAX((n-1)*25%100) AS DOUBLE) / 10000.0 AS p25,
              CAST(MAX(CASE WHEN rn = (n-1)*50//100 + 1 THEN c END)
                  * (100 - MAX((n-1)*50%100))
                + COALESCE(MAX(CASE WHEN rn = (n-1)*50//100 + 2
                    THEN c END),
                  MAX(CASE WHEN rn = (n-1)*50//100 + 1 THEN c END))
                  * MAX((n-1)*50%100) AS DOUBLE) / 10000.0 AS p50,
              CAST(MAX(CASE WHEN rn = (n-1)*75//100 + 1 THEN c END)
                  * (100 - MAX((n-1)*75%100))
                + COALESCE(MAX(CASE WHEN rn = (n-1)*75//100 + 2
                    THEN c END),
                  MAX(CASE WHEN rn = (n-1)*75//100 + 1 THEN c END))
                  * MAX((n-1)*75%100) AS DOUBLE) / 10000.0 AS p75
            FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val q45 = Q(
    "q45_range_bucket_join",
    // point-in-interval join by bucket decomposition — the SCALE path
    // for the q07 non-equi class (IP→geo, price bands, time slots):
    // `p BETWEEN lo AND hi` alone plans BroadcastNestedLoopJoin (O(N·M)
    // and a broadcast that stops fitting at 100 TB); exploding each
    // interval into the fixed-width buckets it covers turns it into an
    // EQUI join on bucket id + the residual filter. The oracle runs the
    // PLAIN inequality join, so the hash-equality row is itself the
    // completeness proof of the decomposition (the d34 trick). Ranges
    // derive deterministically from supplier keys, points from
    // cents-quantized customer balances (the q44 quantization)
    (s, dir) => {
      val ranges = t(s, dir, "supplier")
        .select(col("s_suppkey"),
          expr("(s_suppkey * 37) % 2000").as("lo"))
        .withColumn("hi", col("lo") + expr("s_suppkey % 97"))
      val pts = t(s, dir, "customer").select(
        (abs(round(col("c_acctbal") * 100).cast("long")) % 2100).as("p"))
      val m = graft.ops.Events
        .rangeBucketJoin(pts, "p", ranges, "lo", "hi", bucketWidth = 128L)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_pts"), sum("p").as("sum_p"))
      ranges.join(m, Seq("s_suppkey"), "left")
        .select(col("s_suppkey"), col("lo"), col("hi"),
          coalesce(col("n_pts"), lit(0L)).as("n_pts"),
          coalesce(col("sum_p"), lit(0L)).as("sum_p"))
        .orderBy("s_suppkey")
    },
    Some("""WITH r AS (SELECT s_suppkey,
                (s_suppkey * 37) % 2000 AS lo,
                (s_suppkey * 37) % 2000 + s_suppkey % 97 AS hi
              FROM supplier),
            p AS (SELECT abs(CAST(round(c_acctbal * 100) AS BIGINT))
                % 2100 AS p
              FROM customer),
            m AS (SELECT s_suppkey, COUNT(*) AS n_pts, SUM(p.p) AS sum_p
              FROM r JOIN p ON p.p BETWEEN r.lo AND r.hi
              GROUP BY 1)
            SELECT r.s_suppkey, r.lo, r.hi,
              COALESCE(m.n_pts, 0) AS n_pts,
              CAST(COALESCE(m.sum_p, 0) AS BIGINT) AS sum_p
            FROM r LEFT JOIN m USING (s_suppkey)
            ORDER BY s_suppkey"""))

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25,
    q26, q27, q28, q29, q30, q31, q34, q35, q36, q37, q38, q39, q40, q41,
    q42, q43, q44, q45)
}
