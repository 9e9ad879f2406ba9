package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** End-to-end compiler goldens: all 16 files of the reference's
  * test-queries/ directory (reference test-queries/experiment1_1.sql …
  * query_groupby.sql), each compiled by SpjParser + SpjCompiler over
  * synthetic catalogs matching the reference's .det schemas (reference
  * EMPLOYEES.det, CUSTOMER.det, …) and checked row-for-row against an
  * independent ANSI-SQL evaluation through Spark's OWN parser/analyzer
  * (`spark.sql` over temp views) — no SpjCompiler code on the oracle
  * path. The driver's DuckDB oracle exercises the same dialect on the
  * TPC-H tables (q14 + the spj* entries); these 16 pin compiler-output
  * equality on the reference's own query set, closing the one
  * reference-fidelity gap the r6 audit named.
  *
  * Comparison matches the driver's convention: columns sorted by name,
  * rows compared as a multiset (ORDERBY total order is additionally
  * asserted where the dialect query has one, on its sort key only — the
  * dialect, like SQL, leaves peers unordered).
  */
class SpjGoldenSpec extends SparkSpec {
  import spark.implicits._

  // ---- synthetic catalogs, shaped by the reference .det files ----------
  // (deterministic: fixed seed; sized so every join matches some rows,
  // every selection is selective, and FK ranges leave some dangling keys)

  private lazy val rnd = new scala.util.Random(7)

  private lazy val catalog: Map[String, DataFrame] = {
    val employees = (1 to 40)
      .map(i => (i, s"emp$i", rnd.nextInt(100000)))
      .toDF("eid", "ename", "salary")
    val certified = (1 to 60)
      .map(_ => (rnd.nextInt(50) + 1, rnd.nextInt(40) + 1)).distinct
      .toDF("eid", "aid")
    val aircrafts = (1 to 40)
      .map(i => (i, s"ac$i", rnd.nextInt(100000)))
      .toDF("aid", "aname", "cruisingrange")
    val flights = (1 to 30)
      .map(i => (i, s"c${rnd.nextInt(8)}", s"c${rnd.nextInt(8)}",
        rnd.nextInt(100000), rnd.nextInt(24), rnd.nextInt(24)))
      .toDF("flno", "from", "to", "distance", "departs", "arrives")
    val schedule = (1 to 40)
      .map(_ => (rnd.nextInt(30) + 1, rnd.nextInt(40) + 1)).distinct
      .toDF("flno", "aid")
    val customer = (1 to 100)
      .map(i => (i, rnd.nextInt(2) + 1, s"fn$i", s"ln$i", s"addr$i"))
      .toDF("cid", "gender", "firstname", "lastname", "address")
    val cart = (1 to 100)
      .map(i => (i, rnd.nextInt(120) + 1,
        if (rnd.nextBoolean()) "open" else "paid", s"cr$i"))
      .toDF("cartid", "cid", "status", "remarks")
    val cartdetails = (1 to 100)
      .map(i => (i, rnd.nextInt(120) + 1, rnd.nextInt(50) + 1, s"cdr$i"))
      .toDF("iid", "cartid", "qty", "remarks")
    val bill = (1 to 100)
      .map(i => (i, rnd.nextInt(120) + 1, rnd.nextInt(2500) + 1, s"br$i"))
      .toDF("billid", "iid", "amount", "remarks")
    Map(
      "EMPLOYEES" -> employees, "CERTIFIED" -> certified,
      "AIRCRAFTS" -> aircrafts, "FLIGHTS" -> flights,
      "SCHEDULE" -> schedule, "CUSTOMER" -> customer, "CART" -> cart,
      "CARTDETAILS" -> cartdetails, "BILL" -> bill)
  }

  private lazy val stats: Map[String, Long] =
    catalog.map { case (n, df) => n -> df.count() }

  private lazy val viewsReady: Unit =
    catalog.foreach { case (n, df) => df.createOrReplaceTempView(n) }

  /** Column lists per table (the .det order) for `SELECT *` expansion on
    * the ANSI side with the compiler's qualified output names.
    */
  private val schemas: Map[String, Seq[String]] = Map(
    "EMPLOYEES" -> Seq("eid", "ename", "salary"),
    "CERTIFIED" -> Seq("eid", "aid"),
    "AIRCRAFTS" -> Seq("aid", "aname", "cruisingrange"),
    "FLIGHTS" -> Seq("flno", "from", "to", "distance", "departs", "arrives"),
    "SCHEDULE" -> Seq("flno", "aid"),
    "CUSTOMER" -> Seq("cid", "gender", "firstname", "lastname", "address"),
    "CART" -> Seq("cartid", "cid", "status", "remarks"),
    "CARTDETAILS" -> Seq("iid", "cartid", "qty", "remarks"),
    "BILL" -> Seq("billid", "iid", "amount", "remarks"))

  private def star(tables: String*): String =
    tables.flatMap(t => schemas(t).map(c =>
      s"$t.`$c` AS ${t.toLowerCase}_$c")).mkString(", ")

  /** Compare compiled output vs the independent ANSI evaluation:
    * identical column-name sets, identical row multiset (columns sorted
    * by name — the driver's convention).
    */
  private def assertSame(spj: DataFrame, ansi: DataFrame,
      expectRows: Boolean = true): Unit = {
    val cols = spj.columns.map(_.toLowerCase).sorted.toSeq
    assert(cols == ansi.columns.map(_.toLowerCase).sorted.toSeq,
      s"schema: ${spj.columns.toSeq} vs ${ansi.columns.toSeq}")
    def canon(df: DataFrame): Seq[String] =
      df.select(df.columns.sortBy(_.toLowerCase).map(col).toIndexedSeq: _*)
        .collect()
        .map(_.toSeq.map(String.valueOf).mkString("")).sorted.toSeq
    val a = canon(spj); val b = canon(ansi)
    assert(a == b, s"rows differ: spj=${a.size} ansi=${b.size}")
    if (expectRows) assert(a.nonEmpty, "golden is vacuous: 0 rows")
  }

  private def golden(name: String, spjSql: String, ansiSql: String,
      orderedBy: Option[String] = None): Unit =
    test(s"reference $name end-to-end vs ANSI evaluation") {
      viewsReady
      val spj = SpjCompiler.compile(SpjParser.parse(spjSql), catalog, stats)
      assertSame(spj, spark.sql(ansiSql))
      orderedBy.foreach { key =>
        val vals = spj.select(col(key).cast("double")).collect()
          .map(_.getDouble(0)).toSeq
        assert(vals == vals.sorted, s"$key not in ORDERBY order")
      }
    }

  // ---- the 16 reference test-queries, verbatim -------------------------

  golden("experiment1_1.sql",
    """SELECT *
      |FROM EMPLOYEES, CERTIFIED
      |WHERE EMPLOYEES.eid = CERTIFIED.eid""".stripMargin,
    s"SELECT ${star("EMPLOYEES", "CERTIFIED")} FROM EMPLOYEES, CERTIFIED " +
      "WHERE EMPLOYEES.eid = CERTIFIED.eid")

  golden("experiment1_2.sql",
    """SELECT *
      |FROM FLIGHTS, SCHEDULE
      |WHERE FLIGHTS.flno = SCHEDULE.flno""".stripMargin,
    s"SELECT ${star("FLIGHTS", "SCHEDULE")} FROM FLIGHTS, SCHEDULE " +
      "WHERE FLIGHTS.flno = SCHEDULE.flno")

  golden("experiment1_3.sql",
    """SELECT *
      |FROM SCHEDULE, AIRCRAFTS
      |WHERE SCHEDULE.aid = AIRCRAFTS.aid""".stripMargin,
    s"SELECT ${star("SCHEDULE", "AIRCRAFTS")} FROM SCHEDULE, AIRCRAFTS " +
      "WHERE SCHEDULE.aid = AIRCRAFTS.aid")

  golden("experiment2.sql",
    """SELECT EMPLOYEES.eid, EMPLOYEES.ename
      |FROM EMPLOYEES, CERTIFIED, SCHEDULE
      |WHERE EMPLOYEES.eid = CERTIFIED.eid,SCHEDULE.aid = CERTIFIED.aid""".stripMargin,
    "SELECT EMPLOYEES.eid AS employees_eid, EMPLOYEES.ename AS employees_ename " +
      "FROM EMPLOYEES, CERTIFIED, SCHEDULE " +
      "WHERE EMPLOYEES.eid = CERTIFIED.eid AND SCHEDULE.aid = CERTIFIED.aid")

  golden("query1.sql",
    "SELECT *\nFROM CUSTOMER",
    s"SELECT ${star("CUSTOMER")} FROM CUSTOMER")

  golden("query2.sql",
    """SELECT CUSTOMER.cid,CUSTOMER.gender,CUSTOMER.firstname
      |FROM CUSTOMER
      |WHERE CUSTOMER.gender="1"""".stripMargin,
    "SELECT CUSTOMER.cid AS customer_cid, CUSTOMER.gender AS customer_gender, " +
      "CUSTOMER.firstname AS customer_firstname FROM CUSTOMER " +
      "WHERE CUSTOMER.gender = 1")

  golden("query3.sql",
    """SELECT CUSTOMER.cid, CUSTOMER.firstname, CUSTOMER.gender, CART.cartid, CART.status
      |FROM CUSTOMER,CART
      |WHERE CUSTOMER.cid=CART.cid""".stripMargin,
    "SELECT CUSTOMER.cid AS customer_cid, CUSTOMER.firstname AS customer_firstname, " +
      "CUSTOMER.gender AS customer_gender, CART.cartid AS cart_cartid, " +
      "CART.status AS cart_status FROM CUSTOMER, CART " +
      "WHERE CUSTOMER.cid = CART.cid")

  golden("query4.sql",
    """SELECT *
      |FROM CUSTOMER,CART,CARTDETAILS
      |WHERE CUSTOMER.cid=CART.cid,CART.cartid=CARTDETAILS.cartid""".stripMargin,
    s"SELECT ${star("CUSTOMER", "CART", "CARTDETAILS")} " +
      "FROM CUSTOMER, CART, CARTDETAILS " +
      "WHERE CUSTOMER.cid = CART.cid AND CART.cartid = CARTDETAILS.cartid")

  golden("query5.sql",
    """SELECT *
      |FROM CUSTOMER,CART,CARTDETAILS,BILL
      |WHERE CUSTOMER.cid=CART.cid,CART.cartid=CARTDETAILS.cartid,CARTDETAILS.iid=BILL.iid""".stripMargin,
    s"SELECT ${star("CUSTOMER", "CART", "CARTDETAILS", "BILL")} " +
      "FROM CUSTOMER, CART, CARTDETAILS, BILL " +
      "WHERE CUSTOMER.cid = CART.cid AND CART.cartid = CARTDETAILS.cartid " +
      "AND CARTDETAILS.iid = BILL.iid")

  golden("query6.sql",
    """SELECT *
      |FROM CUSTOMER,CART,CARTDETAILS,BILL
      |WHERE CUSTOMER.cid=CART.cid,CART.cartid=CARTDETAILS.cartid,CARTDETAILS.iid=BILL.iid,BILL.amount<"1000",BILL.amount>"500"""".stripMargin,
    s"SELECT ${star("CUSTOMER", "CART", "CARTDETAILS", "BILL")} " +
      "FROM CUSTOMER, CART, CARTDETAILS, BILL " +
      "WHERE CUSTOMER.cid = CART.cid AND CART.cartid = CARTDETAILS.cartid " +
      "AND CARTDETAILS.iid = BILL.iid AND BILL.amount < 1000 AND BILL.amount > 500")

  golden("query7.sql",
    """SELECT CUSTOMER.gender,BILL.amount
      |FROM CUSTOMER,CART,CARTDETAILS,BILL
      |WHERE CUSTOMER.cid=CART.cid,CART.cartid=CARTDETAILS.cartid,CARTDETAILS.iid=BILL.iid,BILL.amount<"1000",BILL.amount>"500"""".stripMargin,
    "SELECT CUSTOMER.gender AS customer_gender, BILL.amount AS bill_amount " +
      "FROM CUSTOMER, CART, CARTDETAILS, BILL " +
      "WHERE CUSTOMER.cid = CART.cid AND CART.cartid = CARTDETAILS.cartid " +
      "AND CARTDETAILS.iid = BILL.iid AND BILL.amount < 1000 AND BILL.amount > 500")

  golden("query8.sql",
    """SELECT CUSTOMER.gender,MAX(BILL.amount)
      |FROM CUSTOMER,CART,CARTDETAILS,BILL
      |WHERE CUSTOMER.cid=CART.cid,CART.cartid=CARTDETAILS.cartid,CARTDETAILS.iid=BILL.iid,BILL.amount<"1000"
      |GROUPBY CUSTOMER.gender""".stripMargin,
    "SELECT CUSTOMER.gender AS customer_gender, MAX(BILL.amount) AS max_bill_amount " +
      "FROM CUSTOMER, CART, CARTDETAILS, BILL " +
      "WHERE CUSTOMER.cid = CART.cid AND CART.cartid = CARTDETAILS.cartid " +
      "AND CARTDETAILS.iid = BILL.iid AND BILL.amount < 1000 " +
      "GROUP BY CUSTOMER.gender")

  golden("query9.sql",
    "SELECT DISTINCT CUSTOMER.gender\nFROM CUSTOMER",
    "SELECT DISTINCT CUSTOMER.gender AS customer_gender FROM CUSTOMER")

  golden("query10.sql",
    """SELECT *
      |FROM CUSTOMER,CART,CARTDETAILS,BILL
      |WHERE CUSTOMER.cid=CART.cid,CART.cartid=CARTDETAILS.cartid,CARTDETAILS.iid=BILL.iid,BILL.amount<"1000",BILL.amount>"500"
      |ORDERBY BILL.amount""".stripMargin,
    s"SELECT ${star("CUSTOMER", "CART", "CARTDETAILS", "BILL")} " +
      "FROM CUSTOMER, CART, CARTDETAILS, BILL " +
      "WHERE CUSTOMER.cid = CART.cid AND CART.cartid = CARTDETAILS.cartid " +
      "AND CARTDETAILS.iid = BILL.iid AND BILL.amount < 1000 AND BILL.amount > 500",
    orderedBy = Some("bill_amount"))

  golden("query_distinct.sql",
    "SELECT DISTINCT CUSTOMER.gender\nFROM CUSTOMER",
    "SELECT DISTINCT CUSTOMER.gender AS customer_gender FROM CUSTOMER")

  golden("query_groupby.sql",
    // the dialect's GROUPBY with a projected non-key, non-aggregate column:
    // the compiler documents the strict-SQL reading — the projected plain
    // column joins the grouping keys, making this DISTINCT (cartid, qty)
    """SELECT CARTDETAILS.cartid, CARTDETAILS.qty
      |FROM CARTDETAILS
      |GROUPBY CARTDETAILS.qty""".stripMargin,
    "SELECT DISTINCT CARTDETAILS.cartid AS cartdetails_cartid, " +
      "CARTDETAILS.qty AS cartdetails_qty FROM CARTDETAILS")
}
