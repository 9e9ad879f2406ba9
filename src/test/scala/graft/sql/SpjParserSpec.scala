package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import SpjAst._

/** Golden parses of the reference dialect — each case mirrors the shape of
  * a file in the reference's test-queries/ directory.
  */
class SpjParserSpec extends AnyFunSuite {

  test("star + single table (query1.sql shape)") {
    val q = SpjParser.parse("SELECT * FROM CUSTOMER")
    assert(q.projectAll && q.from == List("CUSTOMER") && q.conditions.isEmpty)
  }

  test("string-literal selection (query2.sql shape)") {
    val q = SpjParser.parse(
      """SELECT CUSTOMER.cid,CUSTOMER.gender,CUSTOMER.firstname
        |FROM CUSTOMER
        |WHERE CUSTOMER.gender="1"""".stripMargin)
    assert(q.project == List(Attr("CUSTOMER", "cid"),
      Attr("CUSTOMER", "gender"), Attr("CUSTOMER", "firstname")))
    assert(q.conditions == List(LitCond(Attr("CUSTOMER", "gender"), Eq, "1")))
    assert(q.selections.size == 1 && q.joins.isEmpty)
  }

  test("2-way join (query3.sql shape)") {
    val q = SpjParser.parse(
      """SELECT CUSTOMER.cid, CART.cartid
        |FROM CUSTOMER,CART
        |WHERE CUSTOMER.cid=CART.cid""".stripMargin)
    assert(q.joins == List(AttrCond(Attr("CUSTOMER", "cid"), Eq,
      Attr("CART", "cid"))))
  }

  test("4-way join chain + range + ORDERBY (query10.sql shape)") {
    val q = SpjParser.parse(
      """SELECT *
        |FROM CUSTOMER,CART,CARTDETAILS,BILL
        |WHERE CUSTOMER.cid=CART.cid,CART.cartid=CARTDETAILS.cartid,
        |CARTDETAILS.iid=BILL.iid,BILL.amount<"1000",BILL.amount>"500"
        |ORDERBY BILL.amount""".stripMargin)
    assert(q.joins.size == 3 && q.selections.size == 2)
    assert(q.orderBy == List(Attr("BILL", "amount")))
  }

  test("aggregate + GROUPBY (query8.sql shape)") {
    val q = SpjParser.parse(
      """SELECT CUSTOMER.gender,MAX(BILL.amount)
        |FROM CUSTOMER,BILL
        |WHERE CUSTOMER.cid=BILL.cid,BILL.amount<"1000"
        |GROUPBY CUSTOMER.gender""".stripMargin)
    assert(q.project == List(Attr("CUSTOMER", "gender"),
      Attr("BILL", "amount", Max)))
    assert(q.groupBy == List(Attr("CUSTOMER", "gender")))
  }

  test("DISTINCT (query_distinct.sql shape)") {
    val q = SpjParser.parse("SELECT DISTINCT CUSTOMER.gender FROM CUSTOMER")
    assert(q.distinct)
  }

  test("same-table attr-pair condition is a selection, not a join") {
    val q = SpjParser.parse(
      "SELECT T.a FROM T, S WHERE T.a = T.b, T.x = S.y")
    assert(q.selections == List(AttrCond(Attr("T", "a"), Eq, Attr("T", "b"))))
    assert(q.joins == List(AttrCond(Attr("T", "x"), Eq, Attr("S", "y"))))
  }

  test("all six comparison operators") {
    val q = SpjParser.parse(
      """SELECT T.a FROM T WHERE T.a<"1",T.b>"2",T.c<="3",T.d>="4",T.e="5",T.f!="6"""")
    val ops = q.conditions.collect { case LitCond(_, op, _) => op }
    assert(ops == List(Lt, Gt, Le, Ge, Eq, Ne))
  }

  test("GROUPBY + ORDERBY together") {
    val q = SpjParser.parse(
      "SELECT T.a, SUM(T.b) FROM T GROUPBY T.a ORDERBY T.a")
    assert(q.groupBy == List(Attr("T", "a")) &&
      q.orderBy == List(Attr("T", "a")))
  }

  test("syntax errors raise SpjParseException") {
    assertThrows[SpjParseException](SpjParser.parse("SELECT FROM T"))
    assertThrows[SpjParseException](SpjParser.parse("SELECT T.a T"))
    assertThrows[SpjParseException](SpjParser.parse("SELECT T.a FROM T WHERE T.a ="))
    assertThrows[SpjParseException](SpjParser.parse("""SELECT T.a FROM T WHERE T.a = "x"""" + " extra"))
  }
}
