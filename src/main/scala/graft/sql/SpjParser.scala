package graft.sql

/** AST + hand-written recursive-descent parser for the reference engine's
  * SPJ dialect (reference grammar: src/qp/parser/parser.cup,
  * src/qp/parser/scaner.lex):
  *
  * {{{
  * SELECT [DISTINCT] (* | attlist) FROM tablelist
  *   [WHERE cond {, cond}] [GROUPBY attlist] [ORDERBY attlist]
  * attribute := TAB.attr | MAX(a) | MIN(a) | SUM(a) | COUNT(a) | AVG(a)
  * cond      := attribute op "literal" | attribute op attribute
  * op        := < | > | <= | >= | = | !=
  * }}}
  *
  * Conditions are an implicit conjunction (comma-separated). A condition
  * between two attributes of the SAME table is a selection, not a join
  * (reference: src/qp/utils/SQLQuery.java splitConditionList).
  */
object SpjAst {
  sealed trait AggFn
  case object NoAgg extends AggFn
  case object Max extends AggFn
  case object Min extends AggFn
  case object Sum extends AggFn
  case object Count extends AggFn
  case object Avg extends AggFn

  final case class Attr(table: String, column: String, agg: AggFn = NoAgg)

  sealed trait CompOp { def sql: String }
  case object Lt extends CompOp { val sql = "<" }
  case object Gt extends CompOp { val sql = ">" }
  case object Le extends CompOp { val sql = "<=" }
  case object Ge extends CompOp { val sql = ">=" }
  case object Eq extends CompOp { val sql = "=" }
  case object Ne extends CompOp { val sql = "!=" }

  sealed trait Cond
  /** attribute-vs-quoted-literal — always a selection. */
  final case class LitCond(attr: Attr, op: CompOp, value: String) extends Cond
  /** attribute-vs-attribute — join if tables differ, else selection. */
  final case class AttrCond(lhs: Attr, op: CompOp, rhs: Attr) extends Cond

  final case class SpjQuery(
      distinct: Boolean,
      projectAll: Boolean,
      project: Seq[Attr],
      from: Seq[String],
      conditions: Seq[Cond],
      groupBy: Seq[Attr],
      orderBy: Seq[Attr]) {
    def selections: Seq[Cond] = conditions.filter {
      case _: LitCond => true
      case AttrCond(l, _, r) => l.table.equalsIgnoreCase(r.table)
    }
    def joins: Seq[AttrCond] = conditions.collect {
      case c @ AttrCond(l, _, r) if !l.table.equalsIgnoreCase(r.table) => c
    }
  }
}

final class SpjParseException(msg: String) extends RuntimeException(msg)

object SpjParser {
  import SpjAst._

  private sealed trait Tok
  private case class Ident(s: String) extends Tok
  private case class StrLit(s: String) extends Tok
  private case class Sym(s: String) extends Tok // , ( ) . * < > <= >= = !=
  private case object EofTok extends Tok

  private val keywords = Set("SELECT", "DISTINCT", "FROM", "WHERE",
    "GROUPBY", "ORDERBY", "MAX", "MIN", "SUM", "COUNT", "AVG")

  private def tokenize(in: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = in.length
    while (i < n) {
      val c = in(i)
      if (c.isWhitespace) i += 1
      else if (c == '"' || c == '\'') {
        val close = in.indexOf(c, i + 1)
        if (close < 0) throw new SpjParseException(s"unterminated literal at $i")
        out += StrLit(in.substring(i + 1, close)); i = close + 1
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (in(i).isLetterOrDigit || in(i) == '_')) i += 1
        out += Ident(in.substring(start, i))
      } else if (c.isDigit || (c == '-' && i + 1 < n && in(i + 1).isDigit)) {
        // bare numeric literal: tolerated extension (reference requires quotes)
        val start = i
        i += 1
        while (i < n && (in(i).isDigit || in(i) == '.')) i += 1
        out += StrLit(in.substring(start, i))
      } else if ((c == '<' || c == '>' || c == '!') && i + 1 < n && in(i + 1) == '=') {
        out += Sym(in.substring(i, i + 2)); i += 2
      } else if (",().*<>=".indexOf(c) >= 0) {
        out += Sym(c.toString); i += 1
      } else throw new SpjParseException(s"unexpected character '$c' at $i")
    }
    (out += EofTok).result()
  }

  def parse(sql: String): SpjQuery = new P(tokenize(sql)).query()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def expectSym(s: String): Unit = next() match {
      case Sym(`s`) => ()
      case t => throw new SpjParseException(s"expected '$s', got $t")
    }
    private def kw(k: String): Boolean = peek match {
      case Ident(s) if s.equalsIgnoreCase(k) => pos += 1; true
      case _ => false
    }
    private def ident(): String = next() match {
      case Ident(s) => s
      case t => throw new SpjParseException(s"expected identifier, got $t")
    }

    def query(): SpjQuery = {
      if (!kw("SELECT")) throw new SpjParseException("expected SELECT")
      val distinct = kw("DISTINCT")
      val (all, proj) = peek match {
        case Sym("*") => next(); (true, Nil)
        case _ => (false, attList())
      }
      if (!kw("FROM")) throw new SpjParseException("expected FROM")
      val from = idList()
      val conds = if (kw("WHERE")) condList() else Nil
      val gb = if (kw("GROUPBY")) attList() else Nil
      val ob = if (kw("ORDERBY")) attList() else Nil
      peek match {
        case EofTok => ()
        case t => throw new SpjParseException(s"trailing input: $t")
      }
      SpjQuery(distinct, all, proj, from, conds, gb, ob)
    }

    private def attList(): List[Attr] = {
      val buf = List.newBuilder[Attr]
      buf += attribute()
      while (peek == Sym(",") && isAttrAhead) { next(); buf += attribute() }
      buf.result()
    }

    // In `attlist COMMA ...` contexts a comma may also terminate the list
    // (e.g. conditions after att list is impossible in grammar, but FROM
    // list commas are handled separately) — the grammar is LL(2) here.
    private def isAttrAhead: Boolean = toks(pos + 1) match {
      case Ident(_) => true
      case _ => false
    }

    private def idList(): List[String] = {
      val buf = List.newBuilder[String]
      buf += ident()
      while (peek == Sym(",")) { next(); buf += ident() }
      buf.result()
    }

    private def condList(): List[Cond] = {
      val buf = List.newBuilder[Cond]
      buf += condition()
      while (peek == Sym(",")) { next(); buf += condition() }
      buf.result()
    }

    private def condition(): Cond = {
      val lhs = attribute()
      val op = next() match {
        case Sym("<") => Lt
        case Sym(">") => Gt
        case Sym("<=") => Le
        case Sym(">=") => Ge
        case Sym("=") => Eq
        case Sym("!=") => Ne
        case t => throw new SpjParseException(s"expected comparison op, got $t")
      }
      peek match {
        case StrLit(v) => next(); LitCond(lhs, op, v)
        case _ => AttrCond(lhs, op, attribute())
      }
    }

    private def attribute(): Attr = {
      val first = ident()
      first.toUpperCase match {
        case agg @ ("MAX" | "MIN" | "SUM" | "COUNT" | "AVG") if peek == Sym("(") =>
          expectSym("(")
          val inner = attribute()
          expectSym(")")
          val fn = agg match {
            case "MAX" => Max; case "MIN" => Min; case "SUM" => Sum
            case "COUNT" => Count; case _ => Avg
          }
          inner.copy(agg = fn)
        case _ =>
          expectSym(".")
          Attr(first, ident())
      }
    }
  }
}
