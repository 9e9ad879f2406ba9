package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Compiles an [[SpjAst.SpjQuery]] to a declarative DataFrame plan.
  *
  * This is where the reference's optimizer concerns live
  * (src/qp/optimizer/RandomOptimizer.java + PlanCost.java): instead of
  * randomized iterative improvement over join order/method, we do a greedy
  * smallest-relation-first join ordering from parquet-footer row stats and
  * emit broadcast hints for small build sides — then let Catalyst + AQE
  * finish the job (predicate pushdown, column pruning, runtime join-strategy
  * switch, skew handling). Join METHOD selection (NestedJoin vs HashJoin vs
  * BlockNested in the reference) is deliberately NOT re-implemented: that is
  * exactly what Spark's physical planning + AQE does better.
  *
  * Semantics notes vs the reference:
  *  - selections are applied per-table BEFORE joins (the reference pushes
  *    them via RandomInitialPlan too); Catalyst pushes them into the scan.
  *  - a non-aggregated projected attribute that is missing from GROUPBY is
  *    added as a grouping key (the reference's GroupBy has undefined
  *    semantics there; we choose the strict-SQL reading).
  *  - literals are coerced to the column's type (the reference compares
  *    typed tuple fields the same way).
  *  - SUM/AVG on floating columns accumulate in DECIMAL(18,6) for
  *    deterministic, order-independent totals, surfaced as DOUBLE.
  */
object SpjCompiler {
  import SpjAst._

  /** Rows below which a join side gets an explicit broadcast hint. */
  val BroadcastRows = 500000L

  /** UNCOMPRESSED bytes above which a side is never hinted, whatever its
    * row count: the broadcast lives materialized on the driver and every
    * executor, so byte width — not row count — is the real budget (500k
    * rows of wide strings can be gigabytes). 64 MB decoded keeps the
    * relation comfortably inside executor broadcast memory at any
    * realistic parallelism; AQE may still broadcast larger sides at
    * runtime if its own measured size allows.
    */
  val BroadcastBytes = 64L << 20

  def compile(
      q: SpjQuery,
      catalog: Map[String, DataFrame],
      stats: Map[String, Long] = Map.empty,
      byteStats: Map[String, Long] = Map.empty): DataFrame = {

    def lookup(name: String): DataFrame =
      catalog.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
        .getOrElse(throw new SpjParseException(s"unknown table $name"))
    def rowsOf(name: String): Long =
      stats.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
        .getOrElse(Long.MaxValue)
    // unknown byte size (no footer available) falls back to the row gate
    // alone — pre-byte-stats behavior
    def bytesOf(name: String): Long =
      byteStats.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
        .getOrElse(-1L)
    def broadcastable(name: String): Boolean =
      rowsOf(name) <= BroadcastRows &&
        (bytesOf(name) < 0L || bytesOf(name) <= BroadcastBytes)

    // Qualify every column as table_column so multi-table plans can't
    // collide; resolution below is case-insensitive on the column name.
    def qualified(name: String): DataFrame = {
      val df = lookup(name)
      df.select(df.columns.map(c =>
        col(c).as(s"${name.toLowerCase}_$c")): _*)
    }
    def colRef(dfs: Map[String, DataFrame], a: Attr): Column = {
      val df = dfs.collectFirst {
        case (k, v) if k.equalsIgnoreCase(a.table) => v
      }.getOrElse(throw new SpjParseException(s"unknown table ${a.table}"))
      val hit = df.columns.find(_.equalsIgnoreCase(
        s"${a.table.toLowerCase}_${a.column}"))
        .orElse(df.columns.find(_.split("_", 2).last.equalsIgnoreCase(a.column)))
        .getOrElse(throw new SpjParseException(
          s"unknown column ${a.table}.${a.column}"))
      col(hit)
    }
    def typeOf(a: Attr): DataType = {
      val df = lookup(a.table)
      df.schema.find(_.name.equalsIgnoreCase(a.column))
        .getOrElse(throw new SpjParseException(
          s"unknown column ${a.table}.${a.column}")).dataType
    }

    def cmp(op: CompOp)(l: Column, r: Column): Column = op match {
      case Lt => l < r; case Gt => l > r; case Le => l <= r
      case Ge => l >= r; case Eq => l === r; case Ne => l =!= r
    }

    // 1. Per-table selections, applied before any join.
    val perTableSel: Map[String, Seq[Cond]] =
      q.selections.groupBy {
        case LitCond(a, _, _) => a.table.toLowerCase
        case AttrCond(l, _, _) => l.table.toLowerCase
      }
    var rels: Map[String, DataFrame] = q.from.map { tname =>
      var df = qualified(tname)
      val one = Map(tname -> df)
      perTableSel.getOrElse(tname.toLowerCase, Nil).foreach {
        case LitCond(a, op, v) =>
          df = df.filter(cmp(op)(colRef(Map(tname -> df), a),
            lit(v).cast(typeOf(a))))
        case AttrCond(l, op, r) =>
          df = df.filter(cmp(op)(colRef(Map(tname -> df), l),
            colRef(Map(tname -> df), r)))
      }
      tname.toLowerCase -> df
    }.toMap

    // 2. Greedy smallest-first join ordering over the join graph.
    //    Components without a join condition are cross-joined last
    //    (reference: NestedJoin with no condition).
    val joins = q.joins
    var joined: Set[String] = Set.empty
    var plan: DataFrame = null
    var remaining = q.from.map(_.toLowerCase).distinct

    def joinCondsBetween(inSet: Set[String], t: String): Seq[AttrCond] =
      joins.filter { c =>
        val lt = c.lhs.table.toLowerCase; val rt = c.rhs.table.toLowerCase
        (inSet.contains(lt) && rt == t) || (inSet.contains(rt) && lt == t)
      }

    while (remaining.nonEmpty) {
      if (plan == null) {
        // seed: smallest relation that participates in a join (or smallest)
        val inJoin = remaining.filter(t => joins.exists(c =>
          c.lhs.table.equalsIgnoreCase(t) || c.rhs.table.equalsIgnoreCase(t)))
        val pool = if (inJoin.nonEmpty) inJoin else remaining
        val seed = pool.minBy(rowsOf)
        plan = rels(seed); joined = Set(seed); remaining = remaining.filterNot(_ == seed)
      } else {
        val connected = remaining.filter(t => joinCondsBetween(joined, t).nonEmpty)
        val nextT =
          if (connected.nonEmpty) connected.minBy(rowsOf)
          else remaining.minBy(rowsOf) // disconnected -> cross join
        val conds = joinCondsBetween(joined, nextT)
        val rightRaw = rels(nextT)
        val right =
          if (broadcastable(nextT)) broadcast(rightRaw) else rightRaw
        val env = (joined.map(t => t -> plan) + (nextT -> rightRaw)).toMap
        plan =
          if (conds.isEmpty) plan.crossJoin(right)
          else {
            val expr = conds.map(c =>
              cmp(c.op)(colRef(env, c.lhs), colRef(env, c.rhs))).reduce(_ && _)
            plan.join(right, expr)
          }
        joined += nextT; remaining = remaining.filterNot(_ == nextT)
      }
    }
    if (plan == null) throw new SpjParseException("empty FROM list")
    val env = joined.map(t => t -> plan).toMap

    // 3. Aggregation / projection.
    def outName(a: Attr): String = a.agg match {
      case NoAgg => s"${a.table.toLowerCase}_${a.column.toLowerCase}"
      case fn =>
        val f = fn.toString.toLowerCase
        s"${f}_${a.table.toLowerCase}_${a.column.toLowerCase}"
    }
    def isFloating(a: Attr): Boolean = typeOf(a) match {
      case DoubleType | FloatType => true
      case _ => false
    }
    def aggCol(a: Attr): Column = {
      val c = colRef(env, a)
      val agg = a.agg match {
        case Max => max(c)
        case Min => min(c)
        case Count => count(c)
        case Sum =>
          if (isFloating(a)) sum(c.cast(DecimalType(18, 6))).cast("double")
          else sum(c)
        case Avg =>
          if (isFloating(a))
            (sum(c.cast(DecimalType(18, 6))).cast("double") / count(c))
          else (sum(c).cast("double") / count(c))
        case NoAgg => throw new IllegalStateException("not an aggregate")
      }
      agg.as(outName(a))
    }

    val hasAgg = q.project.exists(_.agg != NoAgg)
    var out: DataFrame =
      if (hasAgg || (q.groupBy.nonEmpty && q.project.nonEmpty)) {
        val plainProjected = q.project.filter(_.agg == NoAgg)
        val keys = (q.groupBy ++ plainProjected)
          .map(a => a.copy(agg = NoAgg))
          .distinctBy(a => (a.table.toLowerCase, a.column.toLowerCase))
        val aggs = q.project.filter(_.agg != NoAgg).map(aggCol)
        val keyCols = keys.map(a => colRef(env, a).as(outName(a)))
        if (keys.isEmpty) plan.agg(aggs.head, aggs.tail: _*)
        else if (aggs.isEmpty)
          // GROUPBY with no aggregated projection (valid in the reference
          // dialect): grouping without aggregates is DISTINCT over the keys.
          plan.select(keyCols: _*).distinct()
            .select(q.project.map(a => col(outName(a))): _*)
        else {
          val grouped = plan.groupBy(keyCols: _*)
          grouped.agg(aggs.head, aggs.tail: _*)
            .select((q.project.map(a =>
              col(outName(a)))): _*)
        }
      } else if (q.projectAll || q.project.isEmpty) plan
      else plan.select(q.project.map(a => colRef(env, a).as(outName(a))): _*)

    if (q.distinct) out = out.distinct()
    if (q.orderBy.nonEmpty) {
      val obCols = q.orderBy.map { a =>
        val n = outName(a.copy(agg = NoAgg))
        if (out.columns.contains(n)) col(n) else colRef(env, a)
      }
      out = out.orderBy(obCols: _*)
    }
    out
  }

  /** Parse + compile + run against the parquet catalog under `dir`.
    * Loads only the tables the query references (schema reads are eager).
    */
  def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    val q = SpjParser.parse(sql)
    val names = q.from.map(_.toLowerCase).distinct
    val catalog = names.map(n => n -> Tables.load(spark, dir, n)).toMap
    val stats = names.map(n => n -> Tables.rowCount(spark, dir, n)).toMap
    val bytes = names.map(n => n -> Tables.uncompressedBytes(spark, dir, n)).toMap
    compile(q, catalog, stats, bytes)
  }
}
