package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BigramSetExpr, DotProduct, NGramHashSet, NfkcFoldExpr, RollingHash, SignPack, SimHash64, TokenStatsExpr}

/** SparkSessionExtensions hook registering graft's native expressions as
  * SQL functions, so `spark.sql("SELECT graft_dot(a, b)")` works anywhere
  * (including pure-SQL deployments):
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftExtensions {

  private type Builder = Seq[Expression] => Expression

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(children(0), children(1))
      }),
    (FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_fingerprint(text)")
        RollingHash(children.head)
      }),
    (FunctionIdentifier("graft_signpack"),
      new ExpressionInfo(classOf[SignPack].getName, "graft_signpack"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_signpack(vec, planesLiteral)")
        val planes = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_signpack planes must be an integer literal, got $other")
        }
        SignPack(children.head, planes)
      }),
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_simhash64(tokenArray)")
        SimHash64(children.head)
      }),
    (FunctionIdentifier("graft_bigram_set"),
      new ExpressionInfo(classOf[BigramSetExpr].getName, "graft_bigram_set"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_bigram_set(text)")
        BigramSetExpr(children.head)
      }),
    (FunctionIdentifier("graft_token_stats"),
      new ExpressionInfo(classOf[TokenStatsExpr].getName, "graft_token_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_token_stats(text)")
        TokenStatsExpr(children.head)
      }),
    (FunctionIdentifier("graft_nfkc_fold"),
      new ExpressionInfo(classOf[NfkcFoldExpr].getName, "graft_nfkc_fold"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_nfkc_fold(text)")
        NfkcFoldExpr(children.head)
      }),
    (FunctionIdentifier("graft_ngram_hash_set"),
      new ExpressionInfo(classOf[NGramHashSet].getName, "graft_ngram_hash_set"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_ngram_hash_set(text, nLiteral)")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_ngram_hash_set n must be an integer literal, got $other")
        }
        NGramHashSet(children.head, n)
      }),
    // composed Column operators exposed to pure SQL: the builder expands
    // the same expression tree the DataFrame API produces, so SQL and
    // DataFrame callers are bit-identical by construction
    (FunctionIdentifier("graft_quality_score"),
      new ExpressionInfo("graft.ops.TextOps", "graft_quality_score"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_quality_score(text)")
        asExpr(graft.ops.TextOps.qualityScore(asCol(children.head)))
      }),
    (FunctionIdentifier("graft_lang_id"),
      new ExpressionInfo("graft.ops.TextOps", "graft_lang_id"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_lang_id(text)")
        asExpr(graft.ops.TextOps.langId(asCol(children.head)))
      }),
    (FunctionIdentifier("graft_gopher_pass"),
      new ExpressionInfo("graft.ops.TextOps", "graft_gopher_pass"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "graft_gopher_pass(text, minWords, maxWords, minStops)")
        val Seq(minW, maxW, minS) = children.tail.map(intLit(
          "graft_gopher_pass bounds must be integer literals", _))
        asExpr(graft.ops.TextOps.gopherPass(
          asCol(children.head), minW, maxW, minS))
      }),
    (FunctionIdentifier("graft_c4_clean"),
      new ExpressionInfo("graft.ops.TextOps", "graft_c4_clean"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_c4_clean(text, minLineWords)")
        asExpr(graft.ops.TextOps.c4CleanText(asCol(children.head),
          intLit("graft_c4_clean minLineWords must be an integer literal",
            children(1))))
      }),
    (FunctionIdentifier("graft_dedup_doc_lines"),
      new ExpressionInfo("graft.ops.TextOps", "graft_dedup_doc_lines"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_dedup_doc_lines(text)")
        asExpr(graft.ops.TextOps.dedupDocLines(asCol(children.head)))
      }))

  private def asCol(e: Expression) =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def asExpr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.Bridge.unresolvedExpression(c)
  private def intLit(msg: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
      v.toInt
    case other => throw new IllegalArgumentException(s"$msg, got $other")
  }

  /** Registers graft's SQL functions on an already-running session (the
    * config-based extension only affects sessions built after
    * spark.sql.extensions is set).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge
        .registerFunction(spark, id, info, builder)
    }
}
