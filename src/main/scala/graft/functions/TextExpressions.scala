package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling polynomial hash over a string's bytes, modulo 1e9+7:
  * h = (h*31 + byte) mod p. The pure-functions equivalent
  * (`aggregate(split(text,''), ...)`) splits the text into a char ARRAY and
  * interprets a lambda per character; this is a tight codegen'd loop over
  * the UTF8 bytes.
  *
  * Byte-level (not codepoint-level) on purpose: deterministic, allocation-
  * free, and equally content-sensitive. Matches TextOps.fingerprint for
  * ASCII; multi-byte codepoints hash per-byte instead of per-char.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xFFL)) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xFFL)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object TextExpressions {
  /** Codegen'd rolling-hash fingerprint of a string column. */
  def fingerprint(text: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(text)))
}
