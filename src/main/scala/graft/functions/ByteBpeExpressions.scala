package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BYTE-level BPE (the GPT-2-style tokenizer family — Radford et al.
  * 2019; Sennrich et al. 2016 merges over a 256-entry byte alphabet).
  * The alpha-run BPE ([[BpeCountExpr]]) treats every non-alpha glyph as
  * one opaque token, so CJK/emoji/accented text inflates counts and its
  * id space diverges from any real model's; byte fallback makes EVERY
  * string tokenizable with zero OOV symbols: the base alphabet is the
  * 256 byte values, merges build multi-byte symbols bottom-up, and
  * decode(encode(s)) == s for arbitrary input by construction.
  *
  * Symbols are represented as ISO-8859-1 (latin-1) strings — the unique
  * 8-bit charset whose char i ↔ byte i round-trip is total — so the
  * merge machinery shares the string-keyed shape of the alpha-run
  * engine while operating on raw UTF-8 bytes. Pair keys use the
  * `Ā` separator (one past the byte range, so it can never occur
  * inside a symbol; the alpha engine's space separator is unusable here
  * because byte 0x20 IS a symbol).
  */
object BytePretok {

  /** GPT-2-style pretokenization (the regex
    * ` ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+`, hand-rolled
    * over codepoints so trainer and encoder share ONE implementation
    * and no regex-dialect parity question exists): letter runs, number
    * runs, and other-glyph runs each claim one optional LEADING literal
    * space 0x20 — and ONLY 0x20, exactly the regex's ` ?`; a tab or
    * newline immediately before content stands as its own pretoken
    * (spaces are part of tokens — byte-level BPE encodes whitespace).
    * A longer whitespace run followed by content emits all but its last
    * char as one whitespace pretoken (`\s+(?!\S)` backtracks one), then
    * the last char follows the single-char rule above; a trailing run
    * is emitted whole. Concatenating the pretokens reproduces the input
    * exactly (the lossless-round-trip precondition).
    */
  def split(s: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    val n = s.length
    var i = 0
    while (i < n) {
      var start = i
      var c = s.codePointAt(i)
      if (Character.isWhitespace(c)) {
        var e = i
        while (e < n && Character.isWhitespace(s.codePointAt(e)))
          e += Character.charCount(s.codePointAt(e))
        if (e == n) { out.add(s.substring(start, e)); i = e }
        else if (e - start == 1) {
          if (s.charAt(start) == ' ') {
            // single literal space: attaches as the next pretoken's
            // leading char (the regex's ` ?`)
            i += 1
            c = s.codePointAt(i)
            out.add(s.substring(start, runEnd(s, i, c)))
            i = runEnd(s, i, c)
          } else {
            // single non-space whitespace (\t, \n, …): its own pretoken
            // — ` ?` never matches it
            out.add(s.substring(start, e))
            i = e
          }
        } else {
          // longer run: all but the last whitespace char is one token
          out.add(s.substring(start, e - 1))
          i = e - 1
          // next iteration sees a single trailing space + content
        }
      } else {
        out.add(s.substring(start, runEnd(s, i, c)))
        i = runEnd(s, i, c)
      }
    }
    out
  }

  /** End of the maximal same-category run starting at `i` (category of
    * codepoint `c`): letters, numbers, or other-non-whitespace.
    */
  private def runEnd(s: String, i: Int, c: Int): Int = {
    val n = s.length
    var e = i
    if (Character.isLetter(c)) {
      while (e < n && Character.isLetter(s.codePointAt(e)))
        e += Character.charCount(s.codePointAt(e))
    } else if (Character.isDigit(c)) {
      while (e < n && Character.isDigit(s.codePointAt(e)))
        e += Character.charCount(s.codePointAt(e))
    } else {
      while (e < n && {
        val d = s.codePointAt(e)
        !Character.isWhitespace(d) && !Character.isLetter(d) &&
          !Character.isDigit(d)
      }) e += Character.charCount(s.codePointAt(e))
    }
    e
  }

  /** UTF-8 bytes of a pretoken as the latin-1 symbol string. */
  def toSymbols(pretoken: String): String =
    new String(pretoken.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Inverse of [[toSymbols]] over a concatenation of symbols. */
  def fromSymbols(symbols: String): String =
    new String(
      symbols.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
      java.nio.charset.StandardCharsets.UTF_8)
}

/** Pretokens of a document as an array — the trainer's rollup unit
  * (explode → groupBy count), emitted by the SAME [[BytePretok.split]]
  * the executor encoder uses, so the trained frequency table and the
  * encode path can never disagree on segmentation.
  */
case class BytePretokensExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_byte_pretokens"

  override protected def nullSafeEval(input: Any): Any =
    BytePretokensExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BytePretokensExpr.compute($s);")

  override protected def withNewChildInternal(
      newChild: Expression): BytePretokensExpr = copy(child = newChild)
}

object BytePretokensExpr {
  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = BytePretok.split(text.toString)
    val arr = new Array[AnyRef](toks.size())
    var i = 0
    while (i < arr.length) {
      arr(i) = UTF8String.fromString(toks.get(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

/** Deterministic id space for byte-level symbols: a single-char symbol's
  * id is its byte value (0..255), and the i-th merge's output symbol is
  * `256 + i` — corpus-independent given the merge table (the
  * [[BpeVocab]] convention without `</w>`; when two distinct merge
  * pairs concatenate to the same string, the FIRST merge keeps the id).
  */
object ByteBpeVocab {
  val Base = 256

  def outputRanks(
      merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      if (!m.containsKey(a + b)) m.put(a + b, i)
    }
    m
  }

  /** id → latin-1 symbol string decode table (for round-trip checks and
    * trainer-side audits; executors never need it).
    */
  def decodeTable(merges: Seq[(String, String)]): Array[String] = {
    val out = new Array[String](Base + merges.size)
    var i = 0
    while (i < Base) { out(i) = String.valueOf(i.toChar); i += 1 }
    merges.zipWithIndex.foreach { case ((a, b), j) => out(Base + j) = a + b }
    out
  }
}

/** Executor-side byte-level BPE engine: greedy lowest-rank merge loop
  * over latin-1 symbol strings (the [[BpeEncoder]] loop with byte
  * alphabet, no `</w>`, `Ā`-separated pair keys), memoized per
  * pretoken (Zipf) with the family's bounded-clear convention.
  */
final class ByteBpe(merges: Seq[(String, String)]) extends Serializable {

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + 'Ā' + b, i)
    }
    m
  }
  @transient private lazy val outRank = ByteBpeVocab.outputRanks(merges)

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()

  def encode(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(encodeIds(text))

  def count(text: UTF8String): Int = {
    val toks = BytePretok.split(text.toString)
    var total = 0
    var i = 0
    while (i < toks.size()) {
      total += pretokenIds(toks.get(i)).length
      i += 1
    }
    total
  }

  private def encodeIds(text: UTF8String): Array[Int] = {
    val toks = BytePretok.split(text.toString)
    val out = new java.util.ArrayList[Integer](64)
    var i = 0
    while (i < toks.size()) {
      val ids = pretokenIds(toks.get(i))
      var j = 0
      while (j < ids.length) { out.add(ids(j)); j += 1 }
      i += 1
    }
    val arr = new Array[Int](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j).intValue; j += 1 }
    arr
  }

  private def pretokenIds(p: String): Array[Int] = {
    if (memo.size > (1 << 20)) memo.clear()
    memo.computeIfAbsent(p, encodePretoken)
  }

  private val encodePretoken: java.util.function.Function[String, Array[Int]] =
    new java.util.function.Function[String, Array[Int]] with Serializable {
      override def apply(p: String): Array[Int] = {
        val w = BytePretok.toSymbols(p)
        val syms = new java.util.ArrayList[String](w.length)
        var i = 0
        while (i < w.length) {
          syms.add(String.valueOf(w.charAt(i)))
          i += 1
        }
        var continue = true
        while (continue && syms.size > 1) {
          var best = -1
          var bestRank = Int.MaxValue
          var j = 0
          while (j + 1 < syms.size) {
            val r = rank.get(syms.get(j) + 'Ā' + syms.get(j + 1))
            if (r != null && r < bestRank) { bestRank = r; best = j }
            j += 1
          }
          if (best < 0) continue = false
          else {
            syms.set(best, syms.get(best) + syms.get(best + 1))
            syms.remove(best + 1)
          }
        }
        val out = new Array[Int](syms.size)
        var k = 0
        while (k < out.length) {
          val s = syms.get(k)
          out(k) =
            if (s.length == 1) s.charAt(0).toInt
            else ByteBpeVocab.Base + outRank.get(s).intValue
          k += 1
        }
        out
      }
    }
}

/** Exact token count under trained byte-level merges — the byte twin of
  * [[BpeCountExpr]]; `size` of [[ByteBpeEncodeExpr]] equals this by a
  * shared engine.
  */
case class ByteBpeCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_byte_bpe_count"

  @transient private lazy val engine = new ByteBpe(merges)

  override protected def nullSafeEval(input: Any): Any =
    engine.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpe", new ByteBpe(merges),
      classOf[ByteBpe].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.count($s);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ByteBpeCountExpr = copy(child = newChild)
}

/** Tokenize to training ids under trained byte-level merges — the emit
  * step whose decode is total: every id is a byte or a merge output, so
  * concatenating decoded symbols reproduces the exact input bytes
  * (spec-pinned on multilingual text the alpha-run engine cannot
  * represent).
  */
case class ByteBpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_byte_bpe_encode"

  @transient private lazy val engine = new ByteBpe(merges)

  override protected def nullSafeEval(input: Any): Any =
    engine.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpe", new ByteBpe(merges),
      classOf[ByteBpe].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.encode($s);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ByteBpeEncodeExpr = copy(child = newChild)
}
