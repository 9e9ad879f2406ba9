package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization (Schuster & Nakajima 2012; the BERT family's
  * tokenizer — Devlin et al. 2019) — the fourth production tokenizer
  * beside alpha BPE (t17), unigram-LM (t25), and byte-level BPE (t32).
  * Two halves, both deterministic:
  *
  *  - TRAINING picks merges like BPE but scores a pair by LIKELIHOOD
  *    GAIN `count(ab) / (count(a)·count(b))` instead of raw frequency —
  *    a rare pair whose halves appear nowhere else merges before a
  *    frequent pair of promiscuous symbols (the property WordPieceSpec
  *    pins). Lives in `TextOps.trainWordPieceVocab` (driver loop over
  *    the bounded word-frequency head, the trainBpeMerges shape).
  *  - ENCODING is greedy longest-match-first: the longest vocab prefix
  *    wins at each position, continuation pieces carry the `##` marker,
  *    and a word with ANY un-matchable remainder becomes ONE `[UNK]`
  *    (BERT's whole-word-UNK rule — never a partial emit).
  *
  * Segmentation matches the alpha-BPE convention so counts are directly
  * comparable: alpha runs are words, each digit or non-alpha glyph is
  * its own single-char piece (UNK when out of vocabulary), spaces are
  * none. Ids are vocabulary indices — `[UNK]` is always id 0, so the id
  * space is total and two jobs sharing a vocab table agree.
  *
  * Per-executor scaling mirrors [[BpeCounter]]: the vocab ships once
  * per executor inside the referenced engine, word encodes memoize in a
  * bounded concurrent map, and the generated-code hot path is one
  * virtual call inside whole-stage codegen.
  */
final class WordPieceEncoder(vocab: Seq[String]) extends Serializable {

  @transient private lazy val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.zipWithIndex.foreach { case (p, i) => m.put(p, i) }
    m
  }

  @transient private lazy val maxPieceLen: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()

  val unkId: Int = 0 // trainer always emits [UNK] first

  /** Ids for one alpha word — `Array(unkId)` when any position fails. */
  def encodeWord(w: String): Array[Int] = {
    if (memo.size > (1 << 20)) memo.clear() // Zipf makes overflow rare
    memo.computeIfAbsent(w, encodeFn)
  }

  private val encodeFn: java.util.function.Function[String, Array[Int]] =
    new java.util.function.Function[String, Array[Int]] with Serializable {
      override def apply(w: String): Array[Int] = {
        val out = new java.util.ArrayList[Integer](4)
        var i = 0
        while (i < w.length) {
          val pre = if (i == 0) "" else "##"
          val cap = math.min(w.length, i + maxPieceLen)
          var j = cap
          var hit = -1
          while (j > i && hit < 0) {
            val id = ids.get(pre + w.substring(i, j))
            if (id != null) hit = id.intValue else j -= 1
          }
          if (hit < 0) return Array(unkId) // whole-word UNK, never partial
          out.add(hit)
          i = j
        }
        val a = new Array[Int](out.size)
        var k = 0
        while (k < a.length) { a(k) = out.get(k).intValue; k += 1 }
        a
      }
    }

  /** Token ids of a document under the alpha-word segmentation. */
  def encode(text: UTF8String): Array[Int] = {
    val s = text.toString
    val n = s.length
    val out = new java.util.ArrayList[Integer](n / 4 + 1)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
        val start = i
        while (i < n && {
          val d = s.charAt(i)
          (d >= 'A' && d <= 'Z') || (d >= 'a' && d <= 'z')
        }) i += 1
        encodeWord(s.substring(start, i)).foreach(id => out.add(id))
      } else {
        if (c != ' ') { // digit or glyph: one piece; space: none
          val id = ids.get(String.valueOf(c))
          out.add(if (id != null) id.intValue else unkId)
        }
        i += 1
      }
    }
    val a = new Array[Int](out.size)
    var k = 0
    while (k < a.length) { a(k) = out.get(k).intValue; k += 1 }
    a
  }

  def count(text: UTF8String): Int = encode(text).length
}

/** Exact per-document WordPiece token count — see [[WordPieceEncoder]]. */
case class WordPieceCountExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_wordpiece_count"

  @transient private lazy val enc = new WordPieceEncoder(vocab)

  override protected def nullSafeEval(input: Any): Any =
    enc.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpEncoder", new WordPieceEncoder(vocab),
      classOf[WordPieceEncoder].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.count($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceCountExpr =
    copy(child = newChild)
}

/** Document → WordPiece training ids — see [[WordPieceEncoder]]. */
case class WordPieceEncodeExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_encode"

  @transient private lazy val enc = new WordPieceEncoder(vocab)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(enc.encode(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpEncoder", new WordPieceEncoder(vocab),
      classOf[WordPieceEncoder].getName)
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev,
      s => s"${ev.value} = new $gad($ref.encode($s));")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeExpr =
    copy(child = newChild)
}
