package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter-stemmer scalar expression (Porter 1980, "An algorithm for
  * suffix stripping" — the classic public algorithm, implemented from the
  * published rule tables, steps 1a–5b). Stays inside whole-stage codegen
  * via the BpeCountExpr pattern: generated code calls the shared
  * [[PorterStemmer]] engine through a reference object, so the stem sits
  * in the scan stage next to the tokenizer — no UDF, no serialization
  * cliff. Every token is case-folded (ROOT locale) FIRST; non-alphabetic
  * and length ≤ 2 tokens then pass through in that folded form — e.g.
  * "X1ING" → "x1ing", not "X1ING" (deliberate: vocab-rollup callers want
  * one casing regardless of whether the suffix rules applied; the Porter
  * rules themselves are defined only over lowercase a–z words).
  */
case class PorterStemExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_porter_stem"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      PorterStemmer.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PorterStemmer.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  $cls.stem($s.toString()));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PorterStemExpr =
    copy(child = newChild)
}

/** The Porter 1980 algorithm, original formulation (no Porter2/Snowball
  * revisions): measure m over the [C](VC)^m[V] form, longest-suffix-first
  * rule matching per step, a matched suffix whose condition fails ends
  * the step (the paper's semantics — shorter suffixes are not retried).
  * Pure functions, thread-safe, executor-shared via the codegen
  * reference object.
  */
object PorterStemmer {

  def stem(word: String): String = {
    val w = word.toLowerCase(java.util.Locale.ROOT)
    val n = w.length
    if (n <= 2) return w
    var i = 0
    while (i < n) {
      val c = w.charAt(i)
      if (c < 'a' || c > 'z') return w
      i += 1
    }
    step5b(step5a(step4(step3(step2(step1c(step1b(step1a(w))))))))
  }

  private def isCons(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(s, i - 1)
    case _ => true
  }

  /** m of the stem: number of VC sequences in [C](VC)^m[V]. */
  private def measure(s: String): Int = {
    var m = 0
    var i = 0
    val n = s.length
    while (i < n && isCons(s, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(s, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && isCons(s, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (!isCons(s, i)) return true; i += 1 }
    false
  }

  private def endsDoubleCons(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      isCons(s, s.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def cvc(s: String): Boolean = {
    val n = s.length
    n >= 3 && isCons(s, n - 3) && !isCons(s, n - 2) && isCons(s, n - 1) && {
      val c = s.charAt(n - 1)
      c != 'w' && c != 'x' && c != 'y'
    }
  }

  private def stemOf(w: String, suf: String): String =
    w.substring(0, w.length - suf.length)

  /** First rule whose suffix matches wins the step (longest first within
    * the paper's per-step tables); condition failure keeps the word.
    */
  private def rules(w: String, tbl: Seq[(String, String, String => Boolean)])
      : String = {
    var i = 0
    while (i < tbl.length) {
      val (suf, rep, cond) = tbl(i)
      if (w.endsWith(suf) && w.length > suf.length) {
        val st = stemOf(w, suf)
        return if (cond(st)) st + rep else w
      }
      i += 1
    }
    w
  }

  private val always: String => Boolean = _ => true

  private def step1a(w: String): String =
    if (w.endsWith("sses")) stemOf(w, "sses") + "ss"
    else if (w.endsWith("ies")) stemOf(w, "ies") + "i"
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) stemOf(w, "s")
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      val st = stemOf(w, "eed")
      return if (measure(st) > 0) st + "ee" else w
    }
    val dropped =
      if (w.endsWith("ed") && hasVowel(stemOf(w, "ed"))) Some(stemOf(w, "ed"))
      else if (w.endsWith("ing") && hasVowel(stemOf(w, "ing")))
        Some(stemOf(w, "ing"))
      else None
    dropped match {
      case None => w
      case Some(s) =>
        if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
        else if (endsDoubleCons(s) && !"lsz".contains(s.charAt(s.length - 1)))
          s.substring(0, s.length - 1)
        else if (measure(s) == 1 && cvc(s)) s + "e"
        else s
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && hasVowel(stemOf(w, "y"))) stemOf(w, "y") + "i"
    else w

  private val S2: Seq[(String, String, String => Boolean)] = Seq(
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"))
    .sortBy(-_._1.length)
    .map { case (a, b) => (a, b, (st: String) => measure(st) > 0) }

  private def step2(w: String): String = rules(w, S2)

  private val S3: Seq[(String, String, String => Boolean)] = Seq(
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""))
    .sortBy(-_._1.length)
    .map { case (a, b) => (a, b, (st: String) => measure(st) > 0) }

  private def step3(w: String): String = rules(w, S3)

  private val S4: Seq[(String, String, String => Boolean)] = {
    val m1: String => Boolean = st => measure(st) > 1
    val ion: String => Boolean = st => measure(st) > 1 && st.nonEmpty &&
      (st.endsWith("s") || st.endsWith("t"))
    Seq("ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
      "ism", "ate", "iti", "ous", "ive", "ize", "ou", "al", "er", "ic")
      .map(s => (s, "", m1)) :+ (("ion", "", ion))
  }.sortBy(-_._1.length)

  private def step4(w: String): String = rules(w, S4)

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val st = stemOf(w, "e")
      val m = measure(st)
      if (m > 1 || (m == 1 && !cvc(st))) st else w
    } else w

  private def step5b(w: String): String =
    if (w.endsWith("ll") && measure(w) > 1) w.substring(0, w.length - 1)
    else w
}
