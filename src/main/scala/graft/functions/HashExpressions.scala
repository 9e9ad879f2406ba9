package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native signature expressions for the dedup operators.
  *
  * Both replace an explode + N-statically-unrolled-aggregates + shuffle
  * pipeline (the best pure-`functions` formulation — already codegen'd,
  * but it materializes one row per (doc, gram), shuffles them, and probes
  * an aggregation hash table N times per gram) with ONE fused loop per
  * document inside the scan stage projection: no explode, no shuffle, no
  * aggregation state. At 100 TB this turns signature computation into a
  * pure map over the corpus — the banding/blocking join afterwards is the
  * only exchange left.
  *
  * Arithmetic is bit-identical to the aggregate formulation it replaced
  * (xxhash64 seed 42 truncated to 31 bits; same affine permutations mod
  * 2^31-1; same strict sign rule), so signatures — and therefore candidate
  * pairs — are unchanged.
  */

/** MinHash signature: for each of the `aParams.length` affine permutations
  * (a, b), the minimum over the document's grams of
  * `(h31(gram) * a + b) mod 2147483647`, where h31 is the low 31 bits of
  * xxhash64(gram). Input: the document's distinct gram array. Output:
  * array<long> of length numHashes (empty input => all 2^31-1 sentinels;
  * callers filter empty docs upstream to match the aggregate formulation,
  * which emitted no row).
  */
case class MinHashSig(child: Expression, aParams: Array[Long], bParams: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(aParams.length == bParams.length && aParams.nonEmpty)

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  private val prime = 2147483647L // 2^31 - 1

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = aParams.length
    val mins = Array.fill(k)(prime)
    var i = 0
    while (i < n) {
      val g = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(
        g.getBaseObject, g.getBaseOffset, g.numBytes, 42L) & 0x7FFFFFFFL
      var j = 0
      while (j < k) {
        val v = (h * aParams(j) + bParams(j)) % prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aParams, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bParams, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val g = ctx.freshName("g")
      val h = ctx.freshName("h")
      val hv = ctx.freshName("hv")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $v.numElements();
         |long[] $mins = new long[${aParams.length}];
         |java.util.Arrays.fill($mins, ${prime}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $g = $v.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $g.getBaseObject(), $g.getBaseOffset(), $g.numBytes(), 42L) & 0x7FFFFFFFL;
         |  for (int $j = 0; $j < ${aParams.length}; $j++) {
         |    long $hv = ($h * $aRef[$j] + $bRef[$j]) % ${prime}L;
         |    if ($hv < $mins[$j]) $mins[$j] = $hv;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array: bit k is set iff the sum over tokens of
  * (bit k of xxhash64(token) ? +1 : -1) is strictly positive. Empty input
  * => 0L; callers filter empty docs upstream to match the aggregate
  * formulation.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Long](64)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(
        t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var k = 0
      while (k < 64) {
        acc(k) += (if (((h >>> k) & 1L) == 1L) 1L else -1L)
        k += 1
      }
      i += 1
    }
    var sh = 0L
    var k = 0
    while (k < 64) { if (acc(k) > 0) sh |= (1L << k); k += 1 }
    sh
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val t = ctx.freshName("t")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      val sh = ctx.freshName("sh")
      s"""
         |int $n = $v.numElements();
         |long[] $acc = new long[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $t = $v.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 42L);
         |  for (int $k = 0; $k < 64; $k++) {
         |    $acc[$k] += ((($h >>> $k) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $sh = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($acc[$k] > 0) $sh |= (1L << $k);
         |}
         |${ev.value} = $sh;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Distinct word-bigram (2-shingle) set of a document, straight from the
  * raw text: tokens are maximal runs between 0x20 bytes (UTF-8 never uses
  * 0x20 inside a multi-byte sequence, so byte-level splitting is exact),
  * bigrams join adjacent tokens with one space, first occurrence wins.
  * Matches `array_distinct(zip_with(slice(tokens,1,n-1), slice(tokens,2,
  * n-1), concat_ws(" ")))` — which evaluates as an interpreted lambda
  * stack per document (CodegenFallback), a real cost on the corpus side of
  * every dedup operator. The loop here is compiled Scala invoked from
  * generated code via the companion's static forwarder.
  */
case class BigramSetExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bigram_set"

  override protected def nullSafeEval(input: Any): Any =
    BigramSetExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BigramSetExpr.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): BigramSetExpr =
    copy(child = newChild)
}

object BigramSetExpr {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    // token boundaries: maximal runs of non-space bytes
    val tokens = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) != 0x20) {
        val start = i
        while (i < bytes.length && bytes(i) != 0x20) i += 1
        tokens.add(UTF8String.fromBytes(bytes, start, i - start))
      } else i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var t = 0
    while (t + 1 < tokens.size()) {
      seen.add(UTF8String.concat(tokens.get(t), Space, tokens.get(t + 1)))
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray(new Array[UTF8String](seen.size())))
  }
}

/** Distinct word-n-gram HASH set of a document — [[BigramSetExpr]]
  * generalized to any shingle width, emitting `xxhash64(gram)` (seed 42,
  * identical to the builtin `xxhash64` on the space-joined gram string)
  * instead of the gram text. One fused loop in the scan stage: tokenize,
  * slide an n-window, hash, dedupe — no gram string ever becomes a row,
  * so the downstream inverted-index join shuffles fixed-width longs only
  * (SURVEY §5). This is the candidate generator for exact n-gram-overlap
  * contamination checks (the 13-gram standard from GPT-3-style
  * decontamination) where Jaccard similarity is the wrong question:
  * one shared long n-gram IS the leak, however dissimilar the docs.
  */
case class NGramHashSet(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hash_set"

  override protected def nullSafeEval(input: Any): Any =
    NGramHashSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NGramHashSet.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramHashSet =
    copy(child = newChild)
}

object NGramHashSet {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val tokens = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) != 0x20) {
        val start = i
        while (i < bytes.length && bytes(i) != 0x20) i += 1
        tokens.add(UTF8String.fromBytes(bytes, start, i - start))
      } else i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var t = 0
    while (t + n <= tokens.size()) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tokens.get(t + j); j += 1 }
      val gram = UTF8String.concatWs(Space, parts: _*)
      seen.add(XXH64.hashUnsafeBytes(
        gram.getBaseObject, gram.getBaseOffset, gram.numBytes, 42L))
      t += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Distinct UNDIRECTED adjacent word-pair set of a document — the
  * TextRank co-occurrence edge generator (window w=2) fused into the scan
  * stage: tokens are maximal runs between 0x20 bytes (byte-exact on UTF-8,
  * the [[BigramSetExpr]] convention), each adjacent pair is oriented
  * `(u, v) = (min, max)` by BINARY UTF8String order (identical to Spark's
  * non-collated `least`/`greatest` on strings), self-pairs (`w w`) are
  * dropped, first occurrence wins. Replaces a `posexplode` + `lead`
  * window — one exchange plus a per-doc sort over every corpus TOKEN —
  * with a pure map: the r12 verdict measured that window as the single
  * avoidable stage ahead of t47's 5 PageRank rounds.
  *
  * Output: array<struct<u string, v string>>. The per-doc dedup makes a
  * downstream global DISTINCT redundant when ids are unique (one text row
  * per id — the documents-table contract every caller here satisfies).
  */
case class AdjacentPairSetExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = AdjacentPairSetExpr.schema
  override def prettyName: String = "graft_adjacent_pair_set"

  override protected def nullSafeEval(input: Any): Any =
    AdjacentPairSetExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.AdjacentPairSetExpr.compute($s);")

  override protected def withNewChildInternal(
      newChild: Expression): AdjacentPairSetExpr =
    copy(child = newChild)
}

object AdjacentPairSetExpr {
  import org.apache.spark.sql.types.{StructField, StructType}

  val schema: ArrayType = ArrayType(StructType(Seq(
    StructField("u", StringType, nullable = false),
    StructField("v", StringType, nullable = false))), containsNull = false)

  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val tokens = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) != 0x20) {
        val start = i
        while (i < bytes.length && bytes(i) != 0x20) i += 1
        tokens.add(UTF8String.fromBytes(bytes, start, i - start))
      } else i += 1
    }
    // tokens contain no 0x20 byte, so "u v" is an injective pair key
    val seen = new java.util.HashSet[UTF8String]()
    val rows = new java.util.ArrayList[
      org.apache.spark.sql.catalyst.InternalRow]()
    var t = 0
    while (t + 1 < tokens.size()) {
      val a = tokens.get(t)
      val b = tokens.get(t + 1)
      val c = a.compareTo(b)
      if (c != 0) {
        val (u, v) = if (c < 0) (a, b) else (b, a)
        if (seen.add(UTF8String.concat(u, Space, v))) {
          rows.add(new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](u, v)))
        }
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rows.toArray(new Array[org.apache.spark.sql.catalyst.InternalRow](
        rows.size())))
  }
}

/** Word-n-gram LIST of a document — document order, WITH multiplicity —
  * the scoring-stream sibling of [[NGramHashSet]] (which is the distinct
  * blocking set). Tokens are maximal runs between 0x20 bytes (the
  * [[BigramSetExpr]] convention, byte-exact vs `filter(split(text, " "),
  * _ =!= "")`); each n-gram is the space-join of n adjacent tokens.
  * Replaces the higher-order-function formulations in TextOps
  * (`zip_with(slice, slice)` for bigrams; `transform(sequence, i =>
  * concat_ws(element_at(tokens, i+k)...))` for trigrams): Spark evaluates
  * lambda functions INTERPRETED, and the trigram form re-evaluates the
  * full `filter(split(text))` token array on EVERY `element_at` call —
  * 3·(n−2) re-tokenizations of the whole document, O(|doc|²) per row
  * (measured: the six t37 rollup map stages each spent 5–11 s single-task
  * at sf0.1 doing exactly this). One fused loop, identical output values.
  */
case class NGramList(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngram_list"

  override protected def nullSafeEval(input: Any): Any =
    NGramList.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NGramList.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramList =
    copy(child = newChild)
}

object NGramList {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val tokens = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) != 0x20) {
        val start = i
        while (i < bytes.length && bytes(i) != 0x20) i += 1
        tokens.add(UTF8String.fromBytes(bytes, start, i - start))
      } else i += 1
    }
    val m = tokens.size() - n + 1
    val out = new Array[AnyRef](if (m > 0) m else 0)
    var t = 0
    while (t < m) {
      if (n == 2) // the hot width: skip the varargs array
        out(t) = UTF8String.concat(tokens.get(t), Space, tokens.get(t + 1))
      else {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = tokens.get(t + j); j += 1 }
        out(t) = UTF8String.concatWs(Space, parts: _*)
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Count of common elements of two SORTED long arrays — one linear merge,
  * no hashing, no boxing, no result-array materialization. The verify
  * stage of the similarity joins only needs |A ∩ B| of two distinct-hash
  * sets; `size(array_intersect(ga, gb))` built a boxed hash set AND the
  * intersection array per candidate pair (measured: two ~25 s task-time
  * stages verifying d34's ~500k candidates at sf0.1). Callers sort once
  * per document at set-build time (`sort_array(collect_list(gh))`); both
  * inputs must be duplicate-free and ascending, which gram-hash SETS are
  * after sort_array.
  */
case class SortedCommonCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_common_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedCommonCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedCommonCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedCommonCount =
    copy(left = newLeft, right = newRight)
}

object SortedCommonCount {
  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Identity wrapper that reports `deterministic = false` for an expression
  * that IS deterministic in fact. Purpose (guide §4.4, the duplicated-
  * evaluation fix applied to Catalyst expressions instead of UDFs): when an
  * expensive array expression is aliased and exploded above a repartition,
  * `InferFiltersFromGenerate` adds `size(arr) > 0 AND isnotnull(arr)` below
  * the Generate, and predicate pushdown then substitutes the alias and
  * pushes the filter below the exchange — so the signature expression is
  * evaluated once per row on the pre-shuffle side AND once above it (a full
  * extra signature pass over the corpus; measured in the d02 plan as
  * `graft_bigram_set` appearing in a Filter below the spread Exchange).
  * Marking the alias non-deterministic bars substitution through the
  * Project: the inferred filter stays above, testing the cheap attribute,
  * and the expression evaluates exactly once. Correctness under retry is
  * unaffected because the wrapped expression really is deterministic.
  * Canonicalized structural equality still holds, so exchange reuse across
  * self-join sides is preserved.
  */
case class ExpensiveBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_expensive"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): ExpensiveBarrier =
    copy(child = newChild)
}

/** Membership probe against a pre-built Bloom filter sketch, usable as a
  * scan-stage prefilter: `mightContainLong` is a few XXH64 rounds against
  * a bit array — no join, no shuffle. False positives only (callers verify
  * those exactly); a `false` is definitive. The sketch rides along as a
  * codegen reference object inside the task binary, which Spark ships to
  * executors via its own (torrent-broadcast) mechanism once per stage.
  */
case class BloomMightContain(
    child: Expression, bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object HashExpressions {
  /** Codegen'd MinHash signature of a gram-array column. */
  def minHashSig(grams: Column, params: Seq[(Long, Long)]): Column =
    Bridge.column(MinHashSig(Bridge.expression(grams),
      params.map(_._1).toArray, params.map(_._2).toArray))

  /** Codegen'd 64-bit SimHash of a token-array column. */
  def simHash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  /** Codegen'd distinct word-bigram set of a string column. */
  def bigramSet(text: Column): Column =
    Bridge.column(BigramSetExpr(Bridge.expression(text)))

  /** Codegen'd distinct undirected adjacent word-pair set (TextRank
    * edges) of a string column. */
  def adjacentPairSet(text: Column): Column =
    Bridge.column(AdjacentPairSetExpr(Bridge.expression(text)))

  /** Codegen'd distinct word-n-gram xxhash64 set of a string column. */
  def ngramHashSet(text: Column, n: Int): Column =
    Bridge.column(NGramHashSet(Bridge.expression(text), n))

  /** Codegen'd word-n-gram LIST (document order, with multiplicity). */
  def ngramList(text: Column, n: Int): Column =
    Bridge.column(NGramList(Bridge.expression(text), n))

  /** Codegen'd |A ∩ B| of two sorted, duplicate-free long-array columns. */
  def sortedCommonCount(a: Column, b: Column): Column =
    Bridge.column(SortedCommonCount(
      Bridge.expression(a), Bridge.expression(b)))

  /** Wrap an actually-deterministic expensive column so the optimizer
    * cannot duplicate its evaluation below an exchange (see
    * [[ExpensiveBarrier]]).
    */
  def expensive(c: Column): Column =
    Bridge.column(ExpensiveBarrier(Bridge.expression(c)))

  /** Codegen'd Bloom-filter membership probe over a long column. */
  def bloomMightContain(
      h: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    Bridge.column(BloomMightContain(Bridge.expression(h), bloom))
}
