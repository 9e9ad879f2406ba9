package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora. Four tiers:
  *
  *  1. exact        — content-hash groupBy (shuffles only (hash, id) pairs)
  *  2. nGramJaccard — exact set-similarity via inverted-index join
  *  3. minHashLsh   — MinHash signatures + LSH banding (sub-quadratic)
  *  4. simHash      — 64-bit SimHash + pigeonhole chunk blocking
  *
  * All are DataFrame->DataFrame combinators built on codegen'd column
  * functions; none materializes a quadratic cross join. At 100 TB the
  * shuffled keys are hashes/ids, never the document text.
  */
object Dedup {

  /** Exact duplicate groups by content hash. Keeps the minimum id as the
    * canonical representative. Only (hash, id) pairs shuffle — the text
    * stays at the scan. `hashFn` defaults to md5 (oracle-portable);
    * xxhash64 is the cheaper production choice.
    */
  def exact(
      df: DataFrame,
      textCol: String,
      idCol: String,
      hashFn: Column => Column = md5(_)): DataFrame =
    df.select(hashFn(col(textCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram (word-bigram) Jaccard pairs with similarity >= tau.
    *
    * Inverted-index plan: explode each doc's distinct bigram set, self-join
    * on the bigram (candidates share >= 1 gram), count common grams per
    * pair, then test `common / (|A|+|B|-common) >= tau` by integer
    * cross-multiplication — exact, so the DuckDB oracle matches bit-for-bit.
    * A length-ratio prefilter (|A| >= tau*|B| and vice versa, necessary for
    * jaccard >= tau) prunes pairs before the similarity test.
    *
    * Scale: work is sum over grams of bucket^2 — bounded by banding on a
    * LARGER shingle when buckets are hot; for genuinely adversarial corpora
    * use [[minHashLsh]] instead.
    */
  def nGramJaccard(
      df: DataFrame,
      textCol: String,
      idCol: String,
      tauNum: Int,
      tauDen: Int): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
        explode(TextOps.bigramSet(col(textCol))).as("g"))
    val sizes = grams.groupBy("id").agg(count(lit(1)).as("n"))
    val a = grams.as("a"); val b = grams.as("b")
    val common = a.join(b, col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .filter(col("na") * tauNum <= col("nb") * tauDen &&
        col("nb") * tauNum <= col("na") * tauDen) // length-ratio prefilter
      .filter(col("c") * tauDen >= (col("na") + col("nb") - col("c")) * tauNum)
      .select(col("id_a"), col("id_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .as("jaccard"))
  }

  /** MinHash signature: for each of `numHashes` hash functions, the min of
    * `xxhash64(i || gram)` over the doc's gram set. One nested codegen'd
    * transform — O(numHashes * |grams|) per doc, no UDF.
    */
  def minHashSignature(grams: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(grams,
        g => xxhash64(concat(i.cast("string"), lit("#"), g)))))

  /** MinHash + LSH banding candidate pairs, verified by true Jaccard.
    *
    * bands * rowsPerBand minhashes; docs sharing any band bucket become
    * candidates (the only join is on (band, bucketHash) — sub-quadratic);
    * candidates are then verified with exact bigram Jaccard >= tauNum/tauDen.
    * Returns (id_a, id_b, jaccard) like [[nGramJaccard]] minus LSH misses.
    */
  def minHashLsh(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bands: Int,
      rowsPerBand: Int,
      tauNum: Int,
      tauDen: Int): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSig = df.select(col(idCol).as("id"),
        TextOps.bigramSet(col(textCol)).as("grams"))
      .filter(size(col("grams")) > 0)
      .withColumn("sig", minHashSignature(col("grams"), numHashes))
    // band j's bucket key = hash of the signature slice [j*r, (j+1)*r);
    // bands are statically unrolled so slice offsets are literals
    val bandCols = (0 until bands).map { j =>
      struct(lit(j).as("band"),
        xxhash64(lit(j),
          concat_ws(",", slice(col("sig"), j * rowsPerBand + 1, rowsPerBand)))
          .as("bucket"))
    }
    val banded = withSig.select(col("id"), col("grams"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("grams"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val l = banded.as("l"); val r = banded.as("r")
    val cand = l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.grams").as("ga"), col("r.grams").as("gb"))
      .dropDuplicates("id_a", "id_b")
    // exact verification on the candidate set only
    val c = size(array_intersect(col("ga"), col("gb")))
    val union = size(col("ga")) + size(col("gb")) - c
    cand.withColumn("c", c).withColumn("u", union)
      .filter(col("c") * tauDen >= col("u") * tauNum)
      .select(col("id_a"), col("id_b"),
        (col("c").cast("double") / col("u")).as("jaccard"))
  }

  /** 64-bit SimHash of the token multiset: bit k of the hash is 1 iff the
    * sum over tokens of (bit k of xxhash64(token) ? +1 : -1) is positive.
    * Pure aggregate/zip_with — codegen'd, no UDF.
    */
  def simHash(text: Column): Column = {
    val bitVotes = aggregate(
      TextOps.tokens(text),
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, k) => a + when(bit_get(h, k) === 1, lit(1L)).otherwise(lit(-1L)))
      })
    // static unroll: bit k set iff vote k positive (1L << 63 wraps to the
    // long sign bit, which is exactly bit 63)
    (0 until 64).map { k =>
      when(element_at(bitVotes, k + 1) > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Near-dup pairs with Hamming distance <= maxHamming between 64-bit
    * SimHashes. Pigeonhole blocking: split the hash into `maxHamming + 1`
    * 16-bit chunks — any pair within the distance budget must agree on at
    * least one chunk, so the only join is on (chunkIdx, chunkValue).
    */
  def simHashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4 chunks of 16 bits support maxHamming <= 3")
    val hashed = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sh"))
    val chunkCols = (0 until 4).map { i =>
      struct(lit(i).as("chunk"),
        shiftright(col("sh"), i * 16).bitwiseAND(lit(0xFFFFL)).as("cv"))
    }
    val chunked = hashed.select(col("id"), col("sh"),
        explode(array(chunkCols: _*)).as("cc"))
      .select(col("id"), col("sh"),
        col("cc.chunk").as("chunk"), col("cc.cv").as("cv"))
    val l = chunked.as("l"); val r = chunked.as("r")
    l.join(r, col("l.chunk") === col("r.chunk") && col("l.cv") === col("r.cv") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.sh").bitwiseXOR(col("r.sh"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }
}
