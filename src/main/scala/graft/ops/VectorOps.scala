package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding-vector similarity operators.
  *
  * Arithmetic design: components are quantized to integers
  * (`round(x * 1000)` held in doubles). Sums of small integers are EXACT in
  * IEEE double regardless of association order, so dot products and norms
  * are bit-identical between Spark's partial aggregation and any oracle —
  * cosine = dot / sqrt(na*nb) then differs by zero, making similarity
  * thresholds and top-k orderings deterministic.
  *
  * All expressions are codegen'd column functions (zip_with/aggregate);
  * no UDFs.
  */
object VectorOps {

  /** Quantize a float-array embedding to integer-valued doubles. */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, x => round(x.cast("double") * scale))

  /** Exact dot product of two quantized vectors (order-independent —
    * integer-valued doubles sum exactly). Custom codegen'd expression:
    * the zip_with/aggregate equivalent is CodegenFallback and ~100x
    * slower on the pairwise hot path.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** Squared L2 norm of a quantized vector. */
  def norm2(v: Column): Column = dot(v, v)

  /** Spread rows across the session's shuffle parallelism: similarity
    * inputs are often a single small parquet file (one scan partition),
    * which would serialize all per-row vector math onto one core.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get(
      "spark.sql.shuffle.partitions").toInt)

  /** Cosine similarity from quantized vectors + precomputed squared norms. */
  def cosine(dotAb: Column, n2a: Column, n2b: Column): Column =
    dotAb / sqrt(n2a * n2b)

  /** All pairs (id_a < id_b) with cosine >= tau. Exact brute force over the
    * pair space — the verification baseline. The 100 TB path is
    * [[lshBuckets]]-blocked candidates or MinHash-style banding; this
    * operator exists to define ground truth and for modest corpus sizes.
    */
  def cosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double): DataFrame = {
    val q = spread(df)
      .select(col(idCol).as("id"), quantize(col(vecCol)).as("q"))
      .withColumn("n2", norm2(col("q")))
    val a = q.as("a"); val b = q.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(dot(col("a.q"), col("b.q")), col("a.n2"), col("b.n2"))
          .as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Brute-force cosine top-k: for each probe (subset of df), the k nearest
    * corpus vectors by cosine, ties broken by corpus id. One shuffle for
    * the window; probe set is broadcast.
    */
  def knnBrute(
      probes: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), quantize(col(vecCol)).as("pq"))
      .withColumn("pn2", norm2(col("pq")))
    val c = spread(corpus)
      .select(col(idCol).as("corpus_id"), quantize(col(vecCol)).as("cq"))
      .withColumn("cn2", norm2(col("cq")))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("corpus_id"))
      .select(col("probe_id"), col("corpus_id"),
        cosine(dot(col("pq"), col("cq")), col("pn2"), col("cn2")).as("cos"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Random-hyperplane LSH bucket id: `planes` sign bits packed into a
    * long. Plane p's normal has pseudo-random +-1 components derived from
    * xxhash64(p, i) — deterministic, no stored model.
    */
  def lshBucket(qvec: Column, planes: Int): Column = {
    // statically unrolled over planes so bit shifts are literal
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(qvec, sequence(lit(1), size(qvec)), (x, i) =>
          x * when(pmod(xxhash64(lit(p), i), lit(2)) === 0,
            lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k: corpus hashed once; probes multi-probe
    * their bucket plus all single-bit flips (planes+1 buckets), then exact
    * cosine top-k within the candidate union. The join key is the bucket id
    * — sub-quadratic, shuffle-light; recall tunable via `planes`.
    */
  def knnLsh(
      probes: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Int = 12): DataFrame = {
    val c = spread(corpus)
      .select(col(idCol).as("corpus_id"), quantize(col(vecCol)).as("cq"))
      .withColumn("cn2", norm2(col("cq")))
      .withColumn("bucket", lshBucket(col("cq"), planes))
    val p0 = probes.select(col(idCol).as("probe_id"), quantize(col(vecCol)).as("pq"))
      .withColumn("pn2", norm2(col("pq")))
      .withColumn("b0", lshBucket(col("pq"), planes))
    // multi-probe: own bucket + single-bit flips
    val flipped = (0 until planes).map(i =>
      col("b0").bitwiseXOR(lit(1L << i)))
    val p = p0.select(col("probe_id"), col("pq"), col("pn2"),
      explode(array((col("b0") +: flipped): _*)).as("bucket"))
    val scored = c.join(broadcast(p), "bucket")
      .filter(col("probe_id") =!= col("corpus_id"))
      .dropDuplicates("probe_id", "corpus_id")
      .select(col("probe_id"), col("corpus_id"),
        cosine(dot(col("pq"), col("cq")), col("pn2"), col("cn2")).as("cos"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
