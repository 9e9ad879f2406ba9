package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog: maps logical table names to parquet files under a scale-factor
  * directory. Plays the role of the reference's `.det`/`.tbl` catalog
  * (reference: src/qp/utils/Schema.java, src/qp/operators/Scan.java:30) —
  * but schema comes from parquet footers and scans are columnar with
  * predicate pushdown instead of full-tuple deserialization.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The events table's `ts` encoding has varied across testdata
    * generations: NANOS-precision parquet timestamps (which Spark's
    * TimestampType (µs) cannot hold — surfaced as longs under
    * `nanosAsLong` and truncated to µs here) or µs TIMESTAMP_NTZ.
    * Branch on the footer schema so both read to the same µs-granular
    * TimestampType; sessions run in UTC, so the NTZ cast is a pure
    * reinterpretation with no wall-clock shift.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // nanos column surfaced as long
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Like [[load]], but spread across the session's shuffle parallelism.
    * The small test tables are single parquet files (one scan partition);
    * per-row-expensive expressions over them would otherwise run on one
    * core. At cluster scale with many input files this is a no-op choice —
    * prefer plain [[load]] when the source is already well-partitioned.
    */
  def loadParallel(spark: SparkSession, dir: String, name: String): DataFrame =
    spreadIfNarrow(load(spark, dir, name))

  /** Repartition `df` to the session's shuffle parallelism ONLY when its
    * scan would produce fewer partitions than that — the guard every
    * per-row-expensive operator preamble uses. A single-file local table
    * (one scan partition) gets spread so fused signature/vector work isn't
    * serialized onto one core; a 100 TB table (thousands of scan
    * partitions) passes through untouched, because an unconditional
    * `repartition()` there would exchange the full text/vector payload
    * before work the fused-expression design exists to keep in the scan
    * stage. Partition count comes from the physical plan without running
    * it (the inputs here are scans/projections — no query stages execute).
    */
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** All tables as a map — handy for the SPJ compiler's catalog. */
  def catalog(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, dir, n)).toMap

  /** Row-count statistics from parquet footers (no data scan). The analog
    * of the reference's `.stat` files (src/qp/optimizer/PlanCost.java) used
    * for join ordering. Cheap: reads only file metadata.
    */
  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    footerSum(spark, dir, name)(_.getRecordCount)

  /** UNCOMPRESSED byte size from parquet footers (sum of row-group
    * `totalByteSize` — what the data costs once decoded, which is what a
    * broadcast costs in executor memory; on-disk compressed size can be
    * 10x smaller on repetitive columns and would under-gate). Row counts
    * alone mis-size relations with wide rows: 500k rows of 2 ints
    * broadcast fine, 500k rows of 4 KB strings are 2 GB.
    */
  def uncompressedBytes(spark: SparkSession, dir: String, name: String): Long = {
    import scala.jdk.CollectionConverters._
    footerSum(spark, dir, name)(
      _.getFooter.getBlocks.asScala.map(_.getTotalByteSize).sum)
  }

  /** Distinct-value counts for the named columns — the second line of the
    * reference's `.stat` files (src/qp/optimizer/PlanCost.java reads
    * "number of distinct values per attribute" to price each join). One
    * approx_count_distinct rollup per table, memoized per
    * (dir, table, column set superset) so repeated compiles in a session
    * (SpjMain, the golden specs) pay once. HLL++ at default precision is
    * within ~2% — selectivity estimation only needs the magnitude.
    */
  def columnNdv(
      spark: SparkSession, dir: String, name: String,
      cols: Seq[String]): Map[String, Long] = {
    val key = (dir, name.toLowerCase)
    // ANALYZE artifact first (the reference's persisted `.stat` file made
    // real): a dir that `TableTools.analyze` has profiled carries every
    // column's NDV in one parquet — a repeated compile (new session, CLI
    // invocation, golden spec) then plans with ZERO stat jobs. Loaded
    // once per dir and folded into the same in-session cache; the
    // staleness contract below applies to the artifact too (re-run
    // analyze after rewriting tables).
    if (!ndvCache.contains(key)) statsFile(spark, dir).get(name.toLowerCase)
      .foreach { fromFile =>
        ndvCache.updateWith(key) {
          case Some(prev) => Some(fromFile ++ prev)
          case None       => Some(fromFile)
        }
      }
    val cached = ndvCache.get(key)
    val missing = cols.map(_.toLowerCase).distinct
      .filterNot(c => cached.exists(_.contains(c)))
    if (missing.isEmpty) cached.getOrElse(Map.empty)
    else {
      import org.apache.spark.sql.functions.approx_count_distinct
      val df = load(spark, dir, name)
      val present = missing.filter(c =>
        df.columns.exists(_.equalsIgnoreCase(c)))
      val fresh: Map[String, Long] =
        if (present.isEmpty) Map.empty
        else {
          val row = df.agg(
            approx_count_distinct(present.head).as(present.head),
            present.tail.map(c => approx_count_distinct(c).as(c)): _*
          ).head()
          present.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
        }
      // Atomic merge: a plain get-then-put loses columns when two compiles
      // race on the same (dir, table) — each would merge into its own stale
      // snapshot and the second put drops the first's columns. updateWith
      // retries on contention so both column sets land.
      // Staleness contract: entries never invalidate within a session — a
      // table REWRITTEN under the same dir feeds the join-order DP stale
      // NDVs (plan choice only, never correctness). Callers that rewrite
      // tables in-session should use a fresh dir (the tools all do).
      ndvCache.updateWith(key) {
        case Some(prev) => Some(prev ++ fresh)
        case None       => Some(fresh)
      }
      ndvCache.getOrElse(key, fresh) ++ fresh
    }
  }
  private val ndvCache =
    new scala.collection.concurrent.TrieMap[(String, String), Map[String, Long]]

  /** The per-dir ANALYZE artifact (`_graft_stats.parquet`, written by
    * `TableTools.analyze`): table → column → ndv. Read at most once per
    * dir per session; absent file memoizes as empty.
    */
  private def statsFile(
      spark: SparkSession, dir: String): Map[String, Map[String, Long]] =
    statsFileCache.getOrElseUpdate(dir, {
      import org.apache.hadoop.fs.Path
      val path = new Path(s"$dir/$StatsFileName")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) Map.empty
      else spark.read.parquet(path.toString)
        .select("table", "column", "ndv").collect()
        .groupBy(_.getString(0).toLowerCase)
        .map { case (t, rows) =>
          t -> rows.map(r => r.getString(1).toLowerCase -> r.getLong(2))
            .toMap
        }
    })
  private val statsFileCache =
    new scala.collection.concurrent.TrieMap[String, Map[String, Map[String, Long]]]
  val StatsFileName = "_graft_stats.parquet"

  /** Per-column range statistics from the ANALYZE artifact: value domain
    * [min, max] (doubles — dates as epoch days, timestamps as epoch
    * seconds) plus an equi-width histogram of non-null value counts over
    * that domain. The other half of the reference PlanCost role
    * (src/qp/optimizer/PlanCost.java): NDV prices equi-joins, min/max +
    * histogram price RANGE predicates, replacing the blanket System-R 1/3
    * with a data-derived fraction. Only ever read from the persisted
    * artifact — a dir never ANALYZEd estimates ranges at 1/3 as before
    * (plan choice only, never correctness).
    */
  final case class ColStats(
      nRows: Long, min: Double, max: Double, hist: Seq[Long])

  /** Range stats for one table from `_graft_stats.parquet`; empty when the
    * artifact is absent or predates range support. Cached per dir per
    * session; the columnNdv staleness contract applies.
    */
  def columnRanges(
      spark: SparkSession, dir: String, name: String): Map[String, ColStats] =
    rangeFileCache.getOrElseUpdate(dir, {
      import org.apache.hadoop.fs.Path
      val path = new Path(s"$dir/$StatsFileName")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) Map.empty
      else {
        val df = spark.read.parquet(path.toString)
        if (!df.columns.contains("min_val")) Map.empty // pre-range artifact
        else df.select("table", "column", "n_rows", "min_val", "max_val", "hist")
          .collect()
          .filter(r => !r.isNullAt(3) && !r.isNullAt(4))
          .groupBy(_.getString(0).toLowerCase)
          .map { case (t, rows) =>
            t -> rows.map { r =>
              r.getString(1).toLowerCase -> ColStats(
                r.getLong(2), r.getDouble(3), r.getDouble(4),
                if (r.isNullAt(5)) Seq.empty else r.getSeq[Long](5))
            }.toMap
          }
      }
    }).getOrElse(name.toLowerCase, Map.empty)
  private val rangeFileCache = new scala.collection.concurrent.TrieMap[
    String, Map[String, Map[String, ColStats]]]

  /** Drop every per-dir stats memo for `dir`. Called by
    * `TableTools.analyze`/`importStats` right after they rewrite
    * `_graft_stats.parquet`, so a compile that already priced a query in
    * this session (memoizing "artifact absent" or stale values) sees the
    * fresh artifact on its next plan instead of silently falling back to
    * the System-R 1/3 range estimate. Also clears the (dir, table) NDV
    * memos, which fold artifact values in.
    */
  def invalidateStats(dir: String): Unit = {
    statsFileCache.remove(dir)
    rangeFileCache.remove(dir)
    ndvCache.keys.filter(_._1 == dir).foreach(ndvCache.remove)
  }

  private def footerSum(spark: SparkSession, dir: String, name: String)(
      f: org.apache.parquet.hadoop.ParquetFileReader => Long): Long = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new Path(s"$dir/$name.parquet")
    val fs = path.getFileSystem(conf)
    val files = fs.listStatus(path).filter(_.getPath.getName.endsWith(".parquet"))
    val fileSeq = if (files.isEmpty) Array(fs.getFileStatus(path)) else files
    fileSeq.map { st =>
      val in = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try f(in) finally in.close()
    }.sum
  }
}
