package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data tooling analogs of the reference repo's utilities:
  *
  *  - [[RandomTableGen]] ~ reference src/RandomDB.java (generate a random
  *    table from a schema spec)
  *  - [[CsvToParquet]]   ~ reference src/ConvertTxtToTbl.java (convert a
  *    delimited text table into the engine's native format)
  *
  * Both emit parquet — the engine's native storage — partitioned for
  * parallel reads, instead of the reference's single serialized .tbl file.
  */
object TableTools {

  /** One `_graft_stats.parquet` artifact row (see [[analyze]]): NDV +
    * n_rows for every column; min/max/histogram only for orderable ones.
    */
  final case class StatRow(
      table: String, column: String, ndv: Long, n_rows: Long,
      min_val: Option[Double], max_val: Option[Double],
      hist: Option[Seq[Long]])

  /** Schema spec mini-language matching the reference's .det type system
    * (INT, STRING, REAL, TIME — reference src/qp/utils/Attribute.java):
    * `"id:INT,name:STRING,price:REAL,created:TIME"`.
    */
  def parseSchema(spec: String): Seq[(String, String)] =
    spec.split(",").toSeq.map { f =>
      val Array(n, t) = f.trim.split(":")
      (n.trim, t.trim.toUpperCase)
    }

  /** Deterministic random table as a DataFrame: seeded per-column hashes of
    * the row id — reproducible, generated distributed (no driver loop).
    */
  def randomTable(
      spark: SparkSession,
      spec: String,
      rows: Long,
      seed: Long = 42L,
      partitions: Int = 0): DataFrame = {
    val nPart = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = spark.range(0, rows, 1, nPart)
    val cols = parseSchema(spec).map { case (name, tpe) =>
      val h = pmod(xxhash64(col("id"), lit(seed), lit(name)), lit(1000000L))
      val c = tpe match {
        case "INT" => h.cast("int")
        case "REAL" => (h.cast("double") / 100.0)
        case "STRING" => concat(lit(name.take(3)), lit("_"), h.cast("string"))
        case "TIME" =>
          timestamp_seconds(lit(1704067200L) + pmod(h, lit(31536000L)))
        case other => throw new IllegalArgumentException(
          s"unknown type $other (expected INT|STRING|REAL|TIME)")
      }
      c.as(name)
    }
    base.select(cols: _*)
  }

  /** Write a table bucketed (and sorted) by a join/grouping key.
    *
    * Bucketing is the storage-level analog of the reference engine's
    * partition-on-key hash join (reference src/qp/operators/HashJoin.java):
    * both sides of a future equi-join land in the same bucket layout, so
    * Spark's planner proves co-partitioning from the catalog and the join
    * runs WITHOUT any Exchange — the decisive optimization for a fact-fact
    * join that would otherwise shuffle 100 TB on every query. Aggregations
    * on the bucket key skip their exchange too. Registered through the
    * session catalog (bucket metadata lives there); `path` makes it an
    * external table.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      key: String,
      buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(tableName)
  }

  /** Hive-style partitioned parquet layout (`path/col=value/...`).
    * Partitioning by a low-cardinality selector column (date, language,
    * source) is the other storage-level pruning lever next to bucketing:
    * a query filtering on the partition column never opens non-matching
    * directories at all — at 100 TB, `lang = 'en'` touches only the `en`
    * files instead of scanning everything and filtering rows. Keep
    * cardinality low (directories are metadata): date x lang is fine,
    * user_id is not — that's what bucketing is for.
    */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Morton (Z-order) interleave of two bucketed keys: bit i of `a`
    * lands at position 2i+1 and bit i of `b` at 2i, so sorting by the
    * code clusters rows that are close in BOTH dimensions. Inputs must
    * already be integer bucket ranks in [0, 2^bits) — see
    * [[zOrderWrite]] for the value-based bucketing. Static unrolled
    * bitwise expression (2·bits terms, pure map, codegen-folded).
    */
  def mortonCode(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits out of range: $bits")
    // cast to long FIRST: shiftleft keeps the input's integer type, so an
    // int bucket column would wrap at position ≥32 (and sign-flip at 31)
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(1), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(1), 2 * i))
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-order-clustered parquet write: range-partition + sort by the
    * Morton code of two columns so each output file covers a COMPACT
    * rectangle in (colA, colB) space — parquet footer min/max on BOTH
    * columns then skip files/row-groups for predicates on EITHER
    * dimension. A single-column sort gives perfect pruning on that
    * column and none on the other; Z-order trades a little of each for
    * useful pruning on both — the standard multi-dimensional layout
    * lever (Delta/Iceberg OPTIMIZE ZORDER).
    *
    * Bucketing is value-based from one broadcast min/max agg (rank =
    * (x−min)·(2^bits−1)/(max−min), a pure map — no rank window, so no
    * one-task bottleneck; heavy value skew concentrates buckets, the
    * usual caveat). Returns (minA, maxA, minB, maxB) used.
    */
  def zOrderWrite(
      df: DataFrame, path: String, colA: String, colB: String,
      bits: Int = 16, nFiles: Int = 0): (Double, Double, Double, Double) = {
    val r = df.agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).collect()(0)
    require((0 to 3).forall(!r.isNullAt(_)),
      s"zOrderWrite($colA, $colB): empty input or all-NULL cluster column " +
        "— nothing to bucket (min/max came back NULL)")
    val (loA, hiA, loB, hiB) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val top = (1L << bits) - 1
    def bucket(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(top), floor((c.cast("double") - lo) * top / (hi - lo)))
        .cast("long")
    val coded = df.withColumn("__z", mortonCode(
      bucket(col(colA), loA, hiA), bucket(col(colB), loB, hiB), bits))
    val n = if (nFiles > 0) nFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    coded.repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    (loA, hiA, loB, hiB)
  }

  /** Compact a parquet directory into files of roughly `targetBytes`
    * each (input-compressed size; default 128 MiB) — the small-file
    * remediation every long-lived ingest pipeline needs. Streaming sinks,
    * per-batch appends, and over-parallel writers leave thousands of tiny
    * files whose per-file open/footer costs dominate scans and whose
    * listing stalls planning; compaction restores scan-sized files.
    *
    * Target count comes from the actual on-disk byte total (file status,
    * no data read). The rewrite is ONE distributed pass: coalesce when
    * shrinking (no shuffle — partitions concatenate) and a round-robin
    * repartition only when the input has fewer partitions than targets.
    * Writes to `outPath` then returns (files_before, files_after): never
    * compact in place — a failed in-place rewrite loses data.
    */
  /** Hot-key skew report — the pre-flight a 100 TB join/groupBy runs
    * BEFORE committing to a shuffle on `keyCols`: the top-`topN` heaviest
    * keys with their share of rows, plus the global `skew_ratio`
    * (heaviest key count ÷ mean per-key count — 1.0 is uniform; ≫ 32
    * means the hottest post-shuffle task outweighs a whole executor and
    * the key needs salting (Events.sessionizeSalted's shape) or AQE skew
    * hints).
    *
    * Shape: ONE scan of the input partial-aggregates to the
    * (distinct-key-sized) count rollup, which a lazy localCheckpoint
    * pins so the two consumers — the global stats row and the top-N —
    * read the rollup, never the input again (Catalyst has no cross-
    * branch CSE; without the pin each branch would re-scan). Top-N plans
    * as TakeOrderedAndProject (k rows per partition, no global sort);
    * stats broadcast as one row.
    */
  /** ANALYZE — persist table statistics as a dir-level artifact (the
    * reference's `.stat` files made real: PlanCost.java reads row counts
    * and per-attribute distinct counts from a stats file beside each
    * table; this writes the same content as `_graft_stats.parquet`
    * beside the parquet tables). `Tables.columnNdv` consults the
    * artifact FIRST, so every later SPJ compile against an analyzed dir
    * — a new session, the CLI, a golden spec — prices its join-order DP
    * with ZERO stat jobs. Row counts still come from parquet footers
    * (always metadata-cheap); the artifact carries what footers cannot:
    * per-column NDV. Re-run after rewriting tables (the columnNdv
    * staleness contract).
    *
    * One approx_count_distinct rollup per table — the same ~2% HLL++
    * the in-session path computes, paid once at publish time instead of
    * once per session.
    *
    * r13: the artifact also carries per-column `min_val`/`max_val` and a
    * [[HistBins]]-bin equi-width histogram for orderable columns (numerics
    * as-is, dates as epoch days, timestamps as epoch seconds — matching
    * the literal coercion in SpjCompiler's range estimator). This is the
    * remaining half of PlanCost.java's role: NDV prices equi-joins;
    * min/max + histogram price RANGE predicates, so `c < lit` contributes
    * its measured fraction to the join-order DP instead of System R's
    * blanket 1/3. Two scans per table (min/max must exist before buckets
    * can be assigned), both single-pass partial aggregations.
    */
  val HistBins = 32

  def analyze(
      spark: SparkSession, dir: String,
      tables: Seq[String] = graft.Tables.names): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    def orderable(dt: DataType, c: String): Option[Column] = dt match {
      case _: NumericType => Some(col(c).cast("double"))
      case DateType => Some(unix_date(col(c)).cast("double"))
      case TimestampType | TimestampNTZType =>
        Some(col(c).cast("timestamp").cast("double"))
      case _ => None
    }
    val rows: Seq[StatRow] = tables.flatMap { t =>
      val df = graft.Tables.load(spark, dir, t)
      val cols = df.columns.filterNot(
        df.schema(_).dataType.typeName.matches("array.*|map.*|struct.*"))
      if (cols.isEmpty) Seq.empty
      else {
        val nRows = graft.Tables.rowCount(spark, dir, t)
        val numCols = cols.flatMap(c =>
          orderable(df.schema(c).dataType, c).map(c -> _))
        // pass 1: NDV for every column + min/max and non-null count for
        // the orderable ones (histograms carry NON-NULL mass only, so the
        // degenerate single-bin case below must use the same base)
        val aggs = cols.map(c => approx_count_distinct(c).as(s"ndv_$c")) ++
          numCols.flatMap { case (c, e) =>
            Seq(min(e).as(s"min_$c"), max(e).as(s"max_$c"),
              count(e).as(s"cnt_$c")) }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        val bounds: Map[String, (Double, Double)] = numCols.flatMap {
          case (c, _) =>
            val lo = row.getAs[Any](s"min_$c")
            val hi = row.getAs[Any](s"max_$c")
            if (lo == null || hi == null) None
            else Some(c -> (lo.asInstanceOf[Double], hi.asInstanceOf[Double]))
        }.toMap
        // pass 2: equi-width histogram over [min, max] for columns with a
        // non-degenerate domain — HistBins conditional sums per column,
        // all columns in ONE partial-aggregating scan
        val histCols = numCols.filter { case (c, _) =>
          bounds.get(c).exists { case (lo, hi) => hi > lo } }
        val hists: Map[String, Seq[Long]] =
          if (histCols.isEmpty) Map.empty
          else {
            val hAggs = histCols.flatMap { case (c, e) =>
              val (lo, hi) = bounds(c)
              val w = (hi - lo) / HistBins
              val bucket = least(floor((e - lit(lo)) / lit(w)),
                lit(HistBins - 1L))
              (0 until HistBins).map(b => sum(when(bucket === b, 1L)
                .otherwise(0L)).as(s"h_${c}_$b"))
            }
            val hRow = df.agg(hAggs.head, hAggs.tail: _*).head()
            histCols.map { case (c, _) =>
              c -> (0 until HistBins).map(b =>
                hRow.getAs[Long](s"h_${c}_$b"))
            }.toMap
          }
        cols.map { c =>
          val b = bounds.get(c)
          StatRow(t.toLowerCase, c.toLowerCase,
            row.getAs[Long](s"ndv_$c"), nRows,
            b.map(_._1), b.map(_._2),
            hists.get(c).orElse(b.map { case (lo, _) =>
              // degenerate domain (constant column): all NON-NULL mass in
              // one bin — same mass semantics as the regular histograms
              // (nRows here would count nulls and overstate rangeSel for
              // mostly-null constant columns)
              Seq(row.getAs[Long](s"cnt_$c")) ++
                Seq.fill(HistBins - 1)(0L) }))
        }
      }
    }
    val out = rows.toDS().toDF()
    out.repartition(1).write.mode("overwrite")
      .parquet(s"$dir/${graft.Tables.StatsFileName}")
    // a compile earlier in this session may have memoized "artifact
    // absent" (or stale values) for this dir — drop those memos so the
    // next plan prices from the artifact just written
    graft.Tables.invalidateStats(dir)
    out
  }

  /** Export a table's statistics in the reference's NATIVE `.stat` text
    * format (grammar from /root/reference/src/qp/optimizer/PlanCost.java
    * getStatistics, lines 220–270: line 1 = tuple count, line 2 =
    * per-attribute distinct counts, whitespace-separated, in schema
    * column order) — the outbound half of stats interop: a user running
    * the reference engine beside this one can hand the reference OUR
    * measured statistics and its RandomOptimizer prices plans from the
    * same numbers the SPJ DP here uses. NDVs come artifact-first via
    * Tables.columnNdv (an ANALYZEd dir exports with zero stat jobs);
    * complex-typed columns (the reference type system has none) fall
    * back to the row count.
    */
  def exportStat(
      spark: SparkSession, dir: String, table: String,
      outDir: String): java.nio.file.Path = {
    val df = graft.Tables.load(spark, dir, table)
    val n = graft.Tables.rowCount(spark, dir, table)
    val simple = df.columns.filterNot(
      df.schema(_).dataType.typeName.matches("array.*|map.*|struct.*"))
    val ndv = graft.Tables.columnNdv(spark, dir, table,
      simple.toSeq.map(_.toLowerCase))
    val line2 = df.columns.map(c =>
      ndv.getOrElse(c.toLowerCase, n)).mkString(" ")
    val p = java.nio.file.Paths.get(outDir, s"$table.stat")
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, s"$n\n$line2\n")
    p
  }

  /** Import reference-format `.stat` files into the engine's ANALYZE
    * artifact — the inbound half: a user migrating FROM the reference
    * brings their maintained stats catalog and every SPJ compile prices
    * its join-order DP from it with zero stat jobs, before any ANALYZE
    * has ever run here. Writes a fresh `_graft_stats.parquet` (NDV +
    * n_rows only — the reference has no range stats; run [[analyze]]
    * later to upgrade the artifact in place). Missing files skip their
    * table; malformed files fail loudly (the reference exits on them
    * too).
    */
  def importStats(
      spark: SparkSession, statDir: String, dir: String,
      tables: Seq[String] = graft.Tables.names): DataFrame = {
    import spark.implicits._
    val rows: Seq[StatRow] = tables.flatMap { t =>
      val p = java.nio.file.Paths.get(statDir, s"$t.stat")
      if (!java.nio.file.Files.exists(p)) Seq.empty
      else {
        val lines = java.nio.file.Files.readAllLines(p)
        require(lines.size >= 2, s"malformed stat file $p: need 2 lines")
        val n = lines.get(0).trim.toLong
        val ndvs = lines.get(1).trim.split("\\s+").map(_.toLong).toSeq
        val cols = graft.Tables.load(spark, dir, t).columns.toSeq
        require(cols.length == ndvs.length,
          s"$p: ${ndvs.length} distinct counts for ${cols.length} columns " +
            "(the reference requires one per attribute in schema order)")
        cols.zip(ndvs).map { case (c, v) =>
          StatRow(t.toLowerCase, c.toLowerCase, v, n, None, None, None) }
      }
    }
    val out = rows.toDS().toDF()
    out.repartition(1).write.mode("overwrite")
      .parquet(s"$dir/${graft.Tables.StatsFileName}")
    graft.Tables.invalidateStats(dir) // same staleness contract as analyze
    out
  }

  def skewReport(
      df: DataFrame, keyCols: Seq[String], topN: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "skewReport needs at least one key column")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .localCheckpoint(eager = false)
    val stats = counts.agg(sum("n_rows").as("total_rows"),
      count(lit(1)).as("n_keys"), max("n_rows").as("max_rows"))
    counts
      .orderBy(col("n_rows").desc +: keyCols.map(col(_).asc): _*)
      .limit(topN)
      .crossJoin(broadcast(stats))
      .select(keyCols.map(col) ++ Seq(col("n_rows"),
        (col("n_rows").cast("double") / col("total_rows").cast("double"))
          .as("row_frac"),
        col("n_keys"),
        (col("max_rows").cast("double") * col("n_keys").cast("double") /
          col("total_rows").cast("double")).as("skew_ratio")): _*)
  }

  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    require(inPath != outPath, "never compact in place")
    val conf = spark.sparkContext.hadoopConfiguration
    // RECURSIVE data-file listing (r6, advisor find): a top-level-only
    // listStatus saw zero files under any nested layout, so totalBytes=0
    // silently coalesced arbitrarily large data into ONE task/file
    def partFiles(path: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else {
        val it = fs.listFiles(p, true)
        val buf = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
        while (it.hasNext) {
          val s = it.next()
          if (s.getPath.getName.endsWith(".parquet")) buf += s
        }
        buf.result()
      }
    }
    val parts = partFiles(inPath)
    require(parts.nonEmpty, s"compact: no parquet data files under $inPath")
    // a hive-partitioned table must be compacted per partition directory —
    // one flat rewrite would silently destroy the pruning layout
    val rootPath = new org.apache.hadoop.fs.Path(inPath)
    val qualifiedRoot = rootPath.getFileSystem(conf).makeQualified(rootPath)
    require(parts.forall(_.getPath.getParent == qualifiedRoot),
      s"compact: $inPath has a nested (partitioned) layout — compact each " +
        "partition directory separately to keep directory pruning intact")
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val sized =
      if (df.rdd.getNumPartitions >= nOut) df.coalesce(nOut)
      else df.repartition(nOut)
    sized.write.mode("overwrite").parquet(outPath)
    (parts.length, partFiles(outPath).length)
  }
}

/** `runMain graft.tools.RandomTableGen <schemaSpec> <rows> <outDir> [seed]`
  * e.g. `RandomTableGen "id:INT,name:STRING,price:REAL" 100000 /tmp/t.parquet`
  */
object RandomTableGen {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: RandomTableGen <schema> <rows> <outDir> [seed]")
    val spark = local()
    TableTools.randomTable(spark, args(0), args(1).toLong,
        if (args.length > 3) args(3).toLong else 42L)
      .write.mode("overwrite").parquet(args(2))
    println(s"[gen] wrote ${args(1)} rows to ${args(2)}")
    spark.stop()
  }

  private[tools] def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** `runMain graft.tools.JsonlToParquet <in.jsonl> <schemaSpec|infer> <outDir>`
  *
  * JSON-lines ingest — the interchange format most raw LLM training
  * corpora arrive in. With an explicit schema the scan is single-pass
  * and malformed lines land in a `_corrupt_record` column instead of
  * failing the job (PERMISSIVE mode — at 100 TB a bad line must never
  * kill the pipeline; filter and count them instead). `infer` samples
  * the input for the schema (extra pass — fine for exploration, not for
  * the 100 TB path).
  */
object JsonlToParquet {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: JsonlToParquet <in.jsonl> <schema|infer> <outDir>")
    val spark = RandomTableGen.local()
    val df = jsonl(spark, args(0), if (args(1) == "infer") None else Some(args(1)))
    df.write.mode("overwrite").parquet(args(2))
    println(s"[jsonl] wrote ${args(2)}")
    spark.stop()
  }

  /** Library form: read JSONL with the .det-style schema spec (or infer),
    * keeping malformed lines in `_corrupt_record`.
    */
  def jsonl(spark: SparkSession, path: String, spec: Option[String]): DataFrame =
    spec match {
      case None => spark.read.json(path)
      case Some(s) =>
        val ddl = TableTools.parseSchema(s).map { case (n, t) =>
          val sparkT = t match {
            case "INT" => "BIGINT"; case "REAL" => "DOUBLE"
            case "STRING" => "STRING"; case "TIME" => "TIMESTAMP"
          }
          s"$n $sparkT"
        }.mkString(", ") + ", _corrupt_record STRING"
        spark.read.schema(ddl)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(path)
    }
}

/** `runMain graft.tools.OrcConvert <in> <out>` — parquet↔ORC interchange
  * (direction from the INPUT's format, sniffed via a footer read). ORC is
  * the other columnar format a 100 TB estate actually holds (Hive/Trino
  * warehouses); both directions preserve schema and values exactly, and
  * the ORC scan keeps the scale properties the engine depends on —
  * predicate pushdown and column pruning reach the reader the same as
  * parquet's (spec-asserted on the plan), so `Tables.load`-style
  * pipelines can point at either format without replanning.
  */
object OrcConvert {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OrcConvert <inDir> <outDir>")
    val spark = RandomTableGen.local()
    val n = convert(spark, args(0), args(1))
    println(s"[orc] wrote ${args(1)} ($n rows)")
    spark.stop()
  }

  /** Returns the row count written. Direction: if `in` reads as parquet,
    * write ORC; otherwise read ORC and write parquet. The count comes
    * from an [[org.apache.spark.sql.Observation]] riding the write
    * itself (r8) — the previous `df.count()` was a second full read of
    * the input purely for the return value, which at 100 TB doubles the
    * conversion job.
    */
  def convert(spark: SparkSession, in: String, out: String): Long = {
    import org.apache.spark.sql.Observation
    val asParquet =
      try { spark.read.parquet(in).schema; true }
      catch { case _: Exception => false }
    val obs = Observation()
    if (asParquet) {
      spark.read.parquet(in)
        .observe(obs, count(lit(1)).as("n"))
        .write.mode("overwrite").orc(out)
    } else {
      spark.read.orc(in)
        .observe(obs, count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(out)
    }
    obs.get("n").asInstanceOf[Long]
  }
}

/** Avro container-file interchange — the remaining ROW-major format a
  * warehouse estate holds (Kafka archives, Sqoop/Flume era dumps,
  * schema-registry pipelines). This build carries only avro-core (no
  * packaged DataSource), so the bridge is per-partition
  * `DataFileWriter`/`DataFileReader` streams — the same executor-side
  * shape the packaged module runs — over FLAT schemas of the warehouse
  * scalar types (boolean/int/long/float/double/string/binary), each
  * field a nullable `[null, T]` union.
  *
  * Scale honesty (documented, not pretended): Avro is row-major — a
  * scan DESERIALIZES EVERY FIELD of every row; there is no column
  * pruning and no predicate pushdown to the reader, unlike the parquet
  * and ORC scans the engine's plans rely on. Use it as interchange at
  * the estate boundary and convert to columnar (`convert` sniffs the
  * direction) before analytics.
  */
object AvroConvert {
  import org.apache.avro.Schema
  import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
  import org.apache.avro.file.{DataFileReader, DataFileWriter}
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AvroConvert <inDir> <outDir>")
    val spark = RandomTableGen.local()
    val n = convert(spark, args(0), args(1))
    println(s"[avro] wrote ${args(1)} ($n rows)")
    spark.stop()
  }

  /** Parquet in → Avro out; otherwise Avro in → parquet out (the
    * OrcConvert direction-sniff convention). Returns rows written.
    */
  def convert(spark: SparkSession, in: String, out: String): Long = {
    val asParquet =
      try { spark.read.parquet(in).schema; true }
      catch { case _: Exception => false }
    if (asParquet) write(spark.read.parquet(in), out)
    else {
      val df = read(spark, in)
      df.write.mode("overwrite").parquet(out)
      df.count()
    }
  }

  /** The Avro record schema for a flat Spark schema — every field a
    * nullable `[null, T]` union. Fails fast on nested/unsupported types.
    */
  def avroSchema(st: StructType, name: String = "row"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"AvroConvert: unsupported type $other for field `${f.name}` — " +
            "flat scalar schemas only (flatten structs/arrays first)")
      }
      val union = Schema.createUnion(
        java.util.Arrays.asList(Schema.create(Schema.Type.NULL), base))
      fields.add(new Schema.Field(f.name, union,
        null, Schema.Field.NULL_DEFAULT_VALUE))
    }
    Schema.createRecord(name, null, "graft.avro", false, fields)
  }

  private def toStruct(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD,
      s"expected a record schema, got ${s.getType}")
    StructType(s.getFields.toArray.map { fo =>
      val f = fo.asInstanceOf[Schema.Field]
      val branches = f.schema().getTypes.toArray.map(
        _.asInstanceOf[Schema].getType).filter(_ != Schema.Type.NULL)
      require(branches.length == 1,
        s"field ${f.name}: only [null, T] unions are supported")
      val dt = branches.head match {
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.INT => IntegerType
        case Schema.Type.LONG => LongType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case other => throw new IllegalArgumentException(
          s"unsupported avro type $other for field ${f.name}")
      }
      StructField(f.name, dt, nullable = true)
    })
  }

  /** Write `df` as one Avro container file per partition under `dir`
    * (`part-NNNNN.avro`). Each task streams its rows through one
    * `DataFileWriter` — at 100 TB the identical loop writes to the
    * distributed FS stream instead of a local path. Returns rows
    * written (accumulated per partition, no second read).
    */
  def write(df: DataFrame, dir: String): Long = {
    val st = df.schema
    val schemaJson = avroSchema(st).toString // Schema is not serializable
    val d = new java.io.File(dir)
    if (d.exists()) {
      d.listFiles().foreach(_.delete()); d.delete()
    }
    d.mkdirs()
    df.rdd.mapPartitionsWithIndex { (idx, it) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(f"$dir/part-$idx%05d.avro"))
      var n = 0L
      it.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < row.length) {
          val v = row.get(i)
          rec.put(i, v match {
            case null => null
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case x => x
          })
          i += 1
        }
        w.append(rec); n += 1
      }
      w.close()
      Iterator.single(n)
    }.sum().toLong
  }

  /** Read an Avro container directory back as a DataFrame. The schema
    * comes from the FIRST part file's embedded writer schema (one
    * driver-side header read); each task then streams its files through
    * `DataFileReader`. Row-major: every field of every row
    * deserializes — no pruning, no pushdown (see the object doc).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).map(_.getPath).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    val r0 = new DataFileReader[GenericRecord](
      new java.io.File(files.head),
      new GenericDatumReader[GenericRecord]())
    val schema = r0.getSchema
    r0.close()
    val st = toStruct(schema)
    val schemaJson = schema.toString
    val nF = st.fields.length
    val rdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .flatMap { path =>
        val schema = new Schema.Parser().parse(schemaJson)
        val rd = new DataFileReader[GenericRecord](
          new java.io.File(path),
          new GenericDatumReader[GenericRecord](schema))
        new Iterator[Row] {
          def hasNext: Boolean = { val h = rd.hasNext; if (!h) rd.close(); h }
          def next(): Row = {
            val rec = rd.next()
            Row.fromSeq((0 until nF).map { i =>
              rec.get(i) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case bb: java.nio.ByteBuffer =>
                  val a = new Array[Byte](bb.remaining()); bb.get(a); a
                case x => x
              }
            })
          }
        }
      }
    spark.createDataFrame(rdd, st)
  }
}

/** `runMain graft.tools.CsvToParquet <in.csv> <schemaSpec|header> <outDir>`
  * Schema spec uses the reference's .det types; pass `header` to infer.
  */
object CsvToParquet {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: CsvToParquet <in.csv> <schema|header> <outDir>")
    val spark = RandomTableGen.local()
    val reader = spark.read.option("delimiter", ",")
    val df =
      if (args(1) == "header")
        reader.option("header", "true").option("inferSchema", "true").csv(args(0))
      else {
        val ddl = TableTools.parseSchema(args(1)).map { case (n, t) =>
          val spark_t = t match {
            case "INT" => "INT"; case "REAL" => "DOUBLE"
            case "STRING" => "STRING"; case "TIME" => "TIMESTAMP"
          }
          s"$n $spark_t"
        }.mkString(", ")
        reader.schema(ddl).csv(args(0))
      }
    df.write.mode("overwrite").parquet(args(2))
    println(s"[csv] wrote ${args(2)}")
    spark.stop()
  }
}
