package graft.tools

import graft.SparkSpec

class TableToolsSpec extends SparkSpec {

  test("randomTable: all four reference types, deterministic under a seed") {
    val df = TableTools.randomTable(spark,
      "id:INT,name:STRING,price:REAL,created:TIME", rows = 100)
    assert(df.count() == 100)
    assert(df.schema.map(f => f.dataType.typeName).toSeq ==
      Seq("integer", "string", "double", "timestamp"))
    val a = df.collect().map(_.toString).sorted
    val b = TableTools.randomTable(spark,
      "id:INT,name:STRING,price:REAL,created:TIME", rows = 100)
      .collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
    val c = TableTools.randomTable(spark,
      "id:INT,name:STRING,price:REAL,created:TIME", rows = 100, seed = 7L)
      .collect().map(_.toString).sorted
    assert(a.toSeq != c.toSeq)
  }

  test("skewReport: hot key surfaces first with exact frac and ratio; " +
    "top-N plans as TakeOrderedAndProject") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 1 hot key with 900 rows + 100 cold keys with 1 row each:
    // total 1000, 101 keys, mean ~9.90, ratio = 900*101/1000 = 90.9
    val df = (Seq.fill(900)(42L) ++ (100L until 200L)).toDF("k")
      .withColumn("payload", col("k") * 2)
    val rep = TableTools.skewReport(df, Seq("k"), topN = 3)
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-N must not global-sort the rollup")
    val rows = rep.collect()
    assert(rows.length == 3)
    val hot = rows.head
    assert(hot.getLong(hot.fieldIndex("k")) == 42L)
    assert(hot.getLong(hot.fieldIndex("n_rows")) == 900L)
    assert(hot.getDouble(hot.fieldIndex("row_frac")) == 0.9)
    assert(hot.getLong(hot.fieldIndex("n_keys")) == 101L)
    assert(hot.getDouble(hot.fieldIndex("skew_ratio")) == 900.0 * 101 / 1000)
    // ties broken by key order; every reported row repeats the globals
    assert(rows(1).getLong(0) == 100L && rows(2).getLong(0) == 101L)
    assert(rows.forall(_.getDouble(hot.fieldIndex("skew_ratio")) ==
      900.0 * 101 / 1000))
  }

  test("randomTable: generated distributed across partitions") {
    val df = TableTools.randomTable(spark, "id:INT", rows = 1000, partitions = 8)
    assert(df.rdd.getNumPartitions == 8)
  }

  test("parseSchema rejects unknown types") {
    assertThrows[IllegalArgumentException](
      TableTools.randomTable(spark, "x:BLOB", 10).collect())
  }

  test("jsonl: explicit schema reads good lines, quarantines malformed ones") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "docs.jsonl")
    java.nio.file.Files.writeString(f.toPath,
      """{"doc_id": 1, "text": "hello world", "score": 0.5}
        |{"doc_id": 2, "text": "second doc", "score": 1.5}
        |{not json at all
        |""".stripMargin)
    // cache: Spark refuses to query ONLY _corrupt_record straight off raw
    // JSON (the real pipeline lands parquet first, as the main() does)
    val df = JsonlToParquet.jsonl(spark, f.getAbsolutePath,
      Some("doc_id:INT,text:STRING,score:REAL")).cache()
    import org.apache.spark.sql.functions.col
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.count() == 2)
    assert(good.select("text").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("hello world", "second doc"))
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
  }

  test("compact: shrinks a many-small-file table, preserves every row") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact").toFile
    val in = new java.io.File(base, "in").getAbsolutePath
    val out = new java.io.File(base, "out").getAbsolutePath
    // 64 tiny files — the streaming-sink debris shape
    (1L to 2000L).toDF("id").repartition(64).write.parquet(in)
    val (before, after) = TableTools.compact(spark, in, out,
      targetBytes = 1L << 20)
    assert(before == 64)
    assert(after < before)
    val got = spark.read.parquet(out)
    assert(got.count() == 2000)
    assert(got.agg(org.apache.spark.sql.functions.sum("id"))
      .collect().head.getLong(0) == 2000L * 2001 / 2)
  }

  test("compact: refuses in-place rewrites") {
    assertThrows[IllegalArgumentException](
      TableTools.compact(spark, "/tmp/x", "/tmp/x"))
  }

  test("compact: fails loudly on empty and on hive-partitioned layouts") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact2").toFile
    // empty input: must error, never default to a 1-file coalesce of
    // whatever a later read finds
    val empty = new java.io.File(base, "empty")
    empty.mkdirs()
    assertThrows[IllegalArgumentException](TableTools.compact(
      spark, empty.getAbsolutePath, new java.io.File(base, "o1").getAbsolutePath))
    // partitioned layout: a flat rewrite would drop directory pruning —
    // refuse and tell the caller to compact per partition
    val part = new java.io.File(base, "part").getAbsolutePath
    (1L to 100L).toDF("id")
      .withColumn("p", org.apache.spark.sql.functions.col("id") % 2)
      .write.partitionBy("p").parquet(part)
    assertThrows[IllegalArgumentException](TableTools.compact(
      spark, part, new java.io.File(base, "o2").getAbsolutePath))
    // but each partition directory compacts fine (recursive listing sees
    // the files; the layout under one partition is flat)
    val (before, after) = TableTools.compact(spark, s"$part/p=0",
      new java.io.File(base, "o3").getAbsolutePath, targetBytes = 1L << 20)
    assert(before >= 1 && after >= 1)
    assert(spark.read.parquet(new java.io.File(base, "o3").getAbsolutePath)
      .count() == 50)
  }

  test("jsonl: inferred schema round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl2").toFile
    val f = new java.io.File(dir, "t.jsonl")
    java.nio.file.Files.writeString(f.toPath,
      """{"a": 1, "b": "x"}
        |{"a": 2, "b": "y"}
        |""".stripMargin)
    val df = JsonlToParquet.jsonl(spark, f.getAbsolutePath, None)
    assert(df.count() == 2 && df.columns.sorted.toSeq == Seq("a", "b"))
  }

  test("orc: parquet->orc->parquet round-trips values; pushdown survives") {
    import org.apache.spark.sql.execution.ExplainMode
    val src = "/root/testdata/sf0.001/customer.parquet"
    val base = java.nio.file.Files.createTempDirectory("orc").toString
    val nOrc = OrcConvert.convert(spark, src, s"$base/t.orc")
    val nBack = OrcConvert.convert(spark, s"$base/t.orc", s"$base/back.parquet")
    val orig = spark.read.parquet(src)
    assert(nOrc == orig.count() && nBack == nOrc)
    // byte-level value equality both hops
    def sig(df: org.apache.spark.sql.DataFrame): Array[String] = {
      val cols = df.columns.sorted.toSeq
      df.selectExpr(s"md5(concat_ws('|', ${cols.mkString(", ")})) AS h")
        .collect().map(_.getString(0)).sorted
    }
    assert(sig(spark.read.orc(s"$base/t.orc")).sameElements(sig(orig)))
    assert(sig(spark.read.parquet(s"$base/back.parquet"))
      .sameElements(sig(orig)))
    // the scale properties hold on the ORC scan too: predicate pushdown
    // and column pruning reach the reader exactly like parquet
    val p = spark.read.orc(s"$base/t.orc")
      .filter(org.apache.spark.sql.functions.col("c_custkey") > 100L)
      .select("c_custkey", "c_name")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).get
    assert(pushed.contains("GreaterThan(c_custkey"))
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("c_custkey") && read.contains("c_name") &&
      !read.contains("c_address"))
  }

  test("avro: full scalar-type round-trip with nulls is byte-exact; " +
    "parquet->avro->parquet conversion preserves a warehouse table") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("avro").toString
    // every supported type incl. nulls and binary
    val src = Seq(
      (1L, Some(7), Some(true), Some(1.5f), Some(2.25),
        Some("hello"), Some(Array[Byte](1, 2, 3))),
      (2L, None, None, None, None, None, None),
      (3L, Some(-9), Some(false), Some(-0.5f), Some(1e300),
        Some("naïve 中文"), Some(Array[Byte]())))
      .toDF("id", "n", "flag", "f", "d", "s", "b")
    val written = AvroConvert.write(src, s"$base/t.avro")
    assert(written == 3L)
    val back = AvroConvert.read(spark, s"$base/t.avro")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3),
        r.get(4), r.get(5),
        Option(r.get(6)).map(_.asInstanceOf[Array[Byte]].toSeq)))
        .sortBy(_._1).toSeq
    assert(canon(back) == canon(src))
    // conversion CLI shape: a real table through avro and back
    val pq = "/root/testdata/sf0.001/region.parquet"
    val n1 = AvroConvert.convert(spark, pq, s"$base/region.avro")
    val n2 = AvroConvert.convert(spark, s"$base/region.avro",
      s"$base/region_back.parquet")
    val orig = spark.read.parquet(pq)
    assert(n1 == orig.count() && n2 == n1)
    assert(spark.read.parquet(s"$base/region_back.parquet")
      .collect().map(_.toSeq).toSet == orig.collect().map(_.toSeq).toSet)
    // honesty gate: nested types refuse loudly instead of mangling
    val nested = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] {
      AvroConvert.write(nested, s"$base/bad.avro")
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("mortonCode interleaves bits; zOrderWrite files cover compact " +
    "rectangles where a single-column sort spans the full other axis") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max, min}
    // expression vs a reference bit-interleave
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i)))
        .reduce(_ | _)
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), (255L, 128L))
    val got = pairs.toDF("a", "b")
      .select(TableTools.mortonCode(col("a"), col("b"), 8)).collect()
      .map(_.getLong(0))
    assert(got.toSeq == pairs.map { case (a, b) => ref(a, b, 8) })
    // r9 advisor fix: INT bucket columns must produce the same codes —
    // shiftleft keeps the input type, so without the internal long cast
    // bit 31 lands in the int sign bit and positions >= 32 wrap mod 32
    val gotInt = pairs.map { case (a, b) => (a.toInt, b.toInt) }
      .toDF("a", "b")
      .select(TableTools.mortonCode(col("a"), col("b"), 16)).collect()
      .map(_.getLong(0))
    assert(gotInt.toSeq == pairs.map { case (a, b) => ref(a, b, 16) })
    assert(gotInt.forall(_ >= 0L))

    // 64x64 uniform grid -> 16 files each way; z-order files must cover
    // far less (x-range * y-range) area than x-sorted files, which each
    // span the whole y axis
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y").repartition(8)
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    TableTools.zOrderWrite(grid, s"$base/z", "x", "y", bits = 6, nFiles = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$base/flat")
    // every 256-point file has AREA 256 on a dense grid — the pruning
    // discriminator is the WORST-AXIS span: a point predicate on y
    // touches every x-sorted file (each spans all 64 y values) but only
    // the z-order files whose ~16-wide y-range contains it
    def avgWorstSide(dir: String): Double = {
      val perFile = spark.read.parquet(dir)
        .withColumn("f", org.apache.spark.sql.functions
          .input_file_name())
        .groupBy("f").agg(
          (max("x") - min("x") + 1).as("rx"),
          (max("y") - min("y") + 1).as("ry"))
        .select(org.apache.spark.sql.functions.greatest(col("rx"),
          col("ry")).cast("double").as("side"))
        .collect().map(_.getDouble(0))
      perFile.sum / perFile.length
    }
    val zs = avgWorstSide(s"$base/z")
    val fs = avgWorstSide(s"$base/flat")
    assert(fs >= 63.0, s"x-sorted files should span the y axis, got $fs")
    assert(zs < fs / 2, s"z-order worst side $zs !< half of flat $fs")
  }
}
