package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def dim(rows: (Long, String, Long)*) =
    rows.toDF("id", "name", "bal")

  test("analyze: the persisted stats artifact feeds columnNdv — a " +
    "tampered ndv proves the compile path reads the FILE, not the data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_analyze")
      .toString
    // a real 'region' table in the temp dir (Tables.load shape)
    (0L until 40L).map(i => (i, s"name$i", s"c${i % 4}"))
      .toDF("r_regionkey", "r_name", "r_comment")
      .write.parquet(s"$dir/region.parquet")
    val stats = graft.tools.TableTools.analyze(spark, dir, Seq("region"))
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(stats("r_regionkey")._2 == 40L, "footer row count exact")
    assert(math.abs(stats("r_regionkey")._1 - 40L) <= 2, "HLL ndv ~exact")
    assert(math.abs(stats("r_comment")._1 - 4L) <= 1)
    // tamper: rewrite the artifact with a sentinel ndv; a FRESH dir key
    // (statsFileCache memoizes per dir) must surface the sentinel
    val dir2 = java.nio.file.Files.createTempDirectory("graft_analyze2")
      .toString
    spark.read.parquet(s"$dir/region.parquet")
      .write.parquet(s"$dir2/region.parquet")
    Seq(("region", "r_name", 7777L, 40L))
      .toDF("table", "column", "ndv", "n_rows")
      .write.parquet(s"$dir2/${graft.Tables.StatsFileName}")
    val got = graft.Tables.columnNdv(spark, dir2, "region", Seq("r_name"))
    assert(got("r_name") == 7777L,
      s"columnNdv must read the artifact, got $got")
  }

  test("exportStat emits the reference .stat grammar; importStats " +
    "round-trips it into the artifact (sentinel proves file-sourced)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stat").toString
    (0L until 40L).map(i => (i, s"name$i", s"c${i % 4}"))
      .toDF("r_regionkey", "r_name", "r_comment")
      .write.parquet(s"$dir/region.parquet")
    // export: line 1 = tuple count, line 2 = one NDV per column in
    // schema order (PlanCost.java getStatistics grammar)
    val p = graft.tools.TableTools.exportStat(spark, dir, "region",
      s"$dir/statout")
    val lines = java.nio.file.Files.readAllLines(p)
    assert(lines.get(0) == "40")
    val ndvs = lines.get(1).trim.split(" ")
    assert(ndvs.length == 3)
    assert(math.abs(ndvs(0).toLong - 40L) <= 2 &&
      math.abs(ndvs(2).toLong - 4L) <= 1)
    // import a HAND-WRITTEN reference-format file with sentinel values
    // into a fresh dir: columnNdv must surface the sentinels (file is
    // the source, zero stat jobs)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_stat2")
      .toString
    spark.read.parquet(s"$dir/region.parquet")
      .write.parquet(s"$dir2/region.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/statout", "region2.stat"),
      "40\n1234 5678 9\n")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/statout", "region2.stat"),
      java.nio.file.Paths.get(s"$dir/statout", "region.stat"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    graft.tools.TableTools.importStats(spark, s"$dir/statout", dir2,
      Seq("region"))
    val got = graft.Tables.columnNdv(spark, dir2, "region",
      Seq("r_regionkey", "r_name", "r_comment"))
    assert(got == Map("r_regionkey" -> 1234L, "r_name" -> 5678L,
      "r_comment" -> 9L), s"import must surface the file's values: $got")
    // malformed: wrong NDV arity fails loudly (the reference exits too)
    val dir3 = java.nio.file.Files.createTempDirectory("graft_stat3")
      .toString
    spark.read.parquet(s"$dir/region.parquet")
      .write.parquet(s"$dir3/region.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/statout", "region.stat"),
      "40\n1 2\n")
    intercept[IllegalArgumentException] {
      graft.tools.TableTools.importStats(spark, s"$dir/statout", dir3,
        Seq("region"))
    }
  }

  test("applyChanges: update-all, insert, delete, no-op tombstone, " +
    "and untouched passthrough in one batch") {
    val target = dim((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    val changes = Seq(
      (2L, "b2", 25L, false), // matched -> replace
      (4L, "d", 40L, false),  // unmatched -> insert
      (3L, "c", 0L, true),    // matched + tombstone -> delete
      (9L, "x", 0L, true)     // unmatched tombstone -> no-op
    ).toDF("id", "name", "bal", "deleted")
    val got = Warehouse.applyChanges(target, changes, Seq("id"), "deleted")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", 10L), (2L, "b2", 25L),
      (4L, "d", 40L)))
  }

  test("applyChanges is idempotent under re-delivery of the same batch") {
    val target = dim((1L, "a", 10L), (2L, "b", 20L))
    val changes = Seq((2L, "b2", 25L, false), (1L, "a", 0L, true))
      .toDF("id", "name", "bal", "deleted")
    val once = Warehouse.applyChanges(target, changes, Seq("id"), "deleted")
    val twice = Warehouse.applyChanges(once, changes, Seq("id"), "deleted")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(twice.toSeq == Seq((2L, "b2", 25L)))
  }

  test("applyChanges fails fast on a duplicate change key and on a " +
    "null change key") {
    val target = dim((1L, "a", 10L))
    val dup = Seq((1L, "x", 1L, false), (1L, "y", 2L, false))
      .toDF("id", "name", "bal", "deleted")
    intercept[Exception] {
      Warehouse.applyChanges(target, dup, Seq("id"), "deleted").collect()
    }
    val nul = Seq((Option.empty[Long], "x", 1L, false))
      .toDF("id", "name", "bal", "deleted")
    intercept[Exception] {
      Warehouse.applyChanges(target, nul, Seq("id"), "deleted").collect()
    }
  }

  test("applyChanges refuses a change schema that is not target + " +
    "tombstone") {
    val target = dim((1L, "a", 10L))
    val bad = Seq((1L, "x", false)).toDF("id", "name", "deleted")
    intercept[IllegalArgumentException] {
      Warehouse.applyChanges(target, bad, Seq("id"), "deleted")
    }
  }

  test("latestByVersion: last writer wins; duplicate (key, version) " +
    "fails fast instead of picking a shuffle-order survivor") {
    val log = Seq(
      (1L, "old", 1L), (1L, "new", 3L), (1L, "mid", 2L),
      (2L, "only", 7L)
    ).toDF("id", "name", "ver")
    val got = Warehouse.latestByVersion(log, Seq("id"), "ver")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "new", 3L), (2L, "only", 7L)))

    val dup = Seq((1L, "a", 1L), (1L, "b", 1L)).toDF("id", "name", "ver")
    intercept[Exception] {
      Warehouse.latestByVersion(dup, Seq("id"), "ver").collect()
    }
  }
}
