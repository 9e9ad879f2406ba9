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

  test("randomTable: generated distributed across partitions") {
    val df = TableTools.randomTable(spark, "id:INT", rows = 1000, partitions = 8)
    assert(df.rdd.getNumPartitions == 8)
  }

  test("parseSchema rejects unknown types") {
    assertThrows[IllegalArgumentException](
      TableTools.randomTable(spark, "x:BLOB", 10).collect())
  }
}
