package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct matches manual computation and handles length mismatch") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val v = df.select(VectorExpressions.dot(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(v == 32.0)
    val short = Seq((Array(1.0, 2.0), Array(3.0))).toDF("a", "b")
      .select(VectorExpressions.dot(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(short == 3.0) // min-length semantics
  }

  test("DotProduct is null-safe") {
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(VectorExpressions.dot(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }

  test("RollingHash matches the lambda fingerprint on ASCII text") {
    val df = Seq("abc", "the quick brown fox", "").toDF("text")
    val rows = df.select(
      TextExpressions.fingerprint(col("text")).as("native"),
      graft.ops.TextOps.fingerprint(col("text")).as("lambda"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("GraftExtensions registers SQL functions") {
    // getOrCreate returns the suite's existing session (withExtensions only
    // affects newly-built sessions), so use runtime registration
    val s2 = spark
    graft.GraftExtensions.register(s2)
    val fp = s2.sql("SELECT graft_fingerprint('abc') AS fp")
      .collect().head.getLong(0)
    assert(fp == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
    val dot = s2.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
  }
}
