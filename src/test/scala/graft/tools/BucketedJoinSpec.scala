package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode

import graft.{SparkSpec, Tables}

/** Co-located join demo: orders and customer written bucketed by the join
  * key join WITHOUT any Exchange — the storage-level answer to "don't
  * shuffle the fact table on every query" at 100 TB (the reference's
  * HashJoin partitions on the key per-query; bucketing does it once at
  * write time).
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed orders x customer join has no Exchange; unbucketed does") {
    val base = Files.createTempDirectory("graft_buckets").toString
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    try {
      TableTools.writeBucketed(orders, "orders_b", "o_custkey", 8,
        Some(s"$base/orders_b"))
      TableTools.writeBucketed(customer, "customer_b", "c_custkey", 8,
        Some(s"$base/customer_b"))
      // disable broadcast so the co-partitioning (not a broadcast) is what
      // eliminates the shuffle — the fact-fact case we care about at scale
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("orders_b").join(spark.table("customer_b"),
          spark.table("orders_b")("o_custkey") ===
            spark.table("customer_b")("c_custkey"))
        val p = joined.queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        assert(p.contains("SortMergeJoin"))
        assert(!p.contains("Exchange"),
          "bucketed join must not shuffle either side")
        assert(joined.count() > 0)
        // control: the same join over plain parquet shuffles both sides
        val unbucketed = orders.join(customer,
          orders("o_custkey") === customer("c_custkey"))
        val pu = unbucketed.queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        assert(pu.contains("Exchange"))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("groupBy on the bucket key skips its exchange") {
    val base = Files.createTempDirectory("graft_buckets_agg").toString
    val orders = Tables.load(spark, dir, "orders")
    try {
      TableTools.writeBucketed(orders, "orders_agg_b", "o_custkey", 8,
        Some(s"$base/orders_agg_b"))
      val agg = spark.table("orders_agg_b").groupBy("o_custkey").count()
      val p = agg.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("Exchange"),
        "aggregation on the bucket key must not shuffle")
      assert(agg.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_agg_b")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
