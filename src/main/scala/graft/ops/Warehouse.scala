package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Warehouse table maintenance: the SQL:2003 MERGE / CDC-apply family.
  * [[Events.scd2History]] materializes a dimension's HISTORY; these
  * maintain its CURRENT STATE — the other half every warehouse estate
  * runs (Debezium/CDC apply, nightly dimension upserts, GDPR deletes).
  */
object Warehouse {

  /** Collapse a change log to one row per key — last-writer-wins by
    * `versionCol` (a CDC LSN, an ingest sequence, an event time).
    * Deterministic only when (key, version) is unique, so duplicate
    * (key, version) pairs FAIL FAST (`raise_error`) instead of letting
    * shuffle order pick a survivor.
    *
    * Shape: ONE key-partitioned window over the change batch — work ∝
    * changes, never the standing table.
    */
  def latestByVersion(changes: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    val dup = Window.partitionBy((keys.map(col) :+ col(versionCol)): _*)
    changes
      .withColumn("__dup", count(lit(1)).over(dup))
      .withColumn("__guard",
        when(col("__dup") > 1, raise_error(concat(
          lit(s"duplicate (${keys.mkString(",")}, $versionCol): "),
          concat_ws(",", keys.map(col): _*)))).otherwise(lit(1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__guard") === 1)
      .drop("__dup", "__guard", "__rn")
  }

  /** Apply a collapsed change batch to a standing table with MERGE
    * semantics (SQL:2003 MERGE INTO / Delta `whenMatched.updateAll` +
    * `whenNotMatched.insertAll` + CDC deletes):
    *
    *  - matched, not tombstoned  → the change row REPLACES the target
    *    row (update-all)
    *  - not matched, not tombstoned → the change row INSERTS
    *  - matched + tombstoned     → the target row is DELETED
    *  - tombstoned, not matched  → no-op (idempotent re-delivery)
    *  - untouched target rows pass through
    *
    * `changes` must carry the target's exact columns plus the boolean
    * `tombstoneCol`; more than one change row per key (run
    * [[latestByVersion]] first) or a NULL change key FAILS FAST —
    * MERGE's standard "source must match at most one row" contract,
    * enforced with `raise_error` rather than trusting shuffle order.
    *
    * Shape: ONE equi full-outer join on the key — the change side is
    * batch-sized and AQE broadcasts it against a 100 TB standing table,
    * so the standing side never reshuffles beyond its key layout; all
    * downstream arithmetic is a pure per-row CASE. (With a bucketed /
    * partitioned standing table the join co-locates — the row 41
    * CorpusMaintain fold discipline applied to relational state.)
    */
  def applyChanges(target: DataFrame, changes: DataFrame,
      keys: Seq[String], tombstoneCol: String): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val tCols = target.columns.toSeq
    require(changes.columns.toSet == (tCols :+ tombstoneCol).toSet,
      s"changes must carry target columns + $tombstoneCol: " +
        s"got ${changes.columns.toSeq} vs $tCols")
    val w = Window.partitionBy(keys.map(col): _*)
    val nullKey = keys.map(col(_).isNull).reduce(_ || _)
    val c = changes
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__guard",
        when(col("__n") > 1 || nullKey, raise_error(concat(
          lit("merge source must match at most one non-null key: "),
          concat_ws(",", keys.map(col): _*)))).otherwise(lit(1)))
      .filter(col("__guard") === 1)
      .select(tCols.map(n => col(n).as(s"c_$n")) :+
        col(tombstoneCol).as("c_tomb"): _*)
    val t = target.select(tCols.map(n => col(n).as(s"t_$n")): _*)
    val cond = keys.map(k => t(s"t_$k") === c(s"c_$k")).reduce(_ && _)
    val matchedKey = col(s"c_${keys.head}")
    t.join(c, cond, "full")
      // matched + tombstone deletes; tombstone-only rows are no-ops
      .filter(!coalesce(col("c_tomb"), lit(false)))
      .select(tCols.map { n =>
        when(matchedKey.isNotNull, col(s"c_$n"))
          .otherwise(col(s"t_$n")).as(n)
      }: _*)
  }
}
