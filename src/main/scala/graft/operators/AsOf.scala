package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (nearest-earlier) join — the canonical time-series operator Spark
  * lacks natively. Implemented by composing built-ins (preference (a) of
  * the build plan): tag both sides, union, then a per-key ordered window
  * carries the latest reference row forward onto each probe row.
  *
  * Scale shape: ONE shuffle on the join key + per-partition sort — exactly
  * the cost of a sort-merge join, with bounded state (one carried row per
  * key), no range explosion. This beats a custom physical operator for
  * maintainability and inherits AQE/skew handling for free.
  */
object AsOf {

  /** For every `probe` row, attach the most recent `ref` row with the same
    * key and ref.ts <= probe.ts.
    *
    * @param probe   left side (keyCol, tsCol, plus carried columns)
    * @param ref     right side; its `carry` columns are emitted with prefix
    */
  def asOfJoin(probe: DataFrame, ref: DataFrame, keyCol: String, tsCol: String,
               carry: Seq[String]): DataFrame = {
    // tag=0 sorts refs before probes at equal timestamps → "<=" semantics
    val refTagged = ref.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("_tag")) ++
        carry.map(c => col(c).as(s"ref_$c")) ++
        probe.columns.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val probeTagged = probe.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("_tag")) ++
        carry.map(c => lit(null).cast(ref.schema(c).dataType).as(s"ref_$c")) ++
        probe.columns.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    refTagged.unionByName(probeTagged)
      .select(
        Seq(col(keyCol), col(tsCol), col("_tag")) ++
          carry.map(c => last(col(s"ref_$c"), ignoreNulls = true).over(w).as(s"ref_$c")) ++
          probe.columns.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
      .filter(col("_tag") === 1)
      .drop("_tag")
  }

  /** Query: each purchase event joined to the user's most recent prior (or
    * simultaneous) click. DuckDB expresses the same thing natively with
    * ASOF JOIN, which is the differential oracle.
    */
  def asofPurchaseClick(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsPar(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    asOfJoin(purchases, clicks, "user_id", "ts", carry = Seq("event_id"))
      .select(col("event_id").as("purchase_id"),
        col("user_id"), col("ref_event_id").as("click_id"))
      .orderBy(col("purchase_id"))
  }
}
