package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §4 / 100 TB posture).
  *
  * AQE's skew-join handling (on by default in Spark 4) splits oversized
  * sort-merge partitions at runtime, which covers most cases. Salting is
  * the explicit, planner-independent fallback for the pathological shape —
  * one key carrying a double-digit percentage of a fact table joined to a
  * side small enough to replicate but too large to broadcast whole.
  */
object Skew {

  /** Salted equi-join, semantically identical to
    * `left.join(right, Seq(key))` (inner): every left row gets a
    * deterministic pseudo-random salt in [0, salts), the right side is
    * replicated `salts` times, and the join key becomes (key, salt) — a
    * single hot key spreads over `salts` reducers instead of serializing
    * through one.
    *
    * The salt derives from xxhash64 over ALL left columns — pure row
    * content, no positional input — so a stage retry after a fetch failure
    * re-emits every row with the SAME salt and routes it to the same
    * reducer (a positional salt like monotonically_increasing_id is the
    * classic nondeterministic-shuffle-key hazard: a retry can re-salt a
    * row and duplicate or drop it). Trade-off: fully identical left rows
    * share a salt, so a hot key made of byte-identical duplicate rows
    * still skews — dedup or add a distinguishing column first.
    *
    * Cost model: right side shuffles `salts`× its size; choose
    * `salts` ≈ (hot-key rows / target partition rows), not more.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "saltedJoin reserves the _salt column name; rename it on the inputs first")
    val salted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    val replicated = right.withColumn("_salt",
      explode(expr(s"sequence(0L, ${salts - 1}L)")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
