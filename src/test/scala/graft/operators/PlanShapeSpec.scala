package graft.operators

import graft.SparkSpec

/** Physical-plan regression guards for the scale-critical properties:
  * filter pushdown to the parquet scan, column pruning, broadcast of
  * dimension sides, partial aggregation before the exchange, top-k via
  * TakeOrdered (never a global sort), and bucketed (not label-wide)
  * near-dup candidate joins. These are the properties the 100 TB posture
  * depends on — a silent regression (a lost pushdown, a sort sneaking
  * back in) matters more than a few percent of runtime.
  *
  * Assertions are structural (a column appears within the ReadSchema
  * line, a join carries a signature key) rather than exact
  * formatted-explain substrings, so a Spark upgrade that reorders pruned
  * columns or renames an agg label fails only on real regressions.
  */
class PlanShapeSpec extends SparkSpec {

  private def executed(q: org.apache.spark.sql.DataFrame): String = {
    q.collect() // let AQE finalize so the asserted plan is the real one
    // formatted explain: AQE's plan toString elides scan metadata
    // (PushedFilters/ReadSchema) inside query stages
    q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  /** The ReadSchema line(s) for scans of a table containing `marker`. */
  private def readSchemas(plan: String, marker: String): Seq[String] =
    plan.linesIterator.filter(_.contains("ReadSchema:")).filter(_.contains(marker)).toSeq

  test("q6: all predicates pushed to the scan, only needed columns read") {
    val plan = executed(Joins.q6Forecast(spark, sf001))
    assert(plan.contains("PushedFilters:"), plan.take(400))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range not pushed")
    assert(plan.contains("LessThan(l_quantity"), "quantity filter not pushed")
    // projection pruning, column-order agnostic: the lineitem scan reads
    // exactly the 4 referenced columns and none of the other 4
    val schemas = readSchemas(plan, "l_quantity")
    assert(schemas.nonEmpty, "lineitem ReadSchema line not found")
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"))
      assert(schemas.forall(_.contains(c)), s"needed column $c pruned away")
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))
      assert(schemas.forall(!_.contains(c)), s"unneeded column $c not pruned")
  }

  test("q5: dimension sides broadcast, no global sort before aggregation") {
    val plan = executed(Joins.q5LocalSupplier(spark, sf001))
    assert(plan.contains("BroadcastHashJoin"), "dims should broadcast")
    assert(plan.contains("HashAggregate"), "aggregation should be hash-based")
  }

  test("word_topk: partial aggregation before the exchange, top-k via TakeOrdered") {
    val plan = executed(Analytics.wordTopk(spark, sf001))
    assert(plan.contains("HashAggregate"), "map-side combine missing")
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("window_topk_per_key: single shuffle on the partition key") {
    val plan = executed(Windows.windowTopkPerKey(spark, sf001))
    assert(plan.contains("Window"), "window operator expected")
    // the window needs a hash exchange keyed (at least) on o_custkey; the
    // trailing presentation sort is on the tiny result
    assert(plan.contains("hashpartitioning") && plan.contains("o_custkey"),
      "keyed shuffle expected")
  }

  test("embedding_near_dup: candidates join on LSH signature buckets, never label-wide") {
    val q = Similarity.embeddingNearDup(spark, sf001)
    // every equi-join in the plan must key on a discriminating column —
    // the LSH signature (candidate stage) or vec_id (vector fetch); a
    // label-only join would be the quadratic within-label blowup the
    // bucketed design exists to avoid (round-2 verdict #3)
    val joins = q.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty, "expected joins in the near-dup plan")
    joins.foreach { j =>
      val condCols = j.condition.toSeq
        .flatMap(_.references.toSeq).map(_.name).toSet
      assert(condCols.contains("sig") || condCols.exists(_.startsWith("vec_id")) ||
        condCols.exists(_.startsWith("va")) || condCols.exists(_.startsWith("vb")),
        s"join keyed only on ${condCols.mkString(",")} — label-wide self-join")
    }
    // and the rerank output matches the exact baseline on every candidate
    // it surfaces (subset property: LSH ∩ threshold ⊆ exact threshold)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.embeddingNearDupExact(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), s"bucketed pairs not a subset: ${got -- exact}")
  }

  /** Exchange TREE nodes in the AQE final plan (formatted explain repeats
    * every node in the Initial Plan and detail sections — slice them off
    * and count only real shuffle nodes, not Reused/QueryStage wrappers).
    */
  private def finalPlanExchanges(plan: String): Int = {
    val section = plan.indexOf("== Initial Plan ==") match {
      case -1 => plan.indexOf("\n(1) ") match { // detail list start
        case -1 => plan
        case d  => plan.substring(0, d)
      }
      case i => plan.substring(0, i)
    }
    section.linesIterator.count(l0 =>
      l0.contains("Exchange (") && !l0.contains("ReusedExchange"))
  }

  test("bucketed join: sort-merge join with NO exchange on either input") {
    val (o, l) = Joins.bucketedTables(spark, sf001)
    val joined = o.hint("merge")
      .join(l, org.apache.spark.sql.functions.col("o_orderkey") ===
        org.apache.spark.sql.functions.col("l_orderkey"))
    val plan = executed(joined)
    assert(plan.contains("SortMergeJoin"), "merge hint should pin SMJ")
    // the whole point of bucketing: zero shuffles anywhere in the join
    assert(finalPlanExchanges(plan) == 0, s"bucketed join should not shuffle:\n$plan")
    // the full demo adds exactly two tiny post-join exchanges (3-row agg +
    // presentation sort) — and still none below the join
    val demo = executed(Joins.bucketedJoinDemo(spark, sf001))
    val demoEx = finalPlanExchanges(demo)
    assert(demoEx == 2, s"expected only agg+sort exchanges, got $demoEx:\n$demo")
  }

  test("TPC-H remainder: dims broadcast, no cartesian/BNLJ products, one fact pass") {
    // the round-6 additions at their intended plan shapes: every
    // dimension side broadcast, never a cartesian or nested-loop product
    // (q11/q15/q17/q22 DO carry one legitimate single-row broadcast
    // cross: the scalar-subquery threshold), and q2's correlated MIN as
    // a window over ONE lineitem aggregation pass (not a self-join that
    // duplicates the aggregation subtree per consumer)
    val shapes = Seq(
      "q2" -> TpchRemainder.q2MinCostSupplier(spark, sf001),
      "q8" -> TpchRemainder.q8MarketShare(spark, sf001),
      "q9" -> TpchRemainder.q9ProductProfit(spark, sf001),
      "q16" -> TpchRemainder.q16SupplierCnt(spark, sf001),
      "q20" -> TpchRemainder.q20PotentialPromo(spark, sf001))
    for ((name, q) <- shapes) {
      val plan = executed(q)
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian product")
      assert(plan.contains("BroadcastHashJoin"), s"$name lost its broadcast joins")
    }
    val q2Plan = executed(TpchRemainder.q2MinCostSupplier(spark, sf001))
    val lineitemAggs = q2Plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("lineitem"))
    assert(lineitemAggs <= 1, s"q2 scans lineitem $lineitemAggs times (want 1)")
  }

  test("corpus_pipeline: per-row stages fuse into the scan; few, keyed shuffles") {
    val plan = executed(TextAnalysis.corpusPipeline(spark, sf001))
    // the composed normalize→filter→hash pipeline must be ONE codegen'd
    // per-row stage over the scan — if an exchange sneaks between the
    // per-row stages, the fusion claim (SURVEY round-5 addendum) is gone.
    // Budget: the (source,h) dedup agg, the per-source rollups on each
    // join branch, the join itself, and the presentation sort — all on
    // grouped/metadata-scale data, never a second pass over the text
    assert(plan.contains("HashAggregate"), "dedup groupBy should be hash-based")
    val exchanges = finalPlanExchanges(plan)
    assert(exchanges <= 5, s"pipeline grew to $exchanges exchanges:\n$plan")
    // exactly ONE scan of the documents table feeds the whole pipeline
    // branch that reads text (the docs_in branch re-scans only doc_id,
    // source — column pruning must keep `text` out of it)
    val textSchemas = readSchemas(plan, "text")
    assert(textSchemas.size == 1,
      s"text column read by ${textSchemas.size} scans — stages not fused")
  }

  test("cluster_mix: both assignment passes broadcast the K-row centroid side") {
    val plan = executed(Clustering.clusterMix(spark, sf001))
    // the K-row seed/centroid relations ride broadcast joins under the
    // corpus×K cross joins — a shuffled join there would repartition the
    // full embedding corpus per pass and sink the 100 TB posture. (The
    // one join Spark may sort-merge is fit⋈a1 inside centroid
    // accumulation: BOTH sides are the bounded fit sample, so its cost
    // is sample-scale by construction — measured A/B showed forcing a
    // persist+broadcast there costs MORE wall time than it saves.)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), "centroids must broadcast")
    // the full-corpus table feeds each assignment pass by scan, not by
    // being the build side of any broadcast: no broadcast of `e` can
    // appear (K rows broadcast; the corpus must never)
    assert(!plan.linesIterator.exists(l =>
      l.contains("BroadcastExchange") && l.contains("embedding#") &&
        l.contains("label#")),
      s"the corpus relation itself was broadcast:\n$plan")
  }
}
