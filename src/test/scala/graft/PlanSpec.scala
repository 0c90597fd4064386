package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the properties that matter at 100 TB must be
  * visible in the plan, not assumed — filters reach the parquet scan,
  * scans prune columns, dimension joins broadcast, and hot paths stay
  * inside whole-stage codegen.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_filter_pushdown pushes predicates into the parquet scan") {
    val p = plan("q_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipda") || p.contains("LessThan(l_quantity"), p)
  }

  test("q_filter_pushdown prunes columns at the scan") {
    val p = plan("q_filter_pushdown")
    // only the 4 needed columns should be read, never the full 11
    assert(!p.contains("l_orderkey"), "scan reads un-needed columns:\n" + p)
  }

  test("q3_top_orders broadcasts the dimension side") {
    val p = plan("q3_top_orders")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_join_enrich broadcasts the customer dim") {
    val p = plan("q_join_enrich")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q1 aggregation is whole-stage codegen with partial aggregation") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stages are visible
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
    // partial + final pair => map-side combine before the shuffle
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q_tail_sampling plans a broadcast semi join (decision side is small)") {
    val p = plan("q_tail_sampling")
    assert(p.contains("LeftSemi"), p)
  }

  test("dedup pipelines never degrade to cartesian products") {
    for (q <- Seq("q_dedup_minhash", "q_dedup_simhash", "q_ngram_jaccard", "q_dedup_apply",
        "q_dedup_embed", "q_dedup_minhash_scale", "q_dedup_simhash_scale")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("ANN brute force is the only deliberate cross product (broadcast side)") {
    val p = plan("q_ann_bruteforce")
    // Q×N with a broadcast query set is the intended shape; it must be
    // the broadcast nested-loop form, never a shuffled cartesian
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q3_top_orders only hints the true dimension (customer) for broadcast") {
    // a fact-derived join side must never carry a broadcast hint —
    // at 100× the data it becomes a build-side OOM. One ResolvedHint
    // (the filtered customer dim) and nothing else.
    val analyzed = SparkEntry.queries("q3_top_orders")(spark, sf)
      .queryExecution.analyzed.toString
    assert("ResolvedHint".r.findAllIn(analyzed).size == 1, analyzed)
  }

  test("no query plans a single-partition global window") {
    import org.apache.spark.sql.execution.window.WindowExec
    for (q <- Seq("q_batch_assign", "q_sessionize", "q_topk_per_group",
        "q_batch_timeout", "q_batch_by_key")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
      val empty = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      assert(empty.isEmpty,
        s"$q moves all data to one partition for a window:\n$plan")
    }
  }

  test("q_filter_events keeps the filter adjacent to the scan") {
    val p = plan("q_filter_events")
    assert(p.contains("PushedFilters: [IsNotNull(event_type)") ||
      p.contains("EqualTo(event_type"), p)
  }
}
