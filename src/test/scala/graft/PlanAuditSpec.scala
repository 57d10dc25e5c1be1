package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Structural plan audits for the headline operators — scale discipline
  * asserted on the PLAN, not the wall clock (this VM's bandwidth swings
  * 1.5–4× between runs, so "it ran fast once" proves nothing; "the filter
  * reached the parquet scan" is true at every scale).
  *
  * Each test executes the query (so AQE finalizes its plan), then asserts
  * on the formatted physical plan:
  *   - pushdown:  filters/projections reach the `FileScan` (PushedFilters /
  *     ReadSchema) — at 100 TB this is the difference between reading a
  *     column chunk and reading the corpus;
  *   - broadcast: dimension joins stay `BroadcastHashJoin`, never a
  *     shuffled join of a 60k-row dim against the fact table;
  *   - no single-partition funnels: nothing moves the full table to one
  *     partition (`Exchange SinglePartition` feeding a sort/window);
  *   - extraction is shuffle-free: the page→triple map has zero Exchange.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Execute (finalizes AQE) and return the formatted physical plan. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  private def run(name: String): String = {
    val q = SparkEntry.queries(name)
    finalPlan(q(spark, sf))
  }

  test("q_filter_project: predicate and projection reach the parquet scan") {
    val p = run("q_filter_project")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThan(l_quantity,45.0)"), "filter not pushed to scan:\n" + p)
    // projection pruned: the scan must not read unprojected lineitem columns
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(readSchema.contains("l_quantity"), readSchema)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipdate"),
      "scan reads unprojected columns:\n" + readSchema)
  }

  test("q_point_lookup: point predicate pushed to the scan") {
    val p = run("q_point_lookup")
    assert(p.contains("EqualTo(o_orderkey,42)"), "point filter not pushed:\n" + p)
  }

  test("q_star_join: all three dimension joins broadcast; aggregation is partial+final") {
    val p = run("q_star_join")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 3, s"expected >=3 broadcast joins, got $bhj:\n" + p)
    // map-side combine: partial HashAggregate before the exchange, final after
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation:\n" + p)
  }

  test("q_rrf: no full-table single-partition move (top-k before the window)") {
    val p = run("q_rrf")
    assert(!p.contains("Exchange SinglePartition"),
      "global single-partition funnel in rrf plan:\n" + p)
    assert(p.contains("TakeOrderedAndProject"), "top-k not distributed:\n" + p)
  }

  test("q_topk_per_group: per-group window partitions by the group key") {
    val p = run("q_topk_per_group")
    assert(!p.contains("Exchange SinglePartition"),
      "per-group top-k moved the table to one partition:\n" + p)
  }

  test("extraction is shuffle-free: pages→triples has zero Exchange") {
    // In production pages arrive as a parquet scan; the synthesis joins in
    // Pages.corpus are test-fixture generation, not the path under audit.
    // Materialize once, then assert extraction adds no Exchange on top of
    // the scan.
    val dir = java.nio.file.Files.createTempDirectory("plan-audit-pages").toString
    graft.kg.Pages.corpus(spark, sf).write.mode("overwrite").parquet(dir)
    val pages = spark.read.parquet(dir)
    val t = graft.kg.Extract.triples(spark, pages).toDF()
    val p = finalPlan(t)
    assert(!p.contains("Exchange"), "extraction path shuffles:\n" + p)
  }

  test("q_dedup_minhash_lsh: banded join stays an equi-join (no all-pairs product)") {
    val p = run("q_dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct"), "LSH path degenerated to a cartesian product:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"), "LSH path degenerated to a nested-loop join:\n" + p)
    // the band self-join moves SLIM (band, key, id) rows only — a hot
    // bucket of k docs must never shuffle/broadcast k² shingle-array
    // copies; the arrays join back for the few surviving candidate pairs
    // (the Linking.duplicatePairs re-plan applied here). Anchored on the
    // (band, key) producer: the posexplode Generate must not carry the
    // shingle column, and any band-keyed exchange must be slim too (at
    // tiny SF the join side broadcasts instead of shuffling — both paths
    // inherit the Generate's slim output).
    val blocks = p.split("\\n\\(\\d+\\) ")
    val bandGenerates = blocks.filter(b => b.startsWith("Generate") && b.contains("band"))
    assert(bandGenerates.nonEmpty, "no band-key Generate found:\n" + p)
    bandGenerates.foreach(b =>
      assert(!b.contains("sh#"), "band generator carries shingle arrays into the join:\n" + b))
    blocks
      .filter(b => b.startsWith("Exchange") && b.contains("hashpartitioning(band"))
      .foreach(b => assert(!b.contains("sh#"), "band exchange carries shingle arrays:\n" + b))
    // shingles computed once: every consumer reads the checkpointed frame
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2,
      "expected the shingle frame checkpointed and re-read, not recomputed:\n" + p)
  }

  test("q_dedup_weighted: block-key candidate generation stays an equi-join") {
    val p = run("q_dedup_weighted")
    assert(!p.contains("CartesianProduct"), "weighted dedup degenerated to a cartesian product:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"), "weighted dedup degenerated to a nested-loop join:\n" + p)
    // candidates come from the block-key self-join (pairs keyed u1/u2);
    // scoring joins the two sides back by uuid — all equi-joins
    assert(p.contains("u1") && p.contains("u2"), p)
  }

  test("q_ann_lsh / q_ann_ivf: bucket pruning stays an equi-join (no all-pairs product)") {
    for (q <- Seq("q_ann_lsh", "q_ann_ivf")) {
      val p = run(q)
      assert(!p.contains("CartesianProduct"), s"$q degenerated to a cartesian product:\n" + p)
    }
  }

  test("q_ann_lsh16 (production width + multi-probe): query side broadcast, corpus never shuffles pre-join") {
    val p = run("q_ann_lsh16")
    assert(!p.contains("CartesianProduct"), "multi-probe degenerated to a cartesian product:\n" + p)
    assert(p.contains("BroadcastHashJoin"), "probe-signature join must broadcast the (tiny) query fan-out:\n" + p)
    // the corpus side reaches the sig equi-join straight from its scan —
    // at 100 TB an Exchange of the corpus before candidate pruning would
    // shuffle everything to prune 2^-16 of it
    assert(
      !"Exchange hashpartitioning.*sig".r.findFirstIn(p).isDefined,
      "corpus shuffled on sig before the broadcast probe join:\n" + p,
    )
  }

  test("q_dedup_exact: one shuffle on the fingerprint, partial combine, pruned scan") {
    val p = run("q_dedup_exact")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, "extra shuffle in exact dedup:\n" + p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation:\n" + p)
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!readSchema.contains("lang"), "scan reads unprojected documents columns:\n" + readSchema)
  }

  test("q_temporal_stats: one grouped aggregation — single scan, partial combine, one shuffle") {
    val p = run("q_temporal_stats")
    // count in the FINAL plan tree only (formatted mode repeats the scan
    // in the initial-plan section and the node details)
    val finalTree = p.split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(finalTree).size <= 1, "events scanned more than once:\n" + p)
    assert("Exchange hashpartitioning".r.findAllIn(finalTree).size <= 1, "extra shuffle:\n" + p)
    assert("HashAggregate".r.findAllIn(finalTree).size >= 2, "no partial aggregation:\n" + p)
  }

  test("q_lang_id / q_quality_score: single-scan, one shuffle on the grouping key") {
    for (q <- Seq("q_lang_id", "q_quality_score")) {
      val p = run(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, s"$q: extra shuffle:\n" + p)
      assert("HashAggregate".r.findAllIn(p).size >= 2, s"$q: no partial aggregation:\n" + p)
    }
  }

  test("q1_agg: aggregation pushes partial combine below the shuffle") {
    val p = run("q1_agg")
    // exactly one shuffle (on the grouping key) for a single groupBy
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected <=1 shuffle, got $exchanges:\n" + p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation:\n" + p)
  }

  test("entity-linking pair join: both sides scan the checkpointed blocking frame, equi-join only") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val nodes = (0 until 500)
      .map(i => (graft.kg.Ids.entity("default", s"Customer#$i"), s"Customer#$i"))
      .toDF("uuid", "name")
    val pairs = graft.kg.Linking.duplicatePairs(nodes)
    val p = finalPlan(pairs)
    // the blocking frame (normName regexes + MinHash bands) is computed
    // ONCE and checkpointed; the self-join must read that RDD on both
    // sides instead of re-running the expressions
    val rddScans = "Scan ExistingRDD".r.findAllIn(p).size
    assert(rddScans >= 2, s"expected both join sides to scan the checkpointed blocking frame:\n" + p)
    // candidate generation stays an equi-join — never an all-pairs product
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "all-pairs product in the pair join:\n" + p)
  }
}
