package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Physical-plan regression guards: the scale properties the round
  * verdicts grade (pushdown, partial aggregation, distributed top-k,
  * no accidental cartesian products) asserted on the actual executed
  * plans, so a refactor that silently de-optimizes a headline query
  * fails the suite, not the next bench.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir

  private def plan(id: String): String =
    SparkEntry.queries(id)(spark, sfDir).queryExecution.executedPlan.toString

  test("b24 flagship: filter reaches the parquet scan; aggregate is two-phase") {
    val p = plan("b24_agg_groupby")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"filter not pushed to scan:\n$p")
    assert(p.contains("partial_"), s"no partial (map-side) aggregate:\n$p")
  }

  test("b02/b42 top-k compile to TakeOrderedAndProject (no global sort)") {
    assert(plan("b02_scan_limit").contains("TakeOrderedAndProject"))
    assert(plan("b42_topk_global").contains("TakeOrderedAndProject"))
  }

  test("c04 ANN brute-force: broadcast query + distributed top-k") {
    val p = plan("c04_sim_topk_search")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not distributed:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoop"),
      s"query vector not broadcast:\n$p")
  }

  test("b20 star join plans no cartesian product") {
    val p = plan("b20_join_multiway_star")
    assert(!p.contains("CartesianProduct"), s"cartesian in star join:\n$p")
  }

  test("c12 inverted-index join: equi-join on gram, no cartesian product") {
    val p = plan("c12_dedup_ngram_jaccard")
    assert(!p.contains("CartesianProduct"),
      s"pair generation degenerated to all-pairs:\n$p")
  }

  test("c02 LSH candidates come from an equi-join, never a cartesian product") {
    val p = plan("c02_dedup_near_minhash")
    assert(!p.contains("CartesianProduct"), s"banding degenerated:\n$p")
  }

  test("b71 string-distance join blocks on an equi-key, no cartesian product") {
    val p = plan("b71_string_distance")
    assert(!p.contains("CartesianProduct"),
      s"distance join degenerated to all-pairs:\n$p")
  }

  test("d72 eq-delete fold: broadcast anti-join sized by the key batch") {
    // the read-side fold must be a BROADCAST anti-join (build side =
    // the key batch), never a shuffle of the corpus or a cartesian
    val ref = {
      val wh = graft.GraftTmp.dir("pa_eq").toString
      graft.icelite.IceLite.createNamespace(wh, "src")
      val r = graft.icelite.TableRef(wh, "src", "t")
      import spark.implicits._
      graft.icelite.IceLite.createOrReplace(r,
        (1L to 100L).map(k => (k, k * 2.0)).toDF("k", "v"))
      graft.icelite.IceLite.deleteByKeysMoR(spark, r,
        Seq(5L, 6L).toDF("k"), Seq("k"))
      r
    }
    val p = graft.icelite.IceLite.read(spark, ref)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"eq fold degenerated:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"key batch not broadcast in eq-delete fold:\n$p")
  }

  test("c27 substring dedup joins on the window hash, no cartesian product") {
    val p = plan("c27_substring_dedup")
    assert(!p.contains("CartesianProduct"), s"span matching degenerated:\n$p")
  }

  test("c17 quantized top-k: broadcast query, distributed top-k, no cartesian") {
    val p = plan("c17_embed_quantize")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not distributed:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoop"),
      s"query row not broadcast:\n$p")
  }

  test("c19 decontamination: the eval gram set broadcasts; corpus side not shuffled") {
    val p = plan("c19_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval grams not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"gram match degenerated:\n$p")
  }

  test("c18 packing: window partitions by shard (no single-partition global window)") {
    val p = plan("c18_sequence_packing")
    assert(p.contains("windowspecdefinition(shard"),
      s"running-sum window must partition by shard:\n$p")
  }

  test("d21 salted join: shuffles on (key, salt), no broadcast, no cartesian") {
    val p = plan("d21_salted_skew_join")
    assert(!p.contains("BroadcastHashJoin"),
      s"salting demo must run the shuffle topology:\n$p")
    assert(!p.contains("CartesianProduct"), s"degenerated:\n$p")
    assert(p.contains("salt"), s"salt missing from the executed plan:\n$p")
  }

  test("c23 semantic dedup: within-cluster pairs come from an equi-join, no cartesian") {
    val p = plan("c23_semantic_dedup")
    // the k-centroid broadcast assignment is a BroadcastNestedLoop by
    // design (k rows); the PAIR join must never degenerate to one
    assert(!p.contains("CartesianProduct"),
      s"cluster pair join degenerated to all-pairs:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoop"),
      s"centroids not broadcast:\n$p")
  }

  test("d29 aggregate pushdown: the final plan reads the metadata-only scan") {
    val p = plan("d29_agg_pushdown")
    assert(p.contains("IceLiteAggScan"),
      s"count/min/max not served by the metadata-only scan:\n$p")
  }

  test("minhash_sig and cosine_sim stay inside whole-stage codegen") {
    // AQE defers codegen subtrees to execution time (the explainer
    // sees only the un-finalized adaptive root) — plan without AQE for
    // this static check
    def codegen(id: String): String = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try SparkEntry.queries(id)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.CodegenMode)
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    val c13 = codegen("c13_dedup_embed_cosine")
    assert(c13.contains("WholeStageCodegen subtrees") && !c13.startsWith("Found 0"),
      s"c13 has no codegen subtrees:\n${c13.take(500)}")
    assert(c13.contains("cosinesimilarity") || c13.contains("CosineSimilarity"),
      "native cosine expression missing from the codegen'd plan")
    val c02 = codegen("c02_dedup_near_minhash")
    assert(c02.contains("minhashsignature") || c02.contains("MinHashSignature"),
      "native minhash expression missing from the codegen'd plan")
  }
}
