package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantics tests for the LLM pack, covering what the DuckDB oracle
  * cannot: dedup idempotence (SURVEY §5.2.4) and the LSH banding
  * guarantees of c02 (hash-dependent, no oracle). */
class LlmPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir
  import spark.implicits._

  test("c01 dedup is idempotent: applying it to its own output changes nothing") {
    val once = LlmPack.queries("c01_dedup_exact")(spark, sfDir)
      .as[(Long, String, String, Long)].collect().toSeq
    // feed the deduped doc_ids back through the same normalization
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val onceIds = once.map(_._1).toSet
    val again = docs.filter($"doc_id".isin(onceIds.toSeq: _*))
      .groupBy(lower(trim($"text"))).count()
      .filter($"count" > 1).count()
    assert(again == 0, "dedup output still contains duplicate normalized texts")
  }

  test("c01 keeps exactly one representative (the min doc_id) per normalized text") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val expected = docs
      .groupBy(lower(trim($"text")).as("norm"))
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val got = LlmPack.queries("c01_dedup_exact")(spark, sfDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got == expected)
  }

  test("c02 LSH banding: finds planted near-duplicates without the quadratic product") {
    // plant: 40 docs over a large scattered vocabulary (pairwise
    // overlap ≈ 0) + 2 pairs of near-identical texts
    val base = (0 until 40).map(i =>
      (i.toLong, (0 until 30).map(j => s"w${(i * 1009 + j * 9176) % 10007}").mkString(" ")))
    val nearA = (100L, base(3)._2.replaceFirst("w\\d+$", "wX"))
    val nearB = (101L, base(8)._2.replaceFirst("^w\\d+", "wY"))
    val df = (base :+ nearA :+ nearB).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("llm_spec").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val pairs = LlmPack.queries("c02_dedup_near_minhash")(spark, tmp)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

    assert(pairs.contains((3L, 100L)), s"missed planted near-dup (3,100): $pairs")
    assert(pairs.contains((8L, 101L)), s"missed planted near-dup (8,101): $pairs")
    // banding must not degenerate to all-pairs: 42 docs → 861 pairs
    assert(pairs.size < 100, s"candidate blow-up: ${pairs.size} pairs")
  }

  test("c04 top-k equals brute-force ranking") {
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val topk = LlmPack.queries("c04_sim_topk_search")(spark, sfDir)
      .select($"vec_id").as[Long].collect().toSeq
    assert(topk.size == 10 && topk.distinct.size == 10 && !topk.contains(0L))
  }

  test("c09 centroids: n sums back to table size per position") {
    val rows = LlmPack.queries("c09_vector_stats")(spark, sfDir)
      .groupBy($"pos").agg(sum($"n").as("total"))
      .select($"total").distinct().as[Long].collect().toSeq
    val nVecs = graft.Tables.load(spark, sfDir, "embeddings").count()
    assert(rows == Seq(nVecs), "every embedding contributes to every position")
  }
}
