package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import syntax._

/** SURVEY.md §2 Part C — LLM-data-pipeline operators c01-c09 over the
  * `documents` / `embeddings` fixtures (the BASELINE north star; not
  * present in the reference, which stops at lakehouse plumbing).
  *
  * Every operator is built from codegen'd built-ins (higher-order
  * functions, xxhash64, windows) — no UDFs in any hot path.
  *
  * Scale design (100 TB):
  * - c01 dedups with ONE hash shuffle (window over the normalized-text
  *   key), no join-back.
  * - c02 is minhash+LSH banding: candidate pairs come from equi-joins
  *   on (band, band_hash) — never the quadratic all-pairs product; the
  *   residual exact-Jaccard check runs only on candidates.
  * - c04 is broadcast-query brute force compiling to
  *   TakeOrderedAndProject: each partition keeps k rows, the driver
  *   merges k·p rows — the distributed top-k pattern (PAPERS.md).
  * - c05 bounds the kNN join by label blocking: pair count is
  *   Σ block² not N².
  * - c07's document-frequency side is vocabulary-sized → broadcast
  *   join against the tf side, which shuffles once on (doc, term).
  */
object LlmPack extends Pack {

  /** c02's most recent persisted signature stage — unpersisted by the
    * next same-context invocation (the current one backs the returned
    * lazy plan; see PersistSlot for the context-scoping rationale). */
  private val lastSig = new PersistSlot

  /** c12's most recent persisted postings stages (same lifecycle). */
  private val lastGrams = new PersistSlot

  /** c12's hot-gram guard: df per gram over the declared cap. */
  private[queries] val HotGramCap = 1000L

  /** Distinct word-3-gram postings with hot grams (df > cap) REMOVED,
    * plus the dropped-gram count. The postings self-join's pair work
    * is Σ_g df(g)² — one stop-phrase gram with df=10⁶ in a 100 TB
    * corpus alone yields 10¹² candidate pairs on a single reducer, so
    * the cap is what keeps the exact operator alive at scale (c02's
    * LSH is the approximate fallback). Dropping a gram from BOTH the
    * postings and the size counts keeps Jaccard self-consistent: it
    * becomes exact Jaccard over the df≤cap gram universe, and hot
    * grams (stop phrases) carry no similarity signal anyway. The
    * dropped count is returned so truncation is visible in the
    * result, never silent. */
  /** The dropped-count side travels as a 1-ROW FRAME, not an eager
    * scalar: `hot.count()` was a separate Spark action that ran the
    * whole postings build + df shuffle BEFORE the main query even
    * started (r15 profile: the count's materialization job was c12's
    * single biggest). As a frame it rides the main action — one job.
    * (Correction of the r15 notes: no ReusedExchange ever formed
    * across the broadcast/agg shapes — the r15 plan paid the gram
    * aggregation twice; the persisted `hot` frame below is what
    * actually makes it run once.) */
  private[queries] def cappedGramPostings(docsDf: DataFrame,
      cap: Long): (DataFrame, DataFrame) = {
    // spread: the gram explode is the CPU stage of c12/c16 (profiled
    // 1.5 s in ONE scan task at sf0.1) — parallelize it when the scan
    // is below core count (no-op at scale; guide §2.5). Only on the
    // CAPPED production path: the uncapped caller is c02's bounded
    // audit reference (a ≤1000-doc slice), where the spread shuffle
    // costs more than the one-task work it saves (measured +0.45 s).
    val raw = (if (cap == Long.MaxValue) docsDf else spread(docsDf, $"doc_id"))
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 3)
      .select($"doc_id",
        explode(array_distinct(expr("word_ngrams(toks, 3)"))).as("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // an unbounded cap needs no df pass at all — skip the extra
    // shuffle (c02's audit-window exact reference runs uncapped)
    if (cap == Long.MaxValue) {
      lastGrams.swap(raw)
      return (raw, docsDf.sparkSession.range(1)
        .select(lit(0L).as("hot_grams_dropped")))
    }
    // hot list is tiny by construction (only grams with df > cap), so
    // the anti-join broadcasts; df is ONE extra shuffle on gram over
    // the persisted postings — the price of a bounded self-join.
    // r16 (verdict #3): the drop-count frame used to re-aggregate
    // dfCounts — the r15 plan showed the gram aggregation TWICE (no
    // ReusedExchange formed across the broadcast/agg shapes). Persist
    // the tiny hot frame instead and derive the count FROM it: the
    // gram agg runs once (materializing hot), and both consumers read
    // the persisted df>cap rows (0 rows at every fixture scale).
    val dfCounts = raw.groupBy($"gram").agg(count(lit(1)).as("df"))
    val hot = dfCounts.filter($"df" > cap).select($"gram")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nHot = hot.agg(count(lit(1)).as("hot_grams_dropped"))
    val grams = raw.join(hot, Seq("gram"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lastGrams.swap(raw, hot, grams)
    (grams, nHot)
  }

  /** The c12 pair engine, cap-parameterized: threshold-filtered
    * near-dup pairs (unrounded, unsorted) + the hot-gram drop count.
    * c12 adds presentation (rounding, ordering); c16 feeds the raw
    * pairs straight into component clustering. */
  private[queries] def jaccardPairsRaw(s: SparkSession, dir: String,
      cap: Long, maxDoc: Option[Long] = None): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    val d0 = docs(s, dir)
    val (grams, nHot) = cappedGramPostings(
      maxDoc.fold(d0)(m => d0.filter($"doc_id" < m)), cap)
    val sizes = grams.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = grams.as("a").join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    // sizes is one row per doc — corpus-sized, so no explicit
    // broadcast (AQE promotes it when it fits; at 100 TB these are
    // shuffle joins on the pair keys)
    val pairs = inter
      .join(sizes.as("sa"), $"doc_a" === col("sa.doc_id"))
      .join(sizes.as("sb"), $"doc_b" === col("sb.doc_id"))
      .withColumn("jaccard",
        $"inter".cast("double") / (col("sa.n") + col("sb.n") - $"inter"))
      .filter($"jaccard" >= 0.5)
    (pairs, nHot)
  }

  /** The c02 pair engine: minhash signatures (16 hashes) over word
    * 3-shingles, LSH banded 4×4; candidates from the band equi-join,
    * then the exact-Jaccard residual verify. Signatures are the
    * expensive stage — persisted so the band self-join and both
    * shingle join-backs read them once, not 4× (at 100 TB this is a
    * materialized signatures table; Spark's ContextCleaner drops the
    * blocks once the plan is GC'd). minhash_sig is the native
    * one-pass codegen'd signature (2 string hashes + k mult-adds per
    * shingle) — the HOF formulation re-walked and re-hashed the
    * shingle array k times in interpreted lambdas. No array_distinct:
    * min() and array_intersect/union are duplicate-insensitive.
    * Bands carry only (doc_id, band, bh) through the shuffle — never
    * the shingle arrays. */
  private[queries] def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val sig = docs(s, dir)
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 3)
      .withColumn("shingles", expr("word_ngrams(toks, 3)"))
      .withColumn("sig", expr("minhash_sig(shingles, 16)"))
      .select($"doc_id", $"shingles", $"sig")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lastSig.swap(sig)
    val bands = sig.select($"doc_id",
        explode(expr("transform(sequence(0, 3), b -> named_struct('band', b, 'bh', xxhash64(slice(sig, b * 4 + 1, 4))))")).as("e"))
      .select($"doc_id", $"e.band", $"e.bh")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .join(sig.select($"doc_id".as("doc_a"), $"shingles".as("sh_a")), "doc_a")
      .join(sig.select($"doc_id".as("doc_b"), $"shingles".as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b")))
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** c12 body, cap-parameterized so the unit test can exercise the
    * guard with a small cap (the declared query uses [[HotGramCap]]). */
  private[queries] def ngramJaccard(s: SparkSession, dir: String,
      cap: Long): DataFrame = {
    val (pairs, nHot) = jaccardPairsRaw(s, dir, cap)
    pairs
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("jaccard"))
      .crossJoin(broadcast(nHot)) // appends hot_grams_dropped (1 row)
      .orderBy($"doc_a", $"doc_b")
  }

  /** c27's core, w-parameterized for the unit test: per document, how
    * many of its w-token windows appear verbatim in ≥2 distinct
    * documents. Window strings never shuffle — only 64-bit xxhash64
    * keys do (the c27 Decl documents the collision trade). */
  private[queries] def substringDupCounts(d0: DataFrame, w: Int): DataFrame = {
    val d = d0
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= w)
    val wins = d.select($"doc_id",
        explode(expr(s"word_ngrams(toks, $w)")).as("gram"))
      .select($"doc_id", xxhash64($"gram").as("gh"))
    val dup = wins.distinct()
      .groupBy($"gh").agg(count(lit(1)).as("nd"))
      .filter($"nd" >= 2).select($"gh")
    val pd = wins.join(dup, Seq("gh"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).cast("long").as("dup_windows"))
    d.select($"doc_id", (size($"toks") - lit(w - 1)).cast("long").as("n_windows"))
      .join(pd, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_windows"))
      .withColumn("dup_ratio",
        round($"dup_windows" / $"n_windows", 4))
      .orderBy($"doc_id")
  }

  /** c16's persisted edge/label stages (same lifecycle as lastSig). */
  private val lastCC = new PersistSlot

  /** c26's persisted pair/unigram counts (same lifecycle): the plan
    * reads `pairs` twice (totals + the PMI join) and `uni` three
    * times — unpersisted, each consumer re-exploded the full token
    * stream (the sf1 shadow-bench caught it at 61x: four token
    * explosions per run, each 10x bigger). */
  private val lastPmi = new PersistSlot

  /** Large-star/small-star edge contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond"): returns an edge
    * set with the SAME connected components whose diameter collapses
    * in O(log n) alternating rounds, independent of the input graph's
    * diameter. Hash-to-min alone needs one shuffle per hop of
    * diameter — fine for near-dup fans (diameter 2-3), a scale-killer
    * on chain-shaped graphs (e.g. drifting boilerplate where doc i
    * only resembles doc i±1). Each round is two window-aggregated
    * passes:
    *   large-star: every neighbor v > u re-attaches to m = min(Γ⁺(u))
    *   small-star: every neighbor v ≤ u (and u itself) attaches to
    *     the min of that small neighborhood
    * Both preserve components exactly (the paper's invariant); the
    * fixpoint witness is the edge-set fingerprint (count + bit_xor of
    * per-edge hashes — order-independent, overflow-free under ANSI,
    * and exact on sets up to hash collisions; a collision could only
    * end the loop one round early, and the caller's own hash-to-min
    * fixpoint still guarantees correct labels on whatever edge set it
    * receives). */
  private[queries] def largeStarSmallStar(pairs: DataFrame,
      maxIter: Int = 50): DataFrame = {
    def symm(e: DataFrame): DataFrame = e
      .select(explode(array(
        struct($"src".as("u"), $"dst".as("v")),
        struct($"dst".as("u"), $"src".as("v")))).as("p"))
      .select($"p.u".as("u"), $"p.v".as("v"))
    val w = Window.partitionBy($"u")
    def largeStar(e: DataFrame): DataFrame = symm(e)
      .withColumn("m", least(min($"v").over(w), $"u"))
      .filter($"v" > $"u")
      .select($"v".as("src"), $"m".as("dst"))
      .distinct()
    def smallStar(e: DataFrame): DataFrame = {
      val small = symm(e).filter($"v" <= $"u")
        .withColumn("m", least(min($"v").over(w), $"u"))
      small.select($"v".as("src"), $"m".as("dst"))
        .union(small.select($"u".as("src"), $"m".as("dst")))
        .filter($"src" =!= $"dst")
        .distinct()
    }
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(src, dst))")).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // localCheckpoint (eager) per round: each round's plan REFERENCES
    // the previous round's twice (smallStar unions two projections of
    // the same window stage), so an un-truncated lineage doubles every
    // iteration — exponential plan blowup long before any data-size
    // problem. Checkpointing materializes the round and cuts the
    // logical plan to a leaf; on a multi-node cluster the same loop
    // uses reliable checkpoint() to survive executor loss.
    var edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
      .localCheckpoint(true)
    var prev = fingerprint(edges)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val f = fingerprint(next)
      done = f == prev
      prev = f
      scala.util.Try(edges.unpersist(blocking = false))
      edges = next
      iter += 1
    }
    require(done, s"largeStarSmallStar: no fixpoint in $maxIter iters")
    lastLSS.swap(edges)
    edges.select($"src".as("doc_a"), $"dst".as("doc_b"))
  }

  /** largeStarSmallStar's final checkpointed round (unpersisted on the
    * next invocation, same lifecycle as lastCC). */
  private val lastLSS = new PersistSlot

  /** c16: hash-to-min connected components over an undirected pair
    * set (columns doc_a, doc_b). Labels start as each node's own id;
    * every iteration each node takes the min label across itself and
    * its neighbors — ONE shuffle per iteration (union + groupBy id),
    * converging in ≤ diameter steps. Near-dup components are mutation
    * fans of a base document (diameter 2-3), so the loop is shallow.
    * Labels can only decrease, so `next.comp < old.comp` is an exact
    * convergence test.
    *
    * Deep/huge graphs: when `contractionThreshold` is set and the
    * pair count exceeds it, the edge set is first collapsed with
    * [[largeStarSmallStar]] — O(log n) rounds regardless of diameter
    * — and hash-to-min then labels the contracted (diameter ≤ 2)
    * graph in 1-2 passes. c16 leaves the threshold unset (near-dup
    * fans are shallow, and the count probe would re-execute the
    * un-persisted pair join once); a chain-shaped workload passes the
    * expected pair budget. LlmPackSpec forces threshold 0 to pin the
    * contracted path end-to-end against the plain loop's labels. */
  private[queries] def connectedComponents(pairs: DataFrame,
      maxIter: Int = 20,
      contractionThreshold: Long = Long.MaxValue): DataFrame = {
    // a contracted graph keeps every original node at its fixpoint
    // (each non-min node holds an edge to its component min, and the
    // min appears as that edge's endpoint), so labeling the
    // contracted edges still labels every node that appeared in ≥1
    // original pair.
    val contracted =
      if (contractionThreshold != Long.MaxValue &&
          pairs.count() > contractionThreshold)
        largeStarSmallStar(pairs)
      else pairs
    // symmetrize in ONE pass over the pair plan (explode of the two
    // directions) — a union of two selects would execute the upstream
    // pair join twice before the checkpoint materializes.
    // localCheckpoint (eager) instead of persist: each round's plan
    // references `labels` TWICE (the join and the union), so an
    // un-truncated lineage doubles per iteration — exponential plan
    // growth that overflows plan stringification near ~20 rounds even
    // though the DATA is cached. Checkpointing cuts every round to a
    // leaf; a multi-node cluster uses reliable checkpoint() instead.
    // repartition WITHOUT an explicit count before the eager
    // checkpoint: localCheckpoint freezes the physical partitioning
    // for every iteration, and the upstream pair join leaves ~cores
    // near-empty partitions at fixture scale — each of the ~3 rounds
    // then pays per-task overhead × cores × (join + agg + checkpoint).
    // AQE sizes the countless exchange by bytes (guide §2.2 "fewer,
    // larger partitions"): edge-proportional — 1 partition here,
    // many on a 100 TB pair graph.
    val edges = contracted
      .select(explode(array(
        struct($"doc_a".as("src"), $"doc_b".as("dst")),
        struct($"doc_b".as("src"), $"doc_a".as("dst")))).as("e"))
      .select($"e.src".as("src"), $"e.dst".as("dst"))
      .repartition($"src")
      .localCheckpoint(true)
    var labels = edges.select($"src".as("id")).distinct()
      .withColumn("comp", $"id").localCheckpoint(true)
    // convergence probe: labels are monotonically non-increasing and
    // at least one strictly decreases per changing round, so
    // sum(comp) is a strictly decreasing fixpoint witness — ONE agg
    // action per iteration, no join-and-count job. Ids are < 2^40 and
    // node counts corpus-bounded, so the sum stays far from overflow.
    def sumComp(df: DataFrame): Long =
      df.agg(sum($"comp")).head.getLong(0)
    var prevSum = sumComp(labels)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val next = edges.as("e").join(labels.as("l"), col("e.dst") === col("l.id"))
        .select(col("e.src").as("id"), col("l.comp").as("comp"))
        .union(labels.select($"id", $"comp"))
        .groupBy($"id").agg(min($"comp").as("comp"))
        .localCheckpoint(true)
      val s = sumComp(next)
      done = s == prevSum
      prevSum = s
      scala.util.Try(labels.unpersist(blocking = false))
      labels = next
      iter += 1
    }
    require(done, s"connectedComponents: no fixpoint in $maxIter iters")
    scala.util.Try(edges.unpersist(blocking = false))
    lastCC.swap(labels)
    labels
  }

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** c32's mechanics, callable by the spec against its own out dir:
    * write the corpus as `nShards` reproducible shards (Knuth-hash
    * membership, one repartition, one file per shard dir,
    * deterministic within-shard order) and return the read-back
    * census with the one-file-per-shard witness. */
  private[graft] def shardedExport(s: SparkSession, dir: String,
      out: String, nShards: Int): DataFrame = {
    val shard = pmod($"doc_id" * lit(2654435761L), lit(4294967296L)) % nShards
    docs(s, dir)
      .withColumn("shard", shard.cast("long"))
      .withColumn("ord",
        pmod($"doc_id" * lit(1327217885L), lit(4294967296L)))
      .repartition(nShards, $"shard")
      .sortWithinPartitions($"shard", $"ord", $"doc_id")
      .select($"shard", $"doc_id", $"source", $"n_chars", $"text")
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    val perDir = graft.icelite.IceLite.listDir(java.nio.file.Files.walk(
        java.nio.file.Paths.get(out)))(_
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("_"))
      .toSeq.groupBy(_.getParent).map(_._2.size).toSeq)
    val oneFileEach = perDir.size == nShards && perDir.forall(_ == 1)
    s.read.parquet(out)
      .groupBy($"shard".cast("long").as("shard"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum($"n_chars").cast("long").as("sum_chars"),
        min($"doc_id").cast("long").as("min_doc"))
      .withColumn("one_file_per_shard", lit(oneFileEach))
      .orderBy($"shard")
  }
  private def emb(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  /** Cosine similarity in double precision, expression-only (SURVEY
    * §2 c03): sequential left-fold matches DuckDB's list_aggregate
    * summation order, so the unrounded doubles agree bitwise. */
  private def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x))
    dot / (na * nb)
  }

  val decls: Seq[Decl] = Seq(

    // keep the lowest doc_id per normalized text: one shuffle, no
    // join-back; at 100 TB the shuffle key is the (tiny) text hash,
    // not the document body
    Decl("c01_dedup_exact",
      (s, dir) => {
        val w = Window.partitionBy(xxhash64(lower(trim($"text"))), lower(trim($"text")))
          .orderBy($"doc_id".asc)
        // dedup runs over the FULL corpus; the verified export is a
        // keyed slice so the declared query never becomes an unbounded
        // ordered dump at scale (round-1 verdict pattern)
        docs(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .filter($"doc_id" < 300)
          .select($"doc_id", $"lang", $"source", $"n_chars")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, lang, source, n_chars FROM (
               SELECT * FROM documents
               QUALIFY ROW_NUMBER() OVER (PARTITION BY lower(trim(text))
                                          ORDER BY doc_id) = 1)
             WHERE doc_id < 300
             ORDER BY doc_id""")),

    // minhash signatures (16 hashes) over word 3-shingles, LSH banded
    // 4×4; candidates from band equi-join, then exact-Jaccard residual
    // (see [[minhashPairs]]). WHICH pairs the bands surface is
    // xxhash64-dependent (not reproducible in the oracle engine), but
    // the QUALITY CONTRACT is not: precision is structural (the
    // residual verify re-checks exact Jaccard ≥ 0.5, so false
    // positives are impossible) and recall vs the exact pair set is
    // 1−(1−J⁴)⁴ per pair — ≥0.99 measured on every fixture scale.
    // The declared query emits that contract as witness columns
    // (b27's tolerance-contract precedent), so the driver's DuckDB
    // gate asserts it instead of skipping this id. The exact
    // reference is scoped to a FIXED AUDIT WINDOW (doc_id < 1000 —
    // the whole corpus at sf0.01, a constant-cost sample above it):
    // the LSH engine always runs the full corpus, but the witness's
    // quadratic exact check must not — and the window's universe is
    // UNCAPPED, the same universe the residual verify and the oracle
    // compute in (a capped reference could flip the witness on
    // correct behavior whenever a gram crossed the df cap).
    Decl("c02_dedup_near_minhash",
      (s, dir) => {
        val found = minhashPairs(s, dir).select($"doc_a", $"doc_b")
          .filter($"doc_a" < 1000 && $"doc_b" < 1000)
        val exact = jaccardPairsRaw(s, dir, Long.MaxValue, Some(1000L))._1
          .select($"doc_a", $"doc_b")
        val j = exact.withColumn("t", lit(1))
          .join(found.withColumn("f", lit(1)),
            Seq("doc_a", "doc_b"), "full_outer")
        j.agg(
            coalesce(sum($"t"), lit(0)).cast("long").as("true_pairs"),
            sum(when($"t".isNotNull && $"f".isNotNull, 1).otherwise(0)).as("hit"),
            sum(when($"f".isNotNull && $"t".isNull, 1).otherwise(0)).as("fp"))
          .select($"true_pairs",
            when($"true_pairs" === 0, lit(true))
              .otherwise($"hit".cast("double") / $"true_pairs".cast("double") >= 0.9)
              .as("recall_ge_090"),
            ($"fp" === 0).as("zero_false_positives"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                            FROM documents
                            WHERE doc_id < 1000
                              AND len(string_split(text, ' ')) >= 3),
                  grams AS (SELECT DISTINCT doc_id,
                              t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
                            FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)),
                  sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
                  inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
                            FROM grams a JOIN grams b
                              ON a.gram = b.gram AND a.doc_id < b.doc_id
                            GROUP BY a.doc_id, b.doc_id),
                  pairs AS (SELECT doc_a, doc_b FROM inter
                            JOIN sizes sa ON doc_a = sa.doc_id
                            JOIN sizes sb ON doc_b = sb.doc_id
                            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5)
             SELECT CAST(COUNT(*) AS BIGINT) AS true_pairs,
                    TRUE AS recall_ge_090,
                    TRUE AS zero_false_positives
             FROM pairs""")),

    // cosine between consecutive vec_ids — pure expression, no UDF
    Decl("c03_sim_cosine_pair",
      (s, dir) => {
        val e = emb(s, dir)
        e.as("a").filter($"vec_id" < 250)
          .join(e.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
          .select(col("a.vec_id").as("vec_id"),
            round(cosine(col("a.embedding"), col("b.embedding")), 6).as("cos"))
          .orderBy($"vec_id")
      },
      Some("""SELECT a.vec_id AS vec_id,
             ROUND((list_aggregate(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum') / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x), 'sum')))), 6) AS cos
             FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
             WHERE a.vec_id < 250
             ORDER BY vec_id""")),

    // top-k neighbors of one query vector: broadcast the query row,
    // TakeOrderedAndProject does partition-local top-k + driver merge
    Decl("c04_sim_topk_search",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val e = emb(s, dir)
        val q = e.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
        e.filter($"vec_id" =!= 0)
          .crossJoin(broadcast(q))
          .select($"vec_id",
            round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos"))
          .orderBy($"cos".desc, $"vec_id".asc)
          .limit(10)
      },
      Some("""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
             SELECT vec_id, ROUND((list_aggregate(list_transform(list_zip(embedding, q_emb), x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum') / (sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) * sqrt(list_aggregate(list_transform(q_emb, x -> CAST(x AS DOUBLE) * x), 'sum')))), 6) AS cos
             FROM embeddings, q WHERE vec_id <> 0
             ORDER BY cos DESC, vec_id ASC LIMIT 10""")),

    // kNN self-join blocked on label: pair count is Σ block², and the
    // per-vector top-3 is a window, not a global sort
    Decl("c05_sim_topk_join",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val e = emb(s, dir)
        val w = Window.partitionBy($"vec_id").orderBy($"cos".desc, $"neighbor".asc)
        e.as("a").filter($"vec_id" < 100)
          .join(e.as("b"),
            col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
          .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor"),
            round(expr("cosine_sim(a.embedding, b.embedding)"), 6).as("cos"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter($"rn" <= 3)
          .select($"vec_id", $"rn", $"neighbor", $"cos")
          .orderBy($"vec_id", $"rn")
      },
      Some("""SELECT vec_id, rn, neighbor, cos FROM (
               SELECT vec_id, neighbor, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, neighbor ASC) AS BIGINT) AS rn
               FROM (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor,
                       ROUND((list_aggregate(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum') / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x), 'sum')))), 6) AS cos
                     FROM embeddings a JOIN embeddings b
                       ON a.label = b.label AND a.vec_id <> b.vec_id
                     WHERE a.vec_id < 100))
             WHERE rn <= 3
             ORDER BY vec_id, rn""")),

    // IVF-style ANN: the 100 TB scale path for c04. Coarse quantizer =
    // per-label centroids (tiny → broadcast); probe the nprobe=2
    // nearest cells, brute-force only inside them. At scale the probed
    // fraction of the corpus is nprobe/ncells — the scan never touches
    // the rest. Probe scoring stays in double (HOF) on both engines so
    // cell selection can't diverge; candidate scoring uses the native
    // codegen'd cosine_sim.
    Decl("c10_sim_topk_ivf",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val e = emb(s, dir)
        val cents = e
          .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
          .groupBy($"label", $"pos").agg(round(avg($"v".cast("double")), 6).as("cv"))
          .groupBy($"label")
          .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)")
            .as("centroid"))
        val q = e.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
        val probes = cents.crossJoin(broadcast(q))
          .select($"label", round(cosine($"centroid", $"q_emb"), 6).as("pcos"))
          .orderBy($"pcos".desc, $"label".asc).limit(2)
          .select($"label")
        e.filter($"vec_id" =!= 0)
          .join(broadcast(probes), "label")
          .crossJoin(broadcast(q))
          .select($"vec_id",
            round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos"))
          .orderBy($"cos".desc, $"vec_id".asc)
          .limit(10)
      },
      Some("""WITH cent AS (
               SELECT label, list(cv ORDER BY pos) AS centroid FROM (
                 SELECT label, pos, ROUND(AVG(CAST(e AS DOUBLE)), 6) AS cv
                 FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
                              unnest(embedding) AS e FROM embeddings)
                 GROUP BY label, pos)
               GROUP BY label),
             q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
             probes AS (
               SELECT label FROM cent, q
               ORDER BY ROUND(list_aggregate(list_transform(list_zip(centroid, q_emb), x -> x[1] * CAST(x[2] AS DOUBLE)), 'sum')
                 / (sqrt(list_aggregate(list_transform(centroid, x -> x * x), 'sum'))
                  * sqrt(list_aggregate(list_transform(q_emb, x -> CAST(x AS DOUBLE) * x), 'sum'))), 6) DESC,
                 label ASC
               LIMIT 2)
             SELECT vec_id,
               ROUND((list_aggregate(list_transform(list_zip(embedding, q_emb), x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
                 / (sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))
                  * sqrt(list_aggregate(list_transform(q_emb, x -> CAST(x AS DOUBLE) * x), 'sum')))), 6) AS cos
             FROM embeddings e JOIN probes USING (label) CROSS JOIN q
             WHERE vec_id <> 0
             ORDER BY cos DESC, vec_id ASC LIMIT 10""")),

    // embedding near-dup via random-hyperplane SimHash: 8 sign bits
    // from deterministic pseudo-random planes (xxhash64-seeded) → one
    // bucket key → candidate pairs only within buckets (expected
    // collisions n²/2^bits, never the full product). Hash-dependent →
    // no oracle; LlmPackSpec plants an exact duplicate (all 8 bits
    // must agree) and bounds the candidate count.
    // c11: SimHash bucketing — 8 signed random hyperplanes → an 8-bit
    // bucket; candidate pairs are same-bucket collisions (n²/2⁸
    // expected pair work, never all-pairs), ranked by exact cosine.
    // The hyperplane weights come from a Knuth MULTIPLICATIVE hash
    // (pure int64 arithmetic — the c32 precedent), not xxhash64, so
    // the oracle engine computes byte-identical buckets and the whole
    // query carries a FULL value gate (this id was the no-oracle
    // holdout until round 10). Bucket = Σ bit_j · 2^(7−j): a weighted
    // sum instead of a fold, because both engines express sums.
    Decl("c11_dedup_simhash",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        // spread: the 8-plane projection is an interpreted HOF fold
        // per row — profiled 2 × 0.47 s in single scan tasks (both
        // self-join sides); parallelize below core count (guide §2.5)
        val e = spread(emb(s, dir), $"vec_id")
        // plane j, dim k ∈ [-0.5, 0.5): deterministic Knuth hash
        val sig = e.withColumn("bucket", expr(
          """aggregate(
               transform(sequence(0, 7), j ->
                 CASE WHEN aggregate(
                   zip_with(embedding,
                     transform(sequence(0, size(embedding) - 1), k ->
                       CAST(pmod((j * 1024 + k) * CAST(2654435761 AS BIGINT),
                                 CAST(4294967296 AS BIGINT)) % 1000 AS DOUBLE)
                         / 1000.0 - 0.5),
                     (x, p) -> CAST(x AS DOUBLE) * p),
                   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) > 0
                 THEN shiftleft(1, 7 - j) ELSE 0 END),
               0, (acc, bit) -> acc + bit)"""))
        sig.as("a").join(sig.as("b"),
            col("a.bucket") === col("b.bucket") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
            round(expr("cosine_sim(a.embedding, b.embedding)"), 6).as("cos"))
          .orderBy($"cos".desc, $"vec_a".asc, $"vec_b".asc)
          .limit(50)
      },
      Some("""WITH sig AS (
               SELECT vec_id, embedding,
                 list_aggregate(list_transform(range(0, 8), j ->
                   CASE WHEN list_aggregate(
                       list_transform(range(0, len(embedding)), k ->
                         CAST(embedding[k + 1] AS DOUBLE) *
                         (CAST((((j * 1024 + k) * 2654435761) % 4294967296) % 1000 AS DOUBLE) / 1000.0 - 0.5)),
                       'sum') > 0
                   THEN (1 << (7 - j)) ELSE 0 END), 'sum') AS bucket
               FROM embeddings)
             SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND((list_aggregate(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum') / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x), 'sum')) * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x), 'sum')))), 6) AS cos
             FROM sig a JOIN sig b
               ON a.bucket = b.bucket AND a.vec_id < b.vec_id
             ORDER BY cos DESC, vec_a ASC, vec_b ASC LIMIT 50""")),

    // c12: exact n-gram Jaccard near-dup via the inverted-index join —
    // the relational formulation of set similarity: postings(gram →
    // docs) self-join counts |A∩B| per pair in one shuffle on gram,
    // never materializing the doc×doc product; |A∪B| = |A|+|B|−|A∩B|.
    // Pair work is Σ_g df(g)² (2.8M at sf0.1, max df 25) — bounded by
    // the CODED hot-gram cap in cappedGramPostings (df ≤ 1000; the
    // dropped-gram count is a result column, so truncation is visible
    // through the gate — 0 at every fixture scale, hence the oracle's
    // constant). c02's LSH remains the approximate fallback.
    Decl("c12_dedup_ngram_jaccard",
      (s, dir) => ngramJaccard(s, dir, HotGramCap),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                            FROM documents WHERE len(string_split(text, ' ')) >= 3),
                  grams AS (SELECT DISTINCT doc_id,
                              t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
                            FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)),
                  sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
                  inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
                            FROM grams a JOIN grams b
                              ON a.gram = b.gram AND a.doc_id < b.doc_id
                            GROUP BY a.doc_id, b.doc_id)
             SELECT doc_a, doc_b,
               ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard,
               CAST(0 AS BIGINT) AS hot_grams_dropped
             FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                        JOIN sizes sb ON doc_b = sb.doc_id
             WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
             ORDER BY doc_a, doc_b""")),

    // c17: int8 embedding quantization + quantized top-k — the
    // memory/IO axis of ANN at 100 TB (4× smaller vectors than f32,
    // 8× smaller than double; the scan that feeds c04/c10 reads int8
    // codes, re-scoring only the shortlist in full precision). Per-
    // vector symmetric quantization: scale = max|x|/127, code =
    // floor(x/scale + 0.5) clamped to ±127 (floor(+0.5) instead of
    // round() — identical half-handling in both engines). Cosine is
    // scale-invariant, so quantized cosine = cosine of the INTEGER
    // code vectors: integer dot products are exact in double, making
    // the approximate score engine-deterministic with no epsilon.
    // cos_exact re-scores the same top-k in full precision — the
    // asymmetric-rescoring step, and the recall diagnostic.
    Decl("c17_embed_quantize",
      (s, dir) => {
        // spread: quantization HOFs are per-row CPU above a one-task
        // scan (profiled 0.54 s single-task; guide §2.5)
        val e = spread(emb(s, dir), $"vec_id")
        val qq = e
          .withColumn("scale", expr(
            "aggregate(embedding, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(CAST(x AS DOUBLE)))) / 127.0"))
          .withColumn("qvec", expr(
            "transform(embedding, x -> CAST(greatest(-127.0, least(127.0, floor(CAST(x AS DOUBLE) / scale + 0.5))) AS BIGINT))"))
        val query = qq.filter($"vec_id" === 0)
          .select($"qvec".as("q_qvec"), $"embedding".as("q_emb"))
        qq.filter($"vec_id" =!= 0)
          .crossJoin(broadcast(query))
          .select($"vec_id",
            round(cosine($"qvec", $"q_qvec"), 6).as("cos_q"),
            round(cosine($"embedding", $"q_emb"), 6).as("cos_exact"))
          .orderBy($"cos_q".desc, $"vec_id".asc)
          .limit(10)
      },
      Some("""WITH q AS (
               SELECT vec_id, embedding,
                 list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 AS scale
               FROM embeddings),
             qq AS (
               SELECT vec_id, embedding,
                 list_transform(embedding, x -> CAST(greatest(-127.0, least(127.0, floor(CAST(x AS DOUBLE) / scale + 0.5))) AS BIGINT)) AS qvec
               FROM q),
             qry AS (SELECT qvec AS q_qvec, embedding AS q_emb FROM qq WHERE vec_id = 0)
             SELECT vec_id,
               ROUND((list_aggregate(list_transform(list_zip(qvec, q_qvec), x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
                 / (sqrt(list_aggregate(list_transform(qvec, x -> CAST(x AS DOUBLE) * x), 'sum'))
                  * sqrt(list_aggregate(list_transform(q_qvec, x -> CAST(x AS DOUBLE) * x), 'sum')))), 6) AS cos_q,
               ROUND((list_aggregate(list_transform(list_zip(embedding, q_emb), x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
                 / (sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))
                  * sqrt(list_aggregate(list_transform(q_emb, x -> CAST(x AS DOUBLE) * x), 'sum')))), 6) AS cos_exact
             FROM qq, qry WHERE vec_id <> 0
             ORDER BY cos_q DESC, vec_id ASC LIMIT 10""")),

    // c16: the dedup suite's missing final step — near-dup PAIRS
    // (c12's exact n-gram Jaccard graph) → connected COMPONENTS →
    // one canonical doc per cluster (min doc_id). Pair-level dedup
    // alone under-deletes: a↔b and b↔c similar means {a,b,c} is one
    // cluster even when a↔c misses the threshold. Output is the
    // cluster assignment for every doc that appears in ≥1 pair
    // (singletons are trivially canonical and stay out of the join).
    Decl("c16_dedup_components",
      (s, dir) => {
        val pairs = jaccardPairsRaw(s, dir, HotGramCap)._1
          .select($"doc_a", $"doc_b")
        val comps = connectedComponents(pairs)
        val sizes = comps.groupBy($"comp")
          .agg(count(lit(1)).cast("long").as("comp_size"))
        comps.join(sizes, "comp")
          .select($"id".cast("long").as("doc_id"),
            $"comp".cast("long").as("canonical_id"),
            $"comp_size",
            ($"id" === $"comp").as("is_canonical"))
          .orderBy($"doc_id")
      },
      // oracle: same pair CTE as c12, then reachability closure via
      // recursive CTE — component id = min reachable doc_id
      Some("""WITH RECURSIVE
                  toks AS (SELECT doc_id, string_split(text, ' ') AS t
                           FROM documents WHERE len(string_split(text, ' ')) >= 3),
                  grams AS (SELECT DISTINCT doc_id,
                              t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
                            FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)),
                  sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
                  inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
                            FROM grams a JOIN grams b
                              ON a.gram = b.gram AND a.doc_id < b.doc_id
                            GROUP BY a.doc_id, b.doc_id),
                  pairs AS (SELECT doc_a, doc_b FROM inter
                            JOIN sizes sa ON doc_a = sa.doc_id
                            JOIN sizes sb ON doc_b = sb.doc_id
                            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
                  edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                            UNION ALL SELECT doc_b, doc_a FROM pairs),
                  reach(id, r) AS (
                    SELECT src, src FROM edges
                    UNION
                    SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
                  comp AS (SELECT id, MIN(r) AS canonical_id FROM reach GROUP BY id),
                  csize AS (SELECT canonical_id, CAST(COUNT(*) AS BIGINT) AS comp_size
                            FROM comp GROUP BY 1)
             SELECT comp.id AS doc_id, comp.canonical_id, csize.comp_size,
               comp.id = comp.canonical_id AS is_canonical
             FROM comp JOIN csize USING (canonical_id)
             ORDER BY doc_id""")),

    // c13: embedding-cosine near-dup — threshold pairs, label-blocked
    // like c05 (pair count Σ block², never N²); the native codegen'd
    // cosine_sim scores candidates. At 100 TB blocking comes from
    // c11's SimHash buckets instead of labels; the verification join
    // is unchanged. Threshold 0.4 sits in the fixture's top tail
    // (max intra-label cosine ≈ 0.475).
    Decl("c13_dedup_embed_cosine",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val e = emb(s, dir)
        e.as("a").join(e.as("b"),
            col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
          .withColumn("cos", expr("cosine_sim(a.embedding, b.embedding)"))
          .filter($"cos" >= 0.4)
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
            round($"cos", 6).as("cos"))
          .orderBy($"vec_a", $"vec_b")
      },
      Some("""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND((list_aggregate(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
                 / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))
                  * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x), 'sum')))), 6) AS cos
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id < b.vec_id
             WHERE (list_aggregate(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
                 / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))
                  * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x), 'sum')))) >= 0.4
             ORDER BY vec_a, vec_b""")),

    // corpus term frequencies, top 100 — generator + hash agg + top-k
    Decl("c06_text_tokenize_counts",
      (s, dir) => docs(s, dir)
        .select(explode(split($"text", " ")).as("tok"))
        .groupBy($"tok")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy($"n".desc, $"tok".asc)
        .limit(100),
      Some("""SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM (
               SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
             GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 100""")),

    // tf-idf top-3 terms per document; df side is vocabulary-sized →
    // broadcast; tf side shuffles once on (doc, term)
    Decl("c07_text_tfidf",
      (s, dir) => {
        val d = docs(s, dir)
        val toks = d.select($"doc_id", explode(split($"text", " ")).as("tok"))
        val tf = toks.filter($"doc_id" < 100)
          .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
        val df = toks.select($"doc_id", $"tok").distinct()
          .groupBy($"tok").agg(count(lit(1)).as("df"))
        val total = d.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"tok".asc)
        tf.join(broadcast(df), "tok")
          .crossJoin(broadcast(total))
          .withColumn("score", round($"tf" * log($"n_docs".cast("double") / $"df"), 6))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter($"rn" <= 3)
          .select($"doc_id", $"rn", $"tok", $"score")
          .orderBy($"doc_id", $"rn")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                            FROM documents),
                  tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
                         WHERE doc_id < 100 GROUP BY doc_id, tok),
                  df AS (SELECT tok, COUNT(*) AS df
                         FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
                  total AS (SELECT COUNT(*) AS n_docs FROM documents)
             SELECT doc_id, rn, tok, score FROM (
               SELECT doc_id, tok,
                 ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df), 6) AS score,
                 CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df), 6) DESC,
                            tok ASC) AS BIGINT) AS rn
               FROM tf JOIN df USING (tok) CROSS JOIN total)
             WHERE rn <= 3
             ORDER BY doc_id, rn""")),

    // per-language corpus profile — the multimodal-metadata slice
    Decl("c08_text_lang_profile",
      (s, dir) => docs(s, dir)
        .groupBy($"lang")
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum($"n_chars").cast("long").as("total_chars"),
          round(avg(length($"text")), 2).as("avg_len"),
          countDistinct($"source").cast("long").as("n_sources"))
        .orderBy($"lang"),
      Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             ROUND(AVG(LENGTH(text)), 2) AS avg_len,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
             FROM documents GROUP BY lang ORDER BY lang""")),

    // element-wise centroid per label — pure relational (posexplode +
    // re-key by position), no UDAF, shuffle bounded by labels × dims
    Decl("c09_vector_stats",
      (s, dir) => emb(s, dir)
        .select($"label", posexplode($"embedding").as(Seq("pos", "e")))
        .groupBy($"label", ($"pos" + 1).cast("long").as("pos"))
        .agg(round(avg($"e".cast("double")), 6).as("centroid"),
          count(lit(1)).cast("long").as("n"))
        .orderBy($"label", $"pos"),
      Some("""SELECT label, pos, ROUND(AVG(CAST(e AS DOUBLE)), 6) AS centroid,
             CAST(COUNT(*) AS BIGINT) AS n
             FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
                          unnest(embedding) AS e
                   FROM embeddings)
             GROUP BY label, pos ORDER BY label, pos""")),

    // c14: deterministic train/val/test split — the assignment step
    // every training-data pipeline runs last. Knuth multiplicative
    // hashing on the doc key ((id·2654435761) mod 2^32 mod 100 →
    // 80/10/10 buckets) instead of rand() or xxhash64: portable
    // across engines (the oracle computes the identical split),
    // reproducible across runs, and append-stable — new docs never
    // reassign existing ones, unlike fraction-based randomSplit.
    // Map-only at any scale; the verified output is the per-
    // (split, lang) histogram, which also demonstrates stratification
    // monitoring. All arithmetic stays < 2^63 (doc_id < 3.5e9).
    Decl("c14_train_test_split",
      (s, dir) => {
        val bucket = ($"doc_id" * lit(2654435761L)) % lit(4294967296L) % lit(100)
        docs(s, dir)
          .withColumn("split",
            when(bucket < 80, "train").when(bucket < 90, "val")
              .otherwise("test"))
          .groupBy($"split", $"lang")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum($"n_chars").cast("long").as("sum_chars"))
          .orderBy($"split", $"lang")
      },
      Some("""SELECT CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80 THEN 'train'
                          WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'val'
                          ELSE 'test' END AS split, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             FROM documents GROUP BY 1, 2 ORDER BY split, lang""")),

    // c15: document chunking — fixed 32-token windows with stride 24
    // (overlap 8), the sequence-packing prep step between curation and
    // tokenization. Expression-only (sequence → transform → slice →
    // array_join): a pure flatMap, no shuffle, no UDF — chunking 100 TB
    // is map-parallel by construction. sequence's upper bound is
    // clamped at 0 (NOTES #14: a negative bound would step -1, not
    // return empty); slice clamps the tail chunk, so n_tokens < 32 on
    // the last chunk and every token lands in ≥1 chunk. Verified over
    // a keyed slice with a deterministic sort.
    Decl("c15_doc_chunking",
      (s, dir) => docs(s, dir).filter($"doc_id" < 50)
        .select($"doc_id", split($"text", " ").as("toks"))
        .select($"doc_id",
          posexplode(expr(
            """transform(
                 sequence(0, greatest(0, cast(ceil((size(toks) - 32) / 24.0) as int))),
                 i -> array_join(slice(toks, i * 24 + 1, 32), ' '))"""))
            .as(Seq("p", "chunk")))
        .select($"doc_id", $"p".cast("long").as("chunk_idx"), $"chunk",
          size(split($"chunk", " ")).cast("long").as("n_tokens"))
        .orderBy($"doc_id", $"chunk_idx"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                         FROM documents WHERE doc_id < 50)
             SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
               array_to_string(list_slice(toks, i*24 + 1, i*24 + 32), ' ') AS chunk,
               CAST(len(string_split(array_to_string(list_slice(toks, i*24 + 1, i*24 + 32), ' '), ' ')) AS BIGINT) AS n_tokens
             FROM t, LATERAL unnest(range(0,
               GREATEST(0, CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT)) + 1)) AS u(i)
             ORDER BY doc_id, chunk_idx""")),

    // c18: greedy contiguous sequence packing — the step after c15's
    // chunking: fill fixed token-budget training sequences (budget
    // 512) in doc order; a doc joins the pack its PRECEDING cumulative
    // token count falls in. Packing is a sequential fold, so the
    // parallel unit is a SHARD (pmod(doc_id, 8)): each shard packs
    // independently under its own running-sum window — at 100 TB
    // shards scale with executors and no global single-partition
    // window ever forms. Verified output is the per-pack summary
    // (docs, token fill).
    Decl("c18_sequence_packing",
      (s, dir) => {
        val t = docs(s, dir)
          .select($"doc_id", size(split($"text", " ")).cast("long").as("toks"))
          .withColumn("shard", pmod($"doc_id", lit(8)).cast("long"))
        val w = Window.partitionBy($"shard").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.withColumn("cum", sum($"toks").over(w))
          .withColumn("pack_id",
            floor(($"cum" - $"toks") / lit(512.0)).cast("long"))
          .groupBy($"shard", $"pack_id")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum($"toks").cast("long").as("tok_total"))
          .orderBy($"shard", $"pack_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
                    doc_id % 8 AS shard FROM documents),
                  c AS (SELECT shard, doc_id, toks,
                    SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum FROM t)
             SELECT shard, CAST(FLOOR((cum - toks) / 512.0) AS BIGINT) AS pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS tok_total
             FROM c GROUP BY 1, 2 ORDER BY shard, pack_id""")),

    // c19: benchmark decontamination — flag training docs sharing any
    // word-5-gram with the eval set (the GPT-3 13-gram rule; n scaled
    // to the fixture's short docs; eval set = doc_id ≡ 0 mod 17 as
    // the benchmark stand-in). The eval side is benchmark-sized —
    // tiny at ANY corpus scale — so its distinct gram set broadcasts
    // and the 100 TB train side streams map-only through the join:
    // the corpus is never shuffled. Output keeps the collision count
    // per flagged doc — the audit trail a removal decision needs.
    Decl("c19_decontaminate",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val d = docs(s, dir)
          .select($"doc_id", split($"text", " ").as("toks"))
          .filter(size($"toks") >= 5)
        val isEval = $"doc_id" % 17 === 0
        val evalGrams = d.filter(isEval)
          .select(explode(array_distinct(expr("word_ngrams(toks, 5)"))).as("gram"))
          .distinct()
        d.filter(!isEval)
          .select($"doc_id",
            explode(array_distinct(expr("word_ngrams(toks, 5)"))).as("gram"))
          .join(broadcast(evalGrams), "gram")
          .groupBy($"doc_id")
          .agg(count(lit(1)).cast("long").as("n_shared_grams"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
                         FROM documents WHERE len(string_split(text, ' ')) >= 5),
                  g AS (SELECT DISTINCT doc_id,
                          t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4] AS gram
                        FROM t, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i)),
                  eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0)
             SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
             FROM g JOIN eg USING (gram) WHERE doc_id % 17 <> 0
             GROUP BY doc_id ORDER BY doc_id""")),

    // c20: domain mixture weights — the training-mixture planning step
    // (DoReMi/temperature-sampling role): per source, token mass and
    // the temperature-reweighted sampling weight p_i ∝ tokens_i^alpha
    // (alpha=0.7 flattens the head domains, upweights the tail), plus
    // the implied epochs-over-source at a one-epoch total token
    // budget: epochs_i = p_i · total_tokens / tokens_i. One global
    // aggregation over source — the per-source stats are
    // corpus-size-independent (sources are few at ANY scale), so the
    // normalizing sum is a 1-row broadcast, never a shuffle of data.
    // pow() values are irrational → round-4 is engine-safe (NOTES 3).
    Decl("c20_mixture_weights",
      (s, dir) => {
        val bySource = docs(s, dir)
          .groupBy($"source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(size(split($"text", " "))).cast("long").as("n_tokens"))
        val norm = bySource.agg(
          sum(pow($"n_tokens", lit(0.7))).as("z"),
          sum($"n_tokens").cast("double").as("total_tokens"))
        bySource.crossJoin(broadcast(norm))
          .select($"source", $"n_docs", $"n_tokens",
            round(pow($"n_tokens", lit(0.7)) / $"z", 4).as("weight"),
            round(pow($"n_tokens", lit(0.7)) / $"z" * $"total_tokens"
              / $"n_tokens", 4).as("epochs"))
          .orderBy($"source")
      },
      Some("""WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                  FROM documents GROUP BY source),
                  n AS (SELECT SUM(pow(n_tokens, 0.7)) AS z,
                    CAST(SUM(n_tokens) AS DOUBLE) AS total_tokens FROM s)
             SELECT source, n_docs, n_tokens,
               ROUND(pow(n_tokens, 0.7) / z, 4) AS weight,
               ROUND(pow(n_tokens, 0.7) / z * total_tokens / n_tokens, 4) AS epochs
             FROM s CROSS JOIN n ORDER BY source""")),

    // c21: INCREMENTAL dedup — dedup an arrival batch against the
    // already-curated corpus WITHOUT re-pairing the corpus with
    // itself (the production shape: the corpus is 100 TB and frozen,
    // the batch is one day's crawl; c01 re-run over corpus+batch
    // would re-shuffle everything already deduped). The batch first
    // dedups internally (c01's one-shuffle window), then anti-joins
    // the corpus on the md5 of the normalized text — the shuffle
    // carries 32-char digests, never document bodies. At 100 TB the
    // corpus digest set is a materialized bucketed table (d03's
    // layout), so each day's probe is a zero-exchange anti-join and
    // the corpus is never rescanned per batch. Batch = doc_id ≡ 0
    // (mod 10) as the arrival stand-in.
    Decl("c21_dedup_incremental",
      (s, dir) => {
        val keyed = docs(s, dir)
          .withColumn("key", md5(lower(trim($"text")).cast("binary")))
        val corpus = keyed.filter($"doc_id" % 10 =!= 0)
        val batch = keyed.filter($"doc_id" % 10 === 0)
        val w = Window.partitionBy($"key").orderBy($"doc_id".asc)
        batch
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .join(corpus.select($"key"), Seq("key"), "left_anti")
          .select($"doc_id", $"lang", $"source", $"n_chars")
          .orderBy($"doc_id")
      },
      // NOT EXISTS (not NOT IN): identical anti-join semantics to
      // Spark even if a key were ever NULL
      Some("""WITH k AS (SELECT *, md5(lower(trim(text))) AS key FROM documents),
                  b AS (SELECT * FROM k WHERE doc_id % 10 = 0
                        QUALIFY ROW_NUMBER() OVER (PARTITION BY key
                                                   ORDER BY doc_id) = 1)
             SELECT doc_id, lang, source, n_chars FROM b
             WHERE NOT EXISTS (SELECT 1 FROM k c
                               WHERE c.doc_id % 10 <> 0 AND c.key = b.key)
             ORDER BY doc_id""")),

    // c22: stratified sampling — EXECUTING a mixture plan (c20 plans
    // the weights, this realizes them): per-language target rates
    // applied via the same Knuth multiplicative-hash family as c14
    // (a different odd constant, so sample membership is independent
    // of c14's split assignment). Deterministic and portable (the
    // oracle reproduces the exact sample), and append-stable —
    // re-running after a corpus append never flips membership of an
    // existing doc, which rand()/TABLESAMPLE cannot promise. Map-only
    // at any scale: no shuffle until the stratum-census aggregate,
    // whose cardinality is |langs|. Verified output is the census
    // (population vs sample per stratum) — the monitoring table a
    // sampling job must emit anyway.
    Decl("c22_stratified_sample",
      (s, dir) => {
        val bucket = ($"doc_id" * lit(2246822519L)) % lit(4294967296L) % lit(100)
        val rate = when($"lang" === "en", 60)
          .when($"lang".isin("de", "es"), 35)
          .otherwise(20)
        docs(s, dir)
          .withColumn("sampled", bucket < rate)
          .groupBy($"lang")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when($"sampled", 1L).otherwise(0L)).cast("long").as("n_sampled"),
            sum(when($"sampled", $"n_chars")).cast("long").as("sampled_chars"))
          .orderBy($"lang")
      },
      Some("""WITH t AS (SELECT lang, n_chars,
                    (doc_id * 2246822519) % 4294967296 % 100 <
                      CASE WHEN lang = 'en' THEN 60
                           WHEN lang IN ('de', 'es') THEN 35
                           ELSE 20 END AS sampled
                  FROM documents)
             SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               CAST(SUM(CASE WHEN sampled THEN n_chars END) AS BIGINT) AS sampled_chars
             FROM t GROUP BY lang ORDER BY lang""")),

    // c23: SEMANTIC DEDUP (the SemDeDup recipe, Abbas et al. 2023):
    // cluster the embedding space, then drop near-duplicates ONLY
    // within a cluster — pair work is Σ(cluster size)² ≈ n²/k, never
    // the all-pairs product. Cluster assignment is one broadcast map
    // pass (k centroids, here the per-label means as the deterministic
    // stand-in for a trained k-means — c10's quantizer; a real run
    // scales k with the corpus, assignment stays one pass). Note the
    // assignment is COMPUTED, not the label itself: a vector lands on
    // whichever centroid it is nearest, so the dedup pairs can cross
    // source labels — c13's label-blocked dedup cannot find those.
    // Drop rule is greedy keep-first (drop any doc with an
    // earlier-id neighbor above τ in its cluster, whether or not
    // that neighbor is itself dropped) — deterministic and
    // join-expressible, the standard SemDeDup simplification.
    Decl("c23_semantic_dedup",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val e = emb(s, dir)
        val cents = e
          .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
          .groupBy($"label", $"pos").agg(round(avg($"v".cast("double")), 6).as("cv"))
          .groupBy($"label")
          .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)")
            .as("centroid"))
          .select($"label".as("cluster"), $"centroid")
        // nearest centroid per vector; rounded cosine + cluster-id
        // tie-break keeps the argmax deterministic in both engines
        def assigned: DataFrame = {
          val w = Window.partitionBy($"vec_id").orderBy($"acos".desc, $"cluster".asc)
          e.crossJoin(broadcast(cents))
            .select($"vec_id", $"embedding", $"cluster",
              round(cosine($"embedding", $"centroid"), 6).as("acos"))
            .withColumn("rk", row_number().over(w))
            .filter($"rk" === 1)
            .select($"vec_id", $"cluster", $"embedding")
        }
        // two independent plan trees sidestep self-join ambiguity; the
        // assignment pass is one broadcast map, cheap to replay
        val dropped = assigned.as("a")
          .join(assigned.as("b"),
            col("a.cluster") === col("b.cluster") &&
              col("a.vec_id") < col("b.vec_id"))
          .filter(expr("cosine_sim(a.embedding, b.embedding)") >= 0.4)
          .select(col("b.vec_id").as("vec_id")).distinct()
        assigned.as("v")
          .join(dropped.as("d"), col("v.vec_id") === col("d.vec_id"), "left")
          .groupBy(col("v.cluster").as("cluster"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            count(col("d.vec_id")).cast("long").as("n_dropped"))
          .withColumn("n_kept", ($"n_docs" - $"n_dropped").cast("long"))
          .select($"cluster", $"n_docs", $"n_kept", $"n_dropped")
          .orderBy($"cluster")
      },
      Some("""WITH cent AS (
               SELECT label AS cluster, list(cv ORDER BY pos) AS centroid FROM (
                 SELECT label, pos, ROUND(AVG(CAST(e AS DOUBLE)), 6) AS cv
                 FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
                              unnest(embedding) AS e FROM embeddings)
                 GROUP BY label, pos)
               GROUP BY label),
             assigned AS (
               SELECT vec_id, cluster, embedding FROM (
                 SELECT e.vec_id, c.cluster, e.embedding,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                     ROUND((list_aggregate(list_transform(list_zip(e.embedding, c.centroid), x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
                       / (sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))
                        * sqrt(list_aggregate(list_transform(c.centroid, x -> x * x), 'sum')))), 6) DESC,
                     c.cluster ASC) AS rk
                 FROM embeddings e CROSS JOIN cent c)
               WHERE rk = 1),
             dropped AS (
               SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b
                 ON a.cluster = b.cluster AND a.vec_id < b.vec_id
               WHERE (list_aggregate(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
                 / (sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))
                  * sqrt(list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x), 'sum')))) >= 0.4)
             SELECT v.cluster, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) - COUNT(d.vec_id) AS BIGINT) AS n_kept,
               CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped
             FROM assigned v LEFT JOIN dropped d ON v.vec_id = d.vec_id
             GROUP BY v.cluster ORDER BY v.cluster""")),

    // c24: the CURATION PIPELINE — the individual curation operators
    // composed into the one job a training-data team actually
    // schedules: exact-dedup (c01's window, keep lowest doc_id) ∧
    // length gate (t02's family) ∧ language allowlist (t01's role),
    // reported as the per-(lang, source) census the run must emit
    // anyway (kept docs and token mass feed the c20 mixture step).
    // One shuffle on the text hash + one on the report key — the
    // whole pipeline is two exchanges regardless of corpus size;
    // every gate is a map-side expression.
    Decl("c24_curation_pipeline",
      (s, dir) => {
        val w = Window
          .partitionBy(xxhash64(lower(trim($"text"))), lower(trim($"text")))
          .orderBy($"doc_id".asc)
        docs(s, dir)
          .withColumn("n_tokens", size(split($"text", " ")))
          .withColumn("rk", row_number().over(w))
          .withColumn("kept",
            $"rk" === 1 && $"n_tokens" >= 40 && $"lang".isin("en", "de", "es"))
          .groupBy($"lang", $"source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when($"kept", 1L).otherwise(0L)).cast("long").as("n_kept"),
            sum(when($"kept", $"n_tokens".cast("long"))).cast("long")
              .as("kept_tokens"))
          .orderBy($"lang", $"source")
      },
      Some("""WITH t AS (
               SELECT lang, source,
                 len(string_split(text, ' ')) AS n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY lower(trim(text))
                   ORDER BY doc_id) AS rk
               FROM documents),
             flagged AS (
               SELECT lang, source, n_tokens,
                 (rk = 1 AND n_tokens >= 40
                  AND lang IN ('en', 'de', 'es')) AS kept
               FROM t)
             SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN kept THEN n_tokens END) AS BIGINT) AS kept_tokens
             FROM flagged GROUP BY lang, source ORDER BY lang, source""")),

    // c25 (builder extension): BM25 RANKED RETRIEVAL — the lexical
    // search stage of a retrieval pipeline (Lucene/Elasticsearch's
    // default scorer; the keyword complement to c04's dense ANN).
    // Robertson idf = ln((N - df + 0.5)/(df + 0.5) + 1), k1=1.2,
    // b=0.75. At scale only the QUERY TERMS' postings move: the
    // tokenize pass filters to the term set before any shuffle, the
    // per-term df and global avgdl are broadcast-sized scalars, the
    // final top-20 is TakeOrderedAndProject — the corpus text itself
    // is never exchanged. Scores rounded to 6dp (the c07 precedent
    // for cross-engine libm ln).
    Decl("c25_bm25_rank",
      (s, dir) => {
        val terms = Seq("spark", "table", "join")
        val d = docs(s, dir)
          .withColumn("dl", size(split($"text", " ")).cast("double"))
        val stats = d.agg(count(lit(1)).cast("double").as("n_docs"),
          avg($"dl").as("avgdl"))
        val toks = d.select($"doc_id", $"dl",
            explode(split($"text", " ")).as("tok"))
          .filter($"tok".isin(terms: _*))
        val tf = toks.groupBy($"doc_id", $"dl", $"tok")
          .agg(count(lit(1)).cast("double").as("tf"))
        val df = toks.select($"doc_id", $"tok").distinct()
          .groupBy($"tok").agg(count(lit(1)).cast("double").as("df"))
        val scored = tf.join(broadcast(df), "tok")
          .crossJoin(broadcast(stats))
          .withColumn("idf", log(($"n_docs" - $"df" + 0.5) / ($"df" + 0.5) + 1.0))
          .withColumn("part",
            $"idf" * ($"tf" * lit(2.2)) /
              ($"tf" + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * $"dl" / $"avgdl")))
          .groupBy($"doc_id")
          .agg(round(sum($"part"), 6).as("score"))
        scored.orderBy($"score".desc, $"doc_id".asc).limit(20)
          .select($"doc_id", $"score")
      },
      Some("""WITH d AS (SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl, text
               FROM documents),
             stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                 AVG(dl) AS avgdl FROM d),
             toks AS (SELECT doc_id, dl,
                 unnest(string_split(text, ' ')) AS tok FROM d),
             qt AS (SELECT * FROM toks
                 WHERE tok IN ('spark', 'table', 'join')),
             tf AS (SELECT doc_id, dl, tok,
                 CAST(COUNT(*) AS DOUBLE) AS tf FROM qt
                 GROUP BY doc_id, dl, tok),
             df AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df
                 FROM (SELECT DISTINCT doc_id, tok FROM qt) GROUP BY tok)
             SELECT doc_id, ROUND(SUM(
               LN((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
               (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
             FROM tf JOIN df USING (tok) CROSS JOIN stats
             GROUP BY doc_id
             ORDER BY score DESC, doc_id ASC LIMIT 20""")),

    // c26: PMI CO-OCCURRENCE mining — pointwise mutual information
    // over skip-gram pairs (offsets 1-2), the collocation /
    // phrase-discovery statistic (word2vec's SGNS objective is a
    // shifted PMI factorization; corpus tooling uses it to find
    // multi-word terms worth single tokens). Spark side is
    // EXPRESSION-ONLY pair extraction: zip_with the token array
    // against its own slice — a per-row flatMap, so the document
    // text never shuffles; only (a, b) pair-count keys and the
    // token-count keys do (two map-side-combining aggregates + one
    // pair→unigram join, the same exchange budget as tf-idf).
    // Normalizers N and P are 1-row aggregates, broadcast. The PMI
    // arithmetic is structured IDENTICALLY in both engines (ln of
    // double ratios, round 6 — c07's ln precedent); ordering is by
    // the ROUNDED value with a (a, b) tie-break so the top-50 cut is
    // engine-stable.
    Decl("c26_pmi_cooccurrence",
      (s, dir) => {
        val toks = docs(s, dir).select($"doc_id",
          split(lower($"text"), " ").as("ts"))
        def shifted(off: Int) = zip_with($"ts",
          slice($"ts", lit(off + 1), size($"ts")),
          (a, b) => struct(a.as("a"), b.as("b")))
        // both count frames are vocabulary-sized after their aggs and
        // read by MULTIPLE consumers (totals + joins) — persist so the
        // token explosion runs once per frame, not once per consumer
        val pairs = toks
          .select(explode(concat(shifted(1), shifted(2))).as("p"))
          .filter($"p.b".isNotNull)
          .groupBy($"p.a".as("a"), $"p.b".as("b"))
          .agg(count(lit(1)).cast("long").as("c_ab"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val uni = toks.select(explode($"ts").as("tok"))
          .groupBy($"tok").agg(count(lit(1)).cast("long").as("c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        lastPmi.swap(pairs, uni)
        val totals = pairs.agg(sum($"c_ab").cast("double").as("p_tot"))
          .crossJoin(uni.agg(sum($"c").cast("double").as("n_tot")))
        pairs.filter($"c_ab" >= 3)
          .join(uni.withColumnRenamed("tok", "a")
            .withColumnRenamed("c", "c_a"), "a")
          .join(uni.withColumnRenamed("tok", "b")
            .withColumnRenamed("c", "c_b"), "b")
          .crossJoin(broadcast(totals))
          .select($"a", $"b", $"c_ab",
            round(log(($"c_ab".cast("double") / $"p_tot") /
              (($"c_a".cast("double") / $"n_tot") *
                ($"c_b".cast("double") / $"n_tot"))), 6).as("pmi"))
          .orderBy($"pmi".desc, $"a".asc, $"b".asc)
          .limit(50)
      },
      Some("""WITH toks AS (
               SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
                 generate_subscripts(string_split(lower(text), ' '), 1) AS pos
               FROM documents),
             pairs AS (
               SELECT a.tok AS a, b.tok AS b,
                 CAST(COUNT(*) AS BIGINT) AS c_ab
               FROM toks a JOIN toks b
                 ON a.doc_id = b.doc_id AND b.pos - a.pos IN (1, 2)
               GROUP BY 1, 2),
             uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
               FROM toks GROUP BY 1),
             tot AS (SELECT
               (SELECT CAST(SUM(c_ab) AS DOUBLE) FROM pairs) AS p_tot,
               (SELECT CAST(SUM(c) AS DOUBLE) FROM uni) AS n_tot)
             SELECT a, b, c_ab,
               ROUND(LN((CAST(c_ab AS DOUBLE) / p_tot) /
                 ((CAST(ca.c AS DOUBLE) / n_tot) *
                  (CAST(cb.c AS DOUBLE) / n_tot))), 6) AS pmi
             FROM pairs
             JOIN uni ca ON pairs.a = ca.tok
             JOIN uni cb ON pairs.b = cb.tok
             CROSS JOIN tot
             WHERE c_ab >= 3
             ORDER BY pmi DESC, a ASC, b ASC LIMIT 50""")),

    // c27: EXACT SUBSTRING DEDUP — the span-level dedup published
    // LLM-corpus work applies where document-level near-dup (c02/c12)
    // cannot: boilerplate and license blocks repeat VERBATIM inside
    // otherwise-distinct documents. A window of W=8 consecutive
    // tokens that appears in ≥2 distinct documents marks a duplicated
    // span; the per-document duplicated-window ratio is the curation
    // signal (mask or drop high-ratio docs). Scale shape: the W-token
    // window STRINGS never shuffle — each window is hashed to 64 bits
    // map-side (xxhash64) and only (doc_id, hash) pairs move; the
    // cross-doc test is one distinct + one aggregate on the hash, and
    // the position-count join-back is an equi-semi-join on the hash.
    // A 64-bit collision could only mark one window duplicated
    // spuriously (never correctness of the texts themselves); the
    // oracle compares per-doc counts, which hashing leaves intact.
    Decl("c27_substring_dedup",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        substringDupCounts(docs(s, dir), 8)
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE len(string_split(text, ' ')) >= 8),
             wins AS (SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
               FROM d, LATERAL (SELECT unnest(range(1, len(toks) - 6)) AS i)),
             dup AS (SELECT gram FROM (
               SELECT gram, COUNT(DISTINCT doc_id) AS nd
               FROM (SELECT DISTINCT doc_id, gram FROM wins) GROUP BY gram)
               WHERE nd >= 2),
             pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_windows
               FROM wins SEMI JOIN dup USING (gram) GROUP BY doc_id)
             SELECT d.doc_id, CAST(len(toks) - 7 AS BIGINT) AS n_windows,
               COALESCE(dup_windows, 0) AS dup_windows,
               ROUND(COALESCE(dup_windows, 0)
                 / CAST(len(toks) - 7 AS DOUBLE), 4) AS dup_ratio
             FROM d LEFT JOIN pd USING (doc_id) ORDER BY doc_id""")),

    // c28: IMPORTANCE WEIGHTING for domain matching (the DSIR recipe:
    // score raw documents by how target-like they are, then resample)
    // — here with unigram-LM features: fit add-one-smoothed unigram
    // distributions over the target slice (source = src0) and the
    // raw rest, broadcast the per-token log-likelihood RATIO table
    // (vocabulary-sized), and score every document with one
    // broadcast join + one aggregate. The ln() inputs are identical
    // exact-integer ratios in both engines, computed once per VOCAB
    // ENTRY (not per occurrence), so cross-engine libm drift is
    // bounded by ~1 ulp × token count — invisible at round 4. The
    // top-50 cut orders by the ROUNDED score with a doc_id tie-break
    // (NOTES rule 13 discipline).
    Decl("c28_dsir_importance",
      (s, dir) => {
        val toks = docs(s, dir).select($"doc_id", $"source",
          explode(split(lower($"text"), " ")).as("tok"))
        val tc = toks.filter($"source" === "src0")
          .groupBy($"tok").agg(count(lit(1)).cast("long").as("ct"))
        val rc = toks.filter($"source" =!= "src0")
          .groupBy($"tok").agg(count(lit(1)).cast("long").as("cr"))
        val vocab = tc.join(rc, Seq("tok"), "full_outer")
          .na.fill(0L, Seq("ct", "cr"))
        val tot = vocab.agg(sum($"ct").cast("double").as("tt"),
          sum($"cr").cast("double").as("tr"),
          count(lit(1)).cast("double").as("v"))
        val lr = vocab.crossJoin(broadcast(tot))
          .select($"tok",
            (log(($"ct" + 1).cast("double") / ($"tt" + $"v")) -
             log(($"cr" + 1).cast("double") / ($"tr" + $"v"))).as("lw"))
        val dt = toks.groupBy($"doc_id", $"tok")
          .agg(count(lit(1)).cast("long").as("n"))
        dt.join(broadcast(lr), "tok")
          .groupBy($"doc_id")
          .agg(round(sum($"n" * $"lw"), 4).as("logw"))
          .orderBy($"logw".desc, $"doc_id".asc)
          .limit(50)
      },
      Some("""WITH toks AS (SELECT doc_id, source,
               unnest(string_split(lower(text), ' ')) AS tok FROM documents),
             tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS ct
               FROM toks WHERE source = 'src0' GROUP BY tok),
             rc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cr
               FROM toks WHERE source <> 'src0' GROUP BY tok),
             vocab AS (SELECT COALESCE(tc.tok, rc.tok) AS tok,
               COALESCE(ct, 0) AS ct, COALESCE(cr, 0) AS cr
               FROM tc FULL OUTER JOIN rc ON tc.tok = rc.tok),
             tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS tt,
               CAST(SUM(cr) AS DOUBLE) AS tr,
               CAST(COUNT(*) AS DOUBLE) AS v FROM vocab),
             lr AS (SELECT tok,
               LN(CAST(ct + 1 AS DOUBLE) / (tt + v)) -
               LN(CAST(cr + 1 AS DOUBLE) / (tr + v)) AS lw
               FROM vocab CROSS JOIN tot),
             dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS n
               FROM toks GROUP BY doc_id, tok)
             SELECT doc_id, ROUND(SUM(n * lw), 4) AS logw
             FROM dt JOIN lr USING (tok) GROUP BY doc_id
             ORDER BY logw DESC, doc_id ASC LIMIT 50""")),

    // c29: BPE PAIR COUNTS — the inner statistic of byte-pair-encoding
    // tokenizer training: corpus-wide adjacent-character-pair
    // frequencies weighted by word frequency; the argmax is the first
    // BPE merge. Scale shape: the corpus collapses to its WORD
    // FREQUENCY table first (vocabulary-sized — the classic BPE
    // training preprocessing), so the pair explosion runs over
    // distinct words × positions, not over every token occurrence;
    // per-pair totals are one map-side-combining aggregate. All
    // arithmetic is integer — the comparison is exact, and the top-30
    // cut tie-breaks on the pair string.
    Decl("c29_bpe_pair_counts",
      (s, dir) => {
        val words = docs(s, dir)
          .select(explode(split(lower($"text"), " ")).as("w"))
          .filter(length($"w") >= 2)
          .groupBy($"w").agg(count(lit(1)).cast("long").as("freq"))
        words.select($"freq", explode(expr(
            "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
            .as("pair"))
          .groupBy($"pair").agg(sum($"freq").cast("long").as("cnt"))
          .orderBy($"cnt".desc, $"pair".asc)
          .limit(30)
      },
      Some("""WITH words AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
               FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
                     FROM documents)
               WHERE len(w) >= 2 GROUP BY w),
             pairs AS (SELECT substring(w, i, 2) AS pair, freq
               FROM words, LATERAL (SELECT unnest(range(1, len(w))) AS i))
             SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
             FROM pairs GROUP BY pair
             ORDER BY cnt DESC, pair ASC LIMIT 30""")),

    // c30: GLOBAL CORPUS SHUFFLE + SHARDING — the step between
    // curation and training: decorrelate document order (a corpus
    // sorted by crawl source trains badly) and split into balanced
    // shards. Deterministic stand-in for randomness: a Knuth
    // multiplicative hash of doc_id is the shuffle key (append-stable,
    // reproducible across runs — the property a training run needs to
    // resume); shard = key mod 8; within-shard order = (key, doc_id).
    // NO GLOBAL SORT anywhere: shard census is one keyed aggregate,
    // the first-doc witness is a keyed window, and the real writer
    // shape at 100 TB is repartition(shard) +
    // sortWithinPartitions(key) — both embarrassingly shuffle-
    // parallel. Balance is hash-uniform (asserted by the oracle's
    // per-shard counts, 62-63 docs per shard at 500 docs).
    Decl("c30_global_shuffle",
      (s, dir) => {
        val d = docs(s, dir)
          .withColumn("skey", pmod($"doc_id" * lit(2654435761L), lit(4294967296L)))
          .withColumn("shard", pmod($"skey", lit(8)).cast("long"))
        val wFirst = org.apache.spark.sql.expressions.Window
          .partitionBy($"shard").orderBy($"skey".asc, $"doc_id".asc)
        d.withColumn("rn", row_number().over(wFirst))
          .groupBy($"shard")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum($"n_chars").cast("long").as("sum_chars"),
            max(when($"rn" === 1, $"doc_id")).cast("long").as("first_doc"))
          .orderBy($"shard")
      },
      Some("""WITH d AS (SELECT doc_id, n_chars,
               (doc_id * 2654435761) % 4294967296 AS skey FROM documents),
             s AS (SELECT doc_id, n_chars, skey, skey % 8 AS shard,
               ROW_NUMBER() OVER (PARTITION BY skey % 8
                 ORDER BY skey, doc_id) AS rn FROM d)
             SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS first_doc
             FROM s GROUP BY shard ORDER BY shard""")),

    // c31: per-source frequency capping — the CommonCrawl-style
    // curation rule "keep at most K documents per domain" that stops a
    // handful of boilerplate-heavy sources from dominating the corpus.
    // Selection must be DETERMINISTIC and append-stable, so the rank
    // within each source orders by the same multiplicative hash as
    // c14/c30 (not by arrival order, which re-shuffles every run):
    // a doc's keep/drop decision depends only on (source, its hash
    // rank), and appending new docs can only evict hash-later ones.
    // One window over the source partition — at 100 TB, the shuffle
    // key is the source and per-source groups stream through the rank;
    // a skewed mega-source is the known hazard and is exactly what the
    // cap bounds the OUTPUT of (the rank itself is a single-pass sort
    // per group, spill-safe).
    Decl("c31_domain_cap",
      (s, dir) => {
        val cap = 40
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"source")
          .orderBy(pmod($"doc_id" * lit(2654435761L), lit(4294967296L)).asc,
            $"doc_id".asc)
        docs(s, dir)
          .withColumn("rk", row_number().over(w))
          .groupBy($"source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when($"rk" <= cap, 1L).otherwise(0L)).cast("long").as("n_kept"),
            sum(when($"rk" <= cap, $"n_chars")).cast("long").as("chars_kept"),
            max(when($"rk" === 1, $"doc_id")).cast("long").as("first_kept_doc"))
          .orderBy($"source")
      },
      Some("""WITH r AS (SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rk
               FROM documents)
             SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN rk <= 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN rk <= 40 THEN n_chars END) AS BIGINT) AS chars_kept,
               CAST(MAX(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS first_kept_doc
             FROM r GROUP BY source ORDER BY source""")),

    // c32: SHARDED EXPORT — the last mile of a curation pipeline:
    // materialize the corpus as a FIXED number of reproducible shards
    // (the dataset-release shape: training jobs address shard files,
    // re-runs must produce byte-stable membership). Shard = Knuth
    // multiplicative hash of doc_id (NOT pmod(doc_id, N): dense ids
    // would stripe correlated neighbors into the same shard),
    // decoupled from input partitioning. ONE shuffle: repartition on
    // the shard value puts each shard's rows in exactly one task;
    // write.partitionBy lands them as one file per shard dir;
    // sortWithinPartitions gives a deterministic within-shard order
    // (map-side, no extra exchange — c30's shuffle-order hash). At
    // 100 TB the same plan holds with shards sized to ~file targets:
    // cost is the one hash-repartition any export pays. Witnessed
    // from the READ-BACK files, not the pre-write frame; the
    // one-file-per-shard invariant is a result column.
    Decl("c32_sharded_export",
      (s, dir) => shardedExport(s, dir,
        graft.GraftTmp.dir("graft_c32").toString, 16),
      Some("""SELECT (doc_id * 2654435761) % 4294967296 % 16 AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(MIN(doc_id) AS BIGINT) AS min_doc,
             TRUE AS one_file_per_shard
             FROM documents GROUP BY 1 ORDER BY shard""")),

    // c33: EPOCH UPSAMPLING — materialize one training epoch from
    // per-bucket mixture weights (c20 computes weights; this EXECUTES
    // them): weight w means every doc repeats floor(w) times plus one
    // more with probability frac(w), decided by the doc's own Knuth
    // hash — deterministic, append-stable, and exactly replayable
    // (rand() would be none of those). Covers all four regimes:
    // en×1.0 identity, de×2.5 fractional up, zh×3.0 integer up,
    // fr×0.5 down (reps ∈ {0,1} — downsampling IS the w<1 case),
    // es×1.75. The epoch is genuinely MATERIALIZED (explode of
    // sequence(1, reps)) — a flatMap, no shuffle until the audit agg;
    // at 100 TB the epoch writer streams repeats straight to the
    // sink, paying O(output) like any copy job.
    Decl("c33_epoch_upsample",
      (s, dir) => {
        val frac100 = expr("""CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 50
          WHEN 'zh' THEN 0 WHEN 'fr' THEN 50 WHEN 'es' THEN 75 ELSE 0 END""")
        val base = expr("""CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2
          WHEN 'zh' THEN 3 WHEN 'fr' THEN 0 WHEN 'es' THEN 1 ELSE 1 END""")
        docs(s, dir)
          .withColumn("reps", (base + when(
            pmod($"doc_id" * lit(2654435761L), lit(4294967296L)) % 100 < frac100,
            1).otherwise(0)).cast("int"))
          .filter($"reps" > 0) // sequence(1,0) would step -1 (NOTES #14)
          .select($"lang", $"n_chars", $"doc_id",
            explode(expr("sequence(1, reps)")).as("rep"))
          .groupBy($"lang")
          .agg(countDistinct($"doc_id").cast("long").as("n_kept"),
            count(lit(1)).cast("long").as("n_epoch_rows"),
            sum($"n_chars").cast("long").as("epoch_chars"))
          .orderBy($"lang")
      },
      Some("""WITH w AS (SELECT lang, n_chars, doc_id,
               (CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 WHEN 'zh' THEN 3
                 WHEN 'fr' THEN 0 WHEN 'es' THEN 1 ELSE 1 END) +
               (CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 <
                 (CASE lang WHEN 'de' THEN 50 WHEN 'fr' THEN 50
                   WHEN 'es' THEN 75 ELSE 0 END) THEN 1 ELSE 0 END) AS reps
               FROM documents)
             SELECT lang, CAST(COUNT(*) FILTER (reps > 0) AS BIGINT) AS n_kept,
               CAST(SUM(reps) AS BIGINT) AS n_epoch_rows,
               CAST(SUM(n_chars * reps) AS BIGINT) AS epoch_chars
             FROM w GROUP BY lang ORDER BY lang""")),

    // c34: HARD-NEGATIVE MINING — the contrastive-training data step
    // (retrieval/embedding training needs, per anchor: its best
    // SAME-label neighbor as the positive and the top DIFFERENT-label
    // neighbors as hard negatives — the pairs the model currently
    // confuses). Query slice broadcast against one corpus scan (the
    // c04/c05 shape with label predicates); per-anchor ranking is a
    // window over (cos desc, id) — deterministic ties. At 100 TB the
    // anchors batch (broadcast ≪ corpus), the corpus streams once per
    // batch, and c10's IVF drop-in replaces the scan when the corpus
    // side outgrows it.
    Decl("c34_hard_negatives",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val e = emb(s, dir)
        val q = e.filter($"vec_id" < 30)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
            $"label".as("q_label"))
        val scored = e.as("c").join(broadcast(q), col("c.vec_id") =!= col("q_id"))
          .select($"q_id", $"q_label", col("c.vec_id").as("cand"),
            col("c.label").as("cand_label"),
            expr("cosine_sim(c.embedding, q_emb)").as("cos"))
        val wQ = Window.partitionBy($"q_id").orderBy($"cos".desc, $"cand".asc)
        val pos = scored.filter($"cand_label" === $"q_label")
          .withColumn("rk", row_number().over(wQ)).filter($"rk" === 1)
          .select($"q_id", $"cand".as("pos_id"), round($"cos", 6).as("pos_cos"))
        val neg = scored.filter($"cand_label" =!= $"q_label")
          .withColumn("rk", row_number().over(wQ)).filter($"rk" <= 3)
          .groupBy($"q_id")
          .agg(max(when($"rk" === 1, $"cand")).as("neg1"),
            max(when($"rk" === 2, $"cand")).as("neg2"),
            max(when($"rk" === 3, $"cand")).as("neg3"),
            round(max(when($"rk" === 1, $"cos")), 6).as("neg1_cos"))
        pos.join(neg, "q_id").orderBy($"q_id")
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
                         FROM embeddings WHERE vec_id < 30),
             s AS (SELECT q_id, q_label, c.vec_id AS cand, c.label AS cand_label,
                     (list_aggregate(list_transform(list_zip(c.embedding, q_emb), x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum')
                      / (sqrt(list_aggregate(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))
                       * sqrt(list_aggregate(list_transform(q_emb, x -> CAST(x AS DOUBLE) * x), 'sum')))) AS cos
                   FROM embeddings c JOIN q ON c.vec_id <> q_id),
             p AS (SELECT q_id, cand AS pos_id, ROUND(cos, 6) AS pos_cos,
                     ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand) AS rk
                   FROM s WHERE cand_label = q_label),
             n AS (SELECT q_id, cand, cos,
                     ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand) AS rk
                   FROM s WHERE cand_label <> q_label)
             SELECT p.q_id, p.pos_id, p.pos_cos,
               CAST(MAX(CASE WHEN n.rk = 1 THEN n.cand END) AS BIGINT) AS neg1,
               CAST(MAX(CASE WHEN n.rk = 2 THEN n.cand END) AS BIGINT) AS neg2,
               CAST(MAX(CASE WHEN n.rk = 3 THEN n.cand END) AS BIGINT) AS neg3,
               ROUND(MAX(CASE WHEN n.rk = 1 THEN n.cos END), 6) AS neg1_cos
             FROM p JOIN n ON p.q_id = n.q_id AND n.rk <= 3
             WHERE p.rk = 1
             GROUP BY 1, 2, 3 ORDER BY p.q_id"""))
  )
}
