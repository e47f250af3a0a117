package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import syntax._

/** Part D (builder extension, SURVEY §2 addendum) — text-analysis
  * operators a training-data pipeline needs beyond c06-c08: n-gram
  * language identification, quality scoring, BPE-ish token statistics
  * and order-sensitive document fingerprints.
  *
  * Scale notes: t01 builds per-language profiles (vocabulary-sized →
  * broadcast) then scores documents in one shuffle-free map +
  * broadcast join; t02/t03 are pure expression maps; t04's rolling
  * hash is a sequential fold per document (HOF), embarrassingly
  * parallel across documents.
  */
object TextPack extends Pack {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** t07's persisted per-doc bigram-count stage — unpersisted by the
    * next same-context invocation (the current one backs the returned
    * lazy plan; see PersistSlot for the context-scoping rationale). */
  private val lastBi = new PersistSlot

  val decls: Seq[Decl] = Seq(

    // t01: character-trigram language ID. Train: top-15 trigrams per
    // lang (from docs with doc_id >= 100); classify docs < 100 by
    // profile-overlap argmax. The synthetic corpus shares one
    // vocabulary, so accuracy is meaningless — but the operator
    // (profile build → broadcast → overlap argmax) is the real shape,
    // and the result is deterministic on both engines.
    Decl("t01_lang_id_ngram",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        // spread: trigram generation + profile counting is per-row
        // CPU above a one-task scan (profiled 1.33 s single-task at
        // sf0.1); parallelize below core count (guide §2.5)
        val d = syntax.spread(docs(s, dir), $"doc_id")
        // native one-pass generator (returns empty below 3 chars — no
        // sequence(1,0) step -1 trap, no per-position lambda dispatch)
        val grams = d.select($"doc_id", $"lang",
            posexplode(expr("char_ngrams(text, 3)")).as(Seq("p", "gram")))
          .select($"doc_id", $"lang", $"gram")
        val wTop = Window.partitionBy($"lang").orderBy($"n".desc, $"gram".asc)
        val profile = grams.filter($"doc_id" >= 100)
          .groupBy($"lang", $"gram").agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(wTop))
          .filter($"rk" <= 15)
          .select($"lang".as("cand_lang"), $"gram")
        val wBest = Window.partitionBy($"doc_id")
          .orderBy($"hits".desc, $"cand_lang".asc)
        grams.filter($"doc_id" < 100).dropDuplicates("doc_id", "gram")
          .join(broadcast(profile), "gram")
          .groupBy($"doc_id", $"cand_lang")
          .agg(count(lit(1)).cast("long").as("hits"))
          .withColumn("rk", row_number().over(wBest))
          .filter($"rk" === 1)
          .select($"doc_id", $"cand_lang".as("predicted_lang"), $"hits")
          .orderBy($"doc_id")
      },
      Some("""WITH grams AS (
               SELECT doc_id, lang, substring(text, i, 3) AS gram
               FROM documents,
                    LATERAL (SELECT unnest(range(1, GREATEST(length(text) - 2, 0) + 1)) AS i)),
             profile AS (
               SELECT lang AS cand_lang, gram FROM (
                 SELECT lang, gram, COUNT(*) AS n,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, gram ASC) AS rk
                 FROM grams WHERE doc_id >= 100 GROUP BY lang, gram)
               WHERE rk <= 15),
             hits AS (
               SELECT doc_id, cand_lang, CAST(COUNT(*) AS BIGINT) AS hits FROM (
                 SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id < 100) g
               JOIN profile USING (gram) GROUP BY doc_id, cand_lang)
             SELECT doc_id, cand_lang AS predicted_lang, hits FROM (
               SELECT doc_id, cand_lang, hits,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY hits DESC, cand_lang ASC) AS rk
               FROM hits)
             WHERE rk = 1 ORDER BY doc_id""")),

    // t02: quality heuristics — token count, mean token length,
    // stopword ratio (domain's most frequent tokens), alpha ratio
    Decl("t02_quality_score",
      (s, dir) => {
        val stop = Seq("a", "the", "value", "table", "row", "key", "part")
        docs(s, dir).filter($"doc_id" < 200)
          .withColumn("toks", split($"text", " "))
          .select(
            $"doc_id",
            size($"toks").cast("long").as("n_tokens"),
            round(length(regexp_replace($"text", " ", "")).cast("double")
              / size($"toks"), 4).as("mean_tok_len"),
            round(expr(s"size(filter(toks, t -> t IN (${stop.map("'" + _ + "'").mkString(",")})))")
              .cast("double") / size($"toks"), 4).as("stopword_ratio"),
            round(length(regexp_replace($"text", "[^a-z]", "")).cast("double")
              / length($"text"), 4).as("alpha_ratio"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(string_split(text, ' ')), 4) AS mean_tok_len,
             ROUND(CAST(len(list_filter(string_split(text, ' '),
               t -> t IN ('a','the','value','table','row','key','part'))) AS DOUBLE)
               / len(string_split(text, ' ')), 4) AS stopword_ratio,
             ROUND(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
               / length(text), 4) AS alpha_ratio
             FROM documents WHERE doc_id < 200 ORDER BY doc_id""")),

    // t03: token counting two ways — whitespace tokens and a BPE-ish
    // deterministic segmentation (consonant/vowel runs)
    Decl("t03_token_count_bpe",
      (s, dir) => docs(s, dir).filter($"doc_id" < 200)
        .select(
          $"doc_id",
          size(split($"text", " ")).cast("long").as("n_ws_tokens"),
          size(expr("regexp_extract_all(text, '[aeiou]+|[^aeiou ]+', 0)"))
            .cast("long").as("n_subtokens"))
        .orderBy($"doc_id"),
      Some("""SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '[aeiou]+|[^aeiou ]+', 0)) AS BIGINT) AS n_subtokens
             FROM documents WHERE doc_id < 200 ORDER BY doc_id""")),

    // t05: PII detection + redaction — the scrub step every
    // pre-training pipeline runs. Counts and redacts email/phone
    // patterns (regex chosen to parse identically under Java regex and
    // DuckDB's RE2). Map-only, embarrassingly parallel; the fixture
    // corpus is synthetic so fixture counts are 0 — TextPackSpec
    // plants PII docs and pins the counts and redacted lengths.
    Decl("t05_pii_redact",
      (s, dir) => {
        val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val phone = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
        docs(s, dir).filter($"doc_id" < 200)
          // typed regexp_extract_all, NOT expr(): Spark SQL string
          // literals process backslash escapes ('\b' → backspace), so
          // an embedded pattern would silently corrupt
          .select(
            $"doc_id",
            size(regexp_extract_all($"text", lit(email), lit(0)))
              .cast("long").as("n_emails"),
            size(regexp_extract_all($"text", lit(phone), lit(0)))
              .cast("long").as("n_phones"),
            length(regexp_replace(regexp_replace($"text", email, "<EMAIL>"),
              phone, "<PHONE>")).cast("long").as("redacted_len"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(text, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phones,
             CAST(length(regexp_replace(regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'), '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
             FROM documents WHERE doc_id < 200 ORDER BY doc_id""")),

    // t04: order-sensitive rolling-hash fingerprint — polynomial fold
    // over per-token values (ascii of head char, length), modulo a
    // prime to stay overflow-safe under ANSI arithmetic. Token
    // reordering changes the fingerprint; bag-identical docs collide
    // only if token ORDER matches too.
    Decl("t04_doc_fingerprint",
      (s, dir) => docs(s, dir).filter($"doc_id" < 200)
        .select(
          $"doc_id",
          expr("""aggregate(split(text, ' '),
                 CAST(7 AS BIGINT),
                 (acc, t) -> (acc * 31 + ascii(t) * 37 + length(t)) % 1000000007)""")
            .as("fingerprint"))
        .orderBy($"doc_id"),
      Some("""SELECT doc_id,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(text, ' '),
                 t -> CAST(ascii(t) * 37 + length(t) AS BIGINT))),
               (acc, v) -> (acc * 31 + v) % 1000000007) AS fingerprint
             FROM documents WHERE doc_id < 200 ORDER BY doc_id""")),

    // t06: corpus profile — the "dataset card" numbers a training-data
    // curation run reports: volume, exact-dup ratio (distinct
    // normalized texts vs docs), token mass, short-doc fraction,
    // language/source spread. One map-side pass + a global agg;
    // every input is a portable expression (no engine-specific hash),
    // so the same numbers come out of any engine. At 100 TB this is
    // the cheap pre-flight profile run before any dedup decision.
    Decl("t06_corpus_profile",
      (s, dir) => docs(s, dir)
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          countDistinct(lower(trim($"text"))).cast("long").as("n_unique_texts"),
          sum(size(split($"text", " "))).cast("long").as("n_tokens"),
          round(avg(size(split($"text", " "))), 4).as("avg_tokens"),
          count(when($"n_chars" < 100, 1)).cast("long").as("n_short"),
          countDistinct($"lang").cast("long").as("n_langs"),
          countDistinct($"source").cast("long").as("n_sources")),
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT lower(trim(text))) AS BIGINT) AS n_unique_texts,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             ROUND(AVG(len(string_split(text, ' '))), 4) AS avg_tokens,
             CAST(COUNT(CASE WHEN n_chars < 100 THEN 1 END) AS BIGINT) AS n_short,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
             FROM documents""")),

    // t07: bigram language-model scoring — the KenLM/CCNet quality-
    // filter role: train add-one-smoothed bigram probabilities on the
    // corpus itself, score each doc by its mean token log-likelihood
    // (low scores = boilerplate/garbled text a perplexity filter
    // drops). Contexts c(w1) are bigram-first occurrences; V is the
    // corpus vocabulary, a 1-row broadcast. Scale: the raw bigram
    // stream is pre-aggregated to per-(doc, w1, w2) counts FIRST (one
    // shuffle), so the count tables derive from — and the probability
    // join runs against — the deduplicated stream: join input shrinks
    // by the per-doc bigram duplication factor, and the per-doc score
    // becomes the k-weighted average of distinct-bigram logprobs
    // (identical value, fewer rows). The counts tables are
    // vocabulary²-bounded — broadcast when they fit, otherwise ONE
    // shuffle on (w1,w2). ln() values are irrational, so round-4 is
    // engine-safe (NOTES.md rule 3); the oracle mirrors the weighted
    // formulation so both engines fold the same operand stream.
    Decl("t07_bigram_lm_score",
      (s, dir) => {
        val toks = docs(s, dir)
          .select($"doc_id", split($"text", " ").as("t"))
          .filter(size($"t") >= 2)
        val db = toks.select($"doc_id", explode(expr(
            "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("b"))
          .select($"doc_id", $"b.w1", $"b.w2")
          .groupBy($"doc_id", $"w1", $"w2").agg(count(lit(1)).as("k"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        lastBi.swap(db)
        val bc = db.groupBy($"w1", $"w2").agg(sum($"k").as("cb"))
        val uc = db.groupBy($"w1").agg(sum($"k").as("cu"))
        val vocab = db.select($"w1").union(db.select($"w2"))
          .agg(countDistinct($"w1").as("v"))
        db.join(bc, Seq("w1", "w2")).join(uc, Seq("w1"))
          .crossJoin(broadcast(vocab))
          .withColumn("lp", log(($"cb" + lit(1)).cast("double") / ($"cu" + $"v")))
          .groupBy($"doc_id")
          .agg(sum($"k").cast("long").as("n_bigrams"),
            round(sum($"k" * $"lp") / sum($"k"), 4).as("avg_logprob"))
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                            FROM documents WHERE len(string_split(text, ' ')) >= 2),
                  bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
                         FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)),
                  db AS (SELECT doc_id, w1, w2, COUNT(*) AS k FROM bi GROUP BY 1, 2, 3),
                  bc AS (SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS cb FROM db GROUP BY 1, 2),
                  uc AS (SELECT w1, CAST(SUM(k) AS BIGINT) AS cu FROM db GROUP BY 1),
                  vocab AS (SELECT COUNT(DISTINCT w) AS v FROM
                    (SELECT w1 AS w FROM db UNION ALL SELECT w2 FROM db))
             SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
               ROUND(SUM(k * ln((cb + 1.0) / (cu + v))) / SUM(k), 4) AS avg_logprob
             FROM db JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN vocab
             GROUP BY doc_id ORDER BY doc_id""")),

    // t08: character-entropy quality signal — Shannon entropy of the
    // per-doc character distribution, the cheap garbled-text /
    // binary-junk detector (low entropy = repeated filler, high =
    // random bytes; natural text sits in a band). Chars come from
    // split-on-empty — LINEAR per doc; a substr(text, i, 1) generator
    // is O(len) per char on UTF8String (quadratic per doc: measured
    // 4.4s → 1.4s at sf0.1). Both engines split '' identically on
    // non-empty text (empty text is filtered; the hand-value spec
    // pins the semantics). Two aggs: (doc, char) counts, then the
    // entropy fold per doc — both map-side-combining shuffles on
    // small keys; the text itself is never shuffled. ln() values are
    // irrational → round-4 is engine-safe (NOTES rule 3).
    // t09: repetition-ratio quality signal — the Gopher repetition
    // rules (duplicate n-gram mass): per doc, the fraction of token
    // bigrams that are repeats of an earlier bigram and the mass of
    // the single most frequent bigram; high values = boilerplate /
    // looped generation a repetition filter drops. Two aggregations on
    // (doc, bigram) keys — both map-side-combining, the text itself
    // never shuffles; linear per doc. Ratios of exact integers stay
    // engine-identical at round 4.
    Decl("t09_repetition_ratio",
      (s, dir) => {
        val bi = docs(s, dir).filter($"doc_id" < 200)
          .select($"doc_id", split($"text", " ").as("t"))
          .filter(size($"t") >= 2)
          .select($"doc_id", explode(expr(
            "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("b"))
          .select($"doc_id", $"b.w1", $"b.w2")
        bi.groupBy($"doc_id", $"w1", $"w2")
          .agg(count(lit(1)).as("cnt"))
          .groupBy($"doc_id")
          .agg(
            sum($"cnt").cast("long").as("n_bigrams"),
            round(lit(1.0) - count(lit(1)) / sum($"cnt"), 4)
              .as("dup_bigram_frac"),
            round(max($"cnt") / sum($"cnt"), 4).as("top_bigram_frac"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
                         FROM documents
                         WHERE doc_id < 200 AND len(string_split(text, ' ')) >= 2),
                  bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
                         FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i)),
                  bc AS (SELECT doc_id, w1, w2, COUNT(*) AS cnt
                         FROM bi GROUP BY 1, 2, 3)
             SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
               ROUND(1.0 - COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 4) AS dup_bigram_frac,
               ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 4) AS top_bigram_frac
             FROM bc GROUP BY doc_id ORDER BY doc_id""")),

    Decl("t08_char_entropy",
      (s, dir) => {
        val chars = docs(s, dir).filter(length($"text") > 0)
          .select($"doc_id", length($"text").cast("double").as("len"),
            explode(split($"text", "")).as("ch"))
        chars.groupBy($"doc_id", $"len", $"ch")
          .agg(count(lit(1)).cast("double").as("cnt"))
          .groupBy($"doc_id")
          .agg(
            count(lit(1)).cast("long").as("n_distinct_chars"),
            round(-sum(($"cnt" / $"len") * log($"cnt" / $"len")), 4)
              .as("entropy"))
          .orderBy($"doc_id")
      },
      Some("""WITH chars AS (
               SELECT doc_id, CAST(length(text) AS DOUBLE) AS len,
                 unnest(string_split(text, '')) AS ch
               FROM documents WHERE length(text) > 0),
                  cc AS (SELECT doc_id, len, ch, CAST(COUNT(*) AS DOUBLE) AS cnt
                         FROM chars GROUP BY 1, 2, 3)
             SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
               ROUND(-SUM((cnt / len) * ln(cnt / len)), 4) AS entropy
             FROM cc GROUP BY doc_id ORDER BY doc_id""")),

    // t10: Unicode sanitation — NFC canonicalization (native codegen
    // expression; DuckDB nfc_normalize mirrors the same Unicode
    // tables) plus a control-character census. Dedup hashing upstream
    // (c01/c02/c27) assumes canonical text: a decomposed "e"+U+0301
    // and the composed "é" MUST hash identically, and C0 controls are
    // the classic mojibake tell. The fixture corpus is ASCII (where
    // NFC is the identity — the fast path), so both engines also
    // plant a decomposed-accent row and a control-char row via
    // UNION ALL VALUES to exercise the non-trivial branch through the
    // oracle. Pure expression map: no shuffle, no UDF, sanitizing
    // 100 TB is scan-bound. The ctrl pattern goes through the TYPED
    // regexp_replace (NOTES rule 17 — expr() would eat the \x).
    Decl("t10_unicode_sanitize",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val ctrlPat = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
        val planted = s.range(1).select(
            lit(9001L).as("doc_id"),
            lit("Cafe\u0301 du jour").as("text")) // decomposed accent
          .union(s.range(1).select(lit(9002L).as("doc_id"),
            lit("bad\u0001ctrl").as("text")))
        docs(s, dir).filter($"doc_id" < 50).select($"doc_id", $"text")
          .union(planted)
          .select($"doc_id",
            length($"text").cast("long").as("len_raw"),
            length(expr("nfc_normalize(text)")).cast("long").as("len_nfc"),
            (length($"text") -
              length(regexp_replace($"text", lit(ctrlPat), lit(""))))
              .cast("long").as("n_ctrl"),
            when(expr("nfc_normalize(text)") =!= $"text", 1L).otherwise(0L)
              .cast("long").as("nfc_changed"))
          .orderBy($"doc_id")
      },
      Some("""WITH u AS (
               SELECT doc_id, text FROM documents WHERE doc_id < 50
               UNION ALL SELECT 9001, 'Cafe' || chr(769) || ' du jour'
               UNION ALL SELECT 9002, 'bad' || chr(1) || 'ctrl')
             SELECT doc_id,
               CAST(length(text) AS BIGINT) AS len_raw,
               CAST(length(nfc_normalize(text)) AS BIGINT) AS len_nfc,
               CAST(length(text) - length(regexp_replace(text,
                 '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS BIGINT) AS n_ctrl,
               CAST(CASE WHEN nfc_normalize(text) <> text THEN 1 ELSE 0 END
                 AS BIGINT) AS nfc_changed
             FROM u ORDER BY doc_id"""))
  )
}
