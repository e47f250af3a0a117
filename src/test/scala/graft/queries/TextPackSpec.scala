package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantics the fixture corpus can't exercise: t05's PII patterns on
  * planted documents (the synthetic corpus contains no PII, so the
  * declared query's fixture counts are all zero). */
class TextPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("char_ngrams/word_ngrams match their HOF formulations; edge semantics pinned") {
    graft.functions.GraftFunctions.register(spark)
    // char_ngrams ≡ transform(sequence(...), substring) incl. the <n guard
    val texts = Seq("hello world", "ab", "abc", "", "日本語のテキスト")
    val rows = texts.toDF("t").selectExpr(
      "char_ngrams(t, 3) AS native",
      """CASE WHEN length(t) < 3 THEN CAST(array() AS ARRAY<STRING>)
         ELSE transform(sequence(1, length(t) - 2), i -> substring(t, i, 3)) END AS hof""")
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (native, hof) => assert(native == hof) }

    // word_ngrams ≡ transform(sequence, slice+concat_ws); empty below n
    val toks = Seq(Seq("a", "b", "c", "d"), Seq("x", "y"), Seq.empty[String])
    val wrows = toks.toDF("w").selectExpr(
      "word_ngrams(w, 3) AS native",
      """CASE WHEN size(w) < 3 THEN CAST(array() AS ARRAY<STRING>)
         ELSE transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3))) END AS hof""")
      .as[(Seq[String], Seq[String])].collect()
    wrows.foreach { case (native, hof) => assert(native == hof) }

    // null input → NULL; null token → NULL (HOF parity)
    val nulls = spark.sql(
      """SELECT char_ngrams(CAST(NULL AS STRING), 3) IS NULL,
                word_ngrams(CAST(NULL AS ARRAY<STRING>), 3) IS NULL,
                word_ngrams(array('a', CAST(NULL AS STRING), 'c'), 2) IS NULL""")
      .as[(Boolean, Boolean, Boolean)].collect().head
    assert(nulls == ((true, true, true)))
  }

  test("t05 counts and redacts planted emails and phone numbers") {
    val texts = Seq(
      (0L, "contact alice@example.com or bob.smith+x@mail.co today"),
      (1L, "call 555-123-4567 or 555 987 6543 now"),
      (2L, "mixed carol@test.org and 111-222-3333 here"),
      (3L, "clean text with no pii at all"))
    val df = texts.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
    val tmp = graft.GraftTmp.dir("pii_spec").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = TextPack.queries("t05_pii_redact")(spark, tmp)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(0L)._2 == 2 && byId(0L)._3 == 0, s"doc 0: ${byId(0L)}")
    assert(byId(1L)._2 == 0 && byId(1L)._3 == 2, s"doc 1: ${byId(1L)}")
    assert(byId(2L)._2 == 1 && byId(2L)._3 == 1, s"doc 2: ${byId(2L)}")
    assert(byId(3L)._2 == 0 && byId(3L)._3 == 0, s"doc 3: ${byId(3L)}")
    // redaction shortens/changes length exactly to the token forms
    val clean0 = "contact <EMAIL> or <EMAIL> today"
    assert(byId(0L)._4 == clean0.length, s"doc 0 redacted_len: ${byId(0L)._4}")
    // no-PII doc length unchanged
    assert(byId(3L)._4 == texts(3)._2.length)
  }

  test("t07 bigram LM scores match a hand computation; repetition scores higher") {
    // corpus: doc 0 = "a b a b" (bigrams ab, ba, ab), doc 1 = "a c"
    // (bigram ac), doc 2 = "z" (no bigram → excluded, and z is not in
    // the bigram vocabulary). contexts: c(a)=3 [a->b ×2, a->c],
    // c(b)=1; vocab {a,b,c} → V=3.
    // P(b|a)=(2+1)/(3+3), P(a|b)=(1+1)/(1+3), P(c|a)=(1+1)/(3+3)
    val df = Seq((0L, "a b a b"), (1L, "a c"), (2L, "z"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
    val tmp = graft.GraftTmp.dir("lm_spec").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = TextPack.queries("t07_bigram_lm_score")(spark, tmp)
      .as[(Long, Long, Double)].collect().toSeq
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lp = (cb: Int, cu: Int) => math.log((cb + 1.0) / (cu + 3.0))
    val exp0 = r4((2 * lp(2, 3) + lp(1, 1)) / 3) // ab, ba, ab
    val exp1 = r4(lp(1, 3))                      // ac
    assert(got == Seq((0L, 3L, exp0), (1L, 1L, exp1)), s"got $got")
    // the repeated pattern is more probable than the one-off bigram
    assert(exp0 > exp1, "repetition must raise mean log-likelihood")
  }

  test("t08 entropy: hand-checked values; constant text scores zero") {
    val df = Seq((0L, "aabb"), (1L, "aaaa"), (2L, "abcd"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
    val tmp = graft.GraftTmp.dir("entropy_spec").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextPack.queries("t08_char_entropy")(spark, tmp)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (0L, 2L, r4(math.log(2))),       // two chars at p=1/2 → ln 2
      (1L, 1L, -0.0),                  // constant text → zero entropy
      (2L, 4L, r4(math.log(4)))),      // uniform over 4 → ln 4
      s"got $got")
  }

  test("nfc_normalize: composition, ASCII identity fast path, NULL, codegen ≡ eval") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(
      ("Café", "Café"),   // decomposed → composed
      ("plain ascii", "plain ascii"), // fast path: already NFC
      ("\u00e9\u00e8", "\u00e9\u00e8"), // composed stays composed
      ("", "")
    ).toDF("raw", "want")
    val got = rows.selectExpr("nfc_normalize(raw) AS got", "want")
      .as[(String, String)].collect()
    got.foreach { case (g, w) => assert(g == w, s"'$g' != '$w'") }

    // NULL propagates; interpreted eval (no codegen) agrees with the
    // codegen'd path — both route through the same static helper
    val n = spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING)) AS v")
      .as[Option[String]].collect().head
    assert(n.isEmpty)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val interp = graft.functions.NfcNormalize(Literal("Cafe\u0301"))
      .eval(null).asInstanceOf[UTF8String]
    assert(interp.toString == "Caf\u00e9")
  }
}
