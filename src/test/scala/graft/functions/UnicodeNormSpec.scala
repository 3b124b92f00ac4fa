package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private def k(s: String): String =
    UnicodeNorm.key(UTF8String.fromString(s)).toString

  // every fixture string is built from escapes — a literal glyph in
  // this file could be silently NFC-normalized by an editor and the
  // NFD case would stop testing anything (the tx48 design rule)
  private val nfc = " caf\u00e9"
  private val nfd = " cafe\u0301"
  private val cased = " CAF\u00c9"
  private val wide = " \uff43\uff41\uff46\uff45"
  private val cyr = " \u0441\u0430f\u0435"

  test("NFC, NFD, cased, full-width, and homoglyph twins all collapse") {
    assert(k(nfd) == nfc, "NFD must compose to NFC under NFKC")
    assert(k(cased) == nfc, "casefold after NFKC")
    assert(k(wide) == " cafe", "full-width folds to ASCII under NFKC")
    assert(k(cyr) == " cafe", "homoglyph strip maps Cyrillic to ASCII")
    assert(k(" cafe") == " cafe")
    // the two canonical groups stay DISTINCT: é is not e
    assert(k(nfc) != k(wide))
  }

  test("ascii lower-case fast path returns the input unchanged; idempotent everywhere") {
    val u = UTF8String.fromString("plain ascii text 123")
    assert(UnicodeNorm.key(u) eq u, "fast path must not copy")
    for (s <- Seq(nfc, nfd, cased, wide, cyr, "x", ""))
      assert(k(k(s)) == k(s), s"not idempotent on ${s.length} chars")
  }

  test("uppercase homoglyphs fold through casefold into the strip table") {
    // Cyrillic А (U+0410) → lower а (U+0430) → 'a'
    assert(k("\u0410\u0415") == "ae")
    // Greek capital Rho (U+03A1) -> lower rho (U+03C1) -> 'p'
    assert(k("\u03a1") == "p")
  }

  test("expanded confusable classes collapse: Cyrillic, Greek, Armenian, Latin strays") {
    // r14 expansion - each class spells an ASCII word entirely in
    // confusables; fixtures as escapes per the tx48 design rule
    // Cyrillic Komi de / qa / we / izhitsa / palochka -> d q w v l
    assert(k("\u0501\u051b\u051d\u0475\u04cf") == "dqwvl")
    // Greek nu rho lunate-sigma upsilon omega gamma kappa iota
    assert(k("\u03bd\u03c1\u03f2\u03c5\u03c9\u03b3\u03ba\u03b9")
      == "vpcuwyki")
    // Armenian oh seh ho vo -> o u h n
    assert(k("\u0585\u057d\u0570\u0578") == "ouhn")
    // Latin letterlike: dotless i, dotless j, script l (script l may
    // fold under NFKC or the map - either path must land on 'l')
    assert(k("\u0131\u0237\u2113") == "ijl")
    // a full spoofed word: Cyrillic v-i-d-e + Greek omicron -> "video"
    assert(k("\u0475\u0456\u0501\u0435\u03bf") == "video")
    // distinct letters must NOT collapse: Greek sigma is not mapped
    assert(k("\u03c3") == "\u03c3")
  }

  test("Column API and SQL registration agree with the JVM kernel; null stays null") {
    val df = Seq(Some(nfd), Some(cyr), None).toDF("s")
    val got = df.select(UnicodeNorm.unicodeNormKey(col("s")))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some(nfc), Some(" cafe"), None))
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("un_spec")
    val sqlGot = spark.sql("SELECT unicode_norm_key(s) FROM un_spec")
      .as[Option[String]].collect().toSeq
    assert(sqlGot == got)
  }

  test("dd1 composition: md5 over the canonical key merges what raw md5 splits") {
    val docs = Seq(
      (1L, "the menu says" + nfc),
      (2L, "the menu says" + nfd),
      (3L, "the menu says" + cased),
      (4L, "other text" + wide),
      (5L, "other text" + cyr)).toDF("doc_id", "text")
    val norm = docs.select(col("doc_id"),
      md5(UnicodeNorm.unicodeNormKey(col("text"))).as("nk"),
      md5(col("text")).as("rk"))
    assert(norm.select(countDistinct("rk")).as[Long].head() == 5L,
      "raw md5 must split every variant")
    assert(norm.select(countDistinct("nk")).as[Long].head() == 2L,
      "canonical md5 must merge each twin group")
  }
}
