package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.NfcNormalize

/** Unit contract of the NFC-normalization codegen Expression
  * (§2.29 `text_unicode_normalize`). */
class NfcNormalizeSpec extends SparkSpec {

  private val decomposed = "résumé" // e + U+0301
  private val precomposed = "résumé"  // U+00E9

  test("composes decomposed input to the precomposed form") {
    assert(decomposed != precomposed) // byte-distinct inputs…
    assert(NfcNormalize.normalize(UTF8String.fromString(decomposed)).toString
      == precomposed)                 // …converge under NFC
  }

  test("already-normalized input takes the allocation-free fast path") {
    val s = UTF8String.fromString(precomposed)
    // eq, not ==: the fast path must return the SAME object.
    assert(NfcNormalize.normalize(s) eq s)
    val ascii = UTF8String.fromString("plain ascii")
    assert(NfcNormalize.normalize(ascii) eq ascii)
  }

  test("codegen path agrees with the shared normalize and propagates null") {
    import spark.implicits._
    val df = Seq(Some(decomposed), Some(precomposed), Some("abc"), None)
      .toDF("s")
      .select(col("s"), NfcNormalize(col("s")).as("n"))
    val rows = df.collect()
    assert(rows.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some(precomposed), Some(precomposed), Some("abc"), None))
  }

  test("SQL registration: nfc_normalize callable from spark.sql") {
    NfcNormalize.register(spark)
    val out = spark.sql(
      s"SELECT nfc_normalize('$decomposed') = '$precomposed' AS ok")
      .head().getBoolean(0)
    assert(out)
  }

  test("declared key: even/odd fingerprints converge doc-by-doc") {
    // The op's whole point: byte-distinct encodings of the same text
    // hash identically after NFC. Even doc 2k and odd doc 2k+1 carry
    // DIFFERENT raw prefixes over different texts, so compare each
    // doc's norm_fp against an independently composed md5 instead:
    // norm("résumé " + text) must equal md5 of the precomposed prefix
    // + raw text for BOTH parities.
    import spark.implicits._
    val res = SparkEntry.queries("text_unicode_normalize")(spark, sf)
    val docs = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        md5(concat(lit(precomposed + " "), col("text")).cast("binary"))
          .as("expect_fp"))
    val joined = res.join(docs, "doc_id")
      .filter(col("norm_fp") =!= col("expect_fp"))
    assert(joined.count() == 0)
  }
}
