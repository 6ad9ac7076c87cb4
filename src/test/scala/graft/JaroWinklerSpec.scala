package graft

import org.apache.spark.sql.functions._
import graft.functions.JaroWinkler

/** Pins graft.functions.JaroWinkler bit-for-bit against DuckDB's
  * `jaro_winkler_similarity` (the declared key's oracle function). The
  * expected doubles below were computed with DuckDB 1.x on this
  * machine — textbook cases, the fixture name domain, and adversarial
  * random strings over the fixture alphabet. Notable pinned semantics:
  * both-empty ⇒ 0.0 (DuckDB's convention, NOT the textbook 1.0),
  * boost threshold jaro > 0.7, prefix cap 4, and transpositions
  * FLOOR-halved (k div 2 — an odd out-of-order count truncates, which
  * the adversarial pairs below exercise; the textbook k/2.0 fails
  * them).
  */
class JaroWinklerSpec extends SparkSpec {

  private val cases: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("", "", 0.0),
    ("a", "", 0.0),
    ("", "b", 0.0),
    ("a", "a", 1.0),
    ("ab", "ba", 0.0),
    ("abc", "abc", 1.0),
    ("crate", "trace", 0.7333333333333334),
    ("dwayne", "duane", 0.8400000000000001),
    ("small ring", "small ping", 0.96),
    ("small ring", "small gizmo", 0.8804545454545455),
    ("red widget", "blue widget", 0.8424242424242424),
    ("aaaaaa", "aaaaab", 0.9333333333333333),
    ("abcdefgh", "abcdefgh", 1.0),
    ("xy", "yx", 0.0),
    ("prefixmatch", "prefixmatxh", 0.9636363636363636),
    ("zzzz", "zzz", 0.9416666666666667),
    ("ab", "cd", 0.0),
    // Boost-threshold edge region: jaro just under / over 0.7, and
    // jaro > 0.7 reached with and without a common prefix.
    ("e", "hegfahfcbha", 0.6969696969696969),
    ("gdffbf", "f", 0.7222222222222223),
    ("bhe dd ", "b", 0.7428571428571429),
    (" cefaeaa", " ", 0.7375),
    ("c ad fc ", " ", 0.7083333333333334),
    ("edeahcceh", "e", 0.7333333333333334),
    // Adversarial random pairs over the fixture alphabet.
    ("cgab b", "a dabg", 0.5555555555555555),
    ("bdb gab", "agad", 0.46428571428571425),
    (" ", "egc", 0.0),
    ("be cbdfb ", "badh gfhhfed", 0.5092592592592592),
    ("chgab ", "fffhhbbehb", 0.5111111111111111),
    ("ecdg", "hbchg e", 0.5952380952380952),
    ("ceeacg ffc", " ah ggggbhga", 0.4055555555555556),
    ("fhbbhhhheb", "bfe", 0.45555555555555555),
    ("ffbdbdhdfdha", "fbbgdhcg", 0.6138888888888889),
    ("fbghgbcccac", "hchfc  caa", 0.5848484848484848),
    ("c c  ahca", "cch", 0.6296296296296297),
    ("hdb", "hcdcg g", 0.6507936507936508),
    ("abebd", "eb", 0.5666666666666667),
    ("facabeg", "abg", 0.4920634920634921),
    ("f fdae", "fcaf", 0.6388888888888888),
    ("db cg", "hceca ", 0.45555555555555555),
    ("g c  adbaac", "fbgh aa dhe", 0.6414141414141414),
    // Non-ASCII: DuckDB compares per UTF-8 BYTE (not code point) —
    // these pins fail under UTF-16 charAt OR code-point iteration
    // (e.g. héllo/hello is 0.88 code-point-wise) and pass byte-wise.
    ("héllo", "hello", 0.8400000000000001),
    ("mañana", "manana", 0.8793650793650793),
    ("日本語", "語本日", 0.5462962962962963),
    ("日本語テスト", "日本語テスト", 1.0),
    ("ünïcödé", "unicode", 0.5670995670995671),
    ("𝔘nicode", "Unicode", 0.8190476190476191))

  test("JaroWinkler matches DuckDB jaro_winkler_similarity bit-for-bit") {
    for ((a, b, want) <- cases) {
      val got = graft.functions.JaroWinkler.sim(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(java.lang.Double.compare(got, want) == 0,
        s"jw('$a','$b') = $got, DuckDB says $want")
      // Symmetry — JW is symmetric by definition; the window/matching
      // loop must not silently depend on argument order.
      val rev = graft.functions.JaroWinkler.sim(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(java.lang.Double.compare(rev, want) == 0,
        s"jw('$b','$a') = $rev asymmetric vs $want")
    }
  }

  test("codegen and interpreted paths agree; SQL registration works") {
    import spark.implicits._
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val viaExpr = df.select(JaroWinkler(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaExpr == cases.map(_._3),
      "Column-API path diverges from pinned values")
    df.createOrReplaceTempView("jw_pairs")
    graft.functions.JaroWinkler.register(spark)
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) FROM jw_pairs")
      .collect().map(_.getDouble(0)).toSeq
    assert(viaSql == cases.map(_._3), "SQL path diverges from pinned values")
  }
}
