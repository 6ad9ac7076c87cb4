package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityJoin

/** SimilarityJoin API contracts not covered by the oracle gate or the
  * dedup parity suites: empty/null-token docs must be excluded (they
  * share a sentinel signature — without the filter they'd all collide
  * into one hot bucket as fake est_jac=1.0 pairs, and verification would
  * hit an ANSI 0/0).
  */
class SimilarityJoinSpec extends SparkSpec {

  private def docsDf = {
    import spark.implicits._
    Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "d")),
      (3L, Seq.empty[String]),
      (4L, Seq.empty[String]),
      (5L, null.asInstanceOf[Seq[String]])
    ).toDF("doc_id", "toks")
  }

  test("minhash: empty/null-token docs never pair, identical docs do (no ANSI 0/0)") {
    val got = SimilarityJoin.minhash(docsDf, "doc_id", "toks", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 1.0)), got.toString)
  }

  test("minhashCandidates: empty/null-token docs generate no candidates") {
    val got = SimilarityJoin.minhashCandidates(
        docsDf.select(col("doc_id"), col("toks")), 32, 16, withEstimate = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 1.0)), got.toString)
  }

  test("streaming nearDupCandidates drops empty-token docs too") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.Doc]
    val t0 = 1700000000000L
    val query = graft.streaming.GraftStreams.nearDupCandidates(mem.toDS())
      .writeStream.format("memory").queryName("neardupempty")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    mem.addData(
      graft.streaming.Doc(1L, t0, Seq("a", "b", "c", "d")),
      graft.streaming.Doc(2L, t0 + 1000, Seq("a", "b", "c", "d")),
      graft.streaming.Doc(3L, t0 + 2000, Seq.empty),
      graft.streaming.Doc(4L, t0 + 3000, Seq.empty))
    query.processAllAvailable()
    query.stop()
    val got = spark.table("neardupempty")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 1.0)), got.toString)
  }

  test("exact and minhash agree on a corpus with empty docs present") {
    val docs = Tables.t(spark, sf, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      .union(docsDf.filter(col("doc_id") >= 3).select(
        (col("doc_id") + 100000).as("doc_id"), col("toks")))
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val ex = SimilarityJoin.exact(docs, "doc_id", "toks", 0.8)
      .collect().toSeq.sortBy(key)
    val mh = SimilarityJoin.minhash(docs, "doc_id", "toks", 0.8)
      .collect().toSeq.sortBy(key)
    assert(ex.nonEmpty, "fixture slice produced no exact pairs — test is vacuous")
    assert(ex == mh)
  }

  private def vecsDf = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(2.0, 0.0, 0.0, 0.0)),   // same direction as 1 → cos 1.0
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),   // orthogonal
      (4L, Seq(0.0, 0.0, 0.0, 0.0)),   // zero norm: no direction
      (5L, null.asInstanceOf[Seq[Double]]),
      (6L, Seq.empty[Double])
    ).toDF("vec_id", "embedding")
  }

  test("embeddingCosine: degenerate vectors excluded, scaled duplicates pair at cos 1.0") {
    val got = SimilarityJoin
      .embeddingCosine(vecsDf, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 1.0)), got.toString)
  }

  test("embeddingCosine: numPivots larger than the corpus still exact") {
    // More pivots than vectors → every vector is its own pivot (α = 0);
    // the diagonal-admissible cluster pairs alone must reproduce the
    // brute-force answer.
    val got = SimilarityJoin
      .embeddingCosine(vecsDf, "vec_id", "embedding", threshold = -1.0,
        numPivots = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((1L, 2L), (1L, 3L), (2L, 3L)), got.toString)
  }

  test("embeddingCosine: no valid vectors → empty result, correct schema") {
    val empty = SimilarityJoin.embeddingCosine(
      vecsDf.filter(col("vec_id") >= 4), "vec_id", "embedding", 0.5)
    assert(empty.columns.toSeq == Seq("vec_i", "vec_j", "cos"))
    assert(empty.count() == 0)
  }

  test("embeddingCosine: single vector → no pairs") {
    assert(SimilarityJoin.embeddingCosine(
      vecsDf.filter(col("vec_id") === 1), "vec_id", "embedding", 0.0)
      .count() == 0)
  }
}
