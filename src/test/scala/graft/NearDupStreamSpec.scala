package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.SimilarityJoin
import graft.streaming.{Doc, GraftStreams}

/** Streaming banded-LSH near-dup vs its batch twin
  * (SimilarityJoin.minhashCandidates): same candidate pairs, same
  * estimated Jaccard, exactly-once emission across bands and triggers.
  */
class NearDupStreamSpec extends SparkSpec {

  private lazy val fixtureDocs: Seq[Doc] = {
    val base = 1700000000000L
    Tables.t(spark, sf, "documents").filter(col("doc_id") < 1000)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
      .collect().toSeq.map { r =>
        val id = r.getLong(0)
        // Distinct per-doc event times (1 s apart) inside one watermark
        // horizon, so no pair is separated by eviction.
        Doc(id, base + id * 1000L, r.getSeq[String](1))
      }
  }

  private def batchCandidates = {
    val docs = Tables.t(spark, sf, "documents").filter(col("doc_id") < 1000)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    SimilarityJoin.minhashCandidates(docs, 32, 16, withEstimate = true)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
  }

  private def runStream(name: String, chunks: Seq[Seq[Doc]]): Seq[Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val query = GraftStreams.nearDupCandidates(mem.toDS(), 32, 16, "1 day")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    chunks.foreach { c => mem.addData(c); query.processAllAvailable() }
    query.stop()
    spark.table(name).collect().toSeq
  }

  test("single-trigger stream emits exactly the batch candidate set, each pair once") {
    val rows = runStream("neardup1", Seq(fixtureDocs))
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.distinct.size == got.size,
      s"pairs emitted more than once: ${got.size - got.distinct.size} dups")
    assert(got.sorted == batchCandidates,
      s"stream ${got.size} pairs vs batch ${batchCandidates.size}")
  }

  test("multi-trigger replay (5 chronological chunks) matches batch too") {
    val chunks = fixtureDocs.sortBy(_.ts_ms).grouped(
      math.max(1, fixtureDocs.size / 5)).toSeq
    val rows = runStream("neardup5", chunks)
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.distinct.size == got.size,
      s"pairs emitted more than once across triggers")
    assert(got.sorted == batchCandidates)
  }

  test("re-delivered docs (at-least-once source) emit no duplicate pairs") {
    val half = fixtureDocs.take(fixtureDocs.size / 2)
    val rows = runStream("neardupredeliver",
      Seq(half, half, fixtureDocs)) // second chunk re-delivers live ids
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.distinct.size == got.size, "re-delivery produced duplicate pairs")
    assert(got.sorted == batchCandidates)
  }

  test("docs beyond the watermark horizon stop pairing and state is evicted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val toks = Seq("alpha", "beta", "gamma", "delta")
    val t0 = 1700000000000L
    val hour = 3600 * 1000L
    val query = GraftStreams.nearDupCandidates(mem.toDS(), 32, 16, "1 hour")
      .writeStream.format("memory").queryName("neardupwm")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Doc(1L, t0, toks)); query.processAllAvailable()
    // Same tokens 10 min later: inside the horizon, must pair.
    mem.addData(Doc(2L, t0 + 10 * 60 * 1000L, toks)); query.processAllAvailable()
    // Push the watermark 5 h ahead (unrelated doc), evicting 1 and 2.
    mem.addData(Doc(3L, t0 + 5 * hour, Seq("zeta", "eta"))); query.processAllAvailable()
    // Same tokens again, but 1 and 2 are beyond the horizon: no new pair.
    mem.addData(Doc(4L, t0 + 5 * hour + 1000L, toks)); query.processAllAvailable()
    query.stop()
    val pairs = spark.table("neardupwm")
      .select("doc_i", "doc_j").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)), s"expected only (1,2), got $pairs")
  }

  test("bandKey matches Spark's hash(slice(sig, ...)) bit-for-bit") {
    import spark.implicits._
    val sigs = Seq(Seq(3, -7, 12345, 0, 99, -1, 8, 2),
      Seq(Int.MinValue, Int.MaxValue, 42, -42, 7, 7, 7, 7))
    val df = sigs.toDF("sig")
    for (b <- 0 until 4) {
      val sparkSide = df.select(expr(s"hash(slice(sig, ${b * 2 + 1}, 2))"))
        .collect().map(_.getInt(0)).toSeq
      val scalaSide = sigs.map(s => SimilarityJoin.bandKey(s, b, 2))
      assert(sparkSide == scalaSide, s"band $b: $sparkSide vs $scalaSide")
    }
  }
}
