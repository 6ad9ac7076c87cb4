package graft

import org.apache.spark.sql.functions._
import graft.functions.ArrayDot
import graft.operators.PipelineQueries

/** Parity locks for the round-2 scale-safe dedup rewrites: the banded /
  * LSH-bucketed candidate generators must produce EXACTLY the pairs the
  * all-pairs reference forms produce (banding is a recall guarantee by
  * pigeonhole for simhash; a 3e-7-miss-probability check for hyperplane
  * LSH, pinned here against the fixed fixture).
  */
class DedupScaleSpec extends SparkSpec {

  test("banded simhash pairs == all-pairs reference at every hamming bound") {
    val docs = Tables.t(spark, sf, "documents").filter(col("doc_id") < 1000)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val sigs = PipelineQueries.simhashSigs(docs).cache()
    try {
      // Independent all-pairs reference over the same signatures.
      val ref = sigs.select(col("doc_id").as("i"), col("sim").as("si"))
        .join(sigs.select(col("doc_id").as("j"), col("sim").as("sj")),
          col("i") < col("j"))
        .withColumn("hamming", expr("bit_count(si ^ sj)").cast("long"))
      for (h <- Seq(0, 5, 10)) {
        val expect = ref.filter(col("hamming") <= h)
          .select(col("i"), col("j"), col("hamming"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val got = PipelineQueries.simhashBandedPairs(sigs, h)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == expect,
          s"h=$h: banded=${got.size} allpairs=${expect.size}, " +
            s"missed=${(expect -- got).size} extra=${(got -- expect).size}")
      }
    } finally sigs.unpersist()
  }

  test("banding rejects hamming bounds beyond the pigeonhole guarantee") {
    val sigs = PipelineQueries.simhashSigs(
      Tables.t(spark, sf, "documents").limit(10)
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks")))
    intercept[IllegalArgumentException] {
      PipelineQueries.simhashBandedPairs(sigs, 11)
    }
  }

  test("LSH-bucketed embedding dedup == all-pairs reference") {
    val normed = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 1000)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(ArrayDot(col("v"), col("v"))))
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("u"))
    val expect = normed.select(col("vec_id").as("i"), col("u").as("ui"))
      .join(normed.select(col("vec_id").as("j"), col("u").as("uj")),
        col("i") < col("j"))
      .withColumn("cos", ArrayDot(col("ui"), col("uj")))
      .filter(col("cos") >= 0.35)
      .select(col("i"), col("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("dedup_embedding_cosine")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect,
      s"lsh=${got.size} allpairs=${expect.size}, " +
        s"missed=${(expect -- got).size} extra=${(got -- expect).size}")
  }
}
