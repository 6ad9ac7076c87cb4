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

  test("SimHashSig bit-matches the explode + 64-vote aggregation form") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val agg = {
      val voteCols = (0 until 64).map(b =>
        sum(when(expr(s"(h >> $b) & 1") === 1, 1L).otherwise(-1L)).as(s"b$b"))
      docs.select(col("doc_id"), explode(col("toks")).as("tok"))
        .withColumn("h", expr("xxhash64(tok)"))
        .groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map(b => expr(s"if(b$b > 0, ${1L << b}L, 0L)"))
            .reduce(_ + _).as("sim"))
    }.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tight = PipelineQueries.simhashSigs(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tight == agg, s"${tight.size} vs ${agg.size} sigs; " +
      s"diff=${(agg.toSet -- tight.toSet).take(3)}")
  }

  test("HyperplaneSig bit-matches the interpreted HOF form") {
    val normed = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(ArrayDot(col("v"), col("v"))))
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("u"))
    val hof = normed.withColumn("bits", expr(
      """transform(sequence(0, 63), k ->
        |  aggregate(sequence(0, size(u) - 1), cast(0.0 as double),
        |    (acc, d) -> acc + u[d] * if(pmod(hash(k, d), 2) = 0, 1.0D, -1.0D))
        |  >= 0.0D)""".stripMargin))
      .select(col("vec_id"), expr(
        "aggregate(sequence(0, 63), 0L, (acc, k) -> acc + if(bits[k], shiftleft(1L, k), 0L))")
        .as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tight = normed
      .select(col("vec_id"), graft.functions.HyperplaneSig(col("u")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tight == hof, s"diff=${(hof.toSet -- tight.toSet).take(3)}")
  }

  test("sketch signatures keep parity with reference forms on null elements") {
    import org.apache.spark.sql.functions.{expr => e}
    // SimHashSig: null token hashes to the seed, like xxhash64(NULL).
    val simNull = spark.range(1)
      .select(graft.functions.SimHashSig(e("array('a', cast(null as string))")).as("s"),
        graft.functions.SimHashSig(e("array('a')")).as("ref"))
      .head()
    val aggForm = {
      val voteCols = (0 until 64).map(b =>
        sum(when(e(s"(h >> $b) & 1") === 1, 1L).otherwise(-1L)).as(s"b$b"))
      spark.range(1)
        .select(explode(e("array('a', cast(null as string))")).as("tok"))
        .withColumn("h", e("xxhash64(tok)"))
        .agg(voteCols.head, voteCols.tail: _*)
        .select((0 until 64).map(b => e(s"if(b$b > 0, ${1L << b}L, 0L)"))
          .reduce(_ + _).as("sim"))
        .head().getLong(0)
    }
    assert(simNull.getLong(0) == aggForm,
      s"SimHashSig null parity: ${simNull.getLong(0)} vs agg $aggForm")
    // HyperplaneSig: a null element zeroes the signature, like the HOF
    // form's null propagation through aggregate().
    val hpNull = spark.range(1)
      .select(graft.functions.HyperplaneSig(
        e("array(1.0D, cast(null as double), -2.0D)")).as("s"))
      .head().getLong(0)
    assert(hpNull == 0L, s"HyperplaneSig null-bearing vector: $hpNull")
  }

  test("SortedIntersectCount == set intersection on sorted distinct arrays") {
    import org.scalacheck.{Gen, Prop}
    def arrCol(xs: Seq[String]) =
      if (xs.isEmpty) array().cast("array<string>")
      else array(xs.map(lit): _*)
    val genSet = Gen.containerOf[Set, String](
      Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h", "", "zz"))
    val prop = Prop.forAll(genSet, genSet) { (a, b) =>
      val got = spark.range(1).select(
        graft.functions.SortedIntersectCount(
          arrCol(a.toSeq.sorted), arrCol(b.toSeq.sorted)).as("c"))
        .head().getInt(0)
      got == (a & b).size
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("pivot-blocked embedding dedup == all-pairs reference") {
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

  test("incremental index dedup == full batch recompute on the union") {
    // The §2.207 contract: stored-base-pairs ∪ (delta signed alone,
    // joined against the persisted band index, exact-verified) must be
    // ROW-IDENTICAL to SimilarityJoin.minhash on the full corpus — the
    // property that lets a 100 TB pipeline pay O(|delta|) per crawl.
    // Multiset compare (sorted seqs), so a duplicated stored pair or a
    // double-counted delta candidate can't hide behind set semantics.
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_i", "doc_j", "jac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    val incremental = rows(
      SparkEntry.queries("dedup_incremental_index")(spark, sf))
    val docs = Tables.t(spark, sf, "documents").filter(col("doc_id") < 1000)
      .select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks"))
    val batch = rows(graft.operators.SimilarityJoin.minhash(
      docs, "doc_id", "toks", threshold = 0.8, numHashes = 32, bands = 16))
    assert(incremental == batch,
      s"incremental=${incremental.size} batch=${batch.size} rows")
    // Replay determinism: the second run takes the already-committed
    // branch (no new index version) and must read back identically.
    val again = rows(
      SparkEntry.queries("dedup_incremental_index")(spark, sf))
    assert(again == incremental, "incremental dedup not replay-stable")
  }

  test("incremental cluster maintenance == full CC recompute on the union") {
    // The §2.212 contract: CC over stored-label STAR edges + delta
    // pairs must label every doc exactly as a full recompute over the
    // union's complete pair set — star edges are connectivity-
    // equivalent to the base pair set by union-find invariant.
    def labels(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val incremental = labels(
      SparkEntry.queries("dedup_incremental_cluster")(spark, sf))
    val docs = Tables.t(spark, sf, "documents").filter(col("doc_id") < 1000)
      .select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks"))
    val full = labels(graft.operators.ConnectedComponents.canonLabels(
      docs.select(col("doc_id")),
      graft.operators.SimilarityJoin.minhash(docs, "doc_id", "toks",
        threshold = 0.8, numHashes = 32, bands = 16)
        .select(col("doc_i"), col("doc_j"))))
    assert(incremental == full,
      s"incremental=${incremental.size} full=${full.size} label rows")
  }
}
