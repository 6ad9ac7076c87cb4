package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Det.r4d

/** First-class similarity-join surface (SURVEY §4.2): one public entry
  * point per candidate-generation strategy, all sharing the exact
  * two-pointer verification, all emitting `(doc_i, doc_j, jac)` with
  * `doc_i < doc_j` and `jac` ≥ the threshold (4-dp deterministic
  * rounding, like every engine double output).
  *
  * Design note — why this is an API over composed operators and NOT a
  * custom `SparkStrategy` (the §4.2 ladder's option (a) over (c)): every
  * stage of the banded pipeline is an equi-shuffle Catalyst already
  * plans well — band explode → equi-join on (band, hash) → pair
  * `distinct` → keyed re-join of token arrays — and the narrow-triple
  * shape (ids + band keys through the shuffle, arrays attached only to
  * surviving candidates) is exactly what a hand-written physical
  * operator would have to reproduce. A custom exec would re-implement
  * hash-join/AQE-skew machinery for zero shuffle savings: carrying token
  * arrays INTO the band shuffle (the only structural alternative) was
  * measured ~50% slower at fixture scale and duplicates every array
  * `bands`× at 100 TB. The declarative form keeps AQE's runtime
  * re-planning (skewed band buckets, broadcast-vs-shuffle re-join)
  * for free.
  */
object SimilarityJoin {

  /** EXACT all-pairs Jaccard ≥ `threshold` via prefix filtering
    * (AllPairs/PPJoin) — see [[Jaccard.pairs]]. `docs` needs an id
    * column and an array-of-tokens column (tokens distinct per doc). */
  def exact(docs: DataFrame, idCol: String, tokensCol: String,
      threshold: Double): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(col(tokensCol)).as("tok"))
    Jaccard.pairs(toks, threshold)
  }

  /** Drop docs that cannot participate in similarity: null or empty
    * token sets. Without this, every empty doc gets the same sentinel
    * MinHash signature — they'd all collide into ONE hot bucket, pair
    * quadratically with est_jac = 1.0 despite sharing zero tokens, and
    * (under ANSI mode) crash exact verification with a 0/0 Jaccard. The
    * exact path drops them structurally (no token rows → no candidates);
    * this keeps the LSH and streaming paths consistent with it. */
  private[graft] def nonEmptyDocs(in: DataFrame): DataFrame =
    in.filter(col("toks").isNotNull && size(col("toks")) > 0)

  /** The banded LSH key derivation, shared by the batch candidate join
    * and the streaming transform: element `b` is the murmur3 hash of the
    * signature's b-th r-slice. [[bandKey]] is the bit-identical Scala
    * twin the streaming state machine uses — change BOTH together
    * (NearDupStreamSpec pins their agreement). */
  private[graft] def bandKeysExpr(sigCol: String, bands: Int, r: Int) =
    expr(s"transform(sequence(0, ${bands - 1}), " +
      s"b -> hash(slice($sigCol, b * $r + 1, $r)))")

  /** Scala twin of [[bandKeysExpr]]'s per-band hash: murmur3 folded over
    * the slice's elements from seed 42 (Spark's array-hash contract). */
  private[graft] def bandKey(sig: Seq[Int], b: Int, r: Int): Int = {
    var h = 42
    var i = b * r
    val end = i + r
    while (i < end) {
      h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(sig(i), h)
      i += 1
    }
    h
  }

  /** MinHash signatures + banded LSH candidates + exact verification.
    * Probabilistic candidate RECALL (≈ 1 − (1 − t^r)^bands where
    * r = numHashes/bands; ~0.9999999 at t = 0.8 with 32 hashes × 16
    * bands), exact PRECISION (candidates re-checked against the real
    * token sets). Signatures are computed scan-side by the tight-loop
    * `MinHashSig` expression — no explode+agg shuffle — and only
    * (doc_id, band, band_hash) triples travel through the candidate
    * shuffle; token arrays re-join KEYED afterwards, so the plan
    * degrades to a shuffled join (not a driver-OOM broadcast) when the
    * doc set outgrows the broadcast threshold at 100 TB. */
  def minhash(docs: DataFrame, idCol: String, tokensCol: String,
      threshold: Double, numHashes: Int = 32, bands: Int = 16): DataFrame = {
    require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val in = nonEmptyDocs(
      docs.select(col(idCol).as("doc_id"), col(tokensCol).as("toks")))
    val cand = minhashCandidates(in, numHashes, bands)
    verify(cand, in.select(col("doc_id"),
      array_sort(col("toks")).as("toks")), threshold)
  }

  /** Candidate pairs only — (i, j) with i < j for pairs sharing ≥ 1 LSH
    * band; with `withEstimate` also `est_jac` = fraction of agreeing
    * signature components. The streaming near-dup transform emits
    * exactly the estimated form (it cannot re-join full token arrays
    * against an unbounded past), so the batch form is public for parity
    * testing and offline candidate audits. Input: (doc_id, toks).
    *
    * Only narrow (doc_id, band, band_hash) triples travel through the
    * band shuffle and the pair `distinct`; signatures re-join KEYED
    * afterwards when the estimate is requested (arrays through a
    * distinct were measured ~50% slower at bench scale). */
  def minhashCandidates(in: DataFrame, numHashes: Int = 32,
      bands: Int = 16, withEstimate: Boolean = false): DataFrame = {
    require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val r = numHashes / bands
    val sig = nonEmptyDocs(in).select(col("doc_id"),
      graft.functions.MinHashSig(col("toks"), numHashes).as("sig"))
    val bandCols = bandTriples(sig, bands, r)
    val cand = bandCols.select(col("band"), col("bh"), col("doc_id").as("i"))
      .join(bandCols.select(col("band"), col("bh"), col("doc_id").as("j")),
        Seq("band", "bh"))
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
    if (!withEstimate) cand
    else cand
      .join(sig.select(col("doc_id").as("i"), col("sig").as("sig_i")), Seq("i"))
      .join(sig.select(col("doc_id").as("j"), col("sig").as("sig_j")), Seq("j"))
      .withColumn("est_jac", r4d(
        expr("size(filter(zip_with(sig_i, sig_j, (a, b) -> a = b), x -> x))")
          .cast("double") / numHashes))
      .select("i", "j", "est_jac")
  }

  /** SimHash near-dup: 64-bit scan-side signatures, Manku-style
    * 12-block/C(12,2)=66-key banding (recall 1.0 by pigeonhole for
    * `maxHamming` ≤ 10 — NOT probabilistic), exact bit_count verify.
    * Emits (doc_i, doc_j, hamming). Token-less docs are excluded, like
    * every similarity surface here. */
  def simhash(docs: DataFrame, idCol: String, tokensCol: String,
      maxHamming: Int = 10): DataFrame =
    PipelineQueries.simhashBandedPairs(
      PipelineQueries.simhashSigs(docs.select(col(idCol).as("doc_id"),
        col(tokensCol).as("toks"))), maxHamming)

  /** (vec_id, u) with u = the L2-normalized vector, so every later
    * similarity is a single dot. Null/empty/zero-norm vectors are
    * excluded (a zero vector has no direction; normalizing it would
    * poison downstream math with NaN). */
  private[graft] def normalized(vecs: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    vecs
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
      .withColumn("nrm", sqrt(graft.functions.ArrayDot(col("v"), col("v"))))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("u"))

  /** Embedding near-dup, EXACT: every pair with cosine ≥ `threshold`,
    * recall 1.0 by construction (not LSH). Emits (vec_i, vec_j, cos).
    *
    * Candidate generation is pivot blocking with a spherical
    * triangle-inequality bound (the metric trick behind IVF / pivot-based
    * metric joins, cf. the `sim_ann_ivf` machinery): sample `numPivots`
    * vectors deterministically (md5 hash order — replay-stable), assign
    * each vector to its nearest pivot (argmax dot over codegen'd
    * ArrayDots against literal pivots — map-side, no shuffle), record its
    * pivot angle α. For clusters a, b with pivot angle θ_ab and member
    * angles bounded by maxα: any cross pair satisfies
    * θ(x,y) ≥ θ_ab − α_x − α_y, so a cluster pair — and, tighter, an
    * individual x against cluster b — can be SKIPPED outright when
    * θ_ab − α_x − maxα_b > arccos(threshold) (+1e-6 slack so fp rounding
    * only ever ADDS candidates). Surviving cluster pairs equi-join on the
    * cluster-pair key (each unordered vector pair generated exactly once
    * — no distinct) and are verified with the exact dot.
    *
    * Scale shape: pivot sample is O(numPivots) driver rows, cluster
    * stats are one O(n)→K-row pass over a persisted assignment that the
    * candidate join then reuses (the same bounded-stats pattern as IVF
    * training; both bounded jobs run at query-CONSTRUCTION time, like
    * GlobalRank's count pass), and the candidate volume is Σ|a|·|b| over ADMISSIBLE
    * cluster pairs only — sub-quadratic whenever the corpus clusters at
    * the threshold's angular scale (SelectivitySpec pins this on a
    * clustered random corpus). On an adversarially isotropic corpus no
    * exact method can prune (all C(n,2) angles concentrate at 90°, so
    * every bound degenerates) and this degrades to verified all-pairs —
    * the honest worst case; route genuinely isotropic data through
    * [[embeddingCosineLsh]] and accept probabilistic recall, or tighten
    * the threshold. Skewed cluster sizes are AQE's skew-join case (the
    * candidate join is a plain equi-shuffle). `numPivots` trades
    * admissibility-table size (K², broadcast) against cluster radius:
    * more pivots → smaller maxα → sharper pruning; scale it toward the
    * corpus' expected cluster count (K ≈ √n is the classic IVF default)
    * — 16 is sized to the fixtures. */
  def embeddingCosine(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPivots: Int = 16): DataFrame = {
    val (cand, keyed) =
      pivotBlocked(normalized(vecs, idCol, vecCol), threshold, numPivots)
    cand
      .join(keyed.select(col("vec_id").as("i"), col("u").as("ui")), Seq("i"))
      .join(keyed.select(col("vec_id").as("j"), col("u").as("uj")), Seq("j"))
      .withColumn("cos", graft.functions.ArrayDot(col("ui"), col("uj")))
      .filter(col("cos") >= threshold)
      .select(least(col("i"), col("j")).as("vec_i"),
        greatest(col("i"), col("j")).as("vec_j"), r4d(col("cos")).as("cos"))
  }

  /** Candidate half of [[embeddingCosine]] — slim (i, j) pairs that
    * survive the triangle-inequality pruning, each unordered pair exactly
    * once (i < j within a cluster, cluster order across). Exposed so
    * SelectivitySpec can assert the candidate count is sub-quadratic on a
    * clusterable corpus independently of the verify filter. */
  private[graft] def pivotBlockedCandidates(normed: DataFrame,
      threshold: Double, numPivots: Int): DataFrame =
    pivotBlocked(normed, threshold, numPivots)._1

  /** [[pivotBlockedCandidates]] plus the (vec_id, u) frame the verify
    * re-join should use — it reads the SAME persisted assignment that fed
    * candidate generation, so the normalization never recomputes. Only
    * narrow (cluster, id, alpha) rows travel through the candidate
    * exchange — the 64-double vectors re-join KEYED on i and j afterwards,
    * the exact shape [[minhashCandidates]] uses (arrays through the band
    * shuffle were measured ~50% slower there; here the wide form also
    * duplicated every left vector once per admissible cluster pair). */
  private def pivotBlocked(normed: DataFrame,
      threshold: Double, numPivots: Int): (DataFrame, DataFrame) = {
    require(numPivots > 0, s"numPivots must be positive, got $numPivots")
    val spark = normed.sparkSession
    // Deterministic O(numPivots) pivot sample: hash order, not rand().
    val pivots: Array[Seq[Double]] = normed
      .orderBy(md5(concat(lit("pivot"), col("vec_id").cast("string"))),
        col("vec_id"))
      .limit(numPivots)
      .collect().map(_.getSeq[Double](1))
    if (pivots.isEmpty)
      return (normed.select(col("vec_id").as("i"), col("vec_id").as("j"))
        .limit(0), normed)
    val acosTau =
      math.acos(math.max(-1.0, math.min(1.0, threshold))) + 1e-6
    // Nearest-pivot assignment: one codegen'd dot per pivot, argmax via
    // struct ordering (tie → lowest pivot id). Map-side only.
    val best = array_max(array(pivots.toSeq.zipWithIndex.map { case (p, k) =>
      struct(graft.functions.ArrayDot(col("u"), typedLit(p)).as("c"),
        lit(-k).as("np"))
    }: _*))
    val assignedPlan = normed.withColumn("b", best)
      .select(col("vec_id"), col("u"), (-col("b.np")).as("g"),
        acos(least(lit(1.0), greatest(lit(-1.0), col("b.c")))).as("alpha"))
    // ONE materialized assignment pass serves the stats collect AND both
    // sides of the candidate join (otherwise the O(n·K·dim) dot loop
    // re-runs three times). RDD persist, not DataFrame cache, for the
    // same reason as GlobalRank: the ContextCleaner GC-unpersists it once
    // the returned frame's lineage is unreachable — no storage pinned
    // across queries. The stats collect below materializes the cache.
    val assignedRdd = assignedPlan.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val assigned = spark.createDataFrame(assignedRdd, assignedPlan.schema)
    // Per-cluster max pivot angle: K bounded rows to the driver (the
    // only collect — same shape as an IVF centroid table).
    val stats = assigned.groupBy("g").agg(max(col("alpha")).as("ma"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    def ddot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val ks = stats.keys.toSeq.sorted
    val admRows = for {
      ai <- ks.indices
      a = ks(ai)
      b <- ks.drop(ai) // ordered pairs a <= b, diagonal included
      th = if (a == b) 0.0
        else math.acos(math.max(-1.0, math.min(1.0, ddot(pivots(a), pivots(b)))))
      if th - stats(a) - stats(b) <= acosTau // cluster-level prune
    } yield (a, b, th, stats(a), stats(b))
    val adm = spark.createDataFrame(admRows)
      .toDF("ga", "gb", "th", "ma", "mb")
    val left = assigned.select(col("g").as("ga"), col("vec_id").as("i"),
      col("alpha").as("ai"))
    val right = assigned.select(col("g").as("gb"), col("vec_id").as("j"),
      col("alpha").as("aj"))
    val cand = left.join(broadcast(adm), Seq("ga"))
      .filter(col("th") - col("ai") - col("mb") <= acosTau) // per-point prune
      .join(right, Seq("gb"))
      .filter(col("th") - col("aj") - col("ma") <= acosTau)
      .filter(col("ga") < col("gb") || col("i") < col("j"))
      .select(col("i"), col("j"))
    (cand, assigned.select(col("vec_id"), col("u")))
  }

  /** Embedding near-dup via banded random-hyperplane LSH (Charikar
    * STOC'02): 64 sign bits against deterministic murmur3-derived ±1
    * hyperplanes (scan-side HyperplaneSig), banded `bands` × (64/bands)
    * bits, exact normalized-dot verify. PROBABILISTIC recall:
    * 1 − (1 − p^(64/bands))^bands with p = 1 − θ/π — useful only for
    * TIGHT thresholds (p near 1), e.g. ~0.93 at cos 0.9 with the default
    * 8×8 banding. For loose thresholds hyperplane banding cannot prune
    * (at cos 0.35, p ≈ 0.61 barely beats a random pair's 0.5) — use the
    * exact [[embeddingCosine]] there. Kept as the isotropic-corpus
    * escape hatch: candidate volume is data-independent
    * (≈ n²·(1−(1−2^−(64/bands))^bands) random-collision bound, 1/256 per
    * band at 8×8 — pinned in SelectivitySpec on an isotropic corpus),
    * where the exact path's bound is distribution-dependent.
    *
    * `multiProbe` (Lv et al., VLDB'07, adapted to sign bits): one side
    * of the candidate join additionally probes every hamming-1 neighbor
    * of each band key, so a pair collides when some band differs in ≤ 1
    * bit instead of 0. Per-band detect prob rises from p^w to
    * p^w + w·p^(w−1)(1−p) — at cos 0.7 with 8×8 that lifts overall
    * recall 0.56 → 0.97 — while the random-collision bound grows only
    * (w+1)× per band (1 − (1 − (w+1)/2^w)^bands ≈ 25% of pairs at 8×8:
    * still sub-all-pairs, pinned in SelectivitySpec). This narrows the
    * documented isotropic+mid-threshold gap (cos ≈ 0.7) where exact
    * pivot pruning degenerates and single-probe banding misses ~half
    * the true pairs. The probe explosion is narrow (vec_id, band, key)
    * rows on ONE join side only — signature arrays never widen. */
  def embeddingCosineLsh(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 8, multiProbe: Boolean = false): DataFrame = {
    val normed = normalized(vecs, idCol, vecCol)
    lshBandedCandidates(normed, bands, multiProbe)
      .join(normed.select(col("vec_id").as("i"), col("u").as("ui")), Seq("i"))
      .join(normed.select(col("vec_id").as("j"), col("u").as("uj")), Seq("j"))
      .withColumn("cos", graft.functions.ArrayDot(col("ui"), col("uj")))
      .filter(col("cos") >= threshold)
      .select(col("i").as("vec_i"), col("j").as("vec_j"), r4d(col("cos")).as("cos"))
  }

  /** Candidate half of [[embeddingCosineLsh]]: distinct (i, j) pairs
    * whose hyperplane signatures agree on ≥ 1 band (with `multiProbe`,
    * differ in ≤ 1 bit of ≥ 1 band — hamming is symmetric, so probing
    * from one side of the join captures the symmetric relation without
    * doubling the explosion). Exposed so SelectivitySpec can pin the
    * data-independent random-collision bounds (2^−w resp. (w+1)/2^w per
    * band, w = 64/bands) on isotropic vectors. */
  private[graft] def lshBandedCandidates(normed: DataFrame,
      bands: Int, multiProbe: Boolean = false): DataFrame = {
    require(bands >= 2 && bands <= 32 && 64 % bands == 0,
      s"bands must divide 64 and lie in [2, 32], got $bands")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val sig = normed.withColumn("sig",
      graft.functions.HyperplaneSig(col("u")))
    val keyed = sig.select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), " +
          s"b -> shiftright(sig, $width * b) & ${mask}L)")))
      .select(col("vec_id"), col("pos").as("band"), col("col").as("bv"))
    // Probe side: per band, the exact key (t = 0) plus the `width`
    // one-bit flips (t = 1..width) — (band, key) structs so the band
    // index survives the flatten.
    val probed =
      if (!multiProbe) keyed
      else sig.select(col("vec_id"), explode(expr(
          s"""flatten(transform(sequence(0, ${bands - 1}), b ->
             |  transform(sequence(0, $width), t -> named_struct(
             |    'band', b,
             |    'bv', (shiftright(sig, $width * b) & ${mask}L)
             |          ^ if(t = 0, 0L, shiftleft(1L, t - 1))))))""".stripMargin))
          .as("bk"))
        .select(col("vec_id"), col("bk.band").as("band"), col("bk.bv").as("bv"))
    probed.select(col("band"), col("bv"), col("vec_id").as("i"))
      .join(keyed.select(col("band"), col("bv"), col("vec_id").as("j")),
        Seq("band", "bv"))
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
  }

  /** THE exact verification tail, shared by every candidate generator
    * (banded LSH here, prefix filtering in [[Jaccard.pairs]]): keyed
    * join of candidate (i, j) pairs to pre-SORTED token arrays, then a
    * two-pointer merge intersection (SortedIntersectCount — its contract
    * is array_sort's nulls-LAST ordering, NOT sort_array's) and the
    * Jaccard threshold filter. `sorted` must be (doc_id, toks) with
    * non-empty array_sort'ed arrays — non-empty keeps the denominator
    * ≥ 1, so no ANSI 0/0 (callers route through [[nonEmptyDocs]] or
    * aggregate from token rows, which cannot produce empty arrays). */
  /** The PERSISTABLE LSH index face: the narrow (doc_id, band, bh)
    * triples the banded candidate join shuffles — exactly what an
    * incremental dedup pipeline stores between crawls (a VersionedTable
    * / parquet table keyed by (band, bh)), so a NEW shard is signed
    * alone and joined against the stored index instead of re-signing
    * the whole corpus. `dedup_incremental_index` is the declared key;
    * DedupScaleSpec pins incremental ≡ full-recompute parity. Input:
    * (doc_id, toks); empty-token docs are excluded like every
    * similarity surface here.
    *
    * Band key = murmur3 of the band's r-slice (array hash). Collisions
    * only ADD candidates (removed by exact verification); equal slices
    * always collide, so banding recall is unaffected by the hash. */
  def minhashBandIndex(in: DataFrame, numHashes: Int = 32,
      bands: Int = 16): DataFrame = {
    require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val r = numHashes / bands
    val sig = nonEmptyDocs(in).select(col("doc_id"),
      graft.functions.MinHashSig(col("toks"), numHashes).as("sig"))
    bandTriples(sig, bands, r)
  }

  private def bandTriples(sig: DataFrame, bands: Int, r: Int): DataFrame =
    sig.select(col("doc_id"), posexplode(bandKeysExpr("sig", bands, r)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bh"))

  private[graft] def verify(cand: DataFrame, sorted: DataFrame,
      threshold: Double): DataFrame =
    cand
      .join(sorted.select(col("doc_id").as("i"), col("toks").as("ta")), Seq("i"))
      .join(sorted.select(col("doc_id").as("j"), col("toks").as("tb")), Seq("j"))
      .withColumn("c",
        graft.functions.SortedIntersectCount(col("ta"), col("tb")))
      .withColumn("jac", col("c").cast("double")
        / (size(col("ta")) + size(col("tb")) - col("c")))
      .filter(col("jac") >= threshold)
      .select(col("i").as("doc_i"), col("j").as("doc_j"), r4d(col("jac")).as("jac"))
}
