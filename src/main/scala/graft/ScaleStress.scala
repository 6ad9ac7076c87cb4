package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 scale-stress harness (dev artifact, not a driver surface):
  * measures how the heaviest declared keys actually scale, turning the
  * scaladocs' 100 TB design claims into fitted curves (SCALE.md).
  *
  * Two instruments:
  *
  * 1. SF-series: times each key at sf0.01 and sf0.1 (the fixtures'
  *    10× step; sf0.001 is too small to clear fixed costs) and fits
  *    the per-decade exponent b in t ∝ n^b.
  * 2. A ~10× synthetic corpus ABOVE sf0.1 for the lineitem-derived
  *    graph keys: `copies` key-shifted disjoint copies of sf0.1's
  *    lineitem (order/part/supp keys offset per copy), i.e. a graph
  *    with 10× the nodes and edges and the same per-order local
  *    structure — copy-shifting is distribution-preserving exactly
  *    because every co-purchase edge lives inside one order. The
  *    text/embedding dedup keys are deliberately NOT copy-scaled:
  *    duplicating documents multiplies cross-copy (near-)duplicate
  *    pairs ~copies² (merged CC clusters, exploding candidate sets),
  *    and no small deterministic perturbation escapes a near-dup
  *    detector that is BY DESIGN robust to small perturbations — a
  *    faithful 10× text corpus needs the upstream generator, which is
  *    driver-side. Their exponents come from instrument 1.
  *
  * Usage: runMain graft.ScaleStress [outJson]
  * Env: SPARK_GRAFT_CPUS (default 4), SPARK_GRAFT_SCALE_COPIES (10).
  */
object ScaleStress {
  // The quiet-heaviest keys of BENCH_FULL.json, round 8 — plus the
  // round-10 heavies the round-10 verdict flagged as unmeasured:
  // Adamic-Adar (the 4th-most-expensive key), the two
  // embedding-ranking evals, and the global-first-occurrence-rank
  // vocab-growth shuffle shape.
  private val SfSeriesKeys = Seq(
    "graph_pagerank", "graph_bfs_distance", "graph_kcore",
    "graph_triangle_count", "graph_clustering_coeff",
    "graph_jaccard_linkpred", "graph_adamic_adar",
    "dedup_cluster_canon", "dedup_minhash_lsh", "dedup_near_jaccard",
    "sim_ann_kmeans", "text_bpe_pair_counts",
    "eval_ndcg_label", "sim_recall_eval", "text_vocab_growth",
    // Round-11 waves: the detection matcher (per-image windows + the
    // bounded score-block window), the Gi* scatter/gather over grid
    // cells, and the tile-fusion explode — the shapes whose 100 TB
    // claims are newest.
    "eval_det_ap", "eval_count_ccc", "geo_hotspot_gi",
    "multimodal_tile_remap",
    // Round-12 waves: the MMR greedy unroll (bounded per probe, but
    // the scan feeds it), the grid-NN scatter join, the Poisson
    // bootstrap's 48× explode, the centroid-silhouette broadcast
    // pass, and the three new degree-shaped graph reads.
    "sim_mmr_rerank", "geo_nn_screening", "agg_bootstrap_ci",
    "sim_silhouette_centroid", "graph_avg_neighbor_degree",
    "graph_degree_gini", "graph_rich_club",
    // Round-13: the four graph heavies that predate the
    // measure-at-birth discipline (VERDICT r12 item 3) and the §2.107
    // legalized key, plus the §2.108 wave at birth.
    "graph_closeness", "graph_modularity", "graph_label_prop",
    "graph_assortativity", "graph_ego_density",
    "graph_betweenness", "eval_map_coco", "multimodal_track_stitch",
    // Round-13 waves 2-5 at birth: the keys with a corpus-shaped
    // reduce or a multi-join tail (the bounded-output cheap ones —
    // kendall_w, rbo — are excluded like the other spine keys).
    "eval_krippendorff_alpha", "text_perplexity_kneser_ney",
    "text_ngram_novelty_decay", "text_burrows_delta",
    "geo_sinuosity", "geo_dbscan_cells", "multimodal_track_speed",
    "agg_theil_index", "agg_wilcoxon_signed_rank",
    // Round-13 waves 6-9 at birth.
    "ts_periodogram", "geo_emerging_cells", "ab_sprt_sequential",
    "stream_rate_alert", "text_odds_ratio_keywords",
    "graph_transitivity_global", "etl_stats_collect",
    "ts_changepoint_binseg", "dedup_line_level",
    "multimodal_mosaic_manifest",
    // Round-13 waves 10-11 at birth.
    "sim_rocchio_expand", "ts_cohort_halflife", "ts_hurst_exponent",
    "agg_cochran_q", "pipeline_annotation_routing",
    "agg_two_proportion_z",
    // Round-13 wave 12 at birth.
    "geo_kde_cells", "sample_ess_report", "graph_eccentricity",
    // Round-13 waves 13-14 at birth.
    "multimodal_hard_example_mining", "eval_pairwise_winrate",
    "graph_bipartite_profile", "agg_ratio_metric_ci", "agg_srm_check",
    "eval_det_recall_by_size",
    // Round-13 wave 15 at birth.
    "ts_drawdown_curve", "eval_youden_threshold",
    "text_source_outlier_score",
    // Round-13 waves 16-17 at birth.
    "agg_cumshare_curve", "sample_systematic",
    "multimodal_box_aspect_hist", "sort_pareto_skyline",
    "pipeline_quality_gate_funnel", "agg_theil_decomposition",
    // Round-13 wave 18 at birth.
    "agg_lognormal_fit", "dedup_cross_source_matrix",
    "ts_event_spacing_cv",
    // Round-13 wave 19 at birth.
    "agg_quartile_dispersion", "win_time_to_next_purchase",
    "agg_trimmed_mean",
    // Round-13 wave 20 at birth.
    "agg_hoover_index", "agg_mean_log_deviation", "ts_trend_r2",
    // Round-14 at birth: the new graph walks/reinforcement, the
    // corpus-wide rank/bigram reducers, and the centroid ranking.
    "graph_katz", "graph_hits", "graph_scc", "agg_kruskal_wallis",
    "text_bigram_overlap", "eval_topk_accuracy", "sim_dim_variance",
    "agg_logrank_test", "ts_holt_winters",
    // Round-15 at birth: the restart-walk superstep key, the
    // per-user blocked hull self-join, and the 28-step unrolled
    // Kalman pivot.
    "graph_ppr", "geo_convex_hull_area", "ts_kalman_smooth",
    // Round-15 waves 21+ at birth: the deterministic-walk corpus,
    // the (sampled) edge-embeddedness triangle profile, the c(k)
    // reduce over the same subgraph, and the type-mixing reduce.
    "graph_deepwalk_corpus", "graph_edge_embeddedness",
    "graph_clustering_by_degree", "graph_attribute_assortativity",
    "sim_loo_knn_accuracy", "text_crossdoc_ngram_share",
    // Round-15 waves 30+ at birth: the full-rank panel scan, the
    // within-part supplier pair reduce, and the remaining
    // anchor-panel keys.
    "eval_first_hit_rank_hist", "graph_supplier_projection",
    "sim_hubness_profile", "sim_intrinsic_dimension",
    "dedup_sorted_neighborhood", "dedup_similarity_histogram",
    // Round-16: the driver's r15 BENCH_FULL pushed the single-parse
    // variant extract into the bench top-10 (a 7.5× drift outlier on
    // byte-identical code — VERDICT r15); instrument it so the
    // top-10 guard holds whichever way the drift adjudicates.
    "json_variant_extract",
    // Round-16 at birth: the minhash→CC→pack composite (two corpus
    // scans + edge-sized iterative stages + the two-pass prefix sum).
    "pipeline_dedup_pack_e2e",
    // Round-16 enrollment made these heavier by design (self-check
    // halves); instrument them so a drifted round can't push an
    // unmeasured key into the bench top-10 (the r15 red-test class).
    "dedup_simhash", "sim_ann_kmeans", "multimodal_decode_stats",
    "text_boilerplate_lines",
    // Round-17 at birth: the incremental-index dedup (two corpus
    // sign passes + the index join + exact verify), the zipf salted
    // join (fact-sized md5 synth + two grouped reduces), and the PNG
    // encode/decode pass (per-doc ImageIO encode is the cost).
    "dedup_incremental_index", "join_skew_salted_spread",
    "multimodal_png_decode", "sim_ann_persisted_ivf",
    "stream_bus_decode", "dedup_incremental_cluster",
    // Round-17 lakehouse-interop wave at birth: the Delta build+replay
    // (per-partition staging scans dominate; the log is bounded
    // metadata), the DV stage + two mark passes + anti-join read, and
    // the Iceberg 8-file staging + two-level planning.
    "scan_delta_log_interop", "scan_deletion_vectors",
    "scan_iceberg_snapshot_interop",
    // Round-17 lakehouse wave 2 at birth: time travel replays two
    // as-of snapshots (two bounded reconciliations + two grouped
    // scans), the change feed scans only the diffed files (4 of 10),
    // and the MOR key stages 4 data + 4 delete files then anti-joins
    // the planned half.
    "scan_delta_time_travel_interop", "etl_delta_change_feed",
    "scan_iceberg_position_deletes",
    // Round-17 lakehouse wave 3 at birth: the incremental view
    // (bootstrap scan + two O(changed-files) delta folds) and the
    // stats-skipping key (8-band staging; the measured read plans 2).
    "etl_incremental_view_cdf", "scan_delta_stats_skipping",
    // Round-17 lakehouse wave 4 at birth: the evolved read (two
    // generation scans + projection) and the post-expiration full read
    // (8 files; expiration itself is build-time metadata).
    "scan_delta_schema_evolution_interop", "scan_iceberg_expire_snapshots",
    // Round-17 lakehouse wave 5 at birth: the per-commit change walk
    // (bounded metadata) + one scan of the single true-change file.
    "etl_delta_cdf_compaction_aware")
  // Keys whose only input is lineitem — copy-scalable (see scaladoc).
  // The embeddings/documents keys are NOT copy-scalable for the same
  // reason the dedup keys aren't (cross-copy duplicate geometry);
  // their exponents come from the SF series.
  private val TenXKeys = Seq(
    "graph_pagerank", "graph_bfs_distance", "graph_kcore",
    "graph_triangle_count", "graph_clustering_coeff",
    "graph_jaccard_linkpred", "graph_adamic_adar",
    "graph_avg_neighbor_degree", "graph_degree_gini",
    "graph_rich_club",
    "graph_closeness", "graph_modularity", "graph_label_prop",
    "graph_assortativity", "graph_ego_density", "graph_betweenness",
    "graph_transitivity_global", "graph_eccentricity",
    "graph_bipartite_profile", "graph_katz", "graph_hits",
    "graph_ppr", "graph_deepwalk_corpus", "graph_edge_embeddedness",
    "graph_clustering_by_degree")

  /** Bench-heavy instrumentation guard input (InventorySpec asserts
    * every BENCH_FULL top-cost key has a row here — the unmeasured-
    * heavy misses of rounds 10 and 12 keep recurring because nothing
    * pinned the rule). */
  private[graft] val measuredKeys: Set[String] = SfSeriesKeys.toSet

  private def timeKey(s: SparkSession, key: String, dir: String): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(s, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      GraftSession.dropLeftoverBlocks(s)
      t
    }
    math.min(once(), once())
  }

  /** `copies` disjoint key-shifted unions of sf's lineitem, written as
    * one parquet dir layout the queries can read as `$out`. Key offsets
    * use the source max+1 so copies can never collide. */
  def buildTenX(s: SparkSession, sfDir: String, out: String,
      copies: Int): Unit = {
    val li = s.read.parquet(s"$sfDir/lineitem.parquet")
    val mx = li.agg(max("l_orderkey"), max("l_partkey"), max("l_suppkey"))
      .head()
    val (mo, mp, ms) = (mx.getLong(0) + 1, mx.getLong(1) + 1,
      mx.getLong(2) + 1)
    val shifted: Seq[DataFrame] = (0 until copies).map { i =>
      li.select(
        (col("l_orderkey") + lit(i * mo)).as("l_orderkey"),
        (col("l_partkey") + lit(i * mp)).as("l_partkey"),
        (col("l_suppkey") + lit(i * ms)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }
    shifted.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$out/lineitem.parquet")
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SCALE_STRESS.json")
    // Optional key filter (local iteration: measure only new keys and
    // merge rows into the tracked JSON by hand).
    val only = args.drop(1).toSet
    val keys =
      if (only.isEmpty) SfSeriesKeys else SfSeriesKeys.filter(only)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.ensureCheckpointDir(spark)
    graft.plans.TopKPushdown.install(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()

    val sf001 = "/root/testdata/sf0.01"
    val sf01 = "/root/testdata/sf0.1"
    val tenXDir = java.nio.file.Files
      .createTempDirectory("graft_scale10").toString
    println(s"[scale] building ${copies}x lineitem corpus at $tenXDir")
    buildTenX(spark, sf01, tenXDir, copies)

    val rows = new scala.collection.mutable.ArrayBuffer[String]
    for (k <- keys) {
      val tA = timeKey(spark, k, sf001)
      val tB = timeKey(spark, k, sf01)
      val exp = math.log(tB / tA) / math.log(10.0)
      val tenX = if (TenXKeys.contains(k)) {
        val tC = timeKey(spark, k, tenXDir)
        val e2 = math.log(tC / tB) / math.log(copies.toDouble)
        f""","t_10x":$tC%.3f,"exp_10x":$e2%.3f"""
      } else ""
      rows += f"""{"key":"$k","t_sf001":$tA%.3f,"t_sf01":$tB%.3f,"exp_sf":$exp%.3f$tenX}"""
      println(s"[scale] ${rows.last}")
    }
    val json = rows.mkString("[\n", ",\n", "\n]\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(s"[scale] wrote $outJson")
    spark.stop()
  }
}
