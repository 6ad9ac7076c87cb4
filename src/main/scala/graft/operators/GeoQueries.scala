package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{events, epochDay, t}
import graft.Det.r4d

/** §2.81 Geospatial survey operators (SURVEY.md, round-10 amendment):
  * the aerial-survey footprint of the reference domain — sightings on
  * a lat/lon plane, gridded density maps, and per-platform track
  * lengths. No geo library: the operators are plain column arithmetic
  * (grid = integer floor-division; distance = one haversine per leg),
  * which is exactly how they distribute at 100 TB — a spatial index
  * buys nothing for full-pass density/track aggregation.
  *
  * Determinism: coordinates are synthesized from fixture integers with
  * POWER-OF-TWO denominators (x/8 and x/32 are exact binary doubles),
  * so grid cells are exact integer floors on both engines. Haversine
  * goes through libm sin/atan2 — each leg's last-ulp divergence is
  * absorbed by the 4dp round on the per-group sum (the entropy-key
  * precedent), and leg COUNT and endpoints stay exact integers.
  */
object GeoQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic sighting coordinates: lat ∈ [−90, 90) on a 1/8°
    * grid, lon ∈ [−180, 180) on a 1/32° grid — both exact binary
    * fractions of integer residues. */
  private def sightings(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(col("event_id"), col("user_id"),
      unix_millis(col("ts").cast("timestamp")).as("ms"),
      ((col("event_id") % 1440).cast("double") / 8 - 90).as("lat"),
      ((col("user_id") * 997 + col("event_id") * 31) % 11520)
        .cast("double").divide(32).minus(180).as("lon"))

  /** One haversine leg in km, shared by the track keys. Radian
    * conversion spelled (x · π) / 180 / 2 operand-for-operand with
    * the oracle — x · (π/180) differs in the last ulp. 1 − a is
    * clamped at 0: floating point can push a infinitesimally past 1.0
    * on near-antipodal legs (the fixture grid admits exact
    * antipodes), where sqrt(negative) → NaN — and a last-ulp libm
    * divergence near a = 1 could NaN on one engine only. Same
    * greatest(0, ·) spelled in the oracle. R = 6371 km. */
  private def legKm(lat: org.apache.spark.sql.Column,
      lon: org.apache.spark.sql.Column,
      plat: org.apache.spark.sql.Column,
      plon: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def halfRad(c: org.apache.spark.sql.Column) =
      c * lit(math.Pi) / 180 / 2
    def rad(c: org.apache.spark.sql.Column) = c * lit(math.Pi) / 180
    val dphi = halfRad(lat - plat)
    val dlam = halfRad(lon - plon)
    val a = sin(dphi) * sin(dphi) +
      cos(rad(plat)) * cos(rad(lat)) * sin(dlam) * sin(dlam)
    lit(2.0 * 6371.0) * atan2(sqrt(a),
      sqrt(greatest(lit(0.0), lit(1.0) - a)))
  }

  val queries: Map[String, Q] = Map(
    // GRID DENSITY MAP (§2.81) — sightings binned to a 2°×2° integer
    // grid: the survey-effort heatmap (where did we look, how often,
    // who). floor() of exact binary coordinates is engine-exact;
    // per-cell stats are one two-phase agg — map-side partials bound
    // the shuffle by |occupied cells| regardless of corpus size.
    // CO-LOCATION PAIRS (§2.144) — which platform pairs keep turning
    // up in the SAME 2°×2° cell on the SAME day: the contact-graph /
    // joint-survey primitive. The join is BLOCKED by (cell, day) —
    // pairs only form inside a block, never across the corpus (the
    // spatial-join analogue of the dedup keys' banding; a fat cell
    // costs its own occupancy², bounded by cell granularity). Pairs
    // counted on the DISTINCT per-day presence table, threshold ≥ 2
    // shared cell-days, exact integers.
    "geo_colocation_pairs" -> ((s, dir) => {
      val pres = sightings(s, dir)
        .select(col("user_id"),
          floor(col("lat") / 2).cast("long").as("cell_lat"),
          floor(col("lon") / 2).cast("long").as("cell_lon"),
          expr("ms div 86400000").as("day"))
        .distinct().localCheckpoint(true)
      pres.as("a").join(pres.as("b"),
          col("a.cell_lat") === col("b.cell_lat")
            && col("a.cell_lon") === col("b.cell_lon")
            && col("a.day") === col("b.day")
            && col("a.user_id") < col("b.user_id"))
        .groupBy(col("a.user_id").as("user_a"),
          col("b.user_id").as("user_b"))
        .agg(count(lit(1)).as("n_shared_cell_days"))
        .filter(col("n_shared_cell_days") >= 2)
        .orderBy("user_a", "user_b")
    }),

    // TRACK BOUNDING BOX (§2.141) — per platform: the lat/lon
    // envelope, fix count, and the box "area" in square degrees —
    // the cheap spatial-extent summary a survey planner reads before
    // any expensive hull/track geometry (and the pre-filter for
    // range-partitioned spatial joins). The fixture grid coordinates
    // are exact binary fractions, so min/max/differences/products
    // are all EXACT doubles — no rounding fence anywhere except the
    // output r4d.
    "geo_track_bbox" -> ((s, dir) => {
      sightings(s, dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_fixes"),
          min(col("lat")).as("lat_min"), max(col("lat")).as("lat_max"),
          min(col("lon")).as("lon_min"), max(col("lon")).as("lon_max"))
        .select(col("user_id"), col("n_fixes"),
          col("lat_min"), col("lat_max"), col("lon_min"),
          col("lon_max"),
          r4d((col("lat_max") - col("lat_min"))
            * (col("lon_max") - col("lon_min"))).as("bbox_deg2"))
        .orderBy("user_id")
    }),

    // ANCHOR CELL (§2.166) — each platform's modal 2°×2° cell (the
    // "home range center" / staging-area primitive of mobility
    // analysis): the argmax cell under the (n desc, cell) total
    // order, its share of the platform's fixes, and the distinct-
    // cell count (range breadth). Exact integers, one keyed reduce +
    // one bounded per-user top-1 window.
    "geo_anchor_cell" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = sightings(s, dir)
        .select(col("user_id"),
          floor(col("lat") / 2).cast("long").as("cla"),
          floor(col("lon") / 2).cast("long").as("clo"))
        .groupBy("user_id", "cla", "clo")
        .agg(count(lit(1)).as("n"))
      val tot = cells.groupBy("user_id")
        .agg(sum(col("n")).as("n_fixes"),
          count(lit(1)).as("n_cells"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("n").desc, col("cla"), col("clo"))
      cells.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .join(tot, Seq("user_id"))
        .select(col("user_id"), col("cla").as("anchor_cell_lat"),
          col("clo").as("anchor_cell_lon"),
          col("n").as("n_fixes_at_anchor"), col("n_fixes"),
          col("n_cells"),
          r4d(col("n").cast("double") / col("n_fixes").cast("double"))
            .as("anchor_share"))
        .orderBy("user_id")
    }),

    // WEEKLY CENTROID DRIFT (§2.194) — migration detection: per
    // platform, the week-over-week displacement of its activity
    // centroid (decimal-exact weekly centers on the binary grid,
    // one correctly-rounded sqrt per consecutive week pair), each
    // displacement micro-snapped to 10⁻⁶ integers before the exact
    // per-user total — total drift far above the daily range means
    // directed movement, not foraging. One keyed reduce + one
    // per-user lag window over the bounded week spine.
    "geo_weekly_centroid_drift" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val D = "decimal(38,6)"
      val wc = sightings(s, dir)
        .select(col("user_id"), expr("ms div 604800000").as("week"),
          col("lat").cast(D).as("y"), col("lon").cast(D).as("x"))
        .groupBy("user_id", "week")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"))
        .select(col("user_id"), col("week"),
          (col("sx").cast("double") / col("n").cast("double"))
            .as("cx"),
          (col("sy").cast("double") / col("n").cast("double"))
            .as("cy"))
      val w = Window.partitionBy("user_id").orderBy(col("week"))
      wc.withColumn("px", lag(col("cx"), 1).over(w))
        .withColumn("py", lag(col("cy"), 1).over(w))
        .filter(col("px").isNotNull)
        .select(col("user_id"),
          floor(sqrt((col("cx") - col("px")) * (col("cx") - col("px"))
            + (col("cy") - col("py")) * (col("cy") - col("py")))
            * lit(1.0e6)).cast("long").as("d6"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_moves"),
          sum(col("d6").cast("decimal(38,0)")).as("s6"),
          max(col("d6")).as("mx6"))
        .select(col("user_id"), (col("n_moves") + 1).as("n_weeks"),
          r4d(col("s6").cast("double") / lit(1.0e6))
            .as("total_drift_deg"),
          r4d(col("mx6").cast("double") / lit(1.0e6))
            .as("max_weekly_drift_deg"))
        .orderBy("user_id")
    }),

    // DIURNALITY (§2.189) — the day/night activity split ecology
    // reads first: per platform, fixes in the 06:00–17:59 UTC band
    // vs the rest, and the diurnality index (n_day − n_night)/n ∈
    // [−1, 1] (+1 strictly diurnal, −1 strictly nocturnal). Exact
    // integer hour tests and counts; one keyed reduce.
    "geo_diurnality" -> ((s, dir) => {
      sightings(s, dir)
        .select(col("user_id"),
          (expr("ms div 3600000 % 24").between(6, 17)).cast("long")
            .as("isday"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_fixes"),
          sum(col("isday")).as("n_day"))
        .select(col("user_id"), col("n_fixes"), col("n_day"),
          (col("n_fixes") - col("n_day")).as("n_night"),
          r4d((lit(2L) * col("n_day") - col("n_fixes"))
            .cast("double") / col("n_fixes").cast("double"))
            .as("diurnality"))
        .orderBy("user_id")
    }),

    // DAILY RANGE PROFILE (§2.181) — how far does a platform roam in
    // a day: per user-day, the Chebyshev span over the fine
    // (1/8°, 1/32°)-grid coordinates DOUBLED to exact integers
    // (2·lat grid units, so no fraction ever enters); per user the
    // mean and max daily span plus active-day count. Distinguishes
    // the long-haul migrant (high max, low mean) from the wide-
    // ranging forager (high mean) — the daily-mobility figure next
    // to radius of gyration's all-time one. Two keyed reduces.
    "geo_daily_range_profile" -> ((s, dir) => {
      val day = sightings(s, dir)
        .select(col("user_id"), expr("ms div 86400000").as("day"),
          (col("lat") * 8).cast("long").as("ly"),
          (col("lon") * 32).cast("long").as("lx"))
        .groupBy("user_id", "day")
        .agg(greatest(
          (max(col("ly")) - min(col("ly"))) * 4,
          max(col("lx")) - min(col("lx"))).as("span32"))
      day.groupBy("user_id")
        .agg(count(lit(1)).as("n_days"),
          sum(col("span32")).as("ss"), max(col("span32")).as("mx"))
        .select(col("user_id"), col("n_days"),
          r4d(col("ss").cast("double") / col("n_days").cast("double")
            / lit(32.0)).as("mean_daily_range_deg"),
          r4d(col("mx").cast("double") / lit(32.0))
            .as("max_daily_range_deg"))
        .orderBy("user_id")
    }),

    // STANDARD DEVIATIONAL ELLIPSE (§2.180) — the classic
    // activity-space / home-range summary wildlife and mobility
    // surveys publish: per platform, the mean center, the ellipse
    // semi-axes (sqrt of the covariance eigenvalues) and the
    // orientation of the first principal axis in degrees. The
    // 1/8°//1/32° fixture grid is decimal-exact, so every moment sum
    // and eigen-numerator is EXACT decimal arithmetic; doubles enter
    // only at the final sqrt/atan2 (the legKm-precedent pair, both
    // correctly-rounded on this domain). One keyed reduce.
    "geo_std_ellipse" -> ((s, dir) => {
      val D = "decimal(38,6)"
      val m = sightings(s, dir)
        .select(col("user_id"), col("lat").cast(D).as("y"),
          col("lon").cast(D).as("x"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .filter(col("n") > 1)
      val n2 = (col("n").cast("decimal(38,0)") * col("n"))
        .cast("double")
      val vx = (col("n") * col("sxx") - col("sx") * col("sx"))
        .cast("double") / n2
      val vy = (col("n") * col("syy") - col("sy") * col("sy"))
        .cast("double") / n2
      val cv = (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double") / n2
      val half = (vx + vy) / 2
      val root = sqrt((vx - vy) * (vx - vy) / 4 + cv * cv)
      m.select(col("user_id"), col("n").as("n_fixes"),
          r4d(col("sy").cast("double") / col("n").cast("double"))
            .as("center_lat"),
          r4d(col("sx").cast("double") / col("n").cast("double"))
            .as("center_lon"),
          r4d(sqrt(half + root)).as("semi_major_deg"),
          r4d(sqrt(greatest(lit(0.0), half - root)))
            .as("semi_minor_deg"),
          r4d(atan2(lit(2.0) * cv, vx - vy) / 2
            * lit(180.0) / lit(math.Pi)).as("orientation_deg"))
        .orderBy("user_id")
    }),

    // REVISIT INTERVALS (§2.179) — site-fidelity timing: per
    // platform, the gaps between consecutive fixes at its ANCHOR
    // (modal) cell — n_visits, mean gap (telescoping-exact:
    // Σgaps = last−first ms), and max gap in hours. The recurrence
    // statistic behind geo_anchor_cell's share number (a high share
    // with long gaps = seasonal site; short gaps = roost). One
    // anchor top-1 window + one per-user lag window, exact ms
    // integers until the final hour divisions.
    "geo_revisit_intervals" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pts = sightings(s, dir)
        .select(col("user_id"), col("ms"), col("event_id"),
          floor(col("lat") / 2).cast("long").as("cla"),
          floor(col("lon") / 2).cast("long").as("clo"))
      val cells = pts.groupBy("user_id", "cla", "clo")
        .agg(count(lit(1)).as("n"))
      val wA = Window.partitionBy("user_id")
        .orderBy(col("n").desc, col("cla"), col("clo"))
      val anchor = cells.withColumn("rk", row_number().over(wA))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("cla"), col("clo"))
      val wv = Window.partitionBy("user_id")
        .orderBy(col("ms"), col("event_id"))
      pts.join(anchor, Seq("user_id", "cla", "clo"))
        .withColumn("pms", lag(col("ms"), 1).over(wv))
        .filter(col("pms").isNotNull)
        .select(col("user_id"), (col("ms") - col("pms")).as("gap"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("sg"),
          max(col("gap")).as("mx"))
        .select(col("user_id"), (col("n_gaps") + 1).as("n_visits"),
          r4d(col("sg").cast("double") / col("n_gaps").cast("double")
            / lit(3600000.0)).as("mean_gap_hours"),
          r4d(col("mx").cast("double") / lit(3600000.0))
            .as("max_gap_hours"))
        .orderBy("user_id")
    }),

    // HOME-WORK VECTOR (§2.175) — the commute-pair readout on top of
    // geo_anchor_cell's modal cell: each platform's top-2 2°×2°
    // cells under the (n desc, cell) total order — "home" and
    // "work" in mobility-science terms — with their fix counts and
    // the exact Chebyshev cell distance between them (the commute
    // range in cells; platforms with <2 visited cells drop out).
    // One keyed reduce + one bounded per-user top-2 window + a
    // conditional-struct pivot — no joins between users.
    "geo_home_work_vector" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = sightings(s, dir)
        .select(col("user_id"),
          floor(col("lat") / 2).cast("long").as("cla"),
          floor(col("lon") / 2).cast("long").as("clo"))
        .groupBy("user_id", "cla", "clo")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("n").desc, col("cla"), col("clo"))
      cells.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_top"),
          max(when(col("rk") === 1,
            struct(col("cla"), col("clo"), col("n")))).as("h"),
          max(when(col("rk") === 2,
            struct(col("cla"), col("clo"), col("n")))).as("v"))
        .filter(col("n_top") === 2)
        .select(col("user_id"),
          col("h")("cla").as("home_lat"), col("h")("clo").as("home_lon"),
          col("h")("n").as("n_home"),
          col("v")("cla").as("work_lat"), col("v")("clo").as("work_lon"),
          col("v")("n").as("n_work"),
          greatest(abs(col("h")("cla") - col("v")("cla")),
            abs(col("h")("clo") - col("v")("clo")))
            .as("cell_distance"))
        .orderBy("user_id")
    }),

    // VISIT ENTROPY (§2.169) — per-platform Shannon entropy over its
    // 2°×2° cell-visit distribution plus the log2(n_cells)-normalized
    // form in [0,1] — the mobility-predictability statistic (the
    // Song-et-al. predictability bound starts from exactly this
    // number): 0 = always the same cell, 1 = uniform over the visited
    // range. Exact integer counts; floats appear only in the in-order
    // c·log2(c) fold over the sorted bounded per-user count list and
    // two divisions (the ts_entropy_daily device). One keyed reduce +
    // one per-user fold — no pair or cell-grid enumeration, so the
    // shape is corpus-linear at any scale.
    "geo_visit_entropy" -> ((s, dir) => {
      val plogp = (cs: org.apache.spark.sql.Column) =>
        aggregate(cs, lit(0.0), (acc, x) =>
          acc + x.cast("double") * log2(x.cast("double")))
      val cells = sightings(s, dir)
        .select(col("user_id"),
          floor(col("lat") / 2).cast("long").as("cla"),
          floor(col("lon") / 2).cast("long").as("clo"))
        .groupBy("user_id", "cla", "clo")
        .agg(count(lit(1)).as("c"))
      cells.groupBy("user_id")
        .agg(sum(col("c")).as("n_fixes"), count(lit(1)).as("n_cells"),
          array_sort(collect_list(col("c"))).as("cs"))
        .select(col("user_id"), col("n_fixes"), col("n_cells"),
          r4d(log2(col("n_fixes")) - plogp(col("cs")) / col("n_fixes"))
            .as("entropy_bits"),
          when(col("n_cells") > 1,
            r4d((log2(col("n_fixes"))
              - plogp(col("cs")) / col("n_fixes"))
              / log2(col("n_cells"))))
            .otherwise(lit(0.0)).as("entropy_norm"))
        .orderBy("user_id")
    }),

    // CELL FLOWS (§2.163) — the migration-corridor readout: counts
    // of consecutive-fix transitions BETWEEN distinct 2°×2° cells
    // (within-cell dwell is geo_cell_dwell's job), top-20 corridors
    // under the (n desc, cells) total order with corpus share. One
    // user-keyed lead window; the flow table partial-aggregates to
    // ≤ occupied-cell-pairs rows before the bounded global sort.
    "geo_cell_flows" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ms"), col("event_id"))
      val f = sightings(s, dir)
        .select(col("user_id"), col("ms"), col("event_id"),
          floor(col("lat") / 2).cast("long").as("cla"),
          floor(col("lon") / 2).cast("long").as("clo"))
        .withColumn("nla", lead(col("cla"), 1).over(w))
        .withColumn("nlo", lead(col("clo"), 1).over(w))
        .filter(col("nla").isNotNull
          && (col("nla") =!= col("cla") || col("nlo") =!= col("clo")))
      val flows = f.groupBy(col("cla").as("from_lat"),
          col("clo").as("from_lon"), col("nla").as("to_lat"),
          col("nlo").as("to_lon"))
        .agg(count(lit(1)).as("n_transitions"))
      val tot = flows.agg(sum(col("n_transitions")).cast("long")
        .as("ntot"))
      flows.crossJoin(broadcast(tot))
        .orderBy(col("n_transitions").desc, col("from_lat"),
          col("from_lon"), col("to_lat"), col("to_lon"))
        .limit(20)
        .select(col("from_lat"), col("from_lon"), col("to_lat"),
          col("to_lon"), col("n_transitions"),
          r4d(col("n_transitions").cast("double")
            / col("ntot").cast("double")).as("share"))
    }),

    // CELL TRANSITION ENTROPY (§2.188) — spatial predictability per
    // PLACE (the Markov-entropy-rate device on the regional 20°
    // grid): for each origin cell with ≥5 outgoing transitions, the
    // Shannon entropy of its next-cell distribution in bits plus the
    // normalized form — 0 = a pure corridor (one destination), 1 =
    // a dispersal hub. Same lead window as the flow keys; exact
    // counts, one sorted bounded c·log2(c) fold per origin cell.
    "geo_cell_transition_entropy" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ms"), col("event_id"))
      val f = sightings(s, dir)
        .select(col("user_id"), col("ms"), col("event_id"),
          floor(col("lat") / 20).cast("long").as("cla"),
          floor(col("lon") / 20).cast("long").as("clo"))
        .withColumn("nla", lead(col("cla"), 1).over(w))
        .withColumn("nlo", lead(col("clo"), 1).over(w))
        .filter(col("nla").isNotNull
          && (col("nla") =!= col("cla") || col("nlo") =!= col("clo")))
      val plogp = (cs: org.apache.spark.sql.Column) =>
        aggregate(cs, lit(0.0), (acc, x) =>
          acc + x.cast("double") * log2(x.cast("double")))
      f.groupBy(col("cla"), col("clo"), col("nla"), col("nlo"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("cla").as("cell_lat"), col("clo").as("cell_lon"))
        .agg(sum(col("c")).as("n_out"), count(lit(1)).as("n_dest"),
          array_sort(collect_list(col("c"))).as("cs"))
        .filter(col("n_out") >= 5)
        .select(col("cell_lat"), col("cell_lon"), col("n_out"),
          col("n_dest"),
          r4d(log2(col("n_out")) - plogp(col("cs")) / col("n_out"))
            .as("entropy_bits"),
          when(col("n_dest") > 1,
            r4d((log2(col("n_out")) - plogp(col("cs"))
              / col("n_out")) / log2(col("n_dest"))))
            .otherwise(lit(0.0)).as("entropy_norm"))
        .orderBy("cell_lat", "cell_lon")
    }),

    // FLOW ASYMMETRY (§2.170) — the directional companion to
    // geo_cell_flows, at the REGIONAL 20°×20° grid (corridors need
    // recurrence; the fine 2° grid is the flows key's job): for each
    // unordered cell pair with ≥3 observed transitions, how one-way
    // is the corridor? asymmetry = (n_ab − n_ba)/(n_ab + n_ba) ∈
    // [−1, 1] (±1 = strictly one-way — the migration-vs-commute
    // discriminator). Same single lead window as the flows key;
    // transitions canonicalize map-side to the lexicographic (a < b)
    // pair before ONE keyed reduce, so the shape stays
    // corpus-linear; counts exact, one rounded division.
    "geo_flow_asymmetry" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ms"), col("event_id"))
      val f = sightings(s, dir)
        .select(col("user_id"), col("ms"), col("event_id"),
          floor(col("lat") / 20).cast("long").as("cla"),
          floor(col("lon") / 20).cast("long").as("clo"))
        .withColumn("nla", lead(col("cla"), 1).over(w))
        .withColumn("nlo", lead(col("clo"), 1).over(w))
        .filter(col("nla").isNotNull
          && (col("nla") =!= col("cla") || col("nlo") =!= col("clo")))
      val canon = col("cla") < col("nla") ||
        (col("cla") === col("nla") && col("clo") < col("nlo"))
      f.select(
          when(canon, col("cla")).otherwise(col("nla")).as("a_lat"),
          when(canon, col("clo")).otherwise(col("nlo")).as("a_lon"),
          when(canon, col("nla")).otherwise(col("cla")).as("b_lat"),
          when(canon, col("nlo")).otherwise(col("clo")).as("b_lon"),
          when(canon, lit(1L)).otherwise(lit(0L)).as("fw"))
        .groupBy("a_lat", "a_lon", "b_lat", "b_lon")
        .agg(sum(col("fw")).as("n_ab"),
          sum(lit(1L) - col("fw")).as("n_ba"))
        .filter(col("n_ab") + col("n_ba") >= 3)
        .select(col("a_lat"), col("a_lon"), col("b_lat"), col("b_lon"),
          col("n_ab"), col("n_ba"),
          (col("n_ab") + col("n_ba")).as("n_total"),
          r4d((col("n_ab") - col("n_ba")).cast("double")
            / (col("n_ab") + col("n_ba")).cast("double"))
            .as("asymmetry"))
        .orderBy("a_lat", "a_lon", "b_lat", "b_lon")
    }),

    // BEARING-CHANGE STATS (§2.159) — how much do tracks TURN:
    // consecutive displacement-vector pairs per platform, the turn
    // classified by the EXACT integer dot-product sign S = dx·ndx +
    // 16·dy·ndy (the degree-space dot times 1024 — the 16 re-weights
    // the 1/8° y-grid against the 1/32° x-grid; sharp turn ⟺ S < 0,
    // no trig, no sqrt in the decision), plus the mean turn cosine
    // micro-snapped to 10⁻⁶ BIGINTs before summing
    // (order-independent; the sqrt pair is correctly-rounded IEEE).
    // Zero-displacement legs drop BEFORE pairing — they have no
    // bearing. The directional-persistence covariate next to
    // geo_sinuosity's path-ratio and geo_heading_sectors' octants.
    "geo_bearing_change_stats" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ms"), col("event_id"))
      val legs = graft.Tables.fanout(graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts").cast("timestamp")).as("ms"),
          ((col("user_id") * 997 + col("event_id") * 31) % 11520)
            .as("x"),
          (col("event_id") % 1440).as("y")), col("user_id"))
        .withColumn("dx", lead(col("x"), 1).over(w) - col("x"))
        .withColumn("dy", lead(col("y"), 1).over(w) - col("y"))
        .filter(col("dx").isNotNull
          && !(col("dx") === 0 && col("dy") === 0))
      val pairs = legs
        .withColumn("ndx", lead(col("dx"), 1).over(w))
        .withColumn("ndy", lead(col("dy"), 1).over(w))
        .filter(col("ndx").isNotNull)
        .select(col("user_id"),
          (col("dx") * col("ndx") + lit(16L) * col("dy") * col("ndy"))
            .as("s"),
          round(
            (col("dx") * col("ndx") + lit(16L) * col("dy") * col("ndy"))
              .cast("double")
              / (sqrt((col("dx") * col("dx")
                  + lit(16L) * col("dy") * col("dy")).cast("double"))
                * sqrt((col("ndx") * col("ndx")
                  + lit(16L) * col("ndy") * col("ndy")).cast("double")))
              * lit(1000000.0)).cast("long").as("c6"))
      pairs.groupBy("user_id")
        .agg(count(lit(1)).as("n_turns"),
          count_if(col("s") < 0).as("n_sharp"),
          sum(col("c6")).as("sc6"))
        .select(col("user_id"), col("n_turns"), col("n_sharp"),
          r4d(col("n_sharp").cast("double")
            / col("n_turns").cast("double")).as("share_sharp"),
          r4d(col("sc6").cast("double") / col("n_turns").cast("double")
            / lit(1000000.0)).as("mean_turn_cos"))
        .orderBy("user_id")
    }),

    // STEP-LENGTH PERCENTILES (§2.157) — the movement-scale profile
    // per platform: median / p90 / max consecutive-fix displacement
    // in degrees (the number that separates loiterers from transit
    // flights, and the bandwidth input for geo_gps_interpolate's
    // gap policy). Steps are computed on the integer grid (exact
    // deltas, power-of-two /1024, /64 conversions, one
    // correctly-rounded sqrt each — the hull key's edge-length
    // formula), identically in both engines, so PERCENTILE_DISC
    // picks the SAME element: order statistics on a double column
    // are engine-safe when every value is bit-identical (SURVEY
    // §1.3's double-column class). One user-keyed window + one
    // reduce.
    "geo_step_length_percentiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ms"), col("event_id"))
      graft.Tables.fanout(graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts").cast("timestamp")).as("ms"),
          ((col("user_id") * 997 + col("event_id") * 31) % 11520)
            .as("x"),
          (col("event_id") % 1440).as("y")), col("user_id"))
        .withColumn("nx", lead(col("x"), 1).over(w))
        .withColumn("ny", lead(col("y"), 1).over(w))
        .filter(col("nx").isNotNull)
        .select(col("user_id"),
          sqrt(((col("nx") - col("x")) * (col("nx") - col("x")))
            .cast("double") / lit(1024.0)
            + ((col("ny") - col("y")) * (col("ny") - col("y")))
              .cast("double") / lit(64.0)).as("step"))
        .createOrReplaceTempView("slp_steps")
      s.sql("""SELECT user_id, count(*) AS n_steps,
        |  ROUND(percentile_disc(0.5) WITHIN GROUP (ORDER BY step)
        |    * 10000) / 10000 AS p50_step_deg,
        |  ROUND(percentile_disc(0.9) WITHIN GROUP (ORDER BY step)
        |    * 10000) / 10000 AS p90_step_deg,
        |  ROUND(max(step) * 10000) / 10000 AS max_step_deg
        |FROM slp_steps GROUP BY user_id ORDER BY user_id""".stripMargin)
    }),

    // RADIUS OF GYRATION (§2.151) — the standard mobility-science
    // track-extent scalar (González et al., Nature 2008): rg =
    // √(mean squared displacement from the VISIT-WEIGHTED centroid),
    // per platform. Complements the hull (geometric envelope) with
    // the mass-weighted spread — a platform that mostly loiters has
    // tiny rg inside a huge hull. Exactness: on the integer fixture
    // grid the centered second moment n·Σx² − (Σx)² is an EXACT
    // integer (< 2⁵³, double-exact) per axis; the per-axis /1024,
    // /64 grid→degree conversions are power-of-two-exact, and the
    // only libm is one correctly-rounded sqrt at the edge. ONE
    // partial-aggregating reduce per user — the cheapest possible
    // shape, no window, no join.
    "geo_radius_of_gyration" -> ((s, dir) => {
      graft.Tables.events(s, dir)
        .select(col("user_id"),
          ((col("user_id") * 997 + col("event_id") * 31) % 11520)
            .as("x"),
          (col("event_id") % 1440).as("y"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("user_id"), col("n").as("n_fixes"),
          r4d(col("sy").cast("double") / col("n").cast("double")
            / lit(8.0) - lit(90.0)).as("centroid_lat"),
          r4d(col("sx").cast("double") / col("n").cast("double")
            / lit(32.0) - lit(180.0)).as("centroid_lon"),
          r4d(sqrt(
            (col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double")
              / (col("n") * col("n")).cast("double") / lit(1024.0)
            + (col("n") * col("syy") - col("sy") * col("sy"))
              .cast("double")
              / (col("n") * col("n")).cast("double") / lit(64.0)))
            .as("rg_deg"))
        .orderBy("user_id")
    }),

    // PER-TRACK CONVEX HULL (§2.150) — hull vertex count, area and
    // perimeter per platform: the real spatial-extent statistic
    // surveys use (geo_track_bbox's envelope overstates extent for
    // any diagonal track). The algorithm is the slope-extremum hull
    // characterization, chosen over monotone chain because it is a
    // JOIN+AGGREGATE, not a stack: on the per-x upper candidates
    // (max y per x), a point is an upper-hull vertex iff
    // min_{left j} slope(j,i) ≥ max_{right k} slope(i,k) — the
    // betweenness lemma (p above segment jk ⟺ slope(j,p) ≥
    // slope(p,k)) quantified over both sides collapses to two slope
    // extrema; endpoints (an empty side) pass vacuously via NULL.
    // Lower hull is the mirrored test on per-x min-y candidates.
    //
    // Exactness: everything runs on the INTEGER fixture grid
    // (x = (user·997 + event·31) mod 11520, y = event mod 1440 —
    // the sightings lat/lon before their affine display transform,
    // which hulls are invariant to up to the final /32, /8 scaling).
    // Slopes are one IEEE division of integer dy/dx: distinct
    // rationals p/q, |q| < 11520 differ by ≥ 1/11520² ≈ 7.5e-9
    // while double rounding error at |slope| ≤ 1439 is ≤ 2e-13, so
    // slope comparisons are EXACT and equal rationals round to equal
    // doubles — no libm, no tie ambiguity. Area is the integer
    // trapezoid (shoelace) sum of upper minus lower chains (one /512
    // power-of-two-exact division at the edge); perimeter micro-snaps
    // each edge's correctly-rounded sqrt length to 10⁻⁶ BIGINTs
    // before summing (order-independent), with the two vertical end
    // walls exact integers (10⁶/8 = 125000). Scale: the quadratic
    // slope test is BLOCKED per user (bounded per-track fix sets —
    // the geo_colocation_pairs cost class); everything else is
    // one window pass + keyed reduces.
    "geo_convex_hull_area" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val p = graft.Tables.events(s, dir)
        .select(col("user_id"),
          ((col("user_id") * 997 + col("event_id") * 31) % 11520)
            .as("x"),
          (col("event_id") % 1440).as("y"))
        .distinct().localCheckpoint(true)
      val hi = p.groupBy("user_id", "x").agg(max(col("y")).as("y"))
      val lo = p.groupBy("user_id", "x").agg(min(col("y")).as("y"))
      def chain(cand: DataFrame, upper: Boolean): DataFrame = {
        val c = cand.localCheckpoint(true)
        val sl = (col("b.y") - col("a.y")).cast("double") /
          (col("b.x") - col("a.x")).cast("double")
        val g = c.as("a").join(c.as("b"),
            col("a.user_id") === col("b.user_id")
              && col("a.x") =!= col("b.x"), "left")
          .groupBy(col("a.user_id").as("user_id"),
            col("a.x").as("x"), col("a.y").as("y"))
          .agg(
            min(when(col("b.x") < col("a.x"), sl)).as("lsl_min"),
            max(when(col("b.x") < col("a.x"), sl)).as("lsl_max"),
            max(when(col("b.x") > col("a.x"), sl)).as("rsl_max"),
            min(when(col("b.x") > col("a.x"), sl)).as("rsl_min"))
        val keep =
          if (upper) col("lsl_min").isNull || col("rsl_max").isNull ||
            col("lsl_min") >= col("rsl_max")
          else col("lsl_max").isNull || col("rsl_min").isNull ||
            col("lsl_max") <= col("rsl_min")
        g.filter(keep).select(col("user_id"), col("x"), col("y"))
      }
      val up = chain(hi, upper = true)
      val dn = chain(lo, upper = false)
      val w = Window.partitionBy("user_id").orderBy("x")
      def edges(ch: DataFrame): DataFrame = ch
        .withColumn("nx", lead(col("x"), 1).over(w))
        .withColumn("ny", lead(col("y"), 1).over(w))
        .filter(col("nx").isNotNull)
        .select(col("user_id"),
          ((col("nx") - col("x")) * (col("y") + col("ny"))).as("a2"),
          round(sqrt(
            ((col("nx") - col("x")) * (col("nx") - col("x")))
              .cast("double") / lit(1024.0)
              + ((col("ny") - col("y")) * (col("ny") - col("y")))
                .cast("double") / lit(64.0)) * lit(1000000.0))
            .cast("long").as("len6"))
        .groupBy("user_id")
        .agg(sum(col("a2")).as("a2"), sum(col("len6")).as("len6"))
      val ue = edges(up)
      val le = edges(dn)
      val vt = hi.withColumnRenamed("y", "yhi")
        .join(lo.withColumnRenamed("y", "ylo"), Seq("user_id", "x"))
      val bd = vt.groupBy("user_id")
        .agg(min(col("x")).as("x0"), max(col("x")).as("x1"))
      val vl = vt.join(bd, Seq("user_id"))
        .groupBy("user_id")
        .agg(sum(
          when(col("x") === col("x0"),
            (col("yhi") - col("ylo")) * 125000L).otherwise(0L)
          + when(col("x") === col("x1"),
            (col("yhi") - col("ylo")) * 125000L).otherwise(0L))
          .as("vlen6"))
      val hv = up.unionAll(dn).distinct()
        .groupBy("user_id").agg(count(lit(1)).as("n_hull_vertices"))
      hv.join(ue.select(col("user_id"), col("a2").as("ua2"),
            col("len6").as("ulen6")), Seq("user_id"), "left")
        .join(le.select(col("user_id"), col("a2").as("la2"),
          col("len6").as("llen6")), Seq("user_id"), "left")
        .join(vl, Seq("user_id"))
        .select(col("user_id"), col("n_hull_vertices"),
          r4d((coalesce(col("ua2"), lit(0L))
            - coalesce(col("la2"), lit(0L))).cast("double")
            / lit(512.0)).as("hull_deg2"),
          r4d((coalesce(col("ulen6"), lit(0L))
            + coalesce(col("llen6"), lit(0L)) + col("vlen6"))
            .cast("double") / lit(1000000.0)).as("hull_perimeter_deg"))
        .orderBy("user_id")
    }),

    // HEADING SECTOR HISTOGRAM (§2.140) — which way do tracks move:
    // consecutive-fix displacement vectors classified into the eight
    // 45° compass octants WITHOUT atan2 — the octant is decided by
    // sign tests and |dx| vs |dy| comparisons on the exact binary
    // grid coordinates, so no libm enters the bucketing at all (the
    // sinuosity key's haversine needs trig; a HISTOGRAM does not).
    // One spelled CASE cascade, identical text in both engines;
    // zero-displacement legs drop. Per-user lead window, one reduce.
    "geo_heading_sectors" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ms"), col("event_id"))
      val legs = sightings(s, dir)
        .withColumn("nlat", lead(col("lat"), 1).over(w))
        .withColumn("nlon", lead(col("lon"), 1).over(w))
        .filter(col("nlat").isNotNull)
        .select((col("nlon") - col("lon")).as("dx"),
          (col("nlat") - col("lat")).as("dy"))
        .filter(!(col("dx") === 0.0 && col("dy") === 0.0))
      val sector = expr("""CASE
        WHEN dy > 0 AND dx >= 0 AND dy >= dx THEN 'NNE'
        WHEN dx > 0 AND dy >= 0 THEN 'ENE'
        WHEN dx > 0 AND dx >= -dy THEN 'ESE'
        WHEN dx >= 0 AND dy < 0 THEN 'SSE'
        WHEN dy < 0 AND -dy >= -dx THEN 'SSW'
        WHEN dx < 0 AND dy <= 0 THEN 'WSW'
        WHEN dx < 0 AND -dx >= dy THEN 'WNW'
        ELSE 'NNW' END""")
      val h = legs.select(sector.as("sector"))
        .groupBy("sector").agg(count(lit(1)).as("n_legs"))
      val tot = h.agg(sum(col("n_legs")).cast("long").as("ntot"))
      h.crossJoin(broadcast(tot))
        .select(col("sector"), col("n_legs"),
          r4d(col("n_legs").cast("double") / col("ntot").cast("double"))
            .as("share"))
        .orderBy("sector")
    }),

    // CELL DWELL TIME (§2.132) — how long do platforms LINGER per
    // grid cell, not just how often are they seen (geo_grid_density's
    // count answers coverage; dwell answers effort): each
    // consecutive-sighting gap is attributed to the EARLIER fix's
    // 2°×2° cell (the standard position-hold assumption), summed per
    // cell. Exact integer millisecond gaps off one user-partitioned
    // lead window; per-cell reduce bounds the shuffle by occupied
    // cells; one division for the mean, r4d.
    "geo_cell_dwell" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ms"), col("event_id"))
      sightings(s, dir)
        .withColumn("nxt", lead(col("ms"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(floor(col("lat") / 2).cast("long").as("cell_lat"),
          floor(col("lon") / 2).cast("long").as("cell_lon"),
          (col("nxt") - col("ms")).as("dwell"))
        .groupBy("cell_lat", "cell_lon")
        .agg(count(lit(1)).as("n_legs"),
          sum(col("dwell")).cast("long").as("dwell_ms"))
        .select(col("cell_lat"), col("cell_lon"), col("n_legs"),
          col("dwell_ms"),
          r4d(col("dwell_ms").cast("double")
            / col("n_legs").cast("double")).as("avg_dwell_ms"))
        .orderBy("cell_lat", "cell_lon")
    }),

    "geo_grid_density" -> ((s, dir) => {
      sightings(s, dir)
        .select(floor(col("lat") / 2).cast("long").as("cell_lat"),
          floor(col("lon") / 2).cast("long").as("cell_lon"),
          col("user_id"))
        .groupBy("cell_lat", "cell_lon")
        .agg(count(lit(1)).as("n_sightings"),
          countDistinct(col("user_id")).as("n_platforms"))
        .filter(col("n_sightings") >= 3)
        .orderBy("cell_lat", "cell_lon")
    }),

    // TRACK LENGTH (§2.81) — per-platform great-circle path length:
    // order each user's sightings by time, one haversine per
    // consecutive leg (lag window — partitioned by user, parallel
    // across users), sum per user. The flight-effort metric every
    // survey program reports. Leg count and the time-ordering are
    // exact; only the final km sum carries libm ulps, rounded away at
    // 4dp. R = 6371 km.
    "geo_track_length" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
      val legs = sightings(s, dir)
        .withColumn("plat", lag(col("lat"), 1).over(w))
        .withColumn("plon", lag(col("lon"), 1).over(w))
        .filter(col("plat").isNotNull)
      legs
        .withColumn("leg_km",
          legKm(col("lat"), col("lon"), col("plat"), col("plon")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_legs"),
          r4d(sum(col("leg_km"))).as("track_km"))
        .orderBy("user_id")
    }),

    // ON-EFFORT TRACK SEGMENTATION (§2.83) — split each platform's
    // track into survey segments wherever the inter-sighting gap
    // exceeds 24 h OR the leg exceeds 15 000 km (ferry/transit, not
    // survey effort): ts_sessionize's lag-flag machinery over the
    // sightings with haversine leg distances, emitting the
    // per-segment effort unit (sighting count, time span, on-effort
    // km) every aerial-survey analysis groups by. The breaking leg
    // belongs to NEITHER segment — only brk = 0 legs sum into seg_km.
    //
    // Determinism of the DISCRETE split: the time rule compares exact
    // integer milliseconds; the distance rule compares a libm double
    // against 15000.0, safe here by measured margin — the closest
    // fixture leg is 0.148 km from the threshold at sf0.1 (1.9 km at
    // sf0.01), ~10 orders of magnitude above cross-engine libm ulp
    // noise, and the fixture is deterministic so any future erosion
    // hash-flags loudly. Scale shape: one user-keyed exchange for the
    // lag/running-sum windows, then a partial-aggregating (user, seg)
    // reduce — parallel across platforms at any corpus size.
    "geo_track_sessions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
      val legged = sightings(s, dir)
        .withColumn("pms", lag(col("ms"), 1).over(w))
        .withColumn("plat", lag(col("lat"), 1).over(w))
        .withColumn("plon", lag(col("lon"), 1).over(w))
        .withColumn("leg_km",
          when(col("pms").isNull, lit(null).cast("double"))
            .otherwise(
              legKm(col("lat"), col("lon"), col("plat"), col("plon"))))
        .withColumn("brk",
          when(col("pms").isNull
            || (col("ms") - col("pms")) > 86400000L
            || col("leg_km") > 15000.0, 1).otherwise(0))
      legged
        .withColumn("seg", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "seg")
        .agg(count(lit(1)).as("n_sightings"),
          min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"),
          r4d(coalesce(sum(when(col("brk") === 0, col("leg_km"))),
            lit(0.0))).as("seg_km"))
        .orderBy("user_id", "seg")
    }),

    // ZONE CONTAINMENT JOIN (§2.85) — sightings matched to
    // rectangular survey zones (10°×20° boxes synthesized from nation
    // keys): the point-in-polygon workhorse as a GRID-BUCKETED
    // equi-join — zones explode onto the 15° cells they overlap
    // (bounded ≤ 2×3 cells each), points key to their cell, the join
    // is a plain equi-join on (cell_lat, cell_lon), and an EXACT
    // containment filter confirms (the bucket can only admit false
    // candidates, never lose true ones — truncating division can
    // over-cover by one cell on negative bounds, which the filter
    // prunes). This shape survives a MILLION zones where the naive
    // theta-join (point × zone range predicates) degenerates to a
    // nested loop; zones with zero sightings are kept by the final
    // left join. All comparisons are exact: zone bounds are integers,
    // coordinates exact binary fractions.
    "geo_zone_join" -> ((s, dir) => {
      val zones = t(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("zone_id"),
        ((col("n_nationkey") % 12) * 15 - 90).cast("long").as("lat_lo"),
        ((col("n_nationkey") * 7 % 24) * 15 - 180).cast("long")
          .as("lon_lo"))
        .withColumn("lat_hi", col("lat_lo") + 10)
        .withColumn("lon_hi", col("lon_lo") + 20)
      val zcells = zones
        .withColumn("cell_lat", explode(sequence(
          expr("lat_lo div 15"), expr("(lat_hi * 8 - 1) div 120"))))
        .withColumn("cell_lon", explode(sequence(
          expr("lon_lo div 15"), expr("(lon_hi * 32 - 1) div 480"))))
      val pts = sightings(s, dir).select(col("event_id"), col("user_id"),
        col("lat"), col("lon"),
        floor(col("lat") / 15).cast("long").as("cell_lat"),
        floor(col("lon") / 15).cast("long").as("cell_lon"))
      val matched = zcells.join(pts, Seq("cell_lat", "cell_lon"))
        .filter(col("lat") >= col("lat_lo") && col("lat") < col("lat_hi")
          && col("lon") >= col("lon_lo") && col("lon") < col("lon_hi"))
        .groupBy("zone_id")
        .agg(count(lit(1)).as("ns"),
          countDistinct(col("user_id")).as("np"))
      zones.join(matched, Seq("zone_id"), "left")
        .select(col("zone_id"), col("lat_lo"), col("lon_lo"),
          coalesce(col("ns"), lit(0L)).as("n_sightings"),
          coalesce(col("np"), lit(0L)).as("n_platforms"))
        .orderBy("zone_id")
    }),

    // NEIGHBORHOOD-SMOOTHED DENSITY (§2.86) — the 3×3 box-kernel pass
    // over the geo_grid_density surface (a raw per-cell heatmap of
    // sparse survey data is speckle; every density product smooths):
    // computed as SCATTER, not gather — each occupied cell explodes
    // its count onto its 9 neighbor positions and a second
    // partial-aggregating reduce sums contributions per target, so
    // the work is O(occupied cells × 9) with NO self-join and no
    // neighbor lookups (the map-reduce stencil shape; a join-based
    // gather would shuffle the cell table twice for the same answer).
    // Output keeps only OCCUPIED cells (inner join back) so the
    // surface stays bounded by data, not by the world grid. All
    // integer counts — exact everywhere.
    "geo_grid_smooth" -> ((s, dir) => {
      val base = sightings(s, dir)
        .select(floor(col("lat") / 2).cast("long").as("cell_lat"),
          floor(col("lon") / 2).cast("long").as("cell_lon"))
        .groupBy("cell_lat", "cell_lon").agg(count(lit(1)).as("n_raw"))
      val spread = base
        .withColumn("di", explode(sequence(lit(-1L), lit(1L))))
        .withColumn("dj", explode(sequence(lit(-1L), lit(1L))))
        .groupBy((col("cell_lat") + col("di")).as("cell_lat"),
          (col("cell_lon") + col("dj")).as("cell_lon"))
        .agg(sum(col("n_raw")).as("n_smooth"))
      base.join(spread, Seq("cell_lat", "cell_lon"))
        .select(col("cell_lat"), col("cell_lon"), col("n_raw"),
          col("n_smooth"))
        .orderBy("cell_lat", "cell_lon")
    }),

    // GETIS-ORD Gi* HOTSPOTS (§2.93) — geo_grid_smooth shows WHERE
    // density concentrates; Gi* says whether a cell's 3×3
    // neighborhood is significantly hotter than the survey-wide
    // baseline — the statistic behind every "hotspot map" a survey
    // program publishes. Study frame = the OCCUPIED cells (n, Σx, Σx²
    // over them — exact BIGINTs); neighborhood sums S_i and occupied-
    // neighbor counts W_i come from the same scatter stencil as the
    // smoother (each cell scatters (count, 1) onto 9 targets — no
    // self-join, no gather lookups). The z-score is n-scaled so every
    // operand is an exact integer: z = (n·S_i − W_i·Σx) /
    // (√(n·Σx² − (Σx)²) · √((n·W_i − W_i²)/(n−1))) — two sqrts + one
    // division per cell, operand-for-operand on both engines, r4d at
    // the edge. Shape: O(rows) reduce to occupied cells, O(cells·9)
    // scatter, 1-row global broadcast — corpus-size-free downstream.
    "geo_hotspot_gi" -> ((s, dir) => {
      val base = sightings(s, dir)
        .select(floor(col("lat") / 2).cast("long").as("cell_lat"),
          floor(col("lon") / 2).cast("long").as("cell_lon"))
        .groupBy("cell_lat", "cell_lon").agg(count(lit(1)).as("x"))
      val spread = base
        .withColumn("di", explode(sequence(lit(-1L), lit(1L))))
        .withColumn("dj", explode(sequence(lit(-1L), lit(1L))))
        .groupBy((col("cell_lat") + col("di")).as("cell_lat"),
          (col("cell_lon") + col("dj")).as("cell_lon"))
        .agg(sum(col("x")).as("s_i"), count(lit(1)).as("w_i"))
      val glob = base.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      base.join(spread, Seq("cell_lat", "cell_lon"))
        .crossJoin(broadcast(glob))
        .select(col("cell_lat"), col("cell_lon"), col("x"), col("w_i"),
          col("s_i"),
          when(col("n") > 1 && col("n") * col("sxx") > col("sx") * col("sx")
              && col("n") * col("w_i") > col("w_i") * col("w_i"),
            r4d((col("n") * col("s_i") - col("w_i") * col("sx"))
              .cast("double")
              / (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                  .cast("double"))
                * sqrt((col("n") * col("w_i") - col("w_i") * col("w_i"))
                  .cast("double") / (col("n") - 1).cast("double")))))
            .as("z_gi"))
        .orderBy("cell_lat", "cell_lon")
    }),

    // GPS TRACK INTERPOLATION (§2.104) — geotag the detections: a
    // survey camera's frames carry timestamps but no position; the
    // platform's GPS pings do. For each detection (purchase events),
    // linearly interpolate the platform position between the
    // bracketing pings (click events) — the EXIF-time → GPS-track
    // join every aerial-survey ingest runs. NOT an O(dets × pings)
    // as-of join: pings and detections union into ONE user-keyed
    // time-sorted window pass (the win_fill_forward device, run both
    // directions) — at 100 TB this is a single shuffle on platform
    // id, state O(1) per row. Exactness: timestamps are integer ms,
    // ping coordinates exact binary fractions, so the interpolation
    // weight (ms−pms)/(nms−pms) is one division and lat/lon one
    // multiply-add each, spelled operand-for-operand; boundary
    // detections hold the single bracketing ping exactly.
    "geo_gps_interpolate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pts = sightings(s, dir)
      val e = events(s, dir).select(col("event_id"), col("event_type"))
      val tagged = pts.join(e, Seq("event_id"))
        .withColumn("kind",
          when(col("event_type") === "click", 0L)
            .when(col("event_type") === "purchase", 1L))
        .filter(col("kind").isNotNull)
      val wB = Window.partitionBy("user_id")
        .orderBy(col("ms"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wF = Window.partitionBy("user_id")
        .orderBy(col("ms"), col("kind"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      def pingCol(c: String) = when(col("kind") === 0, col(c))
      val br = tagged
        .withColumn("pms", last(pingCol("ms"), ignoreNulls = true).over(wB))
        .withColumn("plat", last(pingCol("lat"), ignoreNulls = true).over(wB))
        .withColumn("plon", last(pingCol("lon"), ignoreNulls = true).over(wB))
        .withColumn("nms", first(pingCol("ms"), ignoreNulls = true).over(wF))
        .withColumn("nlat", first(pingCol("lat"), ignoreNulls = true).over(wF))
        .withColumn("nlon", first(pingCol("lon"), ignoreNulls = true).over(wF))
        .filter(col("kind") === 1)
      val frac = ((col("ms") - col("pms")).cast("double")
        / (col("nms") - col("pms")).cast("double"))
      br.filter(col("pms").isNotNull || col("nms").isNotNull)
        .select(col("event_id"), col("user_id"), col("ms"),
          when(col("pms").isNotNull && col("nms").isNotNull
              && col("nms") > col("pms"),
            r4d(col("plat") + (col("nlat") - col("plat")) * frac))
            .when(col("pms").isNotNull && col("nms").isNotNull,
              r4d(col("plat")))
            .when(col("pms").isNotNull, r4d(col("plat")))
            .otherwise(r4d(col("nlat"))).as("lat_i"),
          when(col("pms").isNotNull && col("nms").isNotNull
              && col("nms") > col("pms"),
            r4d(col("plon") + (col("nlon") - col("plon")) * frac))
            .when(col("pms").isNotNull && col("nms").isNotNull,
              r4d(col("plon")))
            .when(col("pms").isNotNull, r4d(col("plon")))
            .otherwise(r4d(col("nlon"))).as("lon_i"),
          when(col("pms").isNotNull && col("nms").isNotNull, "interp")
            .when(col("pms").isNotNull, "hold_prev")
            .otherwise("hold_next").as("method"))
        .orderBy("event_id")
    }),

    // NEAREST-NEIGHBOR DUPLICATE SCREENING (§2.98) — the double-count
    // QA pass every multi-platform survey runs: for each sighting,
    // the nearest OTHER sighting in its 3×3 2°-cell neighborhood
    // (two platforms photographing the same animal produce
    // near-coincident points). The NN decision is ENTIRELY integer:
    // coordinates stay in their native grid residues (lat in 1/8°
    // units × 4 → the common 1/32° unit lon already lives on), so
    // d² = Δu_lat² + Δu_lon² is an exact BIGINT and the argmin
    // tie-breaks on candidate event_id via one lexicographic struct
    // min. Only the REPORTED degree distance takes a sqrt (IEEE
    // correctly-rounded, not libm) and one division.
    //
    // Shape: candidates SCATTER onto their 9 neighbor cells (the
    // grid_smooth stencil — no self-join on an inequality), probes
    // equi-join their own cell, and min(struct) is partial-aggregable
    // so the per-probe reduce combines map-side. Work is O(points ×
    // avg cell occupancy × 9); at 100 TB you shrink the cell pitch to
    // hold occupancy constant — the plan shape is unchanged.
    "geo_nn_screening" -> ((s, dir) => {
      val pts = graft.Tables.fanout(
        events(s, dir).select(col("event_id"), col("user_id"),
          (col("event_id") % 1440).as("lat8"),
          ((col("user_id") * 997 + col("event_id") * 31) % 11520)
            .as("lon32")), col("event_id"))
        .select(col("event_id"), col("user_id"),
          (col("lat8") * 4).as("ulat"), col("lon32").as("ulon"),
          expr("lat8 div 16").as("cell_lat"),
          expr("lon32 div 64").as("cell_lon"))
      val cand = pts
        .withColumn("di", explode(sequence(lit(-1L), lit(1L))))
        .withColumn("dj", explode(sequence(lit(-1L), lit(1L))))
        .select((col("cell_lat") + col("di")).as("cell_lat"),
          (col("cell_lon") + col("dj")).as("cell_lon"),
          col("event_id").as("cand_id"), col("user_id").as("cand_user"),
          col("ulat").as("clat"), col("ulon").as("clon"))
      pts.join(cand, Seq("cell_lat", "cell_lon"))
        .filter(col("event_id") =!= col("cand_id"))
        .withColumn("d2",
          (col("ulat") - col("clat")) * (col("ulat") - col("clat"))
            + (col("ulon") - col("clon")) * (col("ulon") - col("clon")))
        .groupBy("event_id", "user_id")
        .agg(min(struct(col("d2"), col("cand_id"), col("cand_user")))
          .as("nn"))
        .select(col("event_id"), col("nn.cand_id").as("nn_event_id"),
          col("nn.d2").as("d2_units"),
          (col("nn.cand_user") =!= col("user_id")).as("cross_platform"),
          r4d(sqrt(col("nn.d2").cast("double")) / lit(32.0)).as("nn_deg"))
        .orderBy("event_id")
    }),

    // TRACK SINUOSITY (§2.111) — path length over net displacement
    // per platform: the straightness index movement ecology reads off
    // every track (≈1 = transit line, ≫1 = area-restricted search).
    // Path = geo_track_length's leg sum (same haversine, same 4dp
    // absorption); NET is ONE haversine between the first and last
    // sighting (exact (ms, event_id)-ordered endpoints via two window
    // ranks); sinuosity is one division, null when the endpoints
    // coincide. Shape: one user-keyed exchange serves the lag window
    // AND both rank endpoints; everything after is a per-user reduce.
    "geo_sinuosity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
      val wd = Window.partitionBy("user_id")
        .orderBy(col("ms").desc, col("event_id").desc)
      val p = sightings(s, dir)
      val legs = p
        .withColumn("plat", lag(col("lat"), 1).over(w))
        .withColumn("plon", lag(col("lon"), 1).over(w))
        .filter(col("plat").isNotNull)
        .withColumn("leg_km",
          legKm(col("lat"), col("lon"), col("plat"), col("plon")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_legs"),
          sum(col("leg_km")).as("path_km0"))
      val ends = p.withColumn("ra", row_number().over(w))
        .withColumn("rd", row_number().over(wd))
      val first = ends.filter(col("ra") === 1)
        .select(col("user_id"), col("lat").as("flat"),
          col("lon").as("flon"))
      val last = ends.filter(col("rd") === 1)
        .select(col("user_id"), col("lat").as("llat"),
          col("lon").as("llon"))
      legs.join(first, Seq("user_id")).join(last, Seq("user_id"))
        .withColumn("net_km0",
          legKm(col("llat"), col("llon"), col("flat"), col("flon")))
        .select(col("user_id"), col("n_legs"),
          r4d(col("path_km0")).as("track_km"),
          r4d(col("net_km0")).as("net_km"),
          when(col("net_km0") > 0,
            r4d(col("path_km0") / col("net_km0"))).as("sinuosity"))
        .orderBy("user_id")
    }),

    // GRID DBSCAN-LITE (§2.111) — density clusters on the survey
    // grid: CORE cells are those whose sighting count clears 2× the
    // mean occupancy (data-adaptive, so the Poisson tail separates
    // signal from the uniform floor), clusters are 8-connected core
    // cells labeled by FIVE unrolled min-label rounds — the
    // graph_label_prop contract verbatim: a FIXED-round propagation
    // is the declared semantic (bit-replayable on any corpus;
    // converged on the fixture by the cell geometry). The corpus
    // appears ONLY in the first reduce: clustering runs on the
    // bounded ≤(90×180)-cell table, adjacency is the 3×3 scatter
    // stencil (geo_nn_screening's device — an equi-join, never a
    // cell-pair inequality join). Cell labels are the integer-encoded
    // cell key, min-folded; cluster ids are therefore stable keys,
    // not densities.
    "geo_dbscan_cells" -> ((s, dir) => {
      val cells = sightings(s, dir)
        .select(floor(col("lat") / 2).cast("long").as("cla"),
          floor(col("lon") / 2).cast("long").as("clo"))
        .groupBy("cla", "clo").agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val mean = cells.agg((sum(col("n")) * 2).as("num"),
        count(lit(1)).as("den"))
      val core = cells.crossJoin(broadcast(mean))
        .filter(col("n") * col("den") >= col("num"))
        .select(col("cla"), col("clo"), col("n"),
          ((col("cla") + 90) * 1000 + col("clo") + 180).as("key"))
        .localCheckpoint(true)
      // Adjacency PAIRS among core cells (self included via the
      // (0,0) stencil element), built once: label flows one hop per
      // round through min over neighbors' CURRENT labels.
      val scatter = core
        .withColumn("di", explode(sequence(lit(-1L), lit(1L))))
        .withColumn("dj", explode(sequence(lit(-1L), lit(1L))))
        .select((col("cla") + col("di")).as("cla"),
          (col("clo") + col("dj")).as("clo"),
          col("key").as("nb_key"))
      val adj = core.select(col("cla"), col("clo"), col("key"))
        .join(scatter, Seq("cla", "clo"))
        .select(col("key"), col("nb_key"))
        .localCheckpoint(true)
      var lbl = core.select(col("key"), col("key").as("lbl"))
      for (_ <- 1 to 5) {
        lbl = adj
          .join(lbl.select(col("key").as("nb_key"), col("lbl")),
            Seq("nb_key"))
          .groupBy("key").agg(min(col("lbl")).as("lbl"))
          .localCheckpoint(true)
      }
      lbl.join(core.select(col("key"), col("cla"), col("clo"),
          col("n")), Seq("key"))
        .groupBy(col("lbl").as("cluster_id"))
        .agg(count(lit(1)).as("n_cells"),
          sum(col("n")).cast("long").as("n_sightings"),
          min(col("cla")).as("min_cla"), max(col("cla")).as("max_cla"),
          min(col("clo")).as("min_clo"), max(col("clo")).as("max_clo"))
        .orderBy("cluster_id")
    }),

    // GAUSSIAN KDE SURFACE (§2.119) — the smoothed density map
    // (geo_grid_smooth is a box filter; KDE is the publication-grade
    // kernel): every sighting scatters a Gaussian weight
    // exp(−d²/2σ²), σ = 2° (64 units of 1/32°), onto its 3×3
    // neighbor cells, d² the exact INTEGER squared distance from the
    // point to each cell center in 1/32° units (the geo_nn_screening
    // coordinate system). Determinism: the only libm call (exp) runs
    // on an integer-derived double, and each contribution is
    // floor-snapped to 10⁻⁹ units BEFORE the corpus-scale sum
    // (DECIMAL(38,0)) — the theil-index device, so shuffle order
    // cannot move a ulp. Shape: a 9× map-side scatter + one cell
    // reduce; at 100 TB the pitch shrinks to hold per-cell mass
    // bounded, plan unchanged.
    "geo_kde_cells" -> ((s, dir) => {
      val pts = events(s, dir).select(
        (col("event_id") % 1440).as("lat8"),
        ((col("user_id") * 997 + col("event_id") * 31) % 11520)
          .as("lon32"))
        .select((col("lat8") * 4).as("ulat"), col("lon32").as("ulon"),
          expr("lat8 div 16").as("cla"), expr("lon32 div 64").as("clo"))
      val contrib = pts
        .withColumn("di", explode(sequence(lit(-1L), lit(1L))))
        .withColumn("dj", explode(sequence(lit(-1L), lit(1L))))
        .select((col("cla") + col("di")).as("cell_lat"),
          (col("clo") + col("dj")).as("cell_lon"),
          col("ulat"), col("ulon"))
        .withColumn("d2",
          (col("ulat") - (col("cell_lat") * 64 + 32))
            * (col("ulat") - (col("cell_lat") * 64 + 32))
          + (col("ulon") - (col("cell_lon") * 64 + 32))
            * (col("ulon") - (col("cell_lon") * 64 + 32)))
        .withColumn("w9",
          floor(exp(-col("d2").cast("double") / lit(8192.0))
            * lit(1.0e9)).cast("long"))
      contrib.groupBy("cell_lat", "cell_lon")
        .agg(count(lit(1)).as("n_contrib"),
          sum(col("w9").cast("decimal(38,0)")).as("k9"))
        .select(col("cell_lat"), col("cell_lon"), col("n_contrib"),
          r4d(col("k9").cast("double") / lit(1.0e9)).as("density"))
        .orderBy("cell_lat", "cell_lon")
    }),

    // EMERGING / FADING DENSITY CELLS (§2.113) — the temporal face of
    // the hotspot map: per grid cell, a density z-score in the
    // window's FIRST half vs its SECOND half (exact integer midpoint
    // split, the wilcoxon device), classified emerging / fading /
    // persistent at |z| ≥ 1.5 — where is survey activity appearing or
    // disappearing? Exactness: per-half cell counts are integers;
    // mean/var come from exact (Σn, Σn², |cells|) with the squares in
    // DECIMAL(38,0) (counts grow with the corpus), sd = sqrt(nc·ss −
    // s²)/nc and z = (n·nc − s)/nc/sd spelled operand-for-operand.
    // Shape: one (cell, half) reduce, a 1-row moment broadcast, a
    // map-side classify — the cell table is domain-bounded.
    "geo_emerging_cells" -> ((s, dir) => {
      val p = sightings(s, dir)
        .select(floor(col("lat") / 2).cast("long").as("cla"),
          floor(col("lon") / 2).cast("long").as("clo"),
          expr("ms div 86400000").as("day"))
      val b = p.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val counts = p.crossJoin(broadcast(b))
        .select(col("cla"), col("clo"),
          when(col("day") * 2 < col("lo") + col("hi"), lit(1L))
            .otherwise(lit(0L)).as("h1"))
        .groupBy("cla", "clo")
        .agg(sum(col("h1")).cast("long").as("n1"),
          sum(lit(1L) - col("h1")).cast("long").as("n2"))
      val st = counts.agg(count(lit(1)).as("nc"),
        sum(col("n1")).cast("decimal(38,0)").as("s1"),
        sum(col("n2")).cast("decimal(38,0)").as("s2"),
        sum(col("n1").cast("decimal(38,0)") * col("n1")).as("ss1"),
        sum(col("n2").cast("decimal(38,0)") * col("n2")).as("ss2"))
      counts.crossJoin(broadcast(st))
        .withColumn("sd1",
          sqrt((col("nc") * col("ss1") - col("s1") * col("s1"))
            .cast("double")) / col("nc").cast("double"))
        .withColumn("sd2",
          sqrt((col("nc") * col("ss2") - col("s2") * col("s2"))
            .cast("double")) / col("nc").cast("double"))
        .withColumn("z1",
          (col("n1") * col("nc") - col("s1")).cast("double")
            / col("nc").cast("double") / col("sd1"))
        .withColumn("z2",
          (col("n2") * col("nc") - col("s2")).cast("double")
            / col("nc").cast("double") / col("sd2"))
        .withColumn("class",
          when(col("z2") >= 1.5 && col("z1") >= 1.5, "persistent")
            .when(col("z2") >= 1.5 && col("z1") < 1.5, "emerging")
            .when(col("z1") >= 1.5 && col("z2") < 1.5, "fading"))
        .filter(col("class").isNotNull)
        .select(col("cla"), col("clo"), col("n1"), col("n2"),
          r4d(col("z1")).as("z1"), r4d(col("z2")).as("z2"),
          col("class"))
        .orderBy("cla", "clo")
    }))

  val oracle: Map[String, String] = Map(
    // Same (cell, day)-blocked pair join on the distinct presence
    // table.
    "geo_colocation_pairs" ->
      """WITH p AS (SELECT DISTINCT user_id,
        |    CAST(floor((CAST(event_id % 1440 AS DOUBLE) / 8 - 90) / 2)
        |      AS BIGINT) AS cell_lat,
        |    CAST(floor((CAST((user_id * 997 + event_id * 31) % 11520
        |      AS DOUBLE) / 32 - 180) / 2) AS BIGINT) AS cell_lon,
        |    epoch_ms(ts) // 86400000 AS day
        |  FROM events)
        |SELECT a.user_id AS user_a, b.user_id AS user_b,
        |  count(*) AS n_shared_cell_days
        |FROM p a JOIN p b ON a.cell_lat = b.cell_lat
        |  AND a.cell_lon = b.cell_lon AND a.day = b.day
        |  AND a.user_id < b.user_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY user_a, user_b""".stripMargin,
    // Same decimal weekly centroids, snapped displacements, exact
    // totals.
    "geo_weekly_centroid_drift" ->
      """WITH p AS (SELECT user_id,
        |    epoch_ms(ts) // 604800000 AS week,
        |    CAST(CAST((user_id * 997 + event_id * 31) % 11520
        |      AS DOUBLE) / 32 - 180 AS DECIMAL(38,6)) AS x,
        |    CAST(CAST(event_id % 1440 AS DOUBLE) / 8 - 90
        |      AS DECIMAL(38,6)) AS y
        |  FROM events),
        |wc AS (SELECT user_id, week,
        |    CAST(sum(x) AS DOUBLE) / count(*) AS cx,
        |    CAST(sum(y) AS DOUBLE) / count(*) AS cy
        |  FROM p GROUP BY 1, 2),
        |l AS (SELECT user_id, cx, cy,
        |    lag(cx) OVER w AS px, lag(cy) OVER w AS py
        |  FROM wc WINDOW w AS (PARTITION BY user_id ORDER BY week)),
        |d AS (SELECT user_id,
        |    CAST(floor(sqrt((cx - px) * (cx - px)
        |      + (cy - py) * (cy - py)) * 1000000.0) AS BIGINT) AS d6
        |  FROM l WHERE px IS NOT NULL)
        |SELECT user_id, count(*) + 1 AS n_weeks,
        |  ROUND(CAST(sum(CAST(d6 AS HUGEINT)) AS DOUBLE)
        |    / 1000000.0 * 10000) / 10000 AS total_drift_deg,
        |  ROUND(CAST(max(d6) AS DOUBLE) / 1000000.0 * 10000) / 10000
        |    AS max_weekly_drift_deg
        |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Same exact hour-band test; (2·n_day − n)/n in one division.
    "geo_diurnality" ->
      """WITH p AS (SELECT user_id,
        |    CASE WHEN epoch_ms(ts) // 3600000 % 24 BETWEEN 6 AND 17
        |      THEN 1 ELSE 0 END AS isday
        |  FROM events)
        |SELECT user_id, count(*) AS n_fixes,
        |  CAST(sum(isday) AS BIGINT) AS n_day,
        |  count(*) - CAST(sum(isday) AS BIGINT) AS n_night,
        |  ROUND(CAST(2 * sum(isday) - count(*) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) * 10000) / 10000
        |    AS diurnality
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Same doubled-integer grid spans and exact Chebyshev max.
    "geo_daily_range_profile" ->
      """WITH p AS (SELECT user_id,
        |    epoch_ms(ts) // 86400000 AS day,
        |    CAST(event_id % 1440 AS BIGINT) - 720 AS ly,
        |    CAST((user_id * 997 + event_id * 31) % 11520 AS BIGINT)
        |      - 5760 AS lx
        |  FROM events),
        |d AS (SELECT user_id, day,
        |    greatest((max(ly) - min(ly)) * 4, max(lx) - min(lx))
        |      AS span32
        |  FROM p GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_days,
        |  ROUND(CAST(sum(span32) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    / 32.0 * 10000) / 10000 AS mean_daily_range_deg,
        |  ROUND(CAST(max(span32) AS DOUBLE) / 32.0 * 10000) / 10000
        |    AS max_daily_range_deg
        |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Same decimal-exact moments; sqrt/atan2 on identical doubles.
    "geo_std_ellipse" ->
      """WITH p AS (SELECT user_id,
        |    CAST(CAST((user_id * 997 + event_id * 31) % 11520
        |      AS DOUBLE) / 32 - 180 AS DECIMAL(38,6)) AS x,
        |    CAST(CAST(event_id % 1440 AS DOUBLE) / 8 - 90
        |      AS DECIMAL(38,6)) AS y
        |  FROM events),
        |m AS (SELECT user_id, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy,
        |    sum(x * y) AS sxy
        |  FROM p GROUP BY 1 HAVING count(*) > 1),
        |v AS (SELECT user_id, n, sx, sy,
        |    CAST(n * sxx - sx * sx AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS vx,
        |    CAST(n * syy - sy * sy AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS vy,
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS cv
        |  FROM m)
        |SELECT user_id, n AS n_fixes,
        |  ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) * 10000)
        |    / 10000 AS center_lat,
        |  ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 10000)
        |    / 10000 AS center_lon,
        |  ROUND(sqrt((vx + vy) / 2
        |    + sqrt((vx - vy) * (vx - vy) / 4 + cv * cv)) * 10000)
        |    / 10000 AS semi_major_deg,
        |  ROUND(sqrt(greatest(0.0, (vx + vy) / 2
        |    - sqrt((vx - vy) * (vx - vy) / 4 + cv * cv))) * 10000)
        |    / 10000 AS semi_minor_deg,
        |  ROUND(atan2(2.0 * cv, vx - vy) / 2 * 180.0 / pi()
        |    * 10000) / 10000 + 0.0 AS orientation_deg
        |FROM v ORDER BY user_id""".stripMargin,
    // Same anchor top-1 and per-user lag gaps; exact ms integers.
    "geo_revisit_intervals" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CAST(floor((CAST(event_id % 1440 AS DOUBLE) / 8 - 90) / 2)
        |      AS BIGINT) AS cla,
        |    CAST(floor((CAST((user_id * 997 + event_id * 31) % 11520
        |      AS DOUBLE) / 32 - 180) / 2) AS BIGINT) AS clo
        |  FROM events),
        |cells AS (SELECT user_id, cla, clo, count(*) AS n FROM p
        |  GROUP BY 1, 2, 3),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY n DESC, cla, clo) AS rk FROM cells),
        |a AS (SELECT user_id, cla, clo FROM rk WHERE rk = 1),
        |v AS (SELECT p.user_id, p.ms,
        |    lag(p.ms) OVER (PARTITION BY p.user_id
        |      ORDER BY p.ms, p.event_id) AS pms
        |  FROM p JOIN a ON a.user_id = p.user_id
        |    AND a.cla = p.cla AND a.clo = p.clo),
        |g AS (SELECT user_id, ms - pms AS gap FROM v
        |  WHERE pms IS NOT NULL)
        |SELECT user_id, count(*) + 1 AS n_visits,
        |  ROUND(CAST(sum(CAST(gap AS HUGEINT)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) / 3600000.0 * 10000) / 10000
        |    AS mean_gap_hours,
        |  ROUND(CAST(max(gap) AS DOUBLE) / 3600000.0 * 10000)
        |    / 10000 AS max_gap_hours
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Same per-user cell counts and top-2 total order; exact
    // Chebyshev distance.
    "geo_home_work_vector" ->
      """WITH p AS (SELECT user_id,
        |    CAST(floor((CAST(event_id % 1440 AS DOUBLE) / 8 - 90) / 2)
        |      AS BIGINT) AS cla,
        |    CAST(floor((CAST((user_id * 997 + event_id * 31) % 11520
        |      AS DOUBLE) / 32 - 180) / 2) AS BIGINT) AS clo
        |  FROM events),
        |cells AS (SELECT user_id, cla, clo, count(*) AS n FROM p
        |  GROUP BY 1, 2, 3),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY n DESC, cla, clo) AS rk FROM cells),
        |h AS (SELECT user_id, cla AS home_lat, clo AS home_lon,
        |    n AS n_home FROM rk WHERE rk = 1),
        |v AS (SELECT user_id, cla AS work_lat, clo AS work_lon,
        |    n AS n_work FROM rk WHERE rk = 2)
        |SELECT h.user_id, home_lat, home_lon, n_home,
        |  work_lat, work_lon, n_work,
        |  greatest(abs(home_lat - work_lat), abs(home_lon - work_lon))
        |    AS cell_distance
        |FROM h JOIN v ON v.user_id = h.user_id
        |ORDER BY h.user_id""".stripMargin,
    // Same 20° lead-window transitions; same sorted c·log2(c) fold.
    "geo_cell_transition_entropy" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CAST(floor((CAST(event_id % 1440 AS DOUBLE) / 8 - 90)
        |      / 20) AS BIGINT) AS cla,
        |    CAST(floor((CAST((user_id * 997 + event_id * 31) % 11520
        |      AS DOUBLE) / 32 - 180) / 20) AS BIGINT) AS clo
        |  FROM events),
        |l AS (SELECT *, lead(cla) OVER w AS nla, lead(clo) OVER w
        |    AS nlo
        |  FROM p WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ms, event_id)),
        |f AS (SELECT * FROM l WHERE nla IS NOT NULL
        |  AND (nla <> cla OR nlo <> clo)),
        |tr AS (SELECT cla, clo, nla, nlo, count(*) AS c FROM f
        |  GROUP BY 1, 2, 3, 4),
        |g AS (SELECT cla AS cell_lat, clo AS cell_lon,
        |    CAST(sum(c) AS BIGINT) AS n_out, count(*) AS n_dest,
        |    list_sort(list(c)) AS cs
        |  FROM tr GROUP BY 1, 2 HAVING CAST(sum(c) AS BIGINT) >= 5)
        |SELECT cell_lat, cell_lon, n_out, n_dest,
        |  ROUND((log2(n_out)
        |    - list_aggregate(list_transform(cs, x -> x * log2(x)),
        |        'sum') / n_out) * 10000) / 10000 AS entropy_bits,
        |  CASE WHEN n_dest > 1 THEN
        |    ROUND((log2(n_out)
        |      - list_aggregate(list_transform(cs, x -> x * log2(x)),
        |          'sum') / n_out) / log2(n_dest) * 10000) / 10000
        |  ELSE 0.0 END AS entropy_norm
        |FROM g ORDER BY cell_lat, cell_lon""".stripMargin,
    // Same lead-window transitions; same lexicographic pair
    // canonicalization and exact directional counts.
    "geo_flow_asymmetry" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CAST(floor((CAST(event_id % 1440 AS DOUBLE) / 8 - 90) / 20)
        |      AS BIGINT) AS cla,
        |    CAST(floor((CAST((user_id * 997 + event_id * 31) % 11520
        |      AS DOUBLE) / 32 - 180) / 20) AS BIGINT) AS clo
        |  FROM events),
        |l AS (SELECT *, lead(cla) OVER w AS nla, lead(clo) OVER w
        |    AS nlo
        |  FROM p WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ms, event_id)),
        |f AS (SELECT * FROM l WHERE nla IS NOT NULL
        |  AND (nla <> cla OR nlo <> clo)),
        |c AS (SELECT
        |    CASE WHEN cla < nla OR (cla = nla AND clo < nlo)
        |      THEN cla ELSE nla END AS a_lat,
        |    CASE WHEN cla < nla OR (cla = nla AND clo < nlo)
        |      THEN clo ELSE nlo END AS a_lon,
        |    CASE WHEN cla < nla OR (cla = nla AND clo < nlo)
        |      THEN nla ELSE cla END AS b_lat,
        |    CASE WHEN cla < nla OR (cla = nla AND clo < nlo)
        |      THEN nlo ELSE clo END AS b_lon,
        |    CASE WHEN cla < nla OR (cla = nla AND clo < nlo)
        |      THEN 1 ELSE 0 END AS fw
        |  FROM f),
        |g AS (SELECT a_lat, a_lon, b_lat, b_lon,
        |    CAST(sum(fw) AS BIGINT) AS n_ab,
        |    CAST(sum(1 - fw) AS BIGINT) AS n_ba
        |  FROM c GROUP BY 1, 2, 3, 4)
        |SELECT a_lat, a_lon, b_lat, b_lon, n_ab, n_ba,
        |  n_ab + n_ba AS n_total,
        |  ROUND(CAST(n_ab - n_ba AS DOUBLE)
        |    / CAST(n_ab + n_ba AS DOUBLE) * 10000) / 10000
        |    AS asymmetry
        |FROM g WHERE n_ab + n_ba >= 3
        |ORDER BY a_lat, a_lon, b_lat, b_lon""".stripMargin,
    // Same per-user cell counts; same sorted-list c·log2(c) fold.
    "geo_visit_entropy" ->
      """WITH p AS (SELECT user_id,
        |    CAST(floor((CAST(event_id % 1440 AS DOUBLE) / 8 - 90) / 2)
        |      AS BIGINT) AS cla,
        |    CAST(floor((CAST((user_id * 997 + event_id * 31) % 11520
        |      AS DOUBLE) / 32 - 180) / 2) AS BIGINT) AS clo
        |  FROM events),
        |cells AS (SELECT user_id, cla, clo, count(*) AS c FROM p
        |  GROUP BY 1, 2, 3),
        |g AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_fixes,
        |    count(*) AS n_cells, list_sort(list(c)) AS cs
        |  FROM cells GROUP BY 1)
        |SELECT user_id, n_fixes, n_cells,
        |  ROUND((log2(n_fixes)
        |    - list_aggregate(list_transform(cs, x -> x * log2(x)),
        |        'sum') / n_fixes) * 10000) / 10000 AS entropy_bits,
        |  CASE WHEN n_cells > 1 THEN
        |    ROUND((log2(n_fixes)
        |      - list_aggregate(list_transform(cs, x -> x * log2(x)),
        |          'sum') / n_fixes) / log2(n_cells) * 10000) / 10000
        |  ELSE 0.0 END AS entropy_norm
        |FROM g ORDER BY user_id""".stripMargin,
    // Same exact min/max envelope and product.
    // Same modal-cell argmax under the identical total order.
    "geo_anchor_cell" ->
      """WITH p AS (SELECT user_id,
        |    CAST(floor((CAST(event_id % 1440 AS DOUBLE) / 8 - 90) / 2)
        |      AS BIGINT) AS cla,
        |    CAST(floor((CAST((user_id * 997 + event_id * 31) % 11520
        |      AS DOUBLE) / 32 - 180) / 2) AS BIGINT) AS clo
        |  FROM events),
        |cells AS (SELECT user_id, cla, clo, count(*) AS n FROM p
        |  GROUP BY 1, 2, 3),
        |tot AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS n_fixes,
        |    count(*) AS n_cells FROM cells GROUP BY 1),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY n DESC, cla, clo) AS rk FROM cells)
        |SELECT r.user_id, r.cla AS anchor_cell_lat,
        |  r.clo AS anchor_cell_lon, r.n AS n_fixes_at_anchor,
        |  t.n_fixes, t.n_cells,
        |  ROUND(CAST(r.n AS DOUBLE) / CAST(t.n_fixes AS DOUBLE)
        |    * 10000) / 10000 AS anchor_share
        |FROM rk r JOIN tot t ON t.user_id = r.user_id
        |WHERE r.rk = 1 ORDER BY r.user_id""".stripMargin,
    // Same lead-window transitions, bounded top-20 total order.
    "geo_cell_flows" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CAST(floor((CAST(event_id % 1440 AS DOUBLE) / 8 - 90) / 2)
        |      AS BIGINT) AS cla,
        |    CAST(floor((CAST((user_id * 997 + event_id * 31) % 11520
        |      AS DOUBLE) / 32 - 180) / 2) AS BIGINT) AS clo
        |  FROM events),
        |l AS (SELECT user_id, cla, clo,
        |    lead(cla) OVER w AS nla, lead(clo) OVER w AS nlo
        |  FROM p WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ms, event_id)),
        |f AS (SELECT cla AS from_lat, clo AS from_lon,
        |    nla AS to_lat, nlo AS to_lon, count(*) AS n_transitions
        |  FROM l WHERE nla IS NOT NULL
        |    AND (nla <> cla OR nlo <> clo)
        |  GROUP BY 1, 2, 3, 4),
        |t AS (SELECT CAST(sum(n_transitions) AS BIGINT) AS ntot FROM f)
        |SELECT from_lat, from_lon, to_lat, to_lon, n_transitions,
        |  ROUND(CAST(n_transitions AS DOUBLE) / CAST(ntot AS DOUBLE)
        |    * 10000) / 10000 AS share
        |FROM f CROSS JOIN t
        |ORDER BY n_transitions DESC, from_lat, from_lon, to_lat,
        |  to_lon LIMIT 20""".stripMargin,
    // Same integer dot sign, micro-snapped cosine, zero-leg drop
    // before pairing.
    "geo_bearing_change_stats" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    (user_id * 997 + event_id * 31) % 11520 AS x,
        |    event_id % 1440 AS y FROM events),
        |l0 AS (SELECT user_id, ms, event_id,
        |    lead(x) OVER w - x AS dx, lead(y) OVER w - y AS dy
        |  FROM p WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ms, event_id)),
        |legs AS (SELECT * FROM l0 WHERE dx IS NOT NULL
        |  AND NOT (dx = 0 AND dy = 0)),
        |pr AS (SELECT user_id, dx, dy,
        |    lead(dx) OVER w AS ndx, lead(dy) OVER w AS ndy
        |  FROM legs WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ms, event_id)),
        |t AS (SELECT user_id,
        |    dx * ndx + 16 * dy * ndy AS s,
        |    CAST(round(CAST(dx * ndx + 16 * dy * ndy AS DOUBLE)
        |      / (sqrt(CAST(dx * dx + 16 * dy * dy AS DOUBLE))
        |        * sqrt(CAST(ndx * ndx + 16 * ndy * ndy AS DOUBLE)))
        |      * 1000000.0) AS BIGINT) AS c6
        |  FROM pr WHERE ndx IS NOT NULL)
        |SELECT user_id, count(*) AS n_turns,
        |  count(*) FILTER (WHERE s < 0) AS n_sharp,
        |  ROUND(CAST(count(*) FILTER (WHERE s < 0) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) * 10000) / 10000
        |    AS share_sharp,
        |  ROUND(CAST(CAST(sum(c6) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) / 1000000.0 * 10000) / 10000
        |    AS mean_turn_cos
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Same integer-grid steps; percentile_disc picks the same
    // bit-identical double element.
    "geo_step_length_percentiles" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    (user_id * 997 + event_id * 31) % 11520 AS x,
        |    event_id % 1440 AS y FROM events),
        |l AS (SELECT user_id, x, y,
        |    lead(x) OVER w AS nx, lead(y) OVER w AS ny
        |  FROM p WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ms, event_id)),
        |st AS (SELECT user_id,
        |    sqrt(CAST((nx - x) * (nx - x) AS DOUBLE) / 1024.0
        |      + CAST((ny - y) * (ny - y) AS DOUBLE) / 64.0) AS step
        |  FROM l WHERE nx IS NOT NULL)
        |SELECT user_id, count(*) AS n_steps,
        |  ROUND(percentile_disc(0.5) WITHIN GROUP (ORDER BY step)
        |    * 10000) / 10000 + 0.0 AS p50_step_deg,
        |  ROUND(percentile_disc(0.9) WITHIN GROUP (ORDER BY step)
        |    * 10000) / 10000 + 0.0 AS p90_step_deg,
        |  ROUND(max(step) * 10000) / 10000 + 0.0 AS max_step_deg
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Same exact centered second moments on the integer grid; the
    // identical sqrt edge.
    "geo_radius_of_gyration" ->
      """WITH p AS (SELECT user_id,
        |    (user_id * 997 + event_id * 31) % 11520 AS x,
        |    event_id % 1440 AS y FROM events),
        |a AS (SELECT user_id, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM p GROUP BY 1)
        |SELECT user_id, n AS n_fixes,
        |  ROUND((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 8.0 - 90.0)
        |    * 10000) / 10000 + 0.0 AS centroid_lat,
        |  ROUND((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 32.0 - 180.0)
        |    * 10000) / 10000 + 0.0 AS centroid_lon,
        |  ROUND(sqrt(
        |    CAST(n * sxx - sx * sx AS DOUBLE)
        |      / CAST(n * n AS DOUBLE) / 1024.0
        |    + CAST(n * syy - sy * sy AS DOUBLE)
        |      / CAST(n * n AS DOUBLE) / 64.0) * 10000) / 10000
        |    AS rg_deg
        |FROM a ORDER BY user_id""".stripMargin,
    // Same slope-extremum hull test on the same integer grid; LEFT
    // self-join per user, HUGEINT casts on the BIGINT sums, identical
    // micro-snapped edge lengths and /512 area edge.
    "geo_convex_hull_area" ->
      """WITH p AS (SELECT DISTINCT user_id,
        |    (user_id * 997 + event_id * 31) % 11520 AS x,
        |    event_id % 1440 AS y FROM events),
        |hi AS (SELECT user_id, x, max(y) AS y FROM p GROUP BY 1, 2),
        |lo AS (SELECT user_id, x, min(y) AS y FROM p GROUP BY 1, 2),
        |uj AS (SELECT a.user_id, a.x, a.y,
        |    min(CASE WHEN b.x < a.x THEN
        |      CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
        |      END) AS lsl_min,
        |    max(CASE WHEN b.x > a.x THEN
        |      CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
        |      END) AS rsl_max
        |  FROM hi a LEFT JOIN hi b
        |    ON a.user_id = b.user_id AND a.x <> b.x
        |  GROUP BY 1, 2, 3),
        |up AS (SELECT user_id, x, y FROM uj
        |  WHERE lsl_min IS NULL OR rsl_max IS NULL
        |    OR lsl_min >= rsl_max),
        |lj AS (SELECT a.user_id, a.x, a.y,
        |    max(CASE WHEN b.x < a.x THEN
        |      CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
        |      END) AS lsl_max,
        |    min(CASE WHEN b.x > a.x THEN
        |      CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
        |      END) AS rsl_min
        |  FROM lo a LEFT JOIN lo b
        |    ON a.user_id = b.user_id AND a.x <> b.x
        |  GROUP BY 1, 2, 3),
        |dn AS (SELECT user_id, x, y FROM lj
        |  WHERE lsl_max IS NULL OR rsl_min IS NULL
        |    OR lsl_max <= rsl_min),
        |ue0 AS (SELECT user_id, x, y, lead(x) OVER w AS nx,
        |    lead(y) OVER w AS ny FROM up
        |  WINDOW w AS (PARTITION BY user_id ORDER BY x)),
        |ue AS (SELECT user_id,
        |    CAST(sum((nx - x) * (y + ny)) AS BIGINT) AS ua2,
        |    CAST(sum(CAST(ROUND(sqrt(
        |      CAST((nx - x) * (nx - x) AS DOUBLE) / 1024.0
        |      + CAST((ny - y) * (ny - y) AS DOUBLE) / 64.0)
        |      * 1000000.0) AS BIGINT)) AS BIGINT) AS ulen6
        |  FROM ue0 WHERE nx IS NOT NULL GROUP BY 1),
        |le0 AS (SELECT user_id, x, y, lead(x) OVER w AS nx,
        |    lead(y) OVER w AS ny FROM dn
        |  WINDOW w AS (PARTITION BY user_id ORDER BY x)),
        |le AS (SELECT user_id,
        |    CAST(sum((nx - x) * (y + ny)) AS BIGINT) AS la2,
        |    CAST(sum(CAST(ROUND(sqrt(
        |      CAST((nx - x) * (nx - x) AS DOUBLE) / 1024.0
        |      + CAST((ny - y) * (ny - y) AS DOUBLE) / 64.0)
        |      * 1000000.0) AS BIGINT)) AS BIGINT) AS llen6
        |  FROM le0 WHERE nx IS NOT NULL GROUP BY 1),
        |vt AS (SELECT h.user_id, h.x, h.y - l.y AS dy
        |  FROM hi h JOIN lo l USING (user_id, x)),
        |bd AS (SELECT user_id, min(x) AS x0, max(x) AS x1
        |  FROM vt GROUP BY 1),
        |vl AS (SELECT v.user_id,
        |    CAST(sum(CASE WHEN v.x = b.x0 THEN v.dy * 125000
        |        ELSE 0 END
        |      + CASE WHEN v.x = b.x1 THEN v.dy * 125000
        |        ELSE 0 END) AS BIGINT) AS vlen6
        |  FROM vt v JOIN bd b ON v.user_id = b.user_id GROUP BY 1),
        |hv AS (SELECT user_id, count(*) AS n_hull_vertices FROM
        |    (SELECT DISTINCT user_id, x, y FROM
        |      (SELECT * FROM up UNION ALL SELECT * FROM dn))
        |  GROUP BY 1)
        |SELECT hv.user_id, hv.n_hull_vertices,
        |  ROUND(CAST(COALESCE(ue.ua2, 0) - COALESCE(le.la2, 0)
        |      AS DOUBLE) / 512.0 * 10000) / 10000 + 0.0 AS hull_deg2,
        |  ROUND(CAST(COALESCE(ue.ulen6, 0) + COALESCE(le.llen6, 0)
        |      + vl.vlen6 AS DOUBLE) / 1000000.0 * 10000) / 10000 + 0.0
        |    AS hull_perimeter_deg
        |FROM hv LEFT JOIN ue ON ue.user_id = hv.user_id
        |LEFT JOIN le ON le.user_id = hv.user_id
        |JOIN vl ON vl.user_id = hv.user_id
        |ORDER BY hv.user_id""".stripMargin,
    "geo_track_bbox" ->
      """WITH p AS (SELECT user_id,
        |    CAST(event_id % 1440 AS DOUBLE) / 8 - 90 AS lat,
        |    CAST((user_id * 997 + event_id * 31) % 11520 AS DOUBLE)
        |      / 32 - 180 AS lon
        |  FROM events)
        |SELECT user_id, count(*) AS n_fixes,
        |  min(lat) AS lat_min, max(lat) AS lat_max,
        |  min(lon) AS lon_min, max(lon) AS lon_max,
        |  ROUND((max(lat) - min(lat)) * (max(lon) - min(lon))
        |    * 10000) / 10000 AS bbox_deg2
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Same exact-comparison CASE cascade (no trig).
    "geo_heading_sectors" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |    CAST(event_id % 1440 AS DOUBLE) / 8 - 90 AS lat,
        |    CAST((user_id * 997 + event_id * 31) % 11520 AS DOUBLE)
        |      / 32 - 180 AS lon
        |  FROM events),
        |lg AS (SELECT lat, lon,
        |    lead(lat) OVER w AS nlat, lead(lon) OVER w AS nlon
        |  FROM p WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ms, event_id)),
        |d AS (SELECT nlon - lon AS dx, nlat - lat AS dy FROM lg
        |  WHERE nlat IS NOT NULL
        |    AND NOT (nlon - lon = 0.0 AND nlat - lat = 0.0)),
        |s AS (SELECT CASE
        |    WHEN dy > 0 AND dx >= 0 AND dy >= dx THEN 'NNE'
        |    WHEN dx > 0 AND dy >= 0 THEN 'ENE'
        |    WHEN dx > 0 AND dx >= -dy THEN 'ESE'
        |    WHEN dx >= 0 AND dy < 0 THEN 'SSE'
        |    WHEN dy < 0 AND -dy >= -dx THEN 'SSW'
        |    WHEN dx < 0 AND dy <= 0 THEN 'WSW'
        |    WHEN dx < 0 AND -dx >= dy THEN 'WNW'
        |    ELSE 'NNW' END AS sector
        |  FROM d),
        |h AS (SELECT sector, count(*) AS n_legs FROM s GROUP BY 1),
        |t AS (SELECT CAST(sum(n_legs) AS BIGINT) AS ntot FROM h)
        |SELECT sector, n_legs,
        |  ROUND(CAST(n_legs AS DOUBLE) / CAST(ntot AS DOUBLE)
        |    * 10000) / 10000 AS share
        |FROM h CROSS JOIN t ORDER BY sector""".stripMargin,
    // Same lead window and earlier-fix cell attribution.
    "geo_cell_dwell" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |    CAST(event_id % 1440 AS DOUBLE) / 8 - 90 AS lat,
        |    CAST((user_id * 997 + event_id * 31) % 11520 AS DOUBLE)
        |      / 32 - 180 AS lon
        |  FROM events),
        |lg AS (SELECT *, lead(ms) OVER (PARTITION BY user_id
        |    ORDER BY ms, event_id) AS nxt FROM p),
        |d AS (SELECT CAST(floor(lat / 2) AS BIGINT) AS cell_lat,
        |    CAST(floor(lon / 2) AS BIGINT) AS cell_lon,
        |    nxt - ms AS dwell
        |  FROM lg WHERE nxt IS NOT NULL)
        |SELECT cell_lat, cell_lon, count(*) AS n_legs,
        |  CAST(sum(dwell) AS BIGINT) AS dwell_ms,
        |  ROUND(CAST(CAST(sum(dwell) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) * 10000) / 10000
        |    AS avg_dwell_ms
        |FROM d GROUP BY 1, 2
        |ORDER BY cell_lat, cell_lon""".stripMargin,
    "geo_grid_density" ->
      """WITH p AS (SELECT
        |    CAST(event_id % 1440 AS DOUBLE) / 8 - 90 AS lat,
        |    CAST((user_id * 997 + event_id * 31) % 11520 AS DOUBLE)
        |      / 32 - 180 AS lon,
        |    user_id
        |  FROM events)
        |SELECT CAST(floor(lat / 2) AS BIGINT) AS cell_lat,
        |  CAST(floor(lon / 2) AS BIGINT) AS cell_lon,
        |  count(*) AS n_sightings,
        |  count(DISTINCT user_id) AS n_platforms
        |FROM p GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY cell_lat, cell_lon""".stripMargin,
    "geo_track_length" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |    CAST(event_id % 1440 AS DOUBLE) / 8 - 90 AS lat,
        |    CAST((user_id * 997 + event_id * 31) % 11520 AS DOUBLE)
        |      / 32 - 180 AS lon
        |  FROM events),
        |lg AS (SELECT user_id, lat, lon,
        |    lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |k AS (SELECT user_id,
        |    sin((lat - plat) * pi() / 180 / 2)
        |      * sin((lat - plat) * pi() / 180 / 2)
        |    + cos(plat * pi() / 180) * cos(lat * pi() / 180)
        |      * sin((lon - plon) * pi() / 180 / 2)
        |      * sin((lon - plon) * pi() / 180 / 2) AS a
        |  FROM lg WHERE plat IS NOT NULL)
        |SELECT user_id, count(*) AS n_legs,
        |  ROUND(sum(2.0 * 6371.0
        |      * atan2(sqrt(a), sqrt(greatest(0.0, 1.0 - a))))
        |    * 10000) / 10000 AS track_km
        |FROM k GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Same lag-flag segmentation: window sums of the integer brk flag
    // go HUGEINT in DuckDB → CAST back; the breaking leg is excluded
    // from seg_km on both engines; empty leg sets coalesce to 0.0.
    "geo_track_sessions" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |    CAST(event_id % 1440 AS DOUBLE) / 8 - 90 AS lat,
        |    CAST((user_id * 997 + event_id * 31) % 11520 AS DOUBLE)
        |      / 32 - 180 AS lon
        |  FROM events),
        |lg AS (SELECT event_id, user_id, ms, lat, lon,
        |    lag(ms) OVER w AS pms,
        |    lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |k AS (SELECT event_id, user_id, ms, pms,
        |    sin((lat - plat) * pi() / 180 / 2)
        |      * sin((lat - plat) * pi() / 180 / 2)
        |    + cos(plat * pi() / 180) * cos(lat * pi() / 180)
        |      * sin((lon - plon) * pi() / 180 / 2)
        |      * sin((lon - plon) * pi() / 180 / 2) AS a
        |  FROM lg),
        |b AS (SELECT event_id, user_id, ms,
        |    CASE WHEN pms IS NULL THEN CAST(NULL AS DOUBLE)
        |      ELSE 2.0 * 6371.0
        |        * atan2(sqrt(a), sqrt(greatest(0.0, 1.0 - a))) END
        |      AS leg_km,
        |    CASE WHEN pms IS NULL OR ms - pms > 86400000
        |      OR 2.0 * 6371.0
        |        * atan2(sqrt(a), sqrt(greatest(0.0, 1.0 - a)))
        |        > 15000.0
        |      THEN 1 ELSE 0 END AS brk
        |  FROM k),
        |s AS (SELECT user_id, ms, leg_km, brk,
        |    CAST(sum(brk) OVER (PARTITION BY user_id
        |      ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS seg
        |  FROM b)
        |SELECT user_id, seg, count(*) AS n_sightings,
        |  min(ms) AS start_ms, max(ms) AS end_ms,
        |  ROUND(COALESCE(sum(CASE WHEN brk = 0 THEN leg_km END), 0.0)
        |    * 10000) / 10000 AS seg_km
        |FROM s GROUP BY user_id, seg
        |ORDER BY user_id, seg""".stripMargin,
    // The oracle takes the DIRECT theta join (25 zones × points is
    // oracle-scale); the declared key's grid bucketing must give the
    // identical answer — that equivalence IS the test.
    "geo_zone_join" ->
      """WITH z AS (SELECT CAST(n_nationkey AS BIGINT) AS zone_id,
        |    CAST((n_nationkey % 12) * 15 - 90 AS BIGINT) AS lat_lo,
        |    CAST((n_nationkey * 7 % 24) * 15 - 180 AS BIGINT) AS lon_lo
        |  FROM nation),
        |zz AS (SELECT zone_id, lat_lo, lon_lo,
        |    lat_lo + 10 AS lat_hi, lon_lo + 20 AS lon_hi FROM z),
        |p AS (SELECT event_id, user_id,
        |    CAST(event_id % 1440 AS DOUBLE) / 8 - 90 AS lat,
        |    CAST((user_id * 997 + event_id * 31) % 11520 AS DOUBLE)
        |      / 32 - 180 AS lon
        |  FROM events)
        |SELECT zone_id, lat_lo, lon_lo,
        |  count(p.event_id) AS n_sightings,
        |  count(DISTINCT p.user_id) AS n_platforms
        |FROM zz LEFT JOIN p
        |  ON p.lat >= lat_lo AND p.lat < lat_hi
        |  AND p.lon >= lon_lo AND p.lon < lon_hi
        |GROUP BY 1, 2, 3 ORDER BY zone_id""".stripMargin,
    // The oracle gathers (self-join on |Δ| ≤ 1); the declared key
    // scatters — identical answers, different scale shapes.
    "geo_grid_smooth" ->
      """WITH p AS (SELECT
        |    CAST(event_id % 1440 AS DOUBLE) / 8 - 90 AS lat,
        |    CAST((user_id * 997 + event_id * 31) % 11520 AS DOUBLE)
        |      / 32 - 180 AS lon
        |  FROM events),
        |base AS (SELECT CAST(floor(lat / 2) AS BIGINT) AS cell_lat,
        |    CAST(floor(lon / 2) AS BIGINT) AS cell_lon,
        |    count(*) AS n_raw
        |  FROM p GROUP BY 1, 2)
        |SELECT b.cell_lat, b.cell_lon, b.n_raw,
        |  CAST(sum(n.n_raw) AS BIGINT) AS n_smooth
        |FROM base b JOIN base n
        |  ON abs(n.cell_lat - b.cell_lat) <= 1
        |  AND abs(n.cell_lon - b.cell_lon) <= 1
        |GROUP BY 1, 2, 3
        |ORDER BY b.cell_lat, b.cell_lon""".stripMargin,
    // Gather-form neighborhood sums; the n-scaled z uses only exact
    // integer operands, sqrt/division spelled identically.
    "geo_hotspot_gi" ->
      """WITH p AS (SELECT
        |    CAST(event_id % 1440 AS DOUBLE) / 8 - 90 AS lat,
        |    CAST((user_id * 997 + event_id * 31) % 11520 AS DOUBLE)
        |      / 32 - 180 AS lon
        |  FROM events),
        |base AS (SELECT CAST(floor(lat / 2) AS BIGINT) AS cell_lat,
        |    CAST(floor(lon / 2) AS BIGINT) AS cell_lon,
        |    count(*) AS x
        |  FROM p GROUP BY 1, 2),
        |nb AS (SELECT b.cell_lat, b.cell_lon, b.x,
        |    CAST(sum(n.x) AS BIGINT) AS s_i,
        |    count(*) AS w_i
        |  FROM base b JOIN base n
        |    ON abs(n.cell_lat - b.cell_lat) <= 1
        |    AND abs(n.cell_lon - b.cell_lon) <= 1
        |  GROUP BY 1, 2, 3),
        |g AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM base)
        |SELECT cell_lat, cell_lon, x, w_i, s_i,
        |  CASE WHEN n > 1 AND n * sxx > sx * sx
        |      AND n * w_i > w_i * w_i THEN
        |    ROUND(CAST(n * s_i - w_i * sx AS DOUBLE)
        |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |        * sqrt(CAST(n * w_i - w_i * w_i AS DOUBLE)
        |          / CAST(n - 1 AS DOUBLE))) * 10000) / 10000 + 0.0
        |  END AS z_gi
        |FROM nb CROSS JOIN g
        |ORDER BY cell_lat, cell_lon""".stripMargin,
    // Same one-pass bidirectional IGNORE NULLS window device; the
    // interpolation weight and multiply-adds spelled
    // operand-for-operand with the Spark plan.
    "geo_gps_interpolate" ->
      """WITH p AS (SELECT event_id, user_id, event_type,
        |    epoch_ms(ts) AS ms,
        |    CAST(event_id % 1440 AS DOUBLE) / 8 - 90 AS lat,
        |    CAST((user_id * 997 + event_id * 31) % 11520 AS DOUBLE)
        |      / 32 - 180 AS lon
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |k AS (SELECT *, CASE WHEN event_type = 'click' THEN 0 ELSE 1
        |    END AS kind FROM p),
        |w AS (SELECT event_id, user_id, ms, kind,
        |    last_value(CASE WHEN kind = 0 THEN ms END IGNORE NULLS)
        |      OVER wb AS pms,
        |    last_value(CASE WHEN kind = 0 THEN lat END IGNORE NULLS)
        |      OVER wb AS plat,
        |    last_value(CASE WHEN kind = 0 THEN lon END IGNORE NULLS)
        |      OVER wb AS plon,
        |    first_value(CASE WHEN kind = 0 THEN ms END IGNORE NULLS)
        |      OVER wf AS nms,
        |    first_value(CASE WHEN kind = 0 THEN lat END IGNORE NULLS)
        |      OVER wf AS nlat,
        |    first_value(CASE WHEN kind = 0 THEN lon END IGNORE NULLS)
        |      OVER wf AS nlon
        |  FROM k
        |  WINDOW wb AS (PARTITION BY user_id
        |      ORDER BY ms, kind, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    wf AS (PARTITION BY user_id ORDER BY ms, kind, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |d AS (SELECT * FROM w WHERE kind = 1
        |  AND (pms IS NOT NULL OR nms IS NOT NULL))
        |SELECT event_id, user_id, ms,
        |  ROUND(CASE
        |    WHEN pms IS NOT NULL AND nms IS NOT NULL AND nms > pms THEN
        |      plat + (nlat - plat) * (CAST(ms - pms AS DOUBLE)
        |        / CAST(nms - pms AS DOUBLE))
        |    WHEN pms IS NOT NULL THEN plat
        |    ELSE nlat END * 10000) / 10000 + 0.0 AS lat_i,
        |  ROUND(CASE
        |    WHEN pms IS NOT NULL AND nms IS NOT NULL AND nms > pms THEN
        |      plon + (nlon - plon) * (CAST(ms - pms AS DOUBLE)
        |        / CAST(nms - pms AS DOUBLE))
        |    WHEN pms IS NOT NULL THEN plon
        |    ELSE nlon END * 10000) / 10000 + 0.0 AS lon_i,
        |  CASE WHEN pms IS NOT NULL AND nms IS NOT NULL THEN 'interp'
        |       WHEN pms IS NOT NULL THEN 'hold_prev'
        |       ELSE 'hold_next' END AS method
        |FROM d ORDER BY event_id""".stripMargin,
    // Integer-unit NN (exact BIGINT d², (d², id) row_number argmin);
    // only the reported degree distance divides/sqrts.
    "geo_nn_screening" ->
      """WITH p AS (SELECT event_id, user_id,
        |    (event_id % 1440) * 4 AS ulat,
        |    (user_id * 997 + event_id * 31) % 11520 AS ulon,
        |    (event_id % 1440) // 16 AS cell_lat,
        |    ((user_id * 997 + event_id * 31) % 11520) // 64 AS cell_lon
        |  FROM events),
        |cand AS (SELECT p.cell_lat + di AS cell_lat,
        |    p.cell_lon + dj AS cell_lon,
        |    event_id AS cand_id, user_id AS cand_user,
        |    ulat AS clat, ulon AS clon
        |  FROM p, LATERAL (SELECT unnest(range(-1, 2)) AS di),
        |    LATERAL (SELECT unnest(range(-1, 2)) AS dj)),
        |pairs AS (SELECT a.event_id, a.user_id, c.cand_id, c.cand_user,
        |    (a.ulat - c.clat) * (a.ulat - c.clat)
        |      + (a.ulon - c.clon) * (a.ulon - c.clon) AS d2
        |  FROM p a JOIN cand c USING (cell_lat, cell_lon)
        |  WHERE a.event_id <> c.cand_id),
        |rk AS (SELECT event_id, user_id, cand_id, cand_user, d2,
        |    row_number() OVER (PARTITION BY event_id
        |      ORDER BY d2, cand_id) AS r
        |  FROM pairs)
        |SELECT event_id, cand_id AS nn_event_id,
        |  CAST(d2 AS BIGINT) AS d2_units,
        |  cand_user <> user_id AS cross_platform,
        |  ROUND(sqrt(CAST(d2 AS DOUBLE)) / 32.0 * 10000) / 10000
        |    AS nn_deg
        |FROM rk WHERE r = 1 ORDER BY event_id""".stripMargin,
    // Same leg sum and rank-endpoint net haversine; sinuosity null on
    // coincident endpoints.
    "geo_sinuosity" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |    CAST(event_id % 1440 AS DOUBLE) / 8 - 90 AS lat,
        |    CAST((user_id * 997 + event_id * 31) % 11520 AS DOUBLE)
        |      / 32 - 180 AS lon
        |  FROM events),
        |lg AS (SELECT user_id, lat, lon,
        |    lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |k AS (SELECT user_id,
        |    sin((lat - plat) * pi() / 180 / 2)
        |      * sin((lat - plat) * pi() / 180 / 2)
        |    + cos(plat * pi() / 180) * cos(lat * pi() / 180)
        |      * sin((lon - plon) * pi() / 180 / 2)
        |      * sin((lon - plon) * pi() / 180 / 2) AS a
        |  FROM lg WHERE plat IS NOT NULL),
        |legs AS (SELECT user_id, count(*) AS n_legs,
        |    sum(2.0 * 6371.0
        |      * atan2(sqrt(a), sqrt(greatest(0.0, 1.0 - a)))) AS path0
        |  FROM k GROUP BY user_id),
        |ends AS (SELECT user_id, lat, lon,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ms, event_id) AS ra,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ms DESC, event_id DESC) AS rd
        |  FROM p),
        |fl AS (SELECT f.user_id, f.lat AS flat, f.lon AS flon,
        |    l.lat AS llat, l.lon AS llon
        |  FROM (SELECT * FROM ends WHERE ra = 1) f
        |  JOIN (SELECT * FROM ends WHERE rd = 1) l USING (user_id)),
        |net AS (SELECT user_id,
        |    2.0 * 6371.0 * atan2(sqrt(a),
        |      sqrt(greatest(0.0, 1.0 - a))) AS net0
        |  FROM (SELECT user_id,
        |      sin((llat - flat) * pi() / 180 / 2)
        |        * sin((llat - flat) * pi() / 180 / 2)
        |      + cos(flat * pi() / 180) * cos(llat * pi() / 180)
        |        * sin((llon - flon) * pi() / 180 / 2)
        |        * sin((llon - flon) * pi() / 180 / 2) AS a, user_id
        |    FROM fl))
        |SELECT legs.user_id, n_legs,
        |  ROUND(path0 * 10000) / 10000 AS track_km,
        |  ROUND(net0 * 10000) / 10000 AS net_km,
        |  CASE WHEN net0 > 0
        |    THEN ROUND(path0 / net0 * 10000) / 10000 END AS sinuosity
        |FROM legs JOIN net ON legs.user_id = net.user_id
        |ORDER BY legs.user_id""".stripMargin,
    // Same adaptive core cut and 5 unrolled min-label rounds over the
    // bounded cell table.
    "geo_dbscan_cells" -> {
      val prelude =
        """WITH p AS (SELECT
          |    CAST(event_id % 1440 AS DOUBLE) / 8 - 90 AS lat,
          |    CAST((user_id * 997 + event_id * 31) % 11520 AS DOUBLE)
          |      / 32 - 180 AS lon
          |  FROM events),
          |cells AS (SELECT CAST(floor(lat / 2) AS BIGINT) AS cla,
          |    CAST(floor(lon / 2) AS BIGINT) AS clo, count(*) AS n
          |  FROM p GROUP BY 1, 2),
          |mean AS (SELECT CAST(sum(n) * 2 AS BIGINT) AS num,
          |    count(*) AS den FROM cells),
          |core AS MATERIALIZED (SELECT cla, clo, n,
          |    (cla + 90) * 1000 + clo + 180 AS key
          |  FROM cells, mean WHERE n * den >= num),
          |adj AS MATERIALIZED (SELECT c.key, s.nb_key
          |  FROM core c JOIN (SELECT cla + di AS cla, clo + dj AS clo,
          |      key AS nb_key
          |    FROM core,
          |      (SELECT unnest(range(-1, 2)) AS di),
          |      (SELECT unnest(range(-1, 2)) AS dj)) s
          |    ON s.cla = c.cla AND s.clo = c.clo),
          |l0 AS (SELECT key, key AS lbl FROM core)""".stripMargin
      val rounds = (1 to 5).map { i =>
        s"""l$i AS MATERIALIZED (SELECT a.key, min(p.lbl) AS lbl
           |  FROM adj a JOIN l${i - 1} p ON p.key = a.nb_key
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"$prelude,\n$rounds\n" +
        """SELECT lbl AS cluster_id, count(*) AS n_cells,
          |  CAST(sum(n) AS BIGINT) AS n_sightings,
          |  min(cla) AS min_cla, max(cla) AS max_cla,
          |  min(clo) AS min_clo, max(clo) AS max_clo
          |FROM l5 JOIN core USING (key)
          |GROUP BY lbl ORDER BY cluster_id""".stripMargin
    },
    // Same integer d² to cell centers, floor-snapped 10⁻⁹ weights,
    // HUGEINT sum.
    "geo_kde_cells" ->
      """WITH pts AS (SELECT (event_id % 1440) * 4 AS ulat,
        |    (user_id * 997 + event_id * 31) % 11520 AS ulon,
        |    (event_id % 1440) // 16 AS cla,
        |    ((user_id * 997 + event_id * 31) % 11520) // 64 AS clo
        |  FROM events),
        |c AS (SELECT cla + di AS cell_lat, clo + dj AS cell_lon,
        |    ulat, ulon
        |  FROM pts, (SELECT unnest(range(-1, 2)) AS di),
        |    (SELECT unnest(range(-1, 2)) AS dj)),
        |w AS (SELECT cell_lat, cell_lon,
        |    CAST(floor(exp(-CAST(
        |      (ulat - (cell_lat * 64 + 32)) * (ulat - (cell_lat * 64 + 32))
        |      + (ulon - (cell_lon * 64 + 32)) * (ulon - (cell_lon * 64 + 32))
        |      AS DOUBLE) / 8192.0) * 1.0e9) AS BIGINT) AS w9
        |  FROM c)
        |SELECT cell_lat, cell_lon, count(*) AS n_contrib,
        |  ROUND(CAST(CAST(sum(w9) AS DECIMAL(38,0)) AS DOUBLE) / 1.0e9
        |    * 10000) / 10000 AS density
        |FROM w GROUP BY 1, 2 ORDER BY cell_lat, cell_lon""".stripMargin,
    // Same midpoint split, HUGEINT moments, sd/z chains spelled
    // operand-for-operand.
    "geo_emerging_cells" ->
      """WITH p AS (SELECT
        |    CAST(floor((CAST(event_id % 1440 AS DOUBLE) / 8 - 90) / 2)
        |      AS BIGINT) AS cla,
        |    CAST(floor((CAST((user_id * 997 + event_id * 31) % 11520
        |      AS DOUBLE) / 32 - 180) / 2) AS BIGINT) AS clo,
        |    epoch_ms(ts) // 86400000 AS day
        |  FROM events),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM p),
        |counts AS (SELECT cla, clo,
        |    CAST(sum(CASE WHEN day * 2 < lo + hi THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN day * 2 < lo + hi THEN 0 ELSE 1 END)
        |      AS BIGINT) AS n2
        |  FROM p CROSS JOIN b GROUP BY 1, 2),
        |st AS (SELECT count(*) AS nc,
        |    CAST(sum(n1) AS HUGEINT) AS s1,
        |    CAST(sum(n2) AS HUGEINT) AS s2,
        |    CAST(sum(CAST(n1 AS HUGEINT) * n1) AS HUGEINT) AS ss1,
        |    CAST(sum(CAST(n2 AS HUGEINT) * n2) AS HUGEINT) AS ss2
        |  FROM counts),
        |z AS (SELECT cla, clo, n1, n2,
        |    CAST(n1 * nc - s1 AS DOUBLE) / CAST(nc AS DOUBLE)
        |      / (sqrt(CAST(nc * ss1 - s1 * s1 AS DOUBLE))
        |        / CAST(nc AS DOUBLE)) AS z1,
        |    CAST(n2 * nc - s2 AS DOUBLE) / CAST(nc AS DOUBLE)
        |      / (sqrt(CAST(nc * ss2 - s2 * s2 AS DOUBLE))
        |        / CAST(nc AS DOUBLE)) AS z2
        |  FROM counts CROSS JOIN st),
        |c AS (SELECT *,
        |    CASE WHEN z2 >= 1.5 AND z1 >= 1.5 THEN 'persistent'
        |      WHEN z2 >= 1.5 AND z1 < 1.5 THEN 'emerging'
        |      WHEN z1 >= 1.5 AND z2 < 1.5 THEN 'fading' END AS class
        |  FROM z)
        |SELECT cla, clo, n1, n2,
        |  ROUND(z1 * 10000) / 10000 + 0.0 AS z1,
        |  ROUND(z2 * 10000) / 10000 + 0.0 AS z2, class
        |FROM c WHERE class IS NOT NULL
        |ORDER BY cla, clo""".stripMargin)
}
