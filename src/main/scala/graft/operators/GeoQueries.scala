package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{events, epochDay}
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

  val queries: Map[String, Q] = Map(
    // GRID DENSITY MAP (§2.81) — sightings binned to a 2°×2° integer
    // grid: the survey-effort heatmap (where did we look, how often,
    // who). floor() of exact binary coordinates is engine-exact;
    // per-cell stats are one two-phase agg — map-side partials bound
    // the shuffle by |occupied cells| regardless of corpus size.
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
      // Radian conversion spelled (x · π) / 180 / 2 operand-for-operand
      // with the oracle — x · (π/180) differs in the last ulp.
      def halfRad(c: org.apache.spark.sql.Column) =
        c * lit(math.Pi) / 180 / 2
      def rad(c: org.apache.spark.sql.Column) = c * lit(math.Pi) / 180
      val dphi = halfRad(col("lat") - col("plat"))
      val dlam = halfRad(col("lon") - col("plon"))
      val a = sin(dphi) * sin(dphi) +
        cos(rad(col("plat"))) * cos(rad(col("lat"))) *
          sin(dlam) * sin(dlam)
      legs
        .withColumn("leg_km",
          lit(2.0 * 6371.0) * atan2(sqrt(a), sqrt(lit(1.0) - a)))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_legs"),
          r4d(sum(col("leg_km"))).as("track_km"))
        .orderBy("user_id")
    }))

  val oracle: Map[String, String] = Map(
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
        |  ROUND(sum(2.0 * 6371.0 * atan2(sqrt(a), sqrt(1.0 - a)))
        |    * 10000) / 10000 AS track_km
        |FROM k GROUP BY user_id ORDER BY user_id""".stripMargin)
}
