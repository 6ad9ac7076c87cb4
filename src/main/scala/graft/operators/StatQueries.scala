package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t, events, epochDay}
import graft.Det.{r4d, sqlEpochDay}

/** §2.74+ Statistical inference + evaluation-metric operators
  * (SURVEY.md, round-10 amendment): the hypothesis-test and
  * model-evaluation surface a data platform grows once analysts move
  * past descriptive aggregates — independence tests on categorical
  * breakdowns, rank correlations robust to monotone transforms, digit
  * forensics, and the classifier/retrieval evaluation metrics every
  * training pipeline reports (confusion tables, exact AUC,
  * calibration).
  *
  * Determinism discipline (§1.3): every statistic is built from EXACT
  * integer counts (contingency cells, concordant/discordant pair
  * counts, leading digits of cents-integers, doubled average ranks —
  * all integers by construction), with the final irrational step
  * (sqrt / log / division) spelled operand-for-operand in both engines
  * and rounded through the multiply-form r4d at the edge. No raw
  * double is ever summed.
  *
  * Scale: each key is aggregate-first — the O(rows) pass reduces to a
  * tiny statistic table (35 contingency cells, ~60 spine days, 9
  * digits, 10 bins) BEFORE any self-join or window, so the quadratic
  * pieces (day-pair joins for Kendall) are O(days²) regardless of
  * corpus size, and every window runs over a driver-scale frame. */
object StatQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Day-of-week as epoch-day mod 7 — engine-neutral (Spark
    * `dayofweek` is 1=Sunday while DuckDB's is 0=Sunday; the mod-7
    * residue of the shared epoch-day convention sidesteps the fence).
    * 1970-01-01 was a Thursday, so residue 0 = Thursday; the label is
    * a bucket id, not a calendar name. */
  private def dow(c: Column): Column = c % 7

  /** The zero-filled (day, clicks, purchases) series on the GLOBAL
    * lo..hi event-day spine — the ts_rolling_corr shape, shared so the
    * rank/concordance keys iterate literally the same series. */
  private def dailyXY(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("event_type"), epochDay("ts").as("day"))
    val perDay = e.groupBy("day")
      .agg(count(when(col("event_type") === "click", 1)).as("cx0"),
        count(when(col("event_type") === "purchase", 1)).as("cy0"))
    val spine = e.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    spine.join(perDay, Seq("day"), "left")
      .select(col("day"), coalesce(col("cx0"), lit(0L)).as("cx"),
        coalesce(col("cy0"), lit(0L)).as("cy"))
  }

  val queries: Map[String, Q] = Map(
    // CHI-SQUARE INDEPENDENCE (§2.74) — is event mix independent of
    // day-of-week? The workhorse categorical test, emitted as the
    // full contingency diagnostic (one row per observed cell with its
    // expected count and chi² contribution) rather than a single
    // opaque statistic — the form a dashboard drills into. Row/col/N
    // totals are window sums over the CELL table (|types|·7 rows), so
    // the corpus is scanned once; expected = r·c/N is an exact BIGINT
    // product (≤ n², far under 2^63 at any plausible per-cell count)
    // pushed through one IEEE division.
    "agg_chi2_independence" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = events(s, dir)
        .select(col("event_type"), dow(epochDay("ts")).as("dow"))
        .groupBy("event_type", "dow").agg(count(lit(1)).as("obs"))
      val wr = Window.partitionBy("event_type")
      val wc = Window.partitionBy("dow")
      val wn = Window.partitionBy()
      val withTotals = cells
        .withColumn("r", sum(col("obs")).over(wr))
        .withColumn("c", sum(col("obs")).over(wc))
        .withColumn("n", sum(col("obs")).over(wn))
      withTotals
        .withColumn("e",
          (col("r") * col("c")).cast("double") / col("n").cast("double"))
        .select(col("event_type"), col("dow"), col("obs"),
          r4d(col("e")).as("expected"),
          r4d((col("obs").cast("double") - col("e"))
            * (col("obs").cast("double") - col("e")) / col("e"))
            .as("chi2_contrib"))
        .orderBy("event_type", "dow")
    }),

    // KENDALL TAU-B (§2.74) — rank concordance between daily click
    // and purchase volume, tie-corrected. Aggregate-first: the
    // O(rows) pass reduces to the shared zero-filled day spine, THEN
    // the O(days²) pair self-join counts concordant / discordant /
    // tied pairs — every count an exact integer, so the only floating
    // steps are one sqrt and one division on BIGINT-exact operands
    // (n0 ≤ days² keeps every product far inside 2^63). The robust
    // complement of ts_rolling_corr's Pearson: invariant under any
    // monotone transform of either series.
    "agg_kendall_tau" -> ((s, dir) => {
      val d = dailyXY(s, dir)
      val a = d.select(col("day").as("d1"), col("cx").as("x1"),
        col("cy").as("y1"))
      val b = d.select(col("day").as("d2"), col("cx").as("x2"),
        col("cy").as("y2"))
      val pairs = a.join(b, col("d1") < col("d2"))
        .select(
          ((col("x2") - col("x1")) * (col("y2") - col("y1"))).as("prod"),
          (col("x1") === col("x2")).as("tx"),
          (col("y1") === col("y2")).as("ty"))
      pairs.agg(
          count(lit(1)).as("n_pairs"),
          count_if(col("prod") > 0).as("concordant"),
          count_if(col("prod") < 0).as("discordant"),
          count_if(col("tx")).as("ties_x"),
          count_if(col("ty")).as("ties_y"))
        .select(col("n_pairs"), col("concordant"), col("discordant"),
          col("ties_x"), col("ties_y"),
          r4d((col("concordant") - col("discordant")).cast("double")
            / sqrt((col("n_pairs") - col("ties_x")).cast("double")
              * (col("n_pairs") - col("ties_y")).cast("double")))
            .as("tau_b"))
    }),

    // BENFORD LEADING-DIGIT PROFILE (§2.74) — first-significant-digit
    // distribution of order totals against Benford's log10(1+1/d)
    // expectation: the classic forensic screen for fabricated or
    // truncated money columns. The digit is extracted from the
    // CENTS-INTEGER's decimal string (integer-to-string is identical
    // cross-engine; double-to-string formatting is NOT — the reason
    // the extraction never touches the raw double). One group-by on a
    // 9-value key; shares are exact-count divisions, the only libm
    // step is log10 of the 9 constants, r4d-rounded.
    "agg_benford_digits" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val digits = t(s, dir, "orders")
        .select(substring(round(col("o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      digits
        .withColumn("total", sum(col("n")).over(Window.partitionBy()))
        .select(col("digit"), col("n"),
          r4d(col("n").cast("double") / col("total").cast("double"))
            .as("share"),
          r4d(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")))
            .as("benford"),
          r4d(col("n").cast("double") / col("total").cast("double")
            - log10(lit(1.0) + lit(1.0) / col("digit").cast("double")))
            .as("excess"))
        .orderBy("digit")
    }))

  val oracle: Map[String, String] = Map(
    "agg_chi2_independence" ->
      s"""WITH cells AS (SELECT event_type,
         |    (${sqlEpochDay("ts")}) % 7 AS dow, count(*) AS obs
         |  FROM events GROUP BY 1, 2),
         |tot AS (SELECT event_type, dow, obs,
         |    CAST(sum(obs) OVER (PARTITION BY event_type) AS BIGINT) AS r,
         |    CAST(sum(obs) OVER (PARTITION BY dow) AS BIGINT) AS c,
         |    CAST(sum(obs) OVER () AS BIGINT) AS n
         |  FROM cells),
         |ex AS (SELECT event_type, dow, obs,
         |    CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE) AS e
         |  FROM tot)
         |SELECT event_type, dow, obs,
         |  ROUND(e * 10000) / 10000 + 0.0 AS expected,
         |  ROUND((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e)
         |    / e * 10000) / 10000 + 0.0 AS chi2_contrib
         |FROM ex ORDER BY event_type, dow""".stripMargin,
    "agg_kendall_tau" ->
      s"""WITH e AS (SELECT event_type, ${sqlEpochDay("ts")} AS day
         |  FROM events),
         |b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
         |spine AS (SELECT unnest(range(lo, hi + 1)) AS day FROM b),
         |d0 AS (SELECT day,
         |    count(*) FILTER (WHERE event_type = 'click') AS cx,
         |    count(*) FILTER (WHERE event_type = 'purchase') AS cy
         |  FROM e GROUP BY day),
         |d AS (SELECT s.day, COALESCE(cx, 0) AS cx, COALESCE(cy, 0) AS cy
         |  FROM spine s LEFT JOIN d0 USING (day)),
         |p AS (SELECT (b2.cx - a.cx) * (b2.cy - a.cy) AS prod,
         |    a.cx = b2.cx AS tx, a.cy = b2.cy AS ty
         |  FROM d a JOIN d b2 ON a.day < b2.day),
         |m AS (SELECT count(*) AS n_pairs,
         |    count(*) FILTER (WHERE prod > 0) AS concordant,
         |    count(*) FILTER (WHERE prod < 0) AS discordant,
         |    count(*) FILTER (WHERE tx) AS ties_x,
         |    count(*) FILTER (WHERE ty) AS ties_y
         |  FROM p)
         |SELECT n_pairs, concordant, discordant, ties_x, ties_y,
         |  ROUND(CAST(concordant - discordant AS DOUBLE)
         |    / sqrt(CAST(n_pairs - ties_x AS DOUBLE)
         |      * CAST(n_pairs - ties_y AS DOUBLE)) * 10000) / 10000
         |    + 0.0 AS tau_b
         |FROM m""".stripMargin,
    "agg_benford_digits" ->
      """WITH d AS (SELECT CAST(substring(CAST(CAST(
        |      ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
        |      AS INT) AS digit, count(*) AS n
        |  FROM orders GROUP BY 1),
        |tt AS (SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS total
        |  FROM d)
        |SELECT digit, n,
        |  ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) * 10000)
        |    / 10000 + 0.0 AS share,
        |  ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 10000)
        |    / 10000 + 0.0 AS benford,
        |  ROUND((CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
        |    - log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) * 10000)
        |    / 10000 + 0.0 AS excess
        |FROM tt ORDER BY digit""".stripMargin)
}
