package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First-class pure-range-join surface (the no-equi-key case): rewrite
  * a point-in-interval join into an EQUI join by binning both sides to
  * fixed-width buckets, so Catalyst plans a hash-partitionable join
  * instead of the O(n·m) BroadcastNestedLoopJoin the naive `s ≤ d ≤ e`
  * predicate produces. The declared `join_range_binned` key runs
  * through here; RangeJoinSpec property-tests binned ≡ naive on random
  * corpora (negative values included).
  *
  * Shape: every point lands in exactly ONE bin, every interval is
  * exploded to EVERY bin its span touches (⌈span/width⌉+1 ≤ 2 rows for
  * width ≥ span) — so each qualifying pair meets in the point's bin
  * exactly once and no post-join dedup is needed. The exact BETWEEN
  * stays as a residual filter on the equi-join output. Candidate
  * volume is Σ_bins |points_b|·|intervals_b| — shuffle-partitionable,
  * AQE-skew-splittable, and sub-quadratic whenever points and
  * intervals spread over many bins. Pick `binWidth` ≥ the typical span
  * (fewer interval duplicates) but small enough that a bin holds a
  * bounded point count; hot bins are ordinary AQE skew.
  */
object RangeJoin {

  /** SQL spelling of a floor division that stays in INTEGER space (the
    * Column-API `/` on longs routes through double, which rounds keys
    * past 2^53 — e.g. epoch-nanos) and floors toward −∞ for negative
    * keys: pmod is always non-negative, so subtracting it lands exactly
    * on a bin boundary, where `div`'s truncation-toward-zero alone
    * would misalign negative keys by one bin. On that exact multiple,
    * truncation and floor agree. */
  private def fdivExpr(e: String, w: Long): String =
    s"(($e) - pmod(($e), ${w}L)) div ${w}L"

  private def fdivSql(name: String, w: Long): String =
    fdivExpr(s"`$name`", w)

  /** All (interval × point) rows with `startCol ≤ pointCol ≤ endCol`,
    * as an equi join on the bin key. Inputs may carry any other
    * columns; both frames must not already contain `__bin`. Intervals
    * with end < start yield nothing (empty ranges, like the naive
    * predicate). `binWidth` > 0. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "pointInInterval reserves column '__bin' — rename the input's")
    // The residual filter references pointCol/startCol/endCol by name,
    // so those specific names shared across sides would fail analysis
    // with AMBIGUOUS_REFERENCE — reject them up front with an
    // actionable message. Other shared names pass through as
    // duplicate-named output columns (the caller's naming to resolve),
    // same as any DataFrame join.
    val shared = (points.columns.toSet intersect intervals.columns.toSet)
      .intersect(Set(pointCol, startCol, endCol))
    require(shared.isEmpty,
      s"points and intervals share filter column names ${shared.mkString(", ")} — " +
        "rename one side before joining")
    val ivb = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bin", explode(expr(
        s"sequence(${fdivSql(startCol, binWidth)}, ${fdivSql(endCol, binWidth)})")))
    val ptb = points.withColumn("__bin", expr(fdivSql(pointCol, binWidth)))
    ivb.join(ptb, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** All (a × b) rows whose inclusive intervals OVERLAP
    * (`aStart ≤ bEnd AND bStart ≤ aEnd`) — the interval×interval member
    * of the family, next to [[pointInInterval]]'s point×interval. Both
    * sides explode to every bin their span touches, so an overlapping
    * pair can meet in SEVERAL shared bins; instead of a post-join
    * dedup (an extra shuffle over the candidate set), each pair is
    * emitted exactly once by keeping only the bin that contains
    * `greatest(aStart, bStart)` — the overlap's left edge, which by the
    * overlap predicate lies inside BOTH intervals and therefore inside
    * both sides' exploded bin ranges. Empty ranges (end < start) on
    * either side yield nothing, like the naive predicate. Candidate
    * volume is Σ_bins |a_b|·|b_b| — equi-shuffle-partitionable and
    * AQE-skew-splittable; pick `binWidth` ≥ the typical span so each
    * interval explodes to ≤2 rows. */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!a.columns.contains("__bin") && !b.columns.contains("__bin"),
      "intervalOverlap reserves column '__bin' — rename the input's")
    val shared = (a.columns.toSet intersect b.columns.toSet)
      .intersect(Set(aStart, aEnd, bStart, bEnd))
    require(shared.isEmpty,
      s"sides share filter column names ${shared.mkString(", ")} — " +
        "rename one side before joining")
    def binned(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(e) >= col(s))
      .withColumn("__bin", explode(expr(
        s"sequence(${fdivSql(s, binWidth)}, ${fdivSql(e, binWidth)})")))
    binned(a, aStart, aEnd).join(binned(b, bStart, bEnd), Seq("__bin"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(expr(s"__bin = ${fdivExpr(s"greatest(`$aStart`, `$bStart`)", binWidth)}"))
      .drop("__bin")
  }
}
