package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** t-digest quantile sketch as a native `TypedImperativeAggregate` —
  * the one Catalyst aggregate surface the engine had not yet
  * demonstrated (WeightedAvg is a typed `Aggregator`, percentile_approx
  * a built-in). Mergeable centroid summaries à la Dunning's merging
  * t-digest (k₁ scale function k(q) = δ/2π·asin(2q−1)): accuracy is
  * relative to q(1−q), so tail quantiles (p95/p99 — the latency/price
  * tails people actually sketch) get proportionally finer centroids
  * than the median, which is the property GK summaries and equi-width
  * histograms lack.
  *
  * Determinism contract (TDigestSpec): compression is a PURE function
  * of the SORTED centroid multiset — update folds rows in partition
  * order (deterministic parquet splits), partial digests CONCATENATE on
  * merge, and eval sorts once before the final compression, so the
  * result is independent of shuffle-fetch/merge arrival order. The
  * merge path only re-compresses beyond a 64k-centroid safety cap
  * (~1000+ executors' partials; below the cap never at fixture scale) —
  * past it, results stay within the rank-error band but may depend on
  * merge order; the cap trades bit-replay for bounded memory, the same
  * trade every streaming sketch makes.
  *
  * Scale: the aggregation buffer is O(δ) centroids per partition
  * (≤ 8δ before an amortized local compression), 16δ bytes serialized —
  * a two-phase hash agg ships kilobytes per group, never rows.
  */
case class TDigestQuantile(child: Expression, q: Expression,
    compression: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Double)]]
  with ImplicitCastInputTypes {

  import TDigestQuantile._

  def this(child: Expression, q: Expression) =
    this(child, q, Literal(100))

  override def children: Seq[Expression] = Seq(child, q, compression)
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_quantile"

  private lazy val qv: Double = {
    require(q.foldable, "tdigest_quantile: q must be a literal")
    val v = q.eval().asInstanceOf[Number].doubleValue()
    require(v >= 0.0 && v <= 1.0, s"tdigest_quantile: q out of [0,1]: $v")
    v
  }
  private lazy val delta: Int = {
    require(compression.foldable,
      "tdigest_quantile: compression must be a literal")
    val d = compression.eval().asInstanceOf[Number].intValue()
    require(d >= 10, s"tdigest_quantile: compression too small: $d")
    d
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Double)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Double)],
      input: InternalRow): ArrayBuffer[(Double, Double)] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      buf += ((v.asInstanceOf[Double], 1.0))
      if (buf.length > 8 * delta) compress(buf, delta) else buf
    }
  }

  override def merge(buf: ArrayBuffer[(Double, Double)],
      other: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    buf ++= other
    if (buf.length > MergeCap) compress(buf, delta) else buf
  }

  override def eval(buf: ArrayBuffer[(Double, Double)]): Any =
    if (buf.isEmpty) null
    else quantileOf(compress(buf, delta), qv)

  override def serialize(buf: ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (m, w) => bb.putDouble(m); bb.putDouble(w) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Double)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new ArrayBuffer[(Double, Double)](n)
    var i = 0
    while (i < n) { out += ((bb.getDouble, bb.getDouble)); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestQuantile =
    copy(child = newChildren(0), q = newChildren(1),
      compression = newChildren(2))
}

object TDigestQuantile {

  /** Above this many buffered centroids a merge() re-compresses — the
    * memory cap that costs bit-replay only past ~1000 executors'
    * uncompressed partials (64k × 16 B = 1 MiB per group·partition). */
  private[graft] val MergeCap = 1 << 16

  /** Column-level wrappers: tdigest_quantile(col, q [, compression]).
    * (Two overloads, not a default arg — the case-class apply already
    * carries defaulted offsets and Scala forbids two defaulted applys.) */
  def apply(c: Column, q: Double): Column = apply(c, q, 100)
  def apply(c: Column, q: Double, compression: Int): Column =
    graftshim.toColumn(TDigestQuantile(graftshim.toExpression(c),
      Literal(q), Literal(compression)).toAggregateExpression())

  /** Deterministic merging compression: sort by (mean, weight), then
    * one forward pass merging neighbors while the merged weight stays
    * under the k₁ scale function's bucket limit. A pure function of the
    * input MULTISET (the sort erases arrival order). */
  private[graft] def compress(items: ArrayBuffer[(Double, Double)],
      delta: Int): ArrayBuffer[(Double, Double)] = {
    if (items.length <= 1) return items
    val sorted = items.sortInPlace()(Ordering.Tuple2(Ordering.Double.TotalOrdering,
      Ordering.Double.TotalOrdering))
    var total = 0.0
    sorted.foreach(total += _._2)
    val dPi = delta / (2 * math.Pi)
    def k(qq: Double): Double =
      dPi * math.asin(2 * math.min(1.0, math.max(0.0, qq)) - 1)
    def kInv(kk: Double): Double =
      (math.sin(math.min(dPi * math.Pi / 2, kk) / dPi) + 1) / 2
    val out = ArrayBuffer.empty[(Double, Double)]
    var (cm, cw) = sorted.head
    var wSoFar = 0.0
    var limit = total * kInv(k(0.0) + 1.0)
    var i = 1
    while (i < sorted.length) {
      val (m, w) = sorted(i)
      if (wSoFar + cw + w <= limit) {
        cw += w
        cm += (w / cw) * (m - cm)
      } else {
        out += ((cm, cw))
        wSoFar += cw
        limit = total * kInv(k(wSoFar / total) + 1.0)
        cm = m; cw = w
      }
      i += 1
    }
    out += ((cm, cw))
    out
  }

  /** Quantile estimate over compressed centroids: linear interpolation
    * between centroid centers (cum − w/2), clamped to the end means. */
  private[graft] def quantileOf(cents: ArrayBuffer[(Double, Double)],
      q: Double): Double = {
    var total = 0.0
    cents.foreach(total += _._2)
    val target = q * total
    var cum = 0.0
    var prevCenter = 0.0
    var prevMean = cents.head._1
    var i = 0
    while (i < cents.length) {
      val (m, w) = cents(i)
      val center = cum + w / 2
      if (target < center) {
        if (i == 0) return m
        val t = (target - prevCenter) / (center - prevCenter)
        return prevMean + t * (m - prevMean)
      }
      prevCenter = center
      prevMean = m
      cum += w
      i += 1
    }
    cents.last._1
  }
}
