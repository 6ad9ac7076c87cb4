package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan) as the third mergeable
  * sketch surface, completing the trilogy next to HLL (distinct —
  * `agg_hll_partitioned_union`) and t-digest (quantiles —
  * `agg_tdigest_quantile`): FREQUENCY estimation in sublinear space.
  * The production shape it buys: per-partition sketches are stored like
  * the HLL stats table, compose under any rollup (counter matrices add
  * element-wise — commutative/associative), and answer "how often does
  * token X occur corpus-wide" without a corpus re-scan — the
  * frequency analog of the stored-distinct dashboard.
  *
  * Estimates are one-sided by construction: each of the `depth` rows
  * overcounts (collisions only ADD), so est ≥ exact always, and
  * min-over-rows bounds the overshoot by εN (ε ≈ e/width) with
  * probability 1−e^(−depth). Hashing is the same Kirsch–Mitzenmacher
  * double hashing over splitmix64 as [[Bloom]] — deterministic and
  * engine-owned, so sketch images are bit-replayable across retries,
  * partitionings and Spark versions (a stored sketch must never depend
  * on a version-drifting internal hash).
  *
  * Buffer = depth·width longs (5×2048 = 80 KiB) per partition-group —
  * a two-phase hash agg ships one matrix per partition, never rows.
  */
object CountMin {

  /** countmin_build(keyCol, depth, width) → binary counter image. */
  def build(key: Column, depth: Int, width: Int): Column =
    graftshim.toColumn(CountMinAgg(graftshim.toExpression(key),
      Literal(depth), Literal(width)).toAggregateExpression())

  /** countmin_estimate(bytesCol, keyCol, depth) → long (min over rows). */
  def estimate(bytes: Column, key: Column, depth: Int): Column =
    graftshim.toColumn(CountMinEstimate(graftshim.toExpression(bytes),
      graftshim.toExpression(key), Literal(depth)))

  /** Row-d counter slot of `key` in a width-`w` row. */
  def slot(key: Long, d: Int, w: Int): Int = {
    val h1 = Bloom.mix64(key)
    val h2 = Bloom.mix64(h1)
    (((h1 + d * h2) & Long.MaxValue) % w).toInt
  }

  /** Point estimate from the serialized counter matrix. Called from
    * generated code — JVM-primitive signature. */
  def estimate(bytes: Array[Byte], key: Long, depth: Int): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = bytes.length / 8 / depth
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = bb.getLong(8 * (d * w + slot(key, d, w)))
      if (c < est) est = c
      d += 1
    }
    est
  }

  /** Same little-endian long[] image as [[Bloom]] — one codec for all
    * three byte-buffer sketch surfaces. */
  def toBytes(counts: Array[Long]): Array[Byte] = Bloom.toBytes(counts)
  def fromBytes(bytes: Array[Byte]): Array[Long] = Bloom.fromBytes(bytes)
}

/** Counter-matrix-building aggregate: update bumps one slot per row,
  * merge adds matrices element-wise, eval emits the little-endian
  * image [[CountMinEstimate]] probes. */
case class CountMinAgg(child: Expression, depth: Expression,
    width: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child, depth, width)
  override def inputTypes: Seq[DataType] =
    Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "countmin_build"

  private lazy val d: Int = {
    require(depth.foldable, "countmin_build: depth must be a literal")
    val v = depth.eval().asInstanceOf[Number].intValue()
    require(v >= 1 && v <= 16, s"countmin_build: depth out of [1,16]: $v")
    v
  }
  private lazy val w: Int = {
    require(width.foldable, "countmin_build: width must be a literal")
    val v = width.eval().asInstanceOf[Number].intValue()
    require(v >= 16, s"countmin_build: width too small: $v")
    // Bound the buffer like depth is bounded: 2²⁴ slots × 16 rows =
    // 2 GiB of longs is already far past any sane sketch — beyond it
    // d·w overflows Int and the allocation fails uncleanly.
    require(v <= (1 << 24), s"countmin_build: width too large: $v")
    v
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var i = 0
      while (i < d) { buf(i * w + CountMin.slot(key, i, w)) += 1; i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = CountMin.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = CountMin.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CountMin.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren(0), depth = newChildren(1),
      width = newChildren(2))
}

/** Per-row point estimate with whole-stage codegen — one static call
  * into [[CountMin.estimate]], exactly the [[BloomMightContain]]
  * shape. */
case class CountMinEstimate(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, LongType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "countmin_estimate"

  override def nullSafeEval(bytes: Any, key: Any, depth: Any): Any =
    CountMin.estimate(bytes.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long], depth.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, key, depth) => {
      s"${ev.value} = graft.functions.CountMin.estimate($bytes, $key, $depth);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CountMinEstimate =
    copy(first = newFirst, second = newSecond, third = newThird)
}
