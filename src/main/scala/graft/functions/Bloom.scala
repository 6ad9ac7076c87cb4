package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}

/** Engine-owned Bloom filter: a mergeable bitset aggregate plus a
  * codegen membership probe.
  *
  * Spark's own runtime bloom (`InjectRuntimeFilter`, pinned by
  * `join_bloom_runtime`) only fires when the optimizer sees BOTH sides
  * of a shuffle join in one plan. The cases it cannot cover are exactly
  * the production blocklist shape: the key set is built in a DIFFERENT
  * job (yesterday's blocklist, another pipeline's output), stored, and
  * probed map-side by many later scans. These two surfaces make that
  * explicit: `BloomBuildAgg` reduces a key column to an 8 KiB bitset
  * (partials OR together — commutative/associative, so the bits are
  * partition- and merge-order independent), and `BloomMightContain`
  * probes it per row inside whole-stage codegen.
  *
  * Hashing is Kirsch–Mitzenmacher double hashing over the splitmix64
  * finalizer: position_i = (h1 + i·h2) mod bits with h2 = mix64(h1) —
  * two mixes per key regardless of the hash count, deterministic, no
  * dependency on Spark's internal (version-drifting) hash exprs. No
  * false negatives by construction; the false-positive rate at the
  * declared key's scale is (1−e^(−k·n/m))^k ≈ 3×10⁻⁶ (n≈10³ keys,
  * m=2¹⁶ bits, k=5), and the consumer re-verifies with an exact join
  * anyway, so the answer stays exact even on a collision.
  */
object Bloom {

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set the k double-hash positions of `key` in `bits`. */
  def add(bits: Array[Long], key: Long, k: Int): Unit = {
    val m = bits.length.toLong * 64
    val h1 = mix64(key)
    val h2 = mix64(h1)
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % m
      bits((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Probe the serialized bitset (little-endian longs). Called from
    * generated code — keep the signature JVM-primitive. */
  def contains(bytes: Array[Byte], key: Long, k: Int): Boolean = {
    val m = bytes.length.toLong * 8
    val h1 = mix64(key)
    val h2 = mix64(h1)
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % m
      if ((bytes((pos >>> 3).toInt) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * bits.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  /** bloom_build(keyCol, numBits, numHashes) → binary bitset. */
  def build(key: Column, numBits: Int, numHashes: Int): Column =
    graftshim.toColumn(BloomBuildAgg(graftshim.toExpression(key),
      Literal(numBits), Literal(numHashes)).toAggregateExpression())

  /** bloom_might_contain(bitsCol, keyCol, numHashes) → boolean. */
  def mightContain(bits: Column, key: Column, numHashes: Int): Column =
    graftshim.toColumn(BloomMightContain(graftshim.toExpression(bits),
      graftshim.toExpression(key), Literal(numHashes)))
}

/** Bitset-building aggregate. Buffer = Array[Long] (m/64 words, fixed
  * size from the first row — O(m) memory per partition regardless of
  * key count); update sets k bits, merge ORs word-wise, eval emits the
  * little-endian byte image `BloomMightContain` probes. */
case class BloomBuildAgg(child: Expression, numBits: Expression,
    numHashes: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child, numBits, numHashes)
  override def inputTypes: Seq[DataType] =
    Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"

  private lazy val m: Int = {
    require(numBits.foldable, "bloom_build: numBits must be a literal")
    val v = numBits.eval().asInstanceOf[Number].intValue()
    require(v >= 64 && v % 64 == 0, s"bloom_build: numBits not a multiple of 64: $v")
    v
  }
  private lazy val k: Int = {
    require(numHashes.foldable, "bloom_build: numHashes must be a literal")
    val v = numHashes.eval().asInstanceOf[Number].intValue()
    require(v >= 1 && v <= 16, s"bloom_build: numHashes out of [1,16]: $v")
    v
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = Bloom.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Bloom.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Bloom.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren(0), numBits = newChildren(1),
      numHashes = newChildren(2))
}

/** Per-row membership probe with whole-stage codegen: one static call
  * into [[Bloom.contains]] on the (typically literal) byte image — the
  * probe stays inside the scan stage's codegen span, so prefiltering a
  * fact table costs one branch per row, no join machinery. */
case class BloomMightContain(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, LongType, IntegerType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(bits: Any, key: Any, k: Any): Any =
    Bloom.contains(bits.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, key, k) => {
      s"${ev.value} = graft.functions.Bloom.contains($bits, $key, $k);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BloomMightContain =
    copy(first = newFirst, second = newSecond, third = newThird)
}
