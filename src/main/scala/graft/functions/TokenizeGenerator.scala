package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** §2.8 `custom_udtf_generator` (SURVEY.md): a custom Catalyst `Generator`
  * (UDTF surface) — tokenize(text) emits one row per (pos, token), used
  * via `LATERAL VIEW tokenize(text) t AS pos, token`.
  *
  * Semantically ≡ `posexplode(split(text, ' '))`; implemented as a real
  * Generator to demonstrate the surface. Streams rows per input row
  * (iterator, no materialized array), so memory is O(1) per row at any
  * scale. `CodegenFallback` is acceptable here: GenerateExec drives
  * generators outside whole-stage codegen anyway.
  */
case class Tokenize(child: Expression) extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("token", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input)
    if (s == null) Iterator.empty
    else {
      // limit = -1 keeps trailing empty tokens, matching Spark's split()
      // and DuckDB's string_split (Java's 1-arg split drops them).
      val toks = s.asInstanceOf[UTF8String].toString.split(" ", -1)
      toks.iterator.zipWithIndex.map { case (tok, i) =>
        InternalRow(i.toLong, UTF8String.fromString(tok))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Tokenize = copy(child = newChildren.head)
}

object Tokenize {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize",
      graft.GraftExtensions.arity("tokenize", 1)(exprs => Tokenize(exprs.head)),
      "built-in")
}
