package graft

import org.apache.spark.sql.functions._

/** Locks ArrayDot's edge semantics in BOTH execution paths (interpreted
  * eval and whole-stage codegen): loud length-mismatch, NULL-element
  * propagation, and bit-parity with the aggregate/zip_with HOF form.
  */
class ArrayDotSpec extends SparkSpec {

  private def dotSql(a: String, b: String): String =
    s"SELECT array_dot($a, $b)"

  private def withCodegen[T](on: Boolean)(f: => T): T = {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    spark.conf.set(key, on.toString)
    try f finally spark.conf.set(key, old)
  }

  test("length mismatch throws in interpreted and codegen paths") {
    graft.functions.DiscountBand.register(spark) // ensure registry warm
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => graft.functions.ArrayDot(exprs(0), exprs(1)), "built-in")
    for (codegen <- Seq(true, false)) withCodegen(codegen) {
      val e = intercept[Exception] {
        spark.sql(dotSql("array(1.0D,2.0D)", "array(1.0D)")).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("length mismatch")),
        s"codegen=$codegen: $e")
    }
  }

  test("null element nulls the result in both paths; matches HOF form") {
    for (codegen <- Seq(true, false)) withCodegen(codegen) {
      val r = spark.sql(dotSql("array(1.0D, CAST(NULL AS DOUBLE))", "array(1.0D, 2.0D)"))
        .head()
      assert(r.isNullAt(0), s"codegen=$codegen: expected NULL")
    }
    // Bit-parity with the HOF fold on real vectors.
    val emb = Tables.t(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("v")).limit(50)
    val rows = emb
      .select(graft.functions.ArrayDot(col("v"), col("v")).as("fast"),
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (acc, e) => acc + e).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }

  test("tokenize keeps trailing empty tokens (split parity)") {
    graft.functions.Tokenize.register(spark)
    val got = spark.sql(
      "SELECT pos, token FROM (SELECT 'a b ' AS t) LATERAL VIEW tokenize(t) v AS pos, token")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((0L, "a"), (1L, "b"), (2L, "")))
    // parity with posexplode(split(...))
    val viaSplit = spark.sql(
      "SELECT posexplode(split('a b ', ' ')) AS (pos, token)")
      .collect().map(r => (r.getInt(0).toLong, r.getString(1))).toSeq
    assert(got == viaSplit)
  }
}
