package graft

import org.apache.spark.sql.functions._
import graft.functions.BitmapDistinctAgg

/** Contract tests for the exact bitmap-distinct aggregate behind
  * `agg_bitmap_distinct` (its exactness itself is oracle-checked by the
  * driver gate — these pin the properties the oracle can't see).
  */
class BitmapDistinctSpec extends SparkSpec {

  test("equals count(DISTINCT) under any partitioning") {
    val e = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"))
    val want = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n")).orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Seq(1, 5, 32).foreach { parts =>
      val got = e.repartition(parts).groupBy("event_type")
        .agg(BitmapDistinctAgg(col("user_id"), 1 << 20).as("n"))
        .orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == want, s"mismatch at $parts partitions")
    }
  }

  test("out-of-domain keys fail loudly, never silently degrade") {
    val ex = intercept[Exception] {
      spark.range(0, 10).select((col("id") + 2000).as("k"))
        .agg(BitmapDistinctAgg(col("k"), 1024)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("outside domain")),
      s"unexpected failure: $ex")
  }
}
