package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** The streaming CDC contract behind `stream_cdc_apply`: applying the
  * change log one micro-batch at a time (foreachBatch maintaining a
  * snapshot) must land EXACTLY the one-shot latest-wins result — the
  * equivalence a production CDC sink has to guarantee across restarts
  * and batch boundaries. Includes the delete-then-update reactivation
  * case that silently diverges under physical-delete merges (the
  * tombstone rationale documented in graft.operators.Cdc).
  */
class CdcStreamSpec extends SparkSpec {

  private def oneShot: DataFrame = {
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    Cdc.present(Cdc.merge(Cdc.base(customer), Cdc.log(orders)))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("3-batch incremental fold == one-shot apply (version-ordered)") {
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val log = Cdc.log(spark.read.parquet(s"$sf/orders.parquet"))
    val cuts = log.stat.approxQuantile("version", Array(0.33, 0.66), 0.0)
    var state = Cdc.base(customer)
    val batches = Seq(
      log.filter(col("version") <= cuts(0)),
      log.filter(col("version") > cuts(0) && col("version") <= cuts(1)),
      log.filter(col("version") > cuts(1)))
    batches.foreach { b => state = Cdc.merge(state, b).localCheckpoint(true) }
    assert(rows(Cdc.present(state)) == rows(oneShot))
  }

  test("foreachBatch streaming apply == one-shot apply") {
    import spark.implicits._
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val log = Cdc.log(spark.read.parquet(s"$sf/orders.parquet"))
      .as[Cdc.Change].collect().sortBy(_.version)
    val thirds = log.grouped(math.max(1, (log.length + 2) / 3)).toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Cdc.Change]
    var state = Cdc.base(customer).localCheckpoint(true)
    val q = mem.toDS().toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // The micro-batch plan is pinned to this trigger; checkpoint the
        // merged state so the next trigger starts from data, not lineage.
        state = Cdc.merge(state, batch).localCheckpoint(true)
        ()
      }
      .start()
    try {
      thirds.foreach { third =>
        mem.addData(third.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(thirds.size > 1, "log must span several micro-batches")
    assert(rows(Cdc.present(state)) == rows(oneShot))
  }

  test("re-applying a batch is a no-op (foreachBatch restart idempotence)") {
    // After a crash between state write and offset commit, Structured
    // Streaming re-delivers the last micro-batch — the merge must
    // absorb the replay. Latest-wins over already-applied versions
    // changes nothing, so apply-twice ≡ apply-once.
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val log = Cdc.log(spark.read.parquet(s"$sf/orders.parquet"))
    val cut = log.stat.approxQuantile("version", Array(0.5), 0.0)(0)
    val b1 = log.filter(col("version") <= cut)
    val b2 = log.filter(col("version") > cut)
    var once = Cdc.base(customer)
    Seq(b1, b2).foreach { b => once = Cdc.merge(once, b).localCheckpoint(true) }
    var twice = Cdc.base(customer)
    Seq(b1, b1, b2, b2).foreach { b =>
      twice = Cdc.merge(twice, b).localCheckpoint(true)
    }
    assert(rows(Cdc.present(twice)) == rows(Cdc.present(once)))
  }

  test("delete-then-update across batches reactivates the base row (tombstone contract)") {
    import spark.implicits._
    val base = Seq((1L, "alice", 10.0)).toDF("c_custkey", "c_name", "c_acctbal")
    val b1 = Seq(Cdc.Change(1L, 100L, "D", 0.0)).toDF()
    val b2 = Seq(Cdc.Change(1L, 200L, "U", 42.0)).toDF()
    var state = Cdc.base(base)
    Seq(b1, b2).foreach { b => state = Cdc.merge(state, b).localCheckpoint(true) }
    val got = rows(Cdc.present(state))
    // One-shot over the concatenated log only sees the final U: the BASE
    // name must survive the intermediate tombstone.
    val want = rows(Cdc.present(Cdc.merge(Cdc.base(base), b1.unionAll(b2))))
    assert(got == want)
    assert(got == Seq(Seq(1L, "alice", 42.0, 200L)),
      s"tombstone reactivation lost the base row: $got")
  }
}
