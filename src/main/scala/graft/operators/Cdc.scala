package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Det.r4d

/** Shared CDC core — one derivation of the change log and one merge
  * semantic, used by `etl_cdc_apply` (one-shot), the batch-declared
  * `stream_cdc_apply` face, and CdcStreamSpec's foreachBatch
  * incremental driver, so the three surfaces cannot drift (the langid
  * shared-core convention).
  *
  * The merge carries TOMBSTONES instead of physically deleting: a D
  * keeps the row with `deleted = 1` (name/balance retained), a later U
  * reactivates it. This is not a style choice — it is what makes
  * incremental application ≡ one-shot latest-wins EXACTLY: under
  * physical deletes, a key deleted in batch 1 and updated in batch 2
  * comes back as a synthetic insert (its base name is gone), while the
  * one-shot apply (which only sees the final U) keeps the base row —
  * the classic silent divergence compacted-log consumers hit.
  * CdcStreamSpec pins exactly that scenario. Presentation filters
  * tombstones and synthesizes insert names at the end.
  *
  * Scale: per batch, latest-wins is one max(struct) partial agg keyed
  * on the merge key and the apply is one key-equi full-outer join —
  * identical shuffle shape to `etl_cdc_apply`; the snapshot carries one
  * extra long column for the tombstone flag.
  */
object Cdc {

  /** A change-log entry (the MemoryStream row type for the streaming
    * face). */
  case class Change(key: Long, version: Long, op: String, new_bal: Double)

  /** The base snapshot lifted to merge-state schema: no version yet,
    * nothing tombstoned. */
  def base(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey").as("key"), col("c_name").as("name"),
      col("c_acctbal").as("acctbal"),
      lit(null).cast("long").as("version"), lit(0L).as("deleted"))

  /** The fixture's versioned op-tagged change log (etl_cdc_apply's
    * derivation: o_orderkey = monotone version, %7 deletes, %10 keys
    * remapped negative so inserts are non-vacuous). */
  def log(orders: DataFrame): DataFrame =
    orders.select(
      when(pmod(col("o_custkey"), lit(10)) === 0,
        -col("o_custkey") - 1).otherwise(col("o_custkey")).as("key"),
      col("o_orderkey").as("version"),
      when(col("o_orderkey") % 7 === 0, "D").otherwise("U").as("op"),
      r4d(col("o_totalprice") / 100.0).as("new_bal"))

  /** Latest-wins collapse of a change log: one max(version-led struct)
    * partial agg per key — THE semantic both `etl_cdc_apply` and
    * [[merge]] must share (the tie-break/struct ordering lives here
    * only, so the two apply surfaces cannot drift). */
  def latest(changes: DataFrame): DataFrame =
    changes.groupBy(col("key"))
      .agg(max(struct(col("version"), col("op"), col("new_bal"))).as("m"))
      .select(col("key"), col("m.version").as("version"),
        col("m.op").as("op"), col("m.new_bal").as("new_bal"))

  /** Apply a change log (or one micro-batch of it) to a merge-state
    * snapshot: latest-wins within the log, tombstone on D, reactivate
    * on U, untouched keys carry through. Output schema = input state
    * schema, so applications CHAIN. */
  def merge(state: DataFrame, changes: DataFrame): DataFrame = {
    val lw = latest(changes).withColumnRenamed("version", "v_new")
    state
      .withColumnRenamed("version", "v_old")
      .withColumnRenamed("deleted", "del_old")
      .join(lw, Seq("key"), "full_outer")
      .select(col("key"), col("name"),
        when(col("op") === "U", col("new_bal"))
          .otherwise(col("acctbal")).as("acctbal"),
        coalesce(col("v_new"), col("v_old")).as("version"),
        when(col("op") === "D", 1L).when(col("op") === "U", 0L)
          .otherwise(coalesce(col("del_old"), lit(0L))).as("deleted"))
  }

  /** The user-facing snapshot: tombstones dropped, insert names
    * synthesized (null name = key never seen in the base). */
  def present(state: DataFrame): DataFrame =
    state.filter(col("deleted") === 0)
      .select(col("key"),
        coalesce(col("name"),
          concat(lit("new-"), col("key").cast("string"))).as("name"),
        col("acctbal"), col("version"))
      .orderBy("key")
}
