package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level deletes over IMMUTABLE parquet — the deletion-vector
  * pattern every modern table format (Delta DVs, Iceberg position
  * deletes, Hive ACID delete deltas) layers over data files that are
  * never rewritten in place.
  *
  * Layout: `root/data/` holds the parquet data files; `root/dv/` is a
  * parquet SIDECAR of (file_name, row position) pairs. A DELETE appends
  * matching positions to the sidecar (append-only — no data byte moves,
  * no file rewrite, which is the whole point: at 100 TB rewriting a
  * file to delete 3 rows costs a full file write + invalidates caches;
  * appending positions costs O(deleted)). A read anti-joins the scan
  * against the sidecar on (file, position).
  *
  * Addressing uses the file sources' hidden `_metadata` struct —
  * `_metadata.file_name` + `_metadata.row_index` (the physical row
  * position parquet readers reconstruct, stable across reads by
  * construction) — so positions mean the same thing to the writer that
  * marked them and every later reader.
  *
  * 100 TB shape: the sidecar is O(deleted rows), orders of magnitude
  * smaller than data, so the anti-join broadcasts (production formats
  * compress further into per-file roaring bitmaps shipped with the scan
  * task — same dataflow, tighter encoding; past the broadcast threshold
  * the join keys on file_name, which co-partitions with the scan).
  * Duplicate marks (overlapping DELETE predicates, retried writers) are
  * harmless: the sidecar is a SET, deduplicated at read.
  */
object DeletionVectors {

  def dataDir(root: String): String = s"$root/data"
  private def dvDir(root: String): String = s"$root/dv"

  private final val FILE = "_dv_file"
  private final val POS = "_dv_pos"

  private def withPos(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(dataDir(root))
      .withColumn(FILE, col("_metadata.file_name"))
      .withColumn(POS, col("_metadata.row_index"))

  /** DELETE WHERE `cond` without touching a data byte: append the
    * matching (file, position) pairs to the sidecar. Idempotent in
    * effect (readers dedup), append-only on disk. */
  def markDeleted(spark: SparkSession, root: String, cond: Column): Unit =
    withPos(spark, root).filter(cond).select(col(FILE), col(POS))
      .write.mode("append").parquet(dvDir(root))

  /** The deduplicated deleted-position set (audit face). */
  def deletedPositions(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(dvDir(root)).distinct()

  /** Scan minus deleted positions. The broadcast anti-join keeps the
    * data side a single pass with no shuffle; dropping the helper
    * columns afterwards returns the caller exactly the data schema. */
  def readLive(spark: SparkSession, root: String): DataFrame = {
    val base = withPos(spark, root)
    val out =
      if (!new java.io.File(dvDir(root)).exists()) base
      else base.join(broadcast(deletedPositions(spark, root)),
        Seq(FILE, POS), "left_anti")
    out.drop(FILE, POS)
  }
}
