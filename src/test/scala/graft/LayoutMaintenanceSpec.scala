package graft

import java.io.File

import graft.operators.ScanQueries

/** File-level invariants of the layout-maintenance keys — the part of
  * their contract the DuckDB oracle CANNOT see (it only proves content
  * equality): compaction must actually shrink the file count, and
  * dynamic partition overwrite must physically leave non-targeted
  * partitions' files alone.
  */
class LayoutMaintenanceSpec extends SparkSpec {

  private def parquetFiles(dir: String): Set[String] = {
    val fs = new File(dir).listFiles()
    if (fs == null) Set.empty
    else fs.filter(f => f.getName.endsWith(".parquet")).map(_.getName).toSet
  }

  test("compaction: >=32 fragment files collapse to <=4 range-clustered files") {
    ScanQueries.queries("scan_compact_smallfiles")(spark, sf).count()
    val root = ScanQueries.scratch(spark, sf)
    val frag = parquetFiles(s"$root/frag_docs")
    val compact = parquetFiles(s"$root/compact_docs")
    // repartition(64) targets 64 files; tiny fixtures may produce a few
    // empty partitions Spark skips, hence >= 32, not == 64.
    assert(frag.size >= 32, s"expected a fragmented layout, got ${frag.size} files")
    assert(compact.size <= 4 && compact.nonEmpty,
      s"expected <=4 compacted files, got ${compact.size}")
    // repartitionByRange + sortWithinPartitions ⇒ per-file doc_id
    // ranges don't overlap — the clustering claim behind "compaction
    // doubles as pruning".
    val spans = compact.toSeq.sorted.map { f =>
      val df = spark.read.parquet(s"$root/compact_docs/$f")
      val r = df.agg(org.apache.spark.sql.functions.min("doc_id"),
        org.apache.spark.sql.functions.max("doc_id")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file doc_id ranges overlap: $spans")
      case _ =>
    }
  }

  test("dynamic partition overwrite replaces ONLY the targeted partition's files") {
    val q = ScanQueries.queries("etl_partition_overwrite")
    q(spark, sf).count() // establishes base + first overwrite
    val root = ScanQueries.scratch(spark, sf)
    val otherBefore = parquetFiles(s"$root/po_docs/lang=fr")
    val enBefore = parquetFiles(s"$root/po_docs/lang=en")
    assert(otherBefore.nonEmpty && enBefore.nonEmpty, "expected both partitions")
    q(spark, sf).count() // re-run: base skipped, overwrite fires again
    val otherAfter = parquetFiles(s"$root/po_docs/lang=fr")
    val enAfter = parquetFiles(s"$root/po_docs/lang=en")
    // Non-targeted partition: the exact same physical files survive.
    assert(otherAfter == otherBefore,
      s"fr partition files changed: $otherBefore -> $otherAfter")
    // Targeted partition: rewritten (task UUIDs make fresh file names).
    assert(enAfter != enBefore,
      "en partition files were not replaced by the dynamic overwrite")
    // And the overwrite REPLACED rather than appended: en row count
    // equals the update batch, not 2x.
    val enRows = spark.read.parquet(s"$root/po_docs").where("lang = 'en'").count()
    val batch = graft.Tables.t(spark, sf, "documents").where("lang = 'en'").count()
    assert(enRows == batch, s"expected $batch en rows after overwrite, got $enRows")
  }
}
