package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector over [[VersionedTable]]'s commit log — the
  * table's HISTORY as a first-class Spark source:
  *
  * {{{ spark.read.format("graft.sources.HistoryDataSource")
  *       .load(root)  // one row per commit }}}
  *
  * Schema: (version LONG, op STRING, n_files LONG, n_rows LONG).
  *
  * Why a V2 connector and not a helper returning a DataFrame
  * ([[VersionedTable.history]] stays for that): the connector face is
  * what SQL users and catalog integrations consume — `CREATE TABLE ...
  * USING`, `spark.table`, downstream tools that only speak
  * `format(...)`. It also demonstrates the full DSv2 read contract this
  * repo's extension surface otherwise lacks: TableProvider →
  * SupportsRead table → ScanBuilder → Batch with one InputPartition per
  * manifest → executor-side PartitionReader.
  *
  * The PartitionReader runs on EXECUTORS, where no SparkSession exists,
  * so manifests are parsed by [[VersionedTable.parseManifestMeta]] — a
  * dependency-free extractor for the writer's own fixed manifest
  * grammar (this module wrote the bytes; the lenient Spark JSON reader
  * path stays the API for ad-hoc reads). One partition per commit keeps
  * the read trivially parallel and each task O(one manifest) — history
  * is metadata-sized, but the shape is the honest DSv2 shape.
  *
  * FILESYSTEM CONSTRAINT (explicit, inherited from [[VersionedTable]]):
  * the PartitionReader reads manifests with `java.nio.file.Files`, so
  * EXECUTORS must see the same POSIX filesystem as the driver (local
  * mode, or a shared POSIX mount). Object-store deployment means
  * swapping this read for Hadoop `FileSystem.open` — one line here —
  * after the commit protocol itself is ported (see VersionedTable's
  * filesystem-constraint scaladoc).
  */
class HistoryDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HistoryDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val root = properties.get("path")
    require(root != null && root.nonEmpty,
      "graft history source needs .load(<versioned table root>)")
    new HistoryTable(root)
  }
}

object HistoryDataSource {
  val schema: StructType = new StructType()
    .add("version", LongType, nullable = false)
    .add("op", StringType, nullable = false)
    .add("n_files", LongType, nullable = false)
    .add("n_rows", LongType, nullable = false)
}

private[sources] class HistoryTable(root: String) extends Table
    with SupportsRead {
  override def name(): String = s"graft_history(`$root`)"
  override def schema(): StructType = HistoryDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = HistoryDataSource.schema
      override def toBatch: Batch = this
      // Planning (driver): the same commit-log listing the session API
      // uses — one partition per manifest (a private fork here would
      // let the connector and latestVersion drift on naming rules).
      override def planInputPartitions(): Array[InputPartition] =
        VersionedTable.listVersions(root).map(v =>
          HistoryPartition(s"$root/_commits/$v.json"): InputPartition)
          .toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new HistoryReaderFactory
    }
}

private[sources] case class HistoryPartition(manifestPath: String)
    extends InputPartition

private[sources] class HistoryReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _
      override def next(): Boolean =
        if (done) false
        else {
          val path = p.asInstanceOf[HistoryPartition].manifestPath
          val meta = VersionedTable.parseManifestMeta(
            java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
          row = InternalRow(meta.version, UTF8String.fromString(meta.op),
            meta.nFiles, meta.nRows)
          done = true
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}
