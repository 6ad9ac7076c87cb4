package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

/** Reader (and a minimal fixture-building writer) for the ICEBERG-SHAPED
  * two-level metadata layout — the published Apache Iceberg table spec's
  * structure (iceberg.apache.org/spec), built from the spec with the
  * real serialization stack (table metadata = JSON, manifest lists and
  * manifests = AVRO container files via the Apache Avro library on this
  * classpath; the iceberg-core library is not). Field set is the
  * simplified subset the planning flow needs — same LAYERING, not
  * byte-compatible with iceberg-core (which pins exact Avro field ids):
  *
  *   metadata/version-hint.text          → newest metadata version N
  *   metadata/v<N>.metadata.json         → snapshots + current-snapshot-id
  *   metadata/snap-<id>.avro             → manifest list: one record per
  *       manifest with its partition-value RANGE summary
  *   metadata/manifest-<k>.avro          → data-file entries: path,
  *       record_count, partition value
  *   data files: parquet, referenced by relative path
  *
  * Why two levels: at 100 TB a snapshot has thousands of manifests and
  * millions of files — scan planning must prune WHOLE MANIFESTS from the
  * manifest list's partition summaries before ever opening them, then
  * prune files inside the survivors, and only then open parquet footers.
  * That is exactly [[planFiles]]: both prune levels are metadata-only,
  * driver-side over bounded Avro files (the same place iceberg-core
  * plans), and data bytes are touched only by the final distributed scan.
  *
  * Snapshot semantics: appends write NEW manifest files and a NEW
  * manifest list that REFERENCES the prior snapshot's manifests
  * unchanged (manifest reuse — an append is O(new files) metadata, not
  * O(table)); every snapshot stays readable by id (time travel), with
  * `parent-snapshot-id` carrying lineage.
  */
object IcebergInterop {

  private def metaDir(root: String): String = s"$root/metadata"

  private val manifestEntrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"file_path","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"partition","type":"long"}]}""".stripMargin)

  private val manifestFileSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"content","type":"int","default":0},
      |{"name":"added_files_count","type":"int"},
      |{"name":"partition_lo","type":"long"},
      |{"name":"partition_hi","type":"long"}]}""".stripMargin)

  /** One data-file entry inside a manifest. `status` 1 = added by this
    * snapshot, 0 = existing (carried over). `partition` is the file's
    * identity-partition value (single LONG partition field — the subset
    * shape). */
  case class ManifestEntry(status: Int, filePath: String,
      recordCount: Long, partition: Long)

  /** One manifest reference inside a manifest list, with the partition
    * RANGE summary planning prunes on. `content` is the Iceberg v2
    * manifest content type: 0 = data files, 1 = delete files (position
    * deletes) — ONE list carries both kinds, and planning prunes both
    * by the same partition summaries. */
  case class ManifestFile(manifestPath: String, addedFilesCount: Int,
      partitionLo: Long, partitionHi: Long, content: Int = 0)

  case class Snapshot(snapshotId: Long, parentSnapshotId: Option[Long],
      manifestList: String)

  // ------------------------------------------------------------------
  // Avro faces (driver-side, bounded metadata — the same place
  // iceberg-core does its planning I/O).
  // ------------------------------------------------------------------

  private def writeAvro(path: String, schema: Schema,
      recs: Seq[GenericRecord]): Unit = {
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    try { w.create(schema, f); recs.foreach(w.append) } finally w.close()
  }

  private def readAvro(path: String): Seq[GenericRecord] = {
    val r = new DataFileReader[GenericRecord](new java.io.File(path),
      new GenericDatumReader[GenericRecord]())
    try {
      val b = Seq.newBuilder[GenericRecord]
      while (r.hasNext) b += r.next()
      b.result()
    } finally r.close()
  }

  def writeManifest(root: String, name: String,
      entries: Seq[ManifestEntry]): String = {
    val rel = s"metadata/$name.avro"
    writeAvro(s"$root/$rel", manifestEntrySchema, entries.map { e =>
      val r = new GenericData.Record(manifestEntrySchema)
      r.put("status", e.status)
      r.put("file_path", e.filePath)
      r.put("record_count", e.recordCount)
      r.put("partition", e.partition)
      r
    })
    rel
  }

  def writeManifestList(root: String, snapshotId: Long,
      manifests: Seq[ManifestFile]): String = {
    val rel = s"metadata/snap-$snapshotId.avro"
    writeAvro(s"$root/$rel", manifestFileSchema, manifests.map { m =>
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", m.manifestPath)
      r.put("content", m.content)
      r.put("added_files_count", m.addedFilesCount)
      r.put("partition_lo", m.partitionLo)
      r.put("partition_hi", m.partitionHi)
      r
    })
    rel
  }

  def readManifestList(root: String, rel: String): Seq[ManifestFile] =
    readAvro(s"$root/$rel").map(r => ManifestFile(
      r.get("manifest_path").toString,
      r.get("added_files_count").asInstanceOf[Int],
      r.get("partition_lo").asInstanceOf[Long],
      r.get("partition_hi").asInstanceOf[Long],
      // Pre-`content` manifest lists (this module's own older fixtures)
      // read as data manifests — the Avro default.
      Option(r.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)))

  def readManifest(root: String, rel: String): Seq[ManifestEntry] =
    readAvro(s"$root/$rel").map(r => ManifestEntry(
      r.get("status").asInstanceOf[Int],
      r.get("file_path").toString,
      r.get("record_count").asInstanceOf[Long],
      r.get("partition").asInstanceOf[Long]))

  // ------------------------------------------------------------------
  // Table metadata JSON + version hint.
  // ------------------------------------------------------------------

  def writeMetadata(root: String, version: Int, current: Long,
      snapshots: Seq[Snapshot]): Unit = {
    val snapsJson = snapshots.map { s =>
      val parent = s.parentSnapshotId
        .map(p => s""""parent-snapshot-id":$p,""").getOrElse("")
      s"""{"snapshot-id":${s.snapshotId},$parent""" +
        s""""manifest-list":"${s.manifestList}"}"""
    }.mkString("[", ",", "]")
    val dir = java.nio.file.Paths.get(metaDir(root))
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve(s"v$version.metadata.json"),
      s"""{"format-version":2,"current-snapshot-id":$current,""" +
        s""""snapshots":$snapsJson}""")
    java.nio.file.Files.writeString(dir.resolve("version-hint.text"),
      version.toString)
  }

  /** SNAPSHOT EXPIRATION — the metadata-level GC every production
    * table runs: drop `expire` from the snapshot list (a NEW metadata
    * version; old metadata files stay, the hint moves), delete the
    * expired snapshots' manifest LISTS, and delete only the manifests
    * no surviving snapshot references (reference-counted — manifest
    * REUSE means an expired snapshot's manifests usually live on under
    * its descendants, and deleting them would corrupt every later
    * snapshot). Data files are untouched here (file-level GC is a
    * separate orphan sweep, [[VersionedTable.vacuum]]'s concern).
    * Returns (manifest lists deleted, orphan manifests deleted). */
  def expireSnapshots(root: String, expire: Set[Long]): (Int, Int) = {
    val hint = java.nio.file.Files.readString(
      java.nio.file.Paths.get(metaDir(root), "version-hint.text")).trim.toInt
    val (current, snaps) = readMetadata(root)
    require(!expire.contains(current),
      s"cannot expire the current snapshot $current at $root")
    val (dead, kept) = snaps.partition(s => expire.contains(s.snapshotId))
    val keptRefs = kept
      .flatMap(s => readManifestList(root, s.manifestList))
      .map(_.manifestPath).toSet
    val orphans = dead
      .flatMap(s => readManifestList(root, s.manifestList))
      .map(_.manifestPath).toSet -- keptRefs
    writeMetadata(root, hint + 1, current, kept)
    dead.foreach(s =>
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(root, s.manifestList)): Unit)
    orphans.foreach(m =>
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(root, m)): Unit)
    (dead.size, orphans.size)
  }

  /** Current table metadata via the version hint (the HadoopTables
    * latest-metadata convention). Jackson (Spark's bundled JSON stack)
    * parses the nested document. */
  def readMetadata(root: String): (Long, Seq[Snapshot]) = {
    val hint = java.nio.file.Files.readString(
      java.nio.file.Paths.get(metaDir(root), "version-hint.text")).trim.toInt
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(metaDir(root), s"v$hint.metadata.json")))
    val snaps = (0 until node.get("snapshots").size()).map { i =>
      val s = node.get("snapshots").get(i)
      Snapshot(s.get("snapshot-id").asLong(),
        Option(s.get("parent-snapshot-id")).map(_.asLong()),
        s.get("manifest-list").asText())
    }
    (node.get("current-snapshot-id").asLong(), snaps)
  }

  // ------------------------------------------------------------------
  // Scan planning + read.
  // ------------------------------------------------------------------

  /** A planned scan: the surviving data-file entries, the surviving
    * position-delete file entries that must be applied to them
    * (merge-on-read), and how many manifests (of EITHER content type)
    * the manifest-list summary prune never opened. */
  case class ScanPlan(dataFiles: Seq[ManifestEntry],
      deleteFiles: Seq[ManifestEntry], prunedManifests: Int)

  /** Two-level pruned scan planning for `snapshotId` (None = current):
    * manifests whose [partition_lo, partition_hi] misses `wanted` are
    * never OPENED (level 1); surviving manifests' entries are then
    * file-pruned on exact partition values (level 2). Data and delete
    * manifests prune by the SAME summaries — a position-delete file
    * scoped to pruned partitions is skipped with its data files, so
    * merge-on-read costs O(selected ∪ their deletes), never
    * O(all deletes). */
  def planScan(root: String, snapshotId: Option[Long],
      wanted: Option[Set[Long]]): ScanPlan = {
    val (current, snaps) = readMetadata(root)
    val id = snapshotId.getOrElse(current)
    val snap = snaps.find(_.snapshotId == id)
      .getOrElse(sys.error(s"unknown snapshot $id at $root"))
    val manifests = readManifestList(root, snap.manifestList)
    val (kept, pruned) = manifests.partition { m =>
      wanted.forall(w => w.exists(b => b >= m.partitionLo && b <= m.partitionHi))
    }
    def entries(content: Int) = kept.filter(_.content == content)
      .flatMap(m => readManifest(root, m.manifestPath))
      .filter(e => wanted.forall(_.contains(e.partition)))
    ScanPlan(entries(0), entries(1), pruned.size)
  }

  /** Data-file planning only (the append-lineage face — tables with no
    * delete manifests). Returns the live entries plus the prune count. */
  def planFiles(root: String, snapshotId: Option[Long],
      wanted: Option[Set[Long]]): (Seq[ManifestEntry], Int) = {
    val plan = planScan(root, snapshotId, wanted)
    (plan.dataFiles, plan.prunedManifests)
  }

  /** Distributed read of the planned data files (copy-on-write face:
    * any delete manifests in the snapshot are NOT applied here). */
  def readSnapshot(spark: SparkSession, root: String,
      snapshotId: Option[Long] = None,
      wanted: Option[Set[Long]] = None): DataFrame = {
    val (files, _) = planFiles(root, snapshotId, wanted)
    require(files.nonEmpty, s"no files planned from $root")
    spark.read.parquet(files.map(e => s"$root/${e.filePath}"): _*)
  }

  /** MERGE-ON-READ: the planned data files minus the planned position
    * deletes. Delete files are parquet of (file_path, pos) — the
    * Iceberg position-delete convention: `file_path` is the FULL path
    * of the data file the delete applies to (matched against the scan's
    * `_metadata.file_path`), `pos` the physical row index in it. The
    * anti-join broadcasts (deletes are O(deleted rows), metadata-small
    * next to data) so the data side stays one shuffle-free scan —
    * exactly the [[DeletionVectors]] dataflow under the Iceberg layout. */
  def readSnapshotLive(spark: SparkSession, root: String,
      snapshotId: Option[Long] = None,
      wanted: Option[Set[Long]] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val plan = planScan(root, snapshotId, wanted)
    require(plan.dataFiles.nonEmpty, s"no files planned from $root")
    val data = spark.read
      .parquet(plan.dataFiles.map(e => s"$root/${e.filePath}"): _*)
      .withColumn("_ice_file", col("_metadata.file_path"))
      .withColumn("_ice_pos", col("_metadata.row_index"))
    val out =
      if (plan.deleteFiles.isEmpty) data
      else {
        val dels = spark.read
          .parquet(plan.deleteFiles.map(e => s"$root/${e.filePath}"): _*)
          .select(col("file_path").as("_ice_file"), col("pos").as("_ice_pos"))
          .distinct()
        data.join(broadcast(dels), Seq("_ice_file", "_ice_pos"), "left_anti")
      }
    out.drop("_ice_file", "_ice_pos")
  }
}
