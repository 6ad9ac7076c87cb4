package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader (and a minimal fixture-building writer) for the Delta Lake
  * TABLE-DIRECTORY convention — the published `delta.io` PROTOCOL.md,
  * implemented from the spec, NOT from the delta-io library (which is
  * not on this classpath). The point is INTEROP: a table some other
  * engine's writer maintains is readable here without that engine.
  *
  * Layout read:
  *   - data files: parquet anywhere under the table root, referenced by
  *     RELATIVE path; identity-partition columns are OMITTED from the
  *     file bytes and carried in `add.partitionValues` (the reader must
  *     re-attach them — a reader that just globs parquet silently drops
  *     the partition columns AND resurrects removed files).
  *   - `_delta_log/<v (20-digit zero-padded)>.json`: one commit per
  *     version, JSON LINES, one action object per line (`protocol` /
  *     `metaData` / `add` / `remove`).
  *   - `_delta_log/<v>.checkpoint.parquet`: the full action state as of
  *     v (live `add` rows + `remove` tombstones), so replay is
  *     O(commits since checkpoint), not O(all commits).
  *   - `_delta_log/_last_checkpoint`: JSON pointer `{"version": v}` to
  *     the newest checkpoint.
  *
  * Snapshot reconstruction (PROTOCOL.md "Action Reconciliation"):
  * start from the newest checkpoint state when one exists (else from
  * nothing, requiring commit 0 to be present), apply the strictly
  * contiguous commit suffix in version order; the LAST action for a
  * path wins — live iff it is an `add`. Both guards are loud: a gap in
  * the suffix or a vacuumed log head without a checkpoint is an
  * unreadable table, not an empty one.
  *
  * 100 TB shape: the log is BOUNDED METADATA (file-level actions, the
  * same class as [[VersionedTable]] manifests — thousands of rows per
  * commit, not data-proportional), so the reconciliation runs as one
  * small Spark job over checkpoint+suffix and the live file list
  * collects O(files) to the driver, exactly like every production Delta
  * reader's snapshot phase. Data bytes are only ever touched by the
  * final distributed parquet scan over live files, and
  * [[snapshotFiles]] exposes `partitionValues` so callers prune
  * partitions BEFORE any parquet footer is opened.
  */
object DeltaInterop {

  private def pad(v: Long): String = f"$v%020d"
  private def logDir(root: String): String = s"$root/_delta_log"

  /** Action schema for commit-line JSON: the add/remove subset snapshot
    * reconstruction needs. `protocol`/`metaData` lines parse to
    * all-null structs under this schema and drop out at the path
    * filter. Checkpoint parquet carries the same two struct columns. */
  private val actionSchema = StructType(Seq(
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("dataChange", BooleanType))))))

  /** Version named by `_last_checkpoint`, or None on a young table. */
  private[graft] def lastCheckpoint(root: String): Option[Long] = {
    val f = java.nio.file.Paths.get(logDir(root), "_last_checkpoint")
    if (!java.nio.file.Files.exists(f)) None
    else "\"version\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(java.nio.file.Files.readString(f))
      .map(_.group(1).toLong)
  }

  /** One reconciliation for both faces (latest-snapshot read and
    * checkpoint construction): actions from `ckpt` (when given) plus
    * the commit versions in `tail`, last action per path wins.
    * Returns every path's final state: (relative path, live?,
    * partitionValues, per-file stats JSON when the writer recorded
    * one). */
  private def reconcile(spark: SparkSession, root: String,
      ckpt: Option[Long], tail: Seq[Long]): Seq[(String, Boolean, Map[String, String], Option[String])] = {
    val ckptDf = ckpt.map { c =>
      spark.read.parquet(s"${logDir(root)}/${pad(c)}.checkpoint.parquet")
        .select(col("add"), col("remove"), lit(c).as("version"))
    }
    val tailDf = Option.when(tail.nonEmpty) {
      spark.read.schema(actionSchema)
        .json(tail.map(v => s"${logDir(root)}/${pad(v)}.json"): _*)
        .withColumn("version", regexp_extract(col("_metadata.file_name"),
          "^(\\d{20})\\.json$", 1).cast("long"))
    }
    val acts = (ckptDf.toSeq ++ tailDf.toSeq).reduce(_ unionByName _)
      .select(coalesce(col("add.path"), col("remove.path")).as("path"),
        col("add.path").isNotNull.as("is_add"),
        col("add.partitionValues").as("pv"),
        col("add.stats").as("stats"), col("version"))
      .filter(col("path").isNotNull)
    // Protocol invariant (holds for spec-conforming writers): a path is
    // never added AND removed at the same version, so max_by needs no
    // tie-break. Live file lists are bounded metadata — this collect is
    // the same O(files) driver state every Delta reader's snapshot
    // phase holds.
    acts.groupBy("path")
      .agg(max_by(struct(col("is_add"), col("pv"), col("stats")),
        col("version")).as("last"))
      .select(col("path"), col("last.is_add").as("is_add"),
        col("last.pv").as("pv"), col("last.stats").as("stats"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getBoolean(1),
        Option(r.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty),
        Option(r.getString(3))))
      .sortBy(_._1)
  }

  /** Checkpoint versions present on disk (not just the one
    * `_last_checkpoint` names — TIME TRAVEL needs the newest checkpoint
    * ≤ the target version, which may be an older one). */
  private[graft] def checkpointVersions(root: String): Seq[Long] = {
    val re = "^(\\d{20})\\.checkpoint\\.parquet$".r
    Option(new java.io.File(logDir(root)).listFiles).toSeq.flatten
      .map(_.getName).collect { case re(v) => v.toLong }.sorted
  }

  /** Live data files of the LATEST snapshot: (relative path,
    * partitionValues), from the newest checkpoint + the commit suffix
    * after it. Loud on a gapped suffix or a vacuumed-head log with no
    * checkpoint. */
  def snapshotFiles(spark: SparkSession, root: String): Seq[(String, Map[String, String])] =
    snapshotFilesAt(spark, root, None)

  /** Live data files AS OF version `asOf` (None = latest) — Delta time
    * travel. Replay is bounded exactly as for the latest snapshot: the
    * newest checkpoint ≤ asOf plus the commit suffix (ckpt, asOf]. The
    * guards stay loud PER TARGET VERSION: a version past the log's head
    * doesn't exist; a version whose history was vacuumed away and
    * pre-dates every surviving checkpoint is unreadable — an interop
    * reader must say so, not silently serve a different snapshot. */
  def snapshotFilesAt(spark: SparkSession, root: String,
      asOf: Option[Long]): Seq[(String, Map[String, String])] =
    snapshotFilesWithStats(spark, root, asOf).map(f => (f._1, f._2))

  /** Live data files AS OF `asOf` with each file's per-file stats JSON
    * (the protocol's `add.stats`: numRecords + per-column min/max) —
    * the primary replay face; [[snapshotFilesAt]] drops the stats. The
    * stats live in the LOG, so range planning over them is
    * metadata-only, zero parquet footers opened. */
  def snapshotFilesWithStats(spark: SparkSession, root: String,
      asOf: Option[Long] = None): Seq[(String, Map[String, String], Option[String])] = {
    val dir = new java.io.File(logDir(root))
    require(dir.isDirectory, s"not a Delta table (no _delta_log): $root")
    val commitRe = "^(\\d{20})\\.json$".r
    val versions = dir.listFiles.toSeq.map(_.getName)
      .collect { case commitRe(v) => v.toLong }.sorted
    val ckpts = checkpointVersions(root)
    val head = (versions ++ ckpts).maxOption
      .getOrElse(sys.error(s"empty Delta log at $root"))
    val v = asOf.getOrElse(head)
    require(v >= 0 && v <= head,
      s"version $v does not exist at $root (log head is $head)")
    val ckpt = ckpts.filter(_ <= v).lastOption
    val tail = versions.filter(x => ckpt.forall(_ < x) && x <= v)
    ckpt match {
      case None =>
        require(tail == (0L to v),
          s"unreadable Delta snapshot $v at $root: no checkpoint <= $v " +
            s"and commits $tail are not contiguously 0..$v (vacuumed head?)")
      case Some(c) =>
        require(tail == (c + 1 to v),
          s"unreadable Delta snapshot $v at $root: gap in commit suffix " +
            s"$tail after checkpoint $c")
    }
    reconcile(spark, root, ckpt, tail)
      .collect { case (p, true, pv, st) => (p, pv, st) }
  }

  /** Parse a protocol stats JSON into (numRecords, per-column
    * (min, max)) for the numeric columns it records. */
  def parseStats(json: String): (Long, Map[String, (Double, Double)]) = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def bounds(field: String): Map[String, Double] = {
      val n = node.get(field)
      if (n == null) Map.empty
      else {
        val it = n.fieldNames()
        val b = Map.newBuilder[String, Double]
        while (it.hasNext) { val k = it.next(); b += k -> n.get(k).asDouble() }
        b.result()
      }
    }
    val mins = bounds("minValues"); val maxs = bounds("maxValues")
    (Option(node.get("numRecords")).map(_.asLong()).getOrElse(-1L),
      mins.keySet.intersect(maxs.keySet)
        .map(k => k -> (mins(k), maxs(k))).toMap)
  }

  /** DATA SKIPPING from log stats: the live files of `asOf` whose
    * recorded [min, max] of `column` overlaps [lo, hi], plus how many
    * the stats ruled out WITHOUT opening them. Files with no recorded
    * stats for `column` are conservatively kept — stats ADMIT, the
    * caller's residual predicate confirms, so skipping can only save
    * I/O, never change the answer. */
  def planSkip(spark: SparkSession, root: String, column: String,
      lo: Double, hi: Double, asOf: Option[Long] = None): (Seq[(String, Map[String, String])], Int) = {
    require(lo <= hi, s"empty range [$lo, $hi]")
    val files = snapshotFilesWithStats(spark, root, asOf)
    val (kept, skipped) = files.partition { case (_, _, st) =>
      st.flatMap(s => parseStats(s)._2.get(column)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }
    (kept.map(f => (f._1, f._2)), skipped.size)
  }

  /** CHANGE DATA FEED at the file level: (added, removed) data files
    * between snapshot `fromV` (exclusive) and `toV` (inclusive), each
    * with its partitionValues. For add/remove-only logs (loads, DELETEs,
    * rewrites — no in-file updates) the change rows between two
    * versions are EXACTLY the rows of these files: added files carry
    * inserts, removed files carry deletes, and every file live in both
    * snapshots is untouched. That set difference is the 100 TB CDC win:
    * a consumer scans O(changed files), never the unchanged partitions
    * — the log, bounded metadata, names them without any data diff. */
  def changedFiles(spark: SparkSession, root: String, fromV: Long,
      toV: Long): (Seq[(String, Map[String, String])], Seq[(String, Map[String, String])]) = {
    require(fromV < toV, s"empty change window [$fromV, $toV]")
    val before = snapshotFilesAt(spark, root, Some(fromV))
    val after = snapshotFilesAt(spark, root, Some(toV))
    val beforePaths = before.map(_._1).toSet
    val afterPaths = after.map(_._1).toSet
    (after.filterNot(f => beforePaths(f._1)),
      before.filterNot(f => afterPaths(f._1)))
  }

  /** COMPACTION-AWARE change actions for the window (fromV, toV]: one
    * (version, path, partitionValues, isAdd) row per add/remove with
    * `dataChange = true`, walked commit by commit. This is the
    * protocol's CDC contract that [[changedFiles]]' snapshot diff
    * cannot honor: a compaction (OPTIMIZE) rewrites files with
    * `dataChange = false` — same rows, new layout — and a consumer
    * diffing snapshots would emit that churn as massive spurious
    * deletes + inserts. The per-commit walk skips false actions
    * entirely, and still reads a TRUE-added file's rows even if a
    * later compaction removed the file (remove actions are logical;
    * the bytes live until vacuum). Requires every commit in the window
    * present — loud otherwise (a CDC consumer must not fabricate a
    * window it cannot prove). */
  def changeActions(spark: SparkSession, root: String, fromV: Long,
      toV: Long): Seq[(Long, String, Map[String, String], Boolean)] = {
    require(fromV < toV, s"empty change window [$fromV, $toV]")
    val need = (fromV + 1) to toV
    need.foreach { v =>
      require(java.nio.file.Files.exists(
          java.nio.file.Paths.get(logDir(root), s"${pad(v)}.json")),
        s"change window ($fromV, $toV] needs commit $v at $root " +
          "(vacuumed? CDC cannot replay it)")
    }
    spark.read.schema(StructType(Seq(
        StructField("add", StructType(Seq(
          StructField("path", StringType),
          StructField("partitionValues", MapType(StringType, StringType)),
          StructField("dataChange", BooleanType)))),
        StructField("remove", StructType(Seq(
          StructField("path", StringType),
          StructField("partitionValues", MapType(StringType, StringType)),
          StructField("dataChange", BooleanType)))))))
      .json(need.map(v => s"${logDir(root)}/${pad(v)}.json"): _*)
      .withColumn("version", regexp_extract(col("_metadata.file_name"),
        "^(\\d{20})\\.json$", 1).cast("long"))
      .select(col("version"),
        coalesce(col("add.path"), col("remove.path")).as("path"),
        coalesce(col("add.partitionValues"), col("remove.partitionValues"))
          .as("pv"),
        col("add.path").isNotNull.as("is_add"),
        coalesce(col("add.dataChange"), col("remove.dataChange"))
          .as("data_change"))
      .filter(col("path").isNotNull && col("data_change"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty),
        r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))
  }

  /** Read a snapshot (latest, or AS OF `asOf`), re-attaching
    * identity-partition columns from `partitionValues` (data files omit
    * them, per the protocol). `prune` sees each file's partitionValues
    * BEFORE any parquet read — partition pruning at the metadata level,
    * the 100 TB idiom. Files are grouped by partition tuple (one scan
    * per live partition value, unioned) so the attachment is a
    * constant-folded literal column, not a join. */
  def readSnapshot(spark: SparkSession, root: String,
      prune: Map[String, String] => Boolean = _ => true,
      asOf: Option[Long] = None): DataFrame = {
    val files = snapshotFilesAt(spark, root, asOf).filter(f => prune(f._2))
    require(files.nonEmpty, s"no live files selected from $root")
    readFiles(spark, root, files)
  }

  /** Distributed scan of an explicit (relative path, partitionValues)
    * file set with partition columns re-attached — the shared read face
    * under [[readSnapshot]] and the change-feed consumers (which scan
    * [[changedFiles]] lists, not whole snapshots). */
  def readFiles(spark: SparkSession, root: String,
      files: Seq[(String, Map[String, String])]): DataFrame = {
    require(files.nonEmpty, s"empty file set for $root")
    files.groupBy(_._2).toSeq.sortBy(_._1.toSeq.sorted.mkString(","))
      .map { case (pv, group) =>
        pv.toSeq.sortBy(_._1).foldLeft(
          spark.read.parquet(group.map(g => s"$root/${g._1}"): _*)) {
          case (df, (k, v)) => df.withColumn(k, lit(v))
        }
      }.reduce(_ unionByName _)
  }

  // ------------------------------------------------------------------
  // Writer face — enough of the convention to BUILD conforming tables
  // (fixture construction and the spec's negative cases). Hand-rolled
  // JSON with full string escaping; commit files are written whole.
  // ------------------------------------------------------------------

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def addAction(path: String, pv: Map[String, String], size: Long,
      stats: Option[String] = None, dataChange: Boolean = true): String = {
    val pvj = pv.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
    val statsj = stats.map(s => s""","stats":"${esc(s)}"""").getOrElse("")
    s"""{"add":{"path":"${esc(path)}","partitionValues":{$pvj},""" +
      s""""size":$size,"dataChange":$dataChange$statsj}}"""
  }

  /** The protocol's per-file stats payload (numRecords + single-column
    * min/max) as the JSON string `addAction` embeds. */
  def statsJson(numRecords: Long, column: String, min: Long,
      max: Long): String =
    s"""{"numRecords":$numRecords,"minValues":{"$column":$min},""" +
      s""""maxValues":{"$column":$max}}"""

  def removeAction(path: String, dataChange: Boolean = true): String =
    s"""{"remove":{"path":"${esc(path)}","dataChange":$dataChange}}"""

  def protocolAction: String =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  def metaDataAction(id: String, partitionCols: Seq[String],
      schemaJson: Option[String] = None): String = {
    val pc = partitionCols.map(c => s""""${esc(c)}"""").mkString(",")
    val sj = schemaJson.map(s => s""","schemaString":"${esc(s)}"""").getOrElse("")
    s"""{"metaData":{"id":"${esc(id)}","format":{"provider":"parquet"},""" +
      s""""partitionColumns":[$pc]$sj}}"""
  }

  /** The newest `metaData.schemaString` at or before `asOf` — SCHEMA
    * EVOLUTION state. The protocol evolves a table's schema by writing
    * a new metaData action; data files written under OLDER schemas are
    * never rewritten, so the reader owes the projection. Driver-side
    * Jackson scan of the commit JSONs, newest first — bounded metadata
    * (metaData actions are rare and tiny). */
  def latestSchemaJson(root: String, asOf: Option[Long] = None): Option[String] = {
    val commitRe = "^(\\d{20})\\.json$".r
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    Option(new java.io.File(logDir(root)).listFiles).toSeq.flatten
      .map(_.getName).collect { case commitRe(v) => v.toLong }
      .filter(v => asOf.forall(v <= _)).sorted.reverse.iterator
      .flatMap { v =>
        java.nio.file.Files.readString(
            java.nio.file.Paths.get(logDir(root), s"${pad(v)}.json"))
          .linesIterator.flatMap { line =>
            val node = om.readTree(line)
            Option(node.get("metaData"))
              .flatMap(m => Option(m.get("schemaString"))).map(_.asText())
          }
      }.nextOption()
  }

  /** SCHEMA-EVOLUTION read: every live file projects into the log's
    * CURRENT schema — columns a file predates materialize as typed
    * nulls, columns are cast and ordered per the declaration. The data
    * bytes of pre-evolution files are untouched (that is the point:
    * adding a column to a 100 TB table costs one metadata action, zero
    * file rewrites) and partition columns still attach from
    * partitionValues first. */
  def readSnapshotEvolved(spark: SparkSession, root: String,
      asOf: Option[Long] = None): DataFrame = {
    val schemaJson = latestSchemaJson(root, asOf).getOrElse(
      sys.error(s"no metaData.schemaString in the log at $root"))
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val files = snapshotFilesAt(spark, root, asOf)
    require(files.nonEmpty, s"no live files selected from $root")
    files.groupBy(_._2).toSeq.sortBy(_._1.toSeq.sorted.mkString(","))
      .map { case (pv, group) =>
        // The declared schema is passed to the reader EXPLICITLY — the
        // parquet source then fills columns a file predates with nulls
        // PER FILE. (Relying on inference instead would sample one
        // file's footer for the whole multi-file scan and silently
        // drop or blank the evolved column for the rest.) Partition
        // columns attach from partitionValues, never from file bytes.
        val dataSchema = org.apache.spark.sql.types.StructType(
          schema.fields.filterNot(f => pv.contains(f.name)))
        val withPv = pv.toSeq.sortBy(_._1).foldLeft(
          spark.read.schema(dataSchema)
            .parquet(group.map(g => s"$root/${g._1}"): _*)) {
          case (df, (k, v)) => df.withColumn(k, lit(v))
        }
        withPv.select(schema.fields.toSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
      }.reduce(_ unionByName _)
  }

  def writeCommit(root: String, v: Long, actions: Seq[String]): Unit = {
    val dir = java.nio.file.Paths.get(logDir(root))
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve(s"${pad(v)}.json"),
      actions.mkString("", "\n", "\n"))
  }

  /** Materialize the state as of version `v` (all commits 0..v must
    * still be present) as `<v>.checkpoint.parquet` + `_last_checkpoint`.
    * Tombstones for removed paths are carried so later readers can
    * reconcile against post-checkpoint commits correctly. */
  def writeCheckpoint(spark: SparkSession, root: String, v: Long): Unit = {
    val state = reconcile(spark, root, None, 0L to v)
    val rows = state.map {
      case (p, true, pv, st) => org.apache.spark.sql.Row(
        org.apache.spark.sql.Row(p, pv, 0L, true, st.orNull), null)
      case (p, false, _, _) => org.apache.spark.sql.Row(
        null, org.apache.spark.sql.Row(p, true))
    }
    val tmp = s"${logDir(root)}/.ckpt_tmp_$v"
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), actionSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"checkpoint write produced no part file in $tmp"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(logDir(root), s"${pad(v)}.checkpoint.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ScanSupport.deleteDir(new java.io.File(tmp))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(logDir(root), "_last_checkpoint"),
      s"""{"version":$v,"size":${rows.size}}""")
  }

  /** Log cleanup (what `VACUUM`'s metadata phase does): drop commit
    * JSONs strictly below `before` — legal only once a checkpoint ≥
    * before−1 exists, which the reader's contiguity guard enforces. */
  def cleanLog(root: String, before: Long): Unit = {
    val commitRe = "^(\\d{20})\\.json$".r
    new java.io.File(logDir(root)).listFiles.toSeq.foreach { f =>
      f.getName match {
        case commitRe(v) if v.toLong < before => f.delete(): Unit
        case _ => ()
      }
    }
  }
}

/** Tiny shared fs helper for the foreign-layout writers (kept out of
  * the operator files so sources/ has no operators dependency). */
private[graft] object ScanSupport {
  def deleteDir(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteDir)
    f.delete(): Unit
  }
}
