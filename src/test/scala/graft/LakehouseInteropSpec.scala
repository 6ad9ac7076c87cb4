package graft

import org.apache.spark.sql.functions._
import graft.sources.DeltaInterop
import graft.operators.LakehouseQueries

/** Contract locks for the foreign-lakehouse interop machinery
  * (SURVEY §2.213+): the Delta-convention reader's checkpoint replay,
  * partition-value reattachment, metadata-level pruning, and the loud
  * failure modes an interop reader must NOT paper over.
  */
class LakehouseInteropSpec extends SparkSpec {

  private def freshRoot(name: String): String = {
    val r = s"/tmp/graft_test_delta/${spark.sparkContext.applicationId}/$name"
    graft.sources.ScanSupport.deleteDir(new java.io.File(r))
    new java.io.File(r).mkdirs()
    r
  }

  /** A 2-partition table with one remove: v0 adds p=a (ids 0-4) and
    * p=b (ids 5-9); v1 removes p=b and adds p=c (ids 10-12). */
  private def tinyTable(root: String): Unit = {
    import spark.implicits._
    def stage(sub: String, lo: Int, hi: Int): String = {
      (lo until hi).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/$sub")
      val part = new java.io.File(s"$root/$sub").listFiles
        .find(_.getName.endsWith(".parquet")).get.getName
      s"$sub/$part"
    }
    val fa = stage("pa", 0, 5)
    val fb = stage("pb", 5, 10)
    DeltaInterop.writeCommit(root, 0L, Seq(
      DeltaInterop.protocolAction,
      DeltaInterop.metaDataAction("tiny", Seq("p")),
      DeltaInterop.addAction(fa, Map("p" -> "a"), 0L),
      DeltaInterop.addAction(fb, Map("p" -> "b"), 0L)))
    val fc = stage("pc", 10, 13)
    DeltaInterop.writeCommit(root, 1L, Seq(
      DeltaInterop.removeAction(fb),
      DeltaInterop.addAction(fc, Map("p" -> "c"), 0L)))
  }

  test("snapshot reconciliation: remove tombstones win, adds survive") {
    val root = freshRoot("basic")
    tinyTable(root)
    val files = DeltaInterop.snapshotFiles(spark, root)
    assert(files.size == 2)
    assert(files.map(_._2("p")).sorted == Seq("a", "c"))
    val ids = DeltaInterop.readSnapshot(spark, root)
      .select("id").collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == (0 until 5) ++ (10 until 13))
  }

  test("partition columns come from partitionValues, pruning is pre-scan") {
    val root = freshRoot("prune")
    tinyTable(root)
    // The partition column exists ONLY via reattachment (data files
    // carry just `id`), and a pv-prune selects files before any read.
    val snap = DeltaInterop.readSnapshot(spark, root)
    assert(snap.columns.sorted.toSeq == Seq("id", "p"))
    val onlyA = DeltaInterop.readSnapshot(spark, root,
      prune = pv => pv.get("p").contains("a"))
    assert(onlyA.count() == 5)
    assert(onlyA.select("p").distinct().collect().map(_.getString(0)).toSeq
      == Seq("a"))
  }

  test("checkpoint + vacuumed log head: replay starts at the checkpoint") {
    val root = freshRoot("ckpt")
    tinyTable(root)
    DeltaInterop.writeCheckpoint(spark, root, 1L)
    DeltaInterop.cleanLog(root, before = 2L)
    // Commits 0 and 1 are gone; only the checkpoint carries the state.
    assert(!new java.io.File(s"$root/_delta_log/${"0" * 20}.json").exists())
    assert(DeltaInterop.lastCheckpoint(root).contains(1L))
    val files = DeltaInterop.snapshotFiles(spark, root)
    assert(files.map(_._2("p")).sorted == Seq("a", "c"))
    // A post-checkpoint commit still applies on top of checkpoint state.
    val fcName = new java.io.File(s"$root/pc").listFiles
      .find(_.getName.endsWith(".parquet")).get.getName
    DeltaInterop.writeCommit(root, 2L, Seq(
      DeltaInterop.removeAction(s"pc/$fcName")))
    val after = DeltaInterop.snapshotFiles(spark, root)
    assert(after.map(_._2("p")) == Seq("a"))
    // Checkpoint tombstones hold: pb stays dead even though the
    // checkpoint is the only record of its removal.
    val ids = DeltaInterop.readSnapshot(spark, root)
      .select("id").collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == (0 until 5))
  }

  test("unreadable logs fail loudly: vacuumed head without checkpoint, gapped suffix") {
    val root = freshRoot("vacnockpt")
    tinyTable(root)
    new java.io.File(s"$root/_delta_log/${"0" * 20}.json").delete()
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.snapshotFiles(spark, root)
    }
    assert(e.getMessage.contains("unreadable"))

    val root2 = freshRoot("gap")
    tinyTable(root2)
    DeltaInterop.writeCheckpoint(spark, root2, 0L)
    // Suffix must be contiguous from ckpt+1: drop commit 1, add commit 2.
    new java.io.File(s"$root2/_delta_log/${"0" * 19}1.json").delete()
    DeltaInterop.writeCommit(root2, 2L, Seq(
      DeltaInterop.removeAction("pa/whatever.parquet")))
    val e2 = intercept[IllegalArgumentException] {
      DeltaInterop.snapshotFiles(spark, root2)
    }
    assert(e2.getMessage.contains("gap"))
  }

  // ------------------------------------------------------------------
  // Deletion vectors
  // ------------------------------------------------------------------

  test("deletion vectors: DELETE never rewrites data files; reads are exact") {
    import graft.sources.DeletionVectors
    import spark.implicits._
    val root = s"/tmp/graft_test_delta/${spark.sparkContext.applicationId}/dv"
    graft.sources.ScanSupport.deleteDir(new java.io.File(root))
    (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .repartition(3, col("id"))
      .write.parquet(DeletionVectors.dataDir(root))
    def dataState() = new java.io.File(DeletionVectors.dataDir(root))
      .listFiles.filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    val before = dataState()
    DeletionVectors.markDeleted(spark, root, col("id") % 7 === 0)
    DeletionVectors.markDeleted(spark, root, col("id") % 11 === 0)
    // Not one data byte moved: same files, sizes, mtimes.
    assert(dataState() == before)
    val live = DeletionVectors.readLive(spark, root)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(live.toSeq == (0L until 100L).filter(i => i % 7 != 0 && i % 11 != 0))
    // Set semantics: id=77 matched BOTH predicates (two sidecar marks),
    // the deduplicated audit face counts it once.
    val marked = DeletionVectors.deletedPositions(spark, root).count()
    assert(marked == (0L until 100L).count(i => i % 7 == 0 || i % 11 == 0))
  }

  test("deletion vectors: live read is one scan + broadcast anti-join") {
    import graft.sources.DeletionVectors
    import spark.implicits._
    val root = s"/tmp/graft_test_delta/${spark.sparkContext.applicationId}/dvplan"
    graft.sources.ScanSupport.deleteDir(new java.io.File(root))
    (0 until 10).toDF("id").write.parquet(DeletionVectors.dataDir(root))
    DeletionVectors.markDeleted(spark, root, col("id") === 3)
    val plan = DeletionVectors.readLive(spark, root)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  // ------------------------------------------------------------------
  // Iceberg-shaped two-level metadata
  // ------------------------------------------------------------------

  test("iceberg shape: avro manifests roundtrip and plan two-level prunes") {
    import graft.sources.IcebergInterop
    import IcebergInterop.{ManifestEntry, ManifestFile, Snapshot}
    import spark.implicits._
    val root = s"/tmp/graft_test_delta/${spark.sparkContext.applicationId}/ice"
    graft.sources.ScanSupport.deleteDir(new java.io.File(root))
    // Four 1-file "partitions" 0..3 under two manifests with range
    // summaries [0,1] and [2,3].
    def stage(b: Long): ManifestEntry = {
      val sub = s"data/b$b"
      Seq(b * 10, b * 10 + 1).toDF("v").coalesce(1)
        .write.parquet(s"$root/$sub")
      val part = new java.io.File(s"$root/$sub").listFiles
        .find(_.getName.endsWith(".parquet")).get.getName
      ManifestEntry(1, s"$sub/$part", 2L, b)
    }
    val m1 = ManifestFile(IcebergInterop.writeManifest(root, "manifest-1",
      Seq(stage(0L), stage(1L))), 2, 0L, 1L)
    val m2 = ManifestFile(IcebergInterop.writeManifest(root, "manifest-2",
      Seq(stage(2L), stage(3L))), 2, 2L, 3L)
    val list = IcebergInterop.writeManifestList(root, 7L, Seq(m1, m2))
    IcebergInterop.writeMetadata(root, 1, 7L, Seq(Snapshot(7L, None, list)))
    // Avro roundtrip is exact.
    assert(IcebergInterop.readManifestList(root, list) == Seq(m1, m2))
    assert(IcebergInterop.readManifest(root, m1.manifestPath).map(_.partition)
      == Seq(0L, 1L))
    // Level-1 prune: wanting only bucket 2 never opens manifest-1 …
    val (files, pruned) = IcebergInterop.planFiles(root, None, Some(Set(2L)))
    assert(pruned == 1)
    // … and level-2 prunes bucket 3 out of the surviving manifest.
    assert(files.map(_.partition) == Seq(2L))
    val vals = IcebergInterop.readSnapshot(spark, root, None, Some(Set(2L)))
      .collect().map(_.getLong(0)).sorted
    assert(vals.toSeq == Seq(20L, 21L))
  }

  test("iceberg shape: append reuses prior manifests; snapshots stay readable") {
    import graft.operators.LakehouseQueries
    import graft.sources.IcebergInterop
    // Build the declared key's table, then inspect its metadata.
    LakehouseQueries.queries("scan_iceberg_snapshot_interop")(spark, sf)
      .collect()
    val root =
      s"${graft.operators.ScanQueries.scratch(spark, sf)}/iceberg_orders"
    val (current, snaps) = IcebergInterop.readMetadata(root)
    assert(current == 202L)
    assert(snaps.map(_.snapshotId) == Seq(101L, 202L))
    assert(snaps(1).parentSnapshotId.contains(101L))
    // Manifest REUSE: snapshot 202's list carries 101's manifest files
    // verbatim (append = O(new) metadata, not O(table)).
    val l1 = IcebergInterop.readManifestList(root, snaps(0).manifestList)
    val l2 = IcebergInterop.readManifestList(root, snaps(1).manifestList)
    assert(l1.map(_.manifestPath).toSet.subsetOf(l2.map(_.manifestPath).toSet))
    assert(l2.size == 4)
    // Time travel: snapshot 101 is exactly the even-custkey half.
    val orders = Tables.t(spark, sf, "orders")
    val evens = orders.filter(col("o_custkey") % 2 === 0).count()
    assert(IcebergInterop.readSnapshot(spark, root, Some(101L), None).count()
      == evens)
    assert(IcebergInterop.readSnapshot(spark, root, None, None).count()
      == orders.count())
  }

  // ------------------------------------------------------------------
  // Time travel + change feed (§2.216-217)
  // ------------------------------------------------------------------

  test("time travel: as-of replay is checkpoint-bounded and loud per version") {
    val root = freshRoot("ttravel")
    tinyTable(root)
    def pvsAt(v: Long) =
      DeltaInterop.snapshotFilesAt(spark, root, Some(v)).map(_._2("p")).sorted
    assert(pvsAt(0L) == Seq("a", "b"))
    assert(pvsAt(1L) == Seq("a", "c"))
    // A version past the head does not exist.
    val e0 = intercept[IllegalArgumentException] {
      DeltaInterop.snapshotFilesAt(spark, root, Some(99L))
    }
    assert(e0.getMessage.contains("does not exist"))
    // Vacuum the head behind a checkpoint at 1: v1 stays readable
    // FROM THE CHECKPOINT, v0 is gone and must fail loudly — not
    // silently serve some other snapshot.
    DeltaInterop.writeCheckpoint(spark, root, 1L)
    DeltaInterop.cleanLog(root, before = 2L)
    assert(pvsAt(1L) == Seq("a", "c"))
    val e1 = intercept[IllegalArgumentException] {
      DeltaInterop.snapshotFilesAt(spark, root, Some(0L))
    }
    assert(e1.getMessage.contains("unreadable"))
  }

  test("change feed: the file diff names exactly the changed files") {
    val root = freshRoot("cdf")
    tinyTable(root)
    // v0 -> v1: pb removed, pc added; pa (the unchanged bulk) is in
    // NEITHER list — a CDC consumer never scans it.
    val (added, removed) = DeltaInterop.changedFiles(spark, root, 0L, 1L)
    assert(added.map(_._2("p")) == Seq("c"))
    assert(removed.map(_._2("p")) == Seq("b"))
    // readFiles re-attaches partition values on the diffed scans.
    val ins = DeltaInterop.readFiles(spark, root, added)
    assert(ins.count() == 3 && ins.select("p").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("c"))
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.changedFiles(spark, root, 1L, 1L)
    }
    assert(e.getMessage.contains("empty change window"))
  }

  test("log stats: parse, skip-plan, and survive checkpoint roundtrip") {
    import spark.implicits._
    val root = freshRoot("stats")
    def stage(sub: String, lo: Int, hi: Int): String = {
      (lo until hi).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/$sub")
      val part = new java.io.File(s"$root/$sub").listFiles
        .find(_.getName.endsWith(".parquet")).get.getName
      s"$sub/$part"
    }
    val f1 = stage("lo", 0, 50)
    val f2 = stage("hi", 50, 100)
    DeltaInterop.writeCommit(root, 0L, Seq(
      DeltaInterop.protocolAction,
      DeltaInterop.metaDataAction("stats", Seq.empty),
      DeltaInterop.addAction(f1, Map.empty, 0L,
        Some(DeltaInterop.statsJson(50, "id", 0, 49))),
      DeltaInterop.addAction(f2, Map.empty, 0L,
        Some(DeltaInterop.statsJson(50, "id", 50, 99)))))
    val (n, b) = DeltaInterop.parseStats(
      DeltaInterop.statsJson(50, "id", 0, 49))
    assert(n == 50 && b("id") == ((0.0, 49.0)))
    // A [0, 30] plan keeps lo, skips hi — without opening either.
    val (kept, skipped) = DeltaInterop.planSkip(spark, root, "id", 0, 30)
    assert(kept.map(_._1) == Seq(f1) && skipped == 1)
    // Stats for an unrecorded column keep everything (admit-only).
    val (all, none) = DeltaInterop.planSkip(spark, root, "other", 0, 1)
    assert(all.size == 2 && none == 0)
    // Stats survive the checkpoint parquet roundtrip: after vacuuming
    // the commits, the checkpoint is the only stats carrier.
    DeltaInterop.writeCheckpoint(spark, root, 0L)
    DeltaInterop.cleanLog(root, before = 1L)
    val (kept2, skipped2) = DeltaInterop.planSkip(spark, root, "id", 0, 30)
    assert(kept2.map(_._1) == Seq(f1) && skipped2 == 1)
  }

  test("incremental view == direct aggregate at every maintained version") {
    // The declared key's v1/v3 view states must equal recomputing the
    // aggregates from the time-travel snapshots directly.
    val rows = LakehouseQueries.queries("etl_incremental_view_cdf")(spark, sf)
      .collect()
    val root =
      s"${graft.operators.ScanQueries.scratch(spark, sf)}/delta_cdf"
    for (v <- Seq(1, 3)) {
      val direct = DeltaInterop.readSnapshot(spark, root, asOf = Some(v.toLong))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val maintained = rows.filter(_.getInt(3) == v)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(maintained == direct, s"view at v$v diverged from direct")
    }
  }

  test("schema evolution: newest schemaString wins, old files project as nulls") {
    import spark.implicits._
    val root = freshRoot("evo")
    def stage(sub: String, df: org.apache.spark.sql.DataFrame): String = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$root/$sub")
      val part = new java.io.File(s"$root/$sub").listFiles
        .find(_.getName.endsWith(".parquet")).get.getName
      s"$sub/$part"
    }
    val g1 = (0 until 5).toDF("id")
    val g2 = (5 until 8).map(i => (i, i * 10.0)).toDF("id", "v")
    DeltaInterop.writeCommit(root, 0L, Seq(
      DeltaInterop.protocolAction,
      DeltaInterop.metaDataAction("evo", Seq.empty, Some(g1.schema.json)),
      DeltaInterop.addAction(stage("g1", g1), Map.empty, 0L)))
    DeltaInterop.writeCommit(root, 1L, Seq(
      DeltaInterop.metaDataAction("evo", Seq.empty, Some(g2.schema.json)),
      DeltaInterop.addAction(stage("g2", g2), Map.empty, 0L)))
    // Newest declaration wins; as-of v0 sees the ORIGINAL declaration.
    assert(DeltaInterop.latestSchemaJson(root).contains(g2.schema.json))
    assert(DeltaInterop.latestSchemaJson(root, Some(0L))
      .contains(g1.schema.json))
    val evolved = DeltaInterop.readSnapshotEvolved(spark, root)
    assert(evolved.columns.toSeq == Seq("id", "v"))
    val rows = evolved.collect().map(r =>
      (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1)
    assert(rows.take(5).forall(_._2.isEmpty)) // pre-evolution rows
    assert(rows.drop(5).map(_._2.get).toSeq == Seq(50.0, 60.0, 70.0))
    // Time travel composes: the v0 snapshot under the v0 schema.
    assert(DeltaInterop.readSnapshotEvolved(spark, root, Some(0L))
      .columns.toSeq == Seq("id"))
  }

  test("snapshot expiration is reference-counted; descendants stay intact") {
    import graft.sources.IcebergInterop
    import IcebergInterop.{ManifestEntry, ManifestFile, Snapshot}
    import spark.implicits._
    val root = s"/tmp/graft_test_delta/${spark.sparkContext.applicationId}/exp"
    graft.sources.ScanSupport.deleteDir(new java.io.File(root))
    def stage(b: Long): ManifestEntry = {
      Seq(b).toDF("v").coalesce(1).write.parquet(s"$root/data/b$b")
      val part = new java.io.File(s"$root/data/b$b").listFiles
        .find(_.getName.endsWith(".parquet")).get.getName
      ManifestEntry(1, s"data/b$b/$part", 1L, b)
    }
    // Snapshot 1 carries m1; snapshot 2 REUSES m1 and adds m2; snapshot
    // 1 also carries an m0 nothing else references (a true orphan).
    val m0 = ManifestFile(IcebergInterop.writeManifest(root, "manifest-o",
      Seq(stage(9L))), 1, 9L, 9L)
    val m1 = ManifestFile(IcebergInterop.writeManifest(root, "manifest-a",
      Seq(stage(0L))), 1, 0L, 0L)
    val m2 = ManifestFile(IcebergInterop.writeManifest(root, "manifest-b",
      Seq(stage(1L))), 1, 1L, 1L)
    val l1 = IcebergInterop.writeManifestList(root, 1L, Seq(m0, m1))
    val l2 = IcebergInterop.writeManifestList(root, 2L,
      Seq(m1.copy(addedFilesCount = 0), m2))
    IcebergInterop.writeMetadata(root, 2, 2L, Seq(
      Snapshot(1L, None, l1), Snapshot(2L, Some(1L), l2)))
    // Expiring the current snapshot is refused.
    val e = intercept[IllegalArgumentException] {
      IcebergInterop.expireSnapshots(root, Set(2L))
    }
    assert(e.getMessage.contains("current"))
    val (lists, orphans) = IcebergInterop.expireSnapshots(root, Set(1L))
    assert(lists == 1 && orphans == 1) // l1 gone, m0 swept, m1 SURVIVES
    assert(!new java.io.File(s"$root/$l1").exists())
    assert(new java.io.File(s"$root/${m1.manifestPath}").exists())
    val (current, snaps) = IcebergInterop.readMetadata(root)
    assert(current == 2L && snaps.map(_.snapshotId) == Seq(2L))
    // The descendant still reads exactly its files.
    assert(IcebergInterop.readSnapshot(spark, root, None, None)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L))
    // The expired id fails loudly.
    intercept[RuntimeException] {
      IcebergInterop.readSnapshot(spark, root, Some(1L), None)
    }
  }

  test("change actions skip dataChange=false; snapshot diff does not") {
    import spark.implicits._
    val root = freshRoot("compact")
    def stage(sub: String, lo: Int, hi: Int): String = {
      (lo until hi).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/$sub")
      val part = new java.io.File(s"$root/$sub").listFiles
        .find(_.getName.endsWith(".parquet")).get.getName
      s"$sub/$part"
    }
    val f1 = stage("f1", 0, 5)
    val f2 = stage("f2", 5, 10)
    DeltaInterop.writeCommit(root, 0L, Seq(
      DeltaInterop.protocolAction,
      DeltaInterop.metaDataAction("cmp", Seq.empty),
      DeltaInterop.addAction(f1, Map.empty, 0L),
      DeltaInterop.addAction(f2, Map.empty, 0L)))
    val c1 = stage("c1", 0, 10)
    DeltaInterop.writeCommit(root, 1L, Seq(
      DeltaInterop.removeAction(f1, dataChange = false),
      DeltaInterop.removeAction(f2, dataChange = false),
      DeltaInterop.addAction(c1, Map.empty, 0L, dataChange = false)))
    // The compaction window carries NO change actions …
    assert(DeltaInterop.changeActions(spark, root, 0L, 1L).isEmpty)
    // … while the snapshot diff reports the full layout churn.
    val (a, r) = DeltaInterop.changedFiles(spark, root, 0L, 1L)
    assert(a.size == 1 && r.size == 2)
    // Rows are untouched across the compaction.
    assert(DeltaInterop.readSnapshot(spark, root)
      .collect().map(_.getInt(0)).sorted.toSeq == (0 until 10))
    // A true append after the compaction IS a change action — and the
    // walk refuses a window whose commits were vacuumed.
    val f3 = stage("f3", 10, 12)
    DeltaInterop.writeCommit(root, 2L, Seq(
      DeltaInterop.addAction(f3, Map.empty, 0L)))
    val acts = DeltaInterop.changeActions(spark, root, 0L, 2L)
    assert(acts.map(t => (t._1, t._2, t._4)) == Seq((2L, f3, true)))
    DeltaInterop.writeCheckpoint(spark, root, 2L)
    DeltaInterop.cleanLog(root, before = 2L)
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.changeActions(spark, root, 0L, 2L)
    }
    assert(e.getMessage.contains("needs commit"))
  }

  // ------------------------------------------------------------------
  // Iceberg merge-on-read position deletes (§2.218)
  // ------------------------------------------------------------------

  test("iceberg MOR: delete manifests prune with data, deletes apply exactly") {
    import graft.sources.IcebergInterop
    // Build the declared key's table, then inspect plan + semantics.
    LakehouseQueries.queries("scan_iceberg_position_deletes")(spark, sf)
      .collect()
    val root =
      s"${graft.operators.ScanQueries.scratch(spark, sf)}/iceberg_mor"
    // The current snapshot's list carries 2 data + 2 delete manifests;
    // a bucket-{0,1} plan prunes one of EACH unopened.
    val (_, snaps) = IcebergInterop.readMetadata(root)
    val l2 = IcebergInterop.readManifestList(root, snaps(1).manifestList)
    assert(l2.map(_.content).sorted == Seq(0, 0, 1, 1))
    val plan = IcebergInterop.planScan(root, None, Some(Set(0L, 1L)))
    assert(plan.dataFiles.size == 2 && plan.deleteFiles.size == 2 &&
      plan.prunedManifests == 2)
    // Snapshot 101 (pre-delete) still reads the FULL table — the
    // delete snapshot rewrote no data file (MOR, not COW).
    val orders = Tables.t(spark, sf, "orders")
    assert(IcebergInterop.readSnapshot(spark, root, Some(101L), None).count()
      == orders.count())
    // Live read == the congruence filter, and the anti-join broadcasts.
    val live = IcebergInterop.readSnapshotLive(spark, root, None, None)
    assert(live.count() ==
      orders.filter(col("o_custkey") % 13 =!= 0).count())
    val planStr = live.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastHashJoin") &&
      planStr.contains("LeftAnti") && !planStr.contains("SortMergeJoin"),
      s"expected broadcast anti-join, got:\n$planStr")
  }

  test("declared key: latest snapshot == A + (R & qty>=25), 2 live files") {
    val df = LakehouseQueries.queries("scan_delta_log_interop")(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "R"))
    val li = Tables.t(spark, sf, "lineitem")
    val expA = li.filter(col("l_returnflag") === "A").count()
    val expR = li.filter(col("l_returnflag") === "R" &&
      col("l_quantity") >= 25).count()
    assert(rows(0).getLong(1) == expA)
    assert(rows(1).getLong(1) == expR)
    assert(rows.forall(_.getInt(3) == 2))
  }
}
