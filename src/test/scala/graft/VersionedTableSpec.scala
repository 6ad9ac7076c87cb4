package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** The commit-log table format behind etl_time_travel /
  * scan_manifest_prune: snapshot resolution, time travel, history from
  * metadata alone, and the files-skipped invariant the SQL oracle
  * cannot see.
  */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_vtab").toString

  test("overwrite/append chain: every version stays readable, snapshots isolate") {
    val root = freshRoot()
    assert(VersionedTable.latestVersion(root) == -1L)
    val v0 = VersionedTable.commit(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "overwrite")
    val v1 = VersionedTable.commit(spark, root,
      Seq((3L, "c")).toDF("id", "v"), "append")
    val v2 = VersionedTable.commit(spark, root,
      Seq((9L, "z")).toDF("id", "v"), "overwrite")
    val v3 = VersionedTable.commit(spark, root,
      Seq((10L, "y")).toDF("id", "v"), "append")
    assert((v0, v1, v2, v3) == (0L, 1L, 2L, 3L))
    def ids(v: Long): Set[Long] =
      VersionedTable.readVersion(spark, root, v)
        .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(0) == Set(1L, 2L))
    assert(ids(1) == Set(1L, 2L, 3L)) // append accumulates
    assert(ids(2) == Set(9L))         // overwrite resets the chain
    assert(ids(3) == Set(9L, 10L))
    assert(VersionedTable.readLatest(spark, root)
      .count() == 2L)
    // History is manifest-only metadata and matches the commits.
    val h = VersionedTable.history(spark, root)
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(h.toSeq == Seq((0L, "overwrite", 2L), (1L, "append", 1L),
      (2L, "overwrite", 1L), (3L, "append", 1L)))
  }

  test("a foreign manifest landing at the attempted version triggers a retry, not a clobber") {
    val root = freshRoot()
    VersionedTable.commit(spark, root, Seq((1L, "a")).toDF("id", "v"),
      "overwrite")
    // Simulate a concurrent writer owning version 1: its manifest is
    // already committed when our writer computes attempt = 1.
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$root/_commits/0.json"),
      java.nio.file.Paths.get(s"$root/_commits/1.json"))
    val got = VersionedTable.commit(spark, root,
      Seq((2L, "b")).toDF("id", "v"), "append")
    assert(got == 2L, s"should have retried past the taken slot, got $got")
    assert(VersionedTable.readVersion(spark, root, 2L)
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("tryPublish: the LOSING branch itself — slot taken => false, winner's bytes untouched") {
    // The round-8 review caught the original protocol using
    // Files.move(ATOMIC_MOVE), whose POSIX rename silently REPLACES an
    // existing target — the race branch was dead code and a loser
    // clobbered the winner. This drives the publish primitive at the
    // exact interleaving commit() cannot reach from the public API
    // (foreign manifest appearing AFTER the attempt number was
    // chosen): the second publish to the same slot must FAIL and must
    // NOT rewrite the winner's manifest.
    val root = freshRoot()
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/_commits"))
    val winner = """{"version":5,"op":"append","dir":"w","stats_cols":[],"files":[]}"""
    val loser = """{"version":5,"op":"overwrite","dir":"l","stats_cols":[],"files":[]}"""
    assert(VersionedTable.tryPublish(root, 5L, winner))
    assert(!VersionedTable.tryPublish(root, 5L, loser),
      "second publish to a taken slot must lose")
    val onDisk = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/_commits/5.json")).trim
    assert(onDisk == winner, s"winner's manifest was clobbered: $onDisk")
    // No temp litter left behind by either attempt.
    val leftovers = new java.io.File(s"$root/_commits").listFiles()
      .map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"temp files leaked: ${leftovers.toSeq}")
  }

  test("manifest pruning skips non-overlapping files and never changes the answer") {
    val root = freshRoot()
    // 8 range-partitioned files over id 0..7999 — tight disjoint ranges.
    VersionedTable.commit(spark, root,
      spark.range(8000).select(col("id"), (col("id") % 97).as("x"))
        .repartitionByRange(8, col("id")),
      "overwrite", statsCols = Seq("id"))
    val ranges = VersionedTable.fileRangesFor(spark, root, 0L, "id")
    assert(ranges.size == 8)
    val (pruned, chosen) =
      VersionedTable.prunedRead(spark, root, 0L, "id", 100.0, 900.0)
    assert(chosen.size < 8,
      s"pruning skipped nothing: ${chosen.size} of 8 files chosen")
    // Answer identical to the unpruned filtered read.
    val full = VersionedTable.readVersion(spark, root, 0L)
      .filter(col("id") >= 100 && col("id") <= 900)
    assert(pruned.count() == full.count())
    assert(pruned.agg(sum("x")).head().getLong(0) ==
      full.agg(sum("x")).head().getLong(0))
    // A range beyond every file: zero files, empty frame, same schema.
    val (none, zero) =
      VersionedTable.prunedRead(spark, root, 0L, "id", 1.0e9, 2.0e9)
    assert(zero.isEmpty && none.count() == 0L)
    assert(none.columns.toSeq == full.columns.toSeq)
  }

  test("files without recorded stats are kept conservatively") {
    val root = freshRoot()
    VersionedTable.commit(spark, root,
      spark.range(100).toDF("id"), "overwrite") // NO statsCols
    val (df, chosen) =
      VersionedTable.prunedRead(spark, root, 0L, "id", 0.0, 10.0)
    assert(chosen.nonEmpty, "stat-less files must be admitted, not skipped")
    assert(df.count() == 11L)
  }

  test("all-NULL / NaN stats columns record NO range, never [0,0]") {
    // Round-9 advice fix: null min/max used to null-unbox to 0.0 and
    // fabricate a [0.0, 0.0] range; NaN emitted non-JSON tokens. Both
    // now skip the range entry, so fileRangesFor reports nothing and
    // prunedRead keeps the files conservatively.
    val root = freshRoot()
    VersionedTable.commit(spark, root,
      spark.range(50).select(col("id"),
        lit(null).cast("double").as("allnull"),
        when(col("id") === 0, lit(Double.NaN)).otherwise(col("id") * 1.0)
          .as("hasnan"))
        .coalesce(1),
      "overwrite", statsCols = Seq("allnull", "hasnan"))
    assert(VersionedTable.fileRangesFor(spark, root, 0L, "allnull").isEmpty,
      "all-NULL column must have no recorded range")
    assert(VersionedTable.fileRangesFor(spark, root, 0L, "hasnan").isEmpty,
      "NaN-containing min/max must have no recorded range")
    // Rangeless ⇒ conservatively kept; residual filter still correct.
    val (df, chosen) =
      VersionedTable.prunedRead(spark, root, 0L, "hasnan", 10.0, 20.0)
    assert(chosen.nonEmpty)
    assert(df.count() == 11L)
    // The manifest is still valid JSON for the lenient reader path.
    assert(VersionedTable.history(spark, root).count() == 1L)
  }

  test("vacuum: retained reads identical, past-retention fails loudly, files gone") {
    val root = freshRoot()
    VersionedTable.commit(spark, root,
      spark.range(100).toDF("id"), "overwrite")                  // v0
    VersionedTable.commit(spark, root,
      spark.range(100, 150).toDF("id"), "append")                // v1
    VersionedTable.commit(spark, root,
      spark.range(1000, 1080).toDF("id"), "overwrite")           // v2
    VersionedTable.commit(spark, root,
      spark.range(2000, 2020).toDF("id"), "append")              // v3
    val beforeV2 = VersionedTable.readVersion(spark, root, 2L)
      .agg(sum("id")).head().getLong(0)
    val beforeV3 = VersionedTable.readVersion(spark, root, 3L)
      .agg(sum("id")).head().getLong(0)
    val dataDirsBefore = new java.io.File(s"$root/data").listFiles().length
    val (dropped, deleted) =
      VersionedTable.vacuum(spark, root, retainLast = 2, orphanGraceMs = 0L)
    assert(dropped == Seq(0L, 1L), s"dropped $dropped")
    assert(deleted.size == 2, s"deleted dirs: $deleted")
    assert(new java.io.File(s"$root/data").listFiles().length ==
      dataDirsBefore - 2)
    // Retained versions answer byte-identically.
    assert(VersionedTable.readVersion(spark, root, 2L)
      .agg(sum("id")).head().getLong(0) == beforeV2)
    assert(VersionedTable.readVersion(spark, root, 3L)
      .agg(sum("id")).head().getLong(0) == beforeV3)
    // Past retention: loud failure, not silent empties.
    val err = intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, root, 1L)
    }
    assert(err.getMessage.contains("no committed version"))
    // The audit face shows only the surviving log.
    assert(VersionedTable.history(spark, root).count() == 2L)
    // Vacuum keeps the whole retained CHAIN: retaining 1 from {2,3}
    // must still keep v2 (v3's snapshot starts at the v2 overwrite).
    val (dropped2, _) =
      VersionedTable.vacuum(spark, root, retainLast = 1, orphanGraceMs = 0L)
    assert(dropped2.isEmpty, "v2 is in v3's chain and must survive")
  }

  test("checkpoint: O(delta) planning reads the same snapshot, composes with commits after") {
    val root = freshRoot()
    VersionedTable.commit(spark, root,
      spark.range(10).toDF("id"), "overwrite")                   // v0
    VersionedTable.commit(spark, root,
      spark.range(10, 30).toDF("id"), "append")                  // v1
    assert(VersionedTable.checkpoint(spark, root) == 1L)
    assert(VersionedTable.listCheckpoints(root) == Seq(1L))
    // Snapshot planned THROUGH the checkpoint == the raw-log answer.
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 30L)
    // Commits after the checkpoint compose: an append adds to it...
    VersionedTable.commit(spark, root,
      spark.range(100, 105).toDF("id"), "append")                // v2
    assert(VersionedTable.readLatest(spark, root).count() == 35L)
    // ...and a later overwrite supersedes it entirely.
    VersionedTable.commit(spark, root,
      spark.range(7).toDF("id"), "overwrite")                    // v3
    assert(VersionedTable.readLatest(spark, root).count() == 7L)
    // Time travel to pre-checkpoint versions still works (raw log).
    assert(VersionedTable.readVersion(spark, root, 0L).count() == 10L)
    // Checkpointing is idempotent at a version (racing dup loses).
    VersionedTable.checkpoint(spark, root)
    VersionedTable.checkpoint(spark, root)
    assert(VersionedTable.listCheckpoints(root) == Seq(1L, 3L))
  }

  test("merge: updates replace matched keys, insert unmatched, carry the rest") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.commit(spark, root,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("k", "tag", "x"), "overwrite")
    val v = VersionedTable.merge(spark, root,
      Seq((2L, "B", 200.0), (9L, "new", 90.0)).toDF("k", "tag", "x"),
      keys = Seq("k"))
    assert(v == 1L)
    val got = VersionedTable.readLatest(spark, root)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B", 200.0),
      (3L, "c", 30.0), (9L, "new", 90.0)))
  }

  test("deleteWhere: survivors exact, pre-delete version still sees every row") {
    val root = freshRoot()
    VersionedTable.commit(spark, root,
      Seq((1L, "keep"), (2L, "drop"), (3L, "keep"), (4L, "drop"))
        .toDF("id", "v"), "overwrite")
    val dv = VersionedTable.deleteWhere(spark, root, col("v") === "drop")
    assert(dv == 1L)
    val now = VersionedTable.readLatest(spark, root)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(now == Set(1L, 3L), "delete must be exact set difference")
    // Logical delete: the pre-delete snapshot is untouched until vacuum.
    val before = VersionedTable.readVersion(spark, root, 0L).count()
    assert(before == 4L, "version 0 must still see the deleted rows")
    // Deleting everything leaves an empty (but readable) version.
    VersionedTable.deleteWhere(spark, root, lit(true))
    assert(VersionedTable.readLatest(spark, root).count() == 0L)
  }

  test("optimize: compacts + clusters; old versions untouched; pruning bites") {
    val root = freshRoot()
    VersionedTable.commit(spark, root,
      spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
        .repartition(12), "overwrite", Seq("id"))
    VersionedTable.commit(spark, root,
      spark.range(1000, 2000).select(col("id"), (col("id") % 7).as("k"))
        .repartition(6), "append", Seq("id"))
    val filesBefore =
      VersionedTable.fileRangesFor(spark, root, 1L, "id").size
    assert(filesBefore > 10, s"fixture must start fragmented: $filesBefore")
    val ov = VersionedTable.optimize(spark, root, "id", 2)
    assert(ov == 2L)
    // Content is IDENTICAL (count + checksum), just re-laid-out.
    val after = VersionedTable.readVersion(spark, root, 2L)
    assert(after.count() == 2000L)
    assert(after.agg(sum("id")).head.getLong(0) == 1999000L)
    // 2 files with tight, non-overlapping id ranges.
    val ranges = VersionedTable.fileRangesFor(spark, root, 2L, "id")
      .map { case (_, lo, hi) => (lo, hi) }.sorted
    assert(ranges.size == 2, s"expected 2 clustered files: $ranges")
    assert(ranges(0)._2 < ranges(1)._1,
      s"ranges must not overlap after clustering: $ranges")
    // Time travel still plans the OLD manifests/files, untouched.
    assert(VersionedTable.fileRangesFor(spark, root, 1L, "id")
      .size == filesBefore)
    assert(VersionedTable.readVersion(spark, root, 1L).count() == 2000L)
    // Manifest pruning now reads 1 of the 2 files for a low range.
    val (pdf, chosen) =
      VersionedTable.prunedRead(spark, root, 2L, "id", 0.0, 100.0)
    assert(chosen.size == 1, s"prune should pick 1 file: $chosen")
    assert(pdf.count() == 101L)
    // History records the op distinctly.
    val ops = VersionedTable.history(spark, root)
      .orderBy("version").select("op").collect().map(_.getString(0)).toSeq
    assert(ops == Seq("overwrite", "append", "optimize"))
  }

  test("deleteWhere: NULL predicate rows are KEPT (delete only where TRUE)") {
    val root = freshRoot()
    // Row 2 has v = NULL → cond (v = 'drop') evaluates NULL; SQL
    // three-valued DELETE semantics keep it (a bare filter(!cond)
    // would silently drop it — the round-10 ADVICE finding).
    VersionedTable.commit(spark, root,
      Seq((1L, Some("keep")), (2L, None), (3L, Some("drop")))
        .toDF("id", "v"), "overwrite")
    VersionedTable.deleteWhere(spark, root, col("v") === "drop")
    val now = VersionedTable.readLatest(spark, root)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(now == Set(1L, 2L),
      "NULL-predicate row must survive a DELETE WHERE")
  }

  test("vacuum reclaims a just-dropped version's data dir regardless of age") {
    val root = freshRoot()
    VersionedTable.commit(spark, root,
      Seq((1L, "a")).toDF("id", "v"), "overwrite")
    VersionedTable.commit(spark, root,
      Seq((9L, "z")).toDF("id", "v"), "overwrite")
    // Default-grace vacuum: the v0 dir was JUST written (age ≈ 0) but
    // is referenced by a dropped manifest — known-expired, so it must
    // be reclaimed even under the 24h orphan grace.
    val (dropped, deleted) =
      VersionedTable.vacuum(spark, root, retainLast = 1)
    assert(dropped == Seq(0L))
    assert(deleted.nonEmpty,
      "expired data dir must be deleted under the default grace")
    assert(VersionedTable.readLatest(spark, root)
      .select("id").collect().map(_.getLong(0)).toSet == Set(9L))
  }

  test("commitIf: stale expected version loses WITHOUT clobbering, staging cleaned") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.commit(spark, root,
      Seq((1L, 1.0)).toDF("k", "x"), "overwrite")                // v0
    // A merge computed against v0...
    val stale = Seq((1L, 99.0)).toDF("k", "x")
    // ...while a foreign writer lands v1 first.
    VersionedTable.commit(spark, root,
      Seq((2L, 2.0)).toDF("k", "x"), "append")                   // v1
    // The stale transaction must FAIL (not blind-take slot 2 and
    // silently drop the foreign row from its merged view)...
    assert(VersionedTable.commitIf(spark, root, stale, "overwrite",
      Seq.empty, expectedLatest = 0L) == -1L)
    assert(VersionedTable.latestVersion(root) == 1L)
    assert(VersionedTable.readLatest(spark, root).count() == 2L)
    // ...and its staged dir is cleaned up (only v0+v1 dirs remain).
    assert(new java.io.File(s"$root/data").listFiles().length == 2)
    // The merge LOOP then converges re-reading the winner's state:
    // the re-derived merge sees both the foreign row and the update.
    VersionedTable.merge(spark, root,
      Seq((1L, 99.0)).toDF("k", "x"), keys = Seq("k"))
    val got = VersionedTable.readLatest(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 99.0), (2L, 2.0)))
  }

  test("streaming mergeSink: table latest == batch aggregate; batch replay is snapshot-idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Event, GraftStreams}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = freshRoot()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_msink").toString
    // Deterministic synthetic stream: 120 events over 8 users.
    val evs = (0 until 120).map(i => Event(i.toLong, 1700000000000L + i * 60000L,
      (i % 8).toLong, if (i % 5 == 0) "purchase" else "click", (i % 13) * 1.5))
    val mem = MemoryStream[Event]
    // Per-user running profile in Update mode: merge replaces the
    // user's row each time their group changes.
    val agg = mem.toDF().groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
    val q = GraftStreams.mergeSink(agg, root, Seq("user_id"), ckpt)
    evs.grouped(40).foreach { chunk =>
      mem.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val got = VersionedTable.readLatest(spark, root).orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = evs.groupBy(_.user_id).toSeq.sortBy(_._1).map { case (u, es) =>
      (u, es.size.toLong, es.map(_.value).max)
    }
    assert(got == want, s"stream-maintained table != batch aggregate")
    // At-least-once replay: re-merging the LAST batch's groups again
    // commits a new version but the current snapshot is unchanged —
    // the sink's exactly-once-RESULTS contract.
    val vBefore = VersionedTable.latestVersion(root)
    VersionedTable.merge(spark, root,
      VersionedTable.readLatest(spark, root), keys = Seq("user_id"))
    assert(VersionedTable.latestVersion(root) == vBefore + 1)
    val replayed = VersionedTable.readLatest(spark, root).orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(replayed == want, "replayed merge changed the snapshot")
  }

  test("DSv2 history connector == the session-side history API") {
    val root = freshRoot()
    VersionedTable.commit(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "overwrite")
    VersionedTable.commit(spark, root, Seq((3L, "c")).toDF("id", "v"),
      "append")
    val viaConnector = spark.read
      .format("graft.sources.HistoryDataSource").load(root)
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val viaApi = VersionedTable.history(spark, root)
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(viaConnector.toSeq == viaApi.toSeq)
    assert(viaConnector.map(_._4).sum == 3L)
    // The executor-side parser rejects non-manifest bytes loudly.
    intercept[IllegalArgumentException] {
      VersionedTable.parseManifestMeta("""{"hello": 1}""")
    }
  }

  test("history connector reads tables containing an optimize commit") {
    // Regression: parseManifestMeta's op pattern was hand-listed as
    // (overwrite|append) while commitIf had started writing
    // op=optimize — any graft_history scan over an optimized table
    // threw. The pattern is now built from the Ops set.
    val root = freshRoot()
    VersionedTable.commit(spark, root,
      (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"), "overwrite")
    VersionedTable.commit(spark, root,
      (41L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), "append")
    VersionedTable.optimize(spark, root, "id", 2)
    val hist = spark.read
      .format("graft.sources.HistoryDataSource").load(root)
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(hist.map(_._2).toSeq == Seq("overwrite", "append", "optimize"))
    assert(hist.last._3 == 50L, "optimize commit must carry all rows")
  }

  test("declared scan_manifest_prune really skips files at the fixture") {
    // The oracle validates the answer; this pins the I/O invariant —
    // the first-quarter range must touch a strict subset of the 8
    // range-partitioned files. Run the declared key first so the
    // scratch table exists.
    SparkEntry.queries("scan_manifest_prune")(spark, sf).collect()
    val root =
      s"${graft.operators.ScanQueries.scratch(spark, sf)}/vtab_lineitem"
    val ranges = VersionedTable.fileRangesFor(spark, root, 0L, "l_orderkey")
    val lo = ranges.map(_._2).min
    val hi = lo + ((ranges.map(_._3).max - lo).toLong / 4).toDouble
    val chosen = VersionedTable.prunedRead(spark, root, 0L, "l_orderkey",
      lo, hi)._2
    assert(chosen.size < ranges.size,
      s"no skip: ${chosen.size} of ${ranges.size}")
  }
}
