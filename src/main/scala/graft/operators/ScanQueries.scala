package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t, events}
import graft.Det.sqlSum

/** §2.1 Scans / sources / sinks (SURVEY.md). Parquet is the native format
  * (vectorized scan, predicate pushdown, column pruning all free); CSV and
  * JSON roundtrips exercise the schema-explicit text sources. At 100 TB the
  * scan plan matters more than anything: these queries keep projections
  * narrow so `ReadSchema` in explain() shows only referenced columns.
  */
object ScanQueries {
  type Q = (SparkSession, String) => DataFrame

  private val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus")

  /** Per-session scratch dir: applicationId keeps concurrent runs over the
    * same sfDir (e.g. bench alongside the correctness check) from racing
    * on an overwrite-then-read of a shared path. Each application deletes
    * its own directory at JVM exit, so repeated runs don't accumulate
    * dumps in /tmp (the pre-round-2 fixed path was self-overwriting). */
  // Every application root that handed out a scratch path, swept by ONE
  // shutdown hook — a per-registration boolean would leak the roots of
  // any second/third SparkSession created in the same JVM (e.g. the
  // fresh-context pattern in ExtensionsSpec).
  private val scratchRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val cleanupRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** ONE sanitizer for everything derived from an sfDir: scratch
    * sub-paths and catalog table-name suffixes (the latter forbid '.',
    * so the shared class keeps only [A-Za-z0-9]). */
  private def ident(s: String): String = s.replaceAll("[^A-Za-z0-9]", "_")

  /** One recursive delete for the scratch shutdown hook and the
    * rebuild-from-scratch versioned-table sites (package-visible: the
    * streaming merge-sink key rebuilds its scratch table the same way). */
  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  // package-visible so LayoutMaintenanceSpec can locate the scratch
  // layouts it pins file-level invariants on.
  private[graft] def scratch(s: SparkSession, dir: String): String = {
    val root = s"/tmp/graft_scratch/${s.sparkContext.applicationId}"
    scratchRoots.add(root)
    if (cleanupRegistered.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        scratchRoots.forEach(r => deleteRecursively(new java.io.File(r)))))
    }
    s"$root/${ident(dir)}"
  }

  /** Idempotent scratch-layout write: run `w` only if `path` has no
    * completed write yet (_SUCCESS is committed last). Scratch dirs are
    * per-application and the query map runs sequentially within one, so
    * a completed marker means OUR earlier identical write — bench
    * iterations and repeated spec plan() calls skip the re-write.
    * Assumption (fine for short-lived bench/verify apps): the SOURCE
    * fixtures under sfDir don't change within one application's
    * lifetime — a mid-run fixture regeneration would keep serving the
    * layout derived from the old data. Long-lived services would key the
    * sub-path on a fixture content fingerprint instead. */
  private def writeOnce(path: String)(w: => Unit): Unit =
    if (!new java.io.File(path, "_SUCCESS").exists()) w

  /** Failure-safe idempotent bucketed-TABLE write: `tableExists` alone
    * is not enough — a saveAsTable that dies mid-write can leave the
    * catalog entry registered over partial bucket files, after which
    * every later call in the session would silently read partial data.
    * Require the data path's _SUCCESS marker too (committed last, like
    * [[writeOnce]]), and drop-and-rewrite when either is missing. */
  private def writeTableOnce(s: SparkSession, name: String, path: String)(
      w: => Unit): Unit =
    if (!s.catalog.tableExists(name) ||
        !new java.io.File(path, "_SUCCESS").exists()) {
      s.sql(s"DROP TABLE IF EXISTS $name")
      w
    }

  /** The three-commit versioned orders table etl_time_travel and
    * scan_dsv2_history share: v0 = overwrite (orders before 1996),
    * v1 = append (1996), v2 = overwrite (high-price orders). Idempotent
    * build — exactly versions 0..2 or a full rebuild (a crashed
    * half-build has fewer commits; version inflation across reruns
    * would break the pinned AS-OF number). Returns the table root. */
  private def timeTravelTable(s: SparkSession, dir: String): String = {
    import graft.sources.VersionedTable
    val root = s"${scratch(s, dir)}/vtab_orders"
    if (VersionedTable.latestVersion(root) != 2L) {
      deleteRecursively(new java.io.File(root))
      val o = t(s, dir, "orders")
      VersionedTable.commit(s, root,
        o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
        "overwrite")
      VersionedTable.commit(s, root,
        o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        "append")
      VersionedTable.commit(s, root,
        o.filter(col("o_totalprice") > 300000), "overwrite")
    }
    root
  }

  /** The merged versioned table behind etl_merge_into: v0 = overwrite
    * (pre-2000 orders, slim projection), v1 = MERGE of the urgent
    * orders with a 5% price bump — replacing the matched pre-2000
    * urgent rows and INSERTING the post-2000 urgent ones. Idempotent
    * build like [[timeTravelTable]]. */
  private def mergeTable(s: SparkSession, dir: String): String = {
    import graft.sources.VersionedTable
    val root = s"${scratch(s, dir)}/vtab_merge"
    if (VersionedTable.latestVersion(root) != 1L) {
      deleteRecursively(new java.io.File(root))
      val o = t(s, dir, "orders")
      VersionedTable.commit(s, root,
        o.filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").as("price")),
        "overwrite")
      VersionedTable.merge(s, root,
        o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") * 1.05).as("price")),
        keys = Seq("o_orderkey"))
    }
    root
  }

  /** The vacuumed versioned table behind scan_vacuum_current: four
    * commits (overwrite, append, overwrite, append), a checkpoint,
    * then vacuum retaining the last TWO versions — versions 0/1 and
    * their data files are gone, 2/3 stay byte-identical. grace=0 is
    * safe here: single writer, nothing in flight. */
  private def vacuumTable(s: SparkSession, dir: String): String = {
    import graft.sources.VersionedTable
    val root = s"${scratch(s, dir)}/vtab_vac"
    if (VersionedTable.latestVersion(root) != 3L ||
        VersionedTable.listVersions(root).size != 2) {
      deleteRecursively(new java.io.File(root))
      val o = t(s, dir, "orders")
      VersionedTable.commit(s, root,
        o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
        "overwrite")
      VersionedTable.commit(s, root,
        o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        "append")
      VersionedTable.commit(s, root,
        o.filter(col("o_totalprice") > 300000), "overwrite")
      VersionedTable.commit(s, root,
        o.filter(col("o_totalprice") <= 100000), "append")
      VersionedTable.checkpoint(s, root)
      VersionedTable.vacuum(s, root, retainLast = 2, orphanGraceMs = 0L)
    }
    root
  }

  /** The deleted versioned table behind etl_delete_where: v0 = the
    * full orders table, v1 = copy-on-write DELETE of the low-value
    * finished orders. Idempotent build like [[timeTravelTable]]. */
  private def deleteTable(s: SparkSession, dir: String): String = {
    import graft.sources.VersionedTable
    val root = s"${scratch(s, dir)}/vtab_delete"
    if (VersionedTable.latestVersion(root) != 1L) {
      deleteRecursively(new java.io.File(root))
      VersionedTable.commit(s, root, t(s, dir, "orders"), "overwrite")
      VersionedTable.deleteWhere(s, root,
        col("o_orderstatus") === "F" && col("o_totalprice") < 100000)
    }
    root
  }

  /** The compacted versioned table behind etl_optimize_compact: v0 =
    * overwrite of pre-1996 orders shattered into 16 small files, v1 =
    * append of the rest in 8 more, v2 = OPTIMIZE range-clustering the
    * full snapshot into 2 files on o_totalprice. Idempotent build
    * like [[timeTravelTable]]. */
  private def optimizeTable(s: SparkSession, dir: String): String = {
    import graft.sources.VersionedTable
    val root = s"${scratch(s, dir)}/vtab_optimize"
    if (VersionedTable.latestVersion(root) != 2L) {
      deleteRecursively(new java.io.File(root))
      val o = t(s, dir, "orders")
      VersionedTable.commit(s, root,
        o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .repartition(16), "overwrite", Seq("o_totalprice"))
      VersionedTable.commit(s, root,
        o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
          .repartition(8), "append", Seq("o_totalprice"))
      VersionedTable.optimize(s, root, "o_totalprice", 2)
    }
    root
  }

  val queries: Map[String, Q] = Map(
    // HIDDEN FILE-METADATA COLUMNS (§2.204) — the `_metadata` struct
    // every file source exposes (file_name/path/size/modification
    // time, block start/length): the per-file audit a lake-layout
    // job runs WITHOUT a separate filesystem listing pass — row
    // counts and key ranges attributed to their physical file, the
    // input to compaction planning and corrupt-file triage. Reading
    // `_metadata.file_name` costs nothing extra (constant-folded per
    // split, no data columns touched beyond the audited ones); at
    // 100 TB the same query over a multi-thousand-file table is the
    // manifest reconciliation pass. Size/mtime are environment-
    // dependent so only the NAME is driver-checked; the DuckDB
    // oracle reads its own filename pseudo-column and takes the
    // basename.
    "scan_metadata_file_audit" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("_metadata.file_name").as("file_name"),
          col("l_orderkey"))
        .groupBy("file_name")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          min(col("l_orderkey")).as("min_orderkey"),
          max(col("l_orderkey")).as("max_orderkey"))
        .orderBy("file_name")
    }),

    "scan_parquet" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(liCols.map(col) :+ col("l_shipdate").cast("date").as("l_shipdate"): _*)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "scan_schema_prune" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // GZIP-COMPRESSED CSV roundtrip (§2.87) — the codec face of the
    // CSV source: write with compression=gzip (one .csv.gz part per
    // partition; gzip is NOT splittable, so at 100 TB each file is
    // one task's read — the layout must keep files small, which is
    // why the writer coalesces deliberately here), read back with the
    // explicit schema. Content must be codec-invariant — the oracle
    // is the raw fixture.
    "scan_csv_gzip_roundtrip" -> ((s, dir) => {
      val tmp = s"${scratch(s, dir)}/csv_gz_customer"
      writeOnce(tmp) {
        t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            col("c_acctbal"))
          .coalesce(1).write.mode("overwrite")
          .option("header", "true").option("compression", "gzip")
          .csv(tmp)
      }
      s.read.schema(
          "c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, " +
            "c_acctbal DOUBLE")
        .option("header", "true").csv(tmp)
        .orderBy(col("c_custkey"))
    }),

    // Write→read roundtrip through a schema-explicit CSV source.
    "scan_csv_roundtrip" -> ((s, dir) => {
      val tmp = s"${scratch(s, dir)}/csv_nation"
      t(s, dir, "nation").write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .option("header", "true").csv(tmp)
        .orderBy(col("n_nationkey"))
    }),

    // Columnar-alternative roundtrip: ORC (built into spark-sql, same
    // vectorized reader + predicate pushdown family as parquet). A
    // double survives bit-exactly, so the oracle reads the plain table.
    "scan_orc_roundtrip" -> ((s, dir) => {
      val tmp = s"${scratch(s, dir)}/orc_supplier"
      writeOnce(tmp) {
        t(s, dir, "supplier").write.mode("overwrite").orc(tmp)
      }
      s.read.schema(
          "s_suppkey LONG, s_name STRING, s_nationkey INT, s_acctbal DOUBLE")
        .orc(tmp)
        .orderBy(col("s_suppkey"))
    }),

    // Same roundtrip via JSON lines.
    "scan_json_roundtrip" -> ((s, dir) => {
      val tmp = s"${scratch(s, dir)}/json_region"
      t(s, dir, "region").write.mode("overwrite").json(tmp)
      s.read.schema("r_regionkey INT, r_name STRING").json(tmp)
        .orderBy(col("r_regionkey"))
    }),

    // Hive-style partitioned layout: write documents partitioned by lang,
    // read back with a partition-key filter. The filter is satisfied by
    // directory listing alone (PartitionFilters in the scan, zero
    // non-matching files opened — pinned in PlanAuditSpec); at 100 TB
    // this is the difference between scanning one language and the whole
    // corpus.
    "scan_partition_prune" -> ((s, dir) => {
      val tmp = s"${scratch(s, dir)}/part_docs"
      writeOnce(tmp) {
        t(s, dir, "documents").write.mode("overwrite")
          .partitionBy("lang").parquet(tmp)
      }
      s.read.parquet(tmp)
        .filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Bucketed-table layout — the OTHER half of storage design at 100 TB
    // (scan_partition_prune covers directory pruning): both fact tables
    // persisted bucketed + sorted on the join key, so the sort-merge join
    // reads co-located buckets with NO shuffle exchange on either side
    // (pinned in PlanAuditSpec). Tables are per-(application, sfDir)
    // external tables in the scratch dir — idempotent within a session,
    // isolated across concurrent runs. At 100 TB the write is the
    // one-off layout cost that every subsequent join amortizes; bucket
    // count then comes from data volume (≈ table bytes / target file
    // size, and EQUAL on both sides or Spark shuffles the smaller one)
    // — 8 is the fixture-scale stand-in.
    "scan_bucket_join" -> ((s, dir) => {
      val root = scratch(s, dir)
      val suf = ident(dir)
      val li = s"graft_li_bkt_$suf"
      val ord = s"graft_ord_bkt_$suf"
      writeTableOnce(s, li, s"$root/$li") {
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$root/$li").mode("overwrite").saveAsTable(li)
      }
      writeTableOnce(s, ord, s"$root/$ord") {
        t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$root/$ord").mode("overwrite").saveAsTable(ord)
      }
      s.table(li).join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("o_custkey"), col("o_totalprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Z-ORDER layout (§2.21) — the third leg of storage design next to
    // directory partitioning (scan_partition_prune) and bucketing
    // (scan_bucket_join): lineitem rewritten range-partitioned + sorted
    // on the Morton interleave of quantized (l_orderkey, l_partkey), so
    // every file's min/max envelope is bounded in BOTH dimensions and a
    // 2-D box predicate prunes files/row-groups on both columns — a
    // single-column sort can only ever prune one (ZOrderSpec measures
    // the per-file envelopes; PlanAuditSpec pins both columns' pushed
    // filters on the read-back). The curve is a pure bit expression
    // (ZOrder.zval) — the one-off layout write pays one range exchange,
    // the same amortized cost model as the bucketed tables. Correctness
    // is layout-independent by construction: the oracle runs the same
    // box on the unsorted original.
    // PARQUET BLOOM FILTER (§2.177) — the point-lookup storage
    // feature zorder/partition pruning don't cover: write lineitem
    // with a parquet bloom filter on l_partkey (row-group-level
    // membership, the layout for needle-in-haystack equality scans
    // where min/max stats are useless because every row group spans
    // the full key range), then read back through an equality
    // predicate. The oracle reads the SAME predicate off the
    // original table, so the bloom path must be exactly
    // false-positive-transparent. Write-once scratch layout like the
    // zorder key.
    "scan_parquet_bloom_filter" -> ((s, dir) => {
      val bdir = s"${scratch(s, dir)}/bloom_li"
      writeOnce(bdir) {
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity",
            "l_extendedprice")
          .write.mode("overwrite")
          .option("parquet.bloom.filter.enabled#l_partkey", "true")
          .option("parquet.bloom.filter.expected.ndv#l_partkey",
            "20000")
          .parquet(bdir)
      }
      s.read.parquet(bdir)
        .filter(col("l_partkey") === 42)
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_rows"),
          graft.Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_partkey")
    }),

    "scan_zorder_prune" -> ((s, dir) => {
      val zdir = s"${scratch(s, dir)}/zorder_li"
      writeOnce(zdir) {
        val li = t(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val b = li.agg(min("l_orderkey").as("omn"), max("l_orderkey").as("omx"),
          min("l_partkey").as("pmn"), max("l_partkey").as("pmx"))
        li.crossJoin(broadcast(b))
          .withColumn("z", ZOrder.zval(
            ZOrder.quantize(col("l_orderkey"), col("omn"), col("omx"), 16),
            ZOrder.quantize(col("l_partkey"), col("pmn"), col("pmx"), 16),
            16))
          .repartitionByRange(8, col("z"))
          .sortWithinPartitions("z")
          .select("l_orderkey", "l_partkey", "l_quantity")
          .write.mode("overwrite").parquet(zdir)
      }
      s.read.parquet(zdir)
        .filter(col("l_orderkey").between(100, 700)
          && col("l_partkey").between(20, 120))
        .orderBy("l_orderkey", "l_partkey", "l_quantity")
    }),

    // Small-file COMPACTION — the maintenance operation every
    // long-lived 100 TB table needs: streaming ingests and per-batch
    // writes fragment a table into thousands of tiny files, and scan
    // cost degrades to file-open overhead (listing, footers, one
    // row-group per file kills vectorization amortization). The key
    // fabricates the problem (documents scattered over 64 shuffle-sized
    // files), then compacts: repartitionByRange on doc_id to a byte-
    // budgeted file count + sortWithinPartitions, so the compacted
    // files carry non-overlapping doc_id ranges — compaction doubles as
    // clustering, and id-ranged reads prune files afterwards (same
    // min/max-envelope mechanics as scan_zorder_prune, one dimension).
    // At 100 TB the target count comes from bytes/128 MB per partition
    // range; 4 is the fixture stand-in. LayoutMaintenanceSpec pins the
    // file counts (≥32 before, ≤4 data files after). Correctness is
    // layout-independent: the oracle reads the original table.
    "scan_compact_smallfiles" -> ((s, dir) => {
      val frag = s"${scratch(s, dir)}/frag_docs"
      val compact = s"${scratch(s, dir)}/compact_docs"
      writeOnce(frag) {
        t(s, dir, "documents").repartition(64)
          .write.mode("overwrite").parquet(frag)
      }
      writeOnce(compact) {
        s.read.parquet(frag)
          .repartitionByRange(4, col("doc_id"))
          .sortWithinPartitions("doc_id")
          .write.mode("overwrite").parquet(compact)
      }
      s.read.parquet(compact)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // NESTED-COLUMN PRUNING roundtrip — flat-column pruning
    // (scan_schema_prune) is table stakes; what dies at 100 TB is a
    // reader that fetches a WHOLE struct to answer one leaf (event
    // payloads, ML feature bundles and telemetry all ship as nested
    // structs). Write events as two structs, aggregate over one leaf,
    // and the scan must read struct<who:struct<event_type>> ONLY —
    // neither who.user_id nor the payload struct (Spark's
    // SchemaPruning rule; ReadSchema pinned in PlanAuditSpec). The
    // oracle reads the flat original, so values prove the roundtrip
    // too.
    "scan_nested_prune" -> ((s, dir) => {
      val tmp = s"${scratch(s, dir)}/nested_events_${math.abs(dir.hashCode)}"
      writeOnce(tmp) {
        events(s, dir).select(col("event_id"),
          struct(col("user_id"), col("event_type")).as("who"),
          struct(col("value"), col("props")).as("payload"))
          .write.mode("overwrite").parquet(tmp)
      }
      s.read.parquet(tmp)
        .groupBy(col("who.event_type").as("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // MALFORMED-RECORD QUARANTINE — the ingestion surface the clean
    // roundtrips above skip: real landed CSV carries rows that don't
    // parse, and a production reader must QUARANTINE them (keep the
    // raw line for replay/debugging) rather than crash the 100 TB job
    // (FAILFAST) or silently drop them (DROPMALFORMED). PERMISSIVE
    // mode + columnNameOfCorruptRecord does exactly that: a type-cast
    // failure nulls the offending field and captures the raw line in
    // the quarantine column, map-side in the scan — no separate
    // validation pass. Corruption is deterministic (mod-7 keys get a
    // non-numeric key field), so the oracle reconstructs both the
    // surviving fields AND the quarantined raw lines from the original
    // table.
    "scan_csv_permissive" -> ((s, dir) => {
      val raw = s"${scratch(s, dir)}/dirty_csv"
      writeOnce(raw) {
        t(s, dir, "nation")
          .select(concat_ws(",",
            when(col("n_nationkey") % 7 === 0,
              concat(lit("x"), col("n_nationkey").cast("string")))
              .otherwise(col("n_nationkey").cast("string")),
            col("n_name")).as("value"))
          .coalesce(1).write.mode("overwrite").text(raw)
      }
      s.read
        .schema("key INT, name STRING, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(raw)
        .select(col("key").cast("long").as("key"), col("name"),
          col("_corrupt_record").as("quarantined"))
        .orderBy(asc_nulls_first("key"), col("name"))
    }),

    // SCHEMA EVOLUTION — the storage reality of every long-lived
    // table: files written before a column existed never carry it, and
    // the reader (not a rewrite job) reconciles the generations. Gen-1
    // files hold the v1 schema (doc_id, text, lang); gen-2 files add
    // (source, n_chars); the read passes the CURRENT schema explicitly
    // (`.schema(v2)`) — per-file column resolution is by name, missing
    // columns surface as null, and the projection backfills defaults.
    // The explicit-schema form IS the 100 TB path: `mergeSchema=true`
    // reconciles footers at O(files) planning cost, while a
    // metastore-pinned schema plans in O(1) — same per-file null
    // semantics, none of the footer sweep (documented trade, the
    // production default for a table with 10⁷ files). Rewriting old
    // files to the new schema — the alternative this key exists to
    // avoid — would be a full-table write.
    "scan_schema_evolution" -> ((s, dir) => {
      val gen1 = s"${scratch(s, dir)}/evo_gen1"
      val gen2 = s"${scratch(s, dir)}/evo_gen2"
      val docs = t(s, dir, "documents")
      writeOnce(gen1) {
        docs.filter(col("doc_id") % 2 === 0)
          .select("doc_id", "text", "lang")
          .write.mode("overwrite").parquet(gen1)
      }
      writeOnce(gen2) {
        docs.filter(col("doc_id") % 2 =!= 0)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(gen2)
      }
      val v2 = docs.select("doc_id", "text", "lang", "source", "n_chars")
        .schema
      s.read.schema(v2).parquet(gen1, gen2)
        .select(col("doc_id"), col("lang"),
          coalesce(col("source"), lit("unknown")).as("source"),
          coalesce(col("n_chars"), lit(-1L)).as("n_chars"))
        .orderBy("doc_id")
    }),

    // WRITER-SIDE SCHEMA MIGRATION (round-7 verdict ask #5) —
    // scan_schema_evolution's convention REVERSED: there the READER
    // reconciles old files; here the WRITE path reconciles an incoming
    // batch whose schema drifted (new `source` column, `n_chars` gone,
    // columns reordered) into the existing layout and MATERIALIZES the
    // widened v2 table. `unionByName(allowMissingColumns = true)` is
    // the by-name alignment — a positional union would silently put
    // lang under doc_id; the absent columns surface as null and the
    // projection pins the declared defaults BEFORE the write, so every
    // v2 file carries the full schema and downstream readers need no
    // per-file reconciliation at all. At 100 TB this is the schema-
    // change job run ONCE at migration time (O(table) rewrite,
    // embarrassingly parallel, no shuffle — the union is a read-
    // concat); the alternative, leaving generations in place, taxes
    // every future scan with footer reconciliation instead
    // (scan_schema_evolution documents that trade from the reader
    // side). Idempotent via writeOnce on both layouts.
    "etl_schema_migrate" -> ((s, dir) => {
      val base = s"${scratch(s, dir)}/mig_base"
      val v2dir = s"${scratch(s, dir)}/mig_v2"
      val docs = t(s, dir, "documents")
      writeOnce(base) {
        docs.filter(col("doc_id") % 2 =!= 0)
          .select("doc_id", "lang", "n_chars")
          .write.mode("overwrite").parquet(base)
      }
      val batch = docs.filter(col("doc_id") % 2 === 0)
        .select("source", "lang", "doc_id")
      val migrated = s.read.parquet(base)
        .unionByName(batch, allowMissingColumns = true)
        .select(col("doc_id"), col("lang"),
          coalesce(col("n_chars"), lit(-1L)).as("n_chars"),
          coalesce(col("source"), lit("unknown")).as("source"))
      writeOnce(v2dir) {
        migrated.write.mode("overwrite").parquet(v2dir)
      }
      s.read.parquet(v2dir).orderBy("doc_id")
    }),

    // DYNAMIC PARTITION OVERWRITE — the other mutation primitive next
    // to etl_upsert_type1's row-level merge: replace exactly the
    // partitions an update batch touches (the nightly "re-land one
    // day/one source" job), leaving every other partition's files
    // physically untouched. The batch (all 'en' docs, n_chars bumped
    // by 1e6) derives from the ORIGINAL fixture, so re-running the
    // query is idempotent; partitionOverwriteMode=dynamic is scoped as
    // a write option, not session-wide. At 100 TB static overwrite
    // would truncate the whole table; dynamic rewrites |batch
    // partitions| directories and the swap is a directory rename.
    // LayoutMaintenanceSpec pins the physical contract: non-targeted
    // partitions keep their exact file set across a re-run while the
    // targeted partition's files are replaced. The oracle composes the
    // same update arithmetic over the original table.
    "etl_partition_overwrite" -> ((s, dir) => {
      val base = s"${scratch(s, dir)}/po_docs"
      writeOnce(base) {
        t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"), col("lang"))
          .write.partitionBy("lang").mode("overwrite").parquet(base)
      }
      t(s, dir, "documents").filter(col("lang") === "en")
        .select(col("doc_id"), (col("n_chars") + 1000000L).as("n_chars"),
          col("lang"))
        .write.partitionBy("lang").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(base)
      s.read.parquet(base)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // Dynamic partition pruning: the partitioned fact side is pruned at
    // RUNTIME by the dim side's filter (no literal lang predicate
    // anywhere on the fact side) — the scan's PartitionFilters must
    // carry a dynamicpruning expression fed from the dim join key
    // (pinned in PlanAuditSpec). At 100 TB this reads two languages'
    // directories instead of the corpus because a DIMENSION said so.
    "scan_dpp_join" -> ((s, dir) => {
      val tmp = s"${scratch(s, dir)}/dpp_docs"
      writeOnce(tmp) {
        t(s, dir, "documents").write.mode("overwrite")
          .partitionBy("lang").parquet(tmp)
      }
      // The dim must be a STORAGE table, not a driver LocalRelation: the
      // optimizer folds a Filter over LocalRelation into the relation
      // itself, and with no Filter node left the DPP rule sees no
      // selective predicate to feed the fact scan from.
      val dimPath = s"${scratch(s, dir)}/dpp_lang_dim"
      writeOnce(dimPath) {
        s.createDataFrame(Seq(
            ("en", "germanic"), ("de", "germanic"), ("es", "romance"),
            ("fr", "romance"), ("zh", "sinitic")))
          .toDF("lang", "family")
          .write.mode("overwrite").parquet(dimPath)
      }
      val dim = s.read.parquet(dimPath)
      s.read.parquet(tmp)
        .join(dim.filter(col("family") === "romance"), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("family"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // PARTITION-VALUES-ONLY SCAN — a query answered entirely from the
    // directory structure: selecting only the partition column makes
    // the file scan read ZERO data columns (pinned: ReadSchema is the
    // empty struct — row counts come from footers, values from the
    // hive paths). At 100 TB "which languages exist" costs a LISTING,
    // not a scan — the cheapest query the layout can answer, and the
    // reason partition columns are chosen from enumeration-shaped
    // dimensions. Reuses scan_partition_prune's layout (writeOnce —
    // whichever key runs first pays the write).
    "scan_partition_values" -> ((s, dir) => {
      val tmp = s"${scratch(s, dir)}/part_docs"
      writeOnce(tmp) {
        t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"), col("lang"))
          .write.partitionBy("lang").mode("overwrite").parquet(tmp)
      }
      s.read.parquet(tmp)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .orderBy("lang")
    }),

    // DROPMALFORMED — the other malformed-record policy (PERMISSIVE
    // quarantines into _corrupt_record; DROPMALFORMED silently sheds):
    // same deterministic dirty file as scan_csv_permissive (every
    // nationkey ≡ 0 mod 7 row corrupted), survivors only. The policy
    // choice is a real pipeline decision — quarantine feeds a
    // reprocess queue, drop is for sources whose garbage is known
    // noise — so both readers are declared keys; the oracle is the
    // clean subset of the original, which pins that DROPMALFORMED
    // drops EXACTLY the corrupted rows.
    "scan_csv_dropmalformed" -> ((s, dir) => {
      val raw = s"${scratch(s, dir)}/dirty_csv"
      writeOnce(raw) {
        t(s, dir, "nation")
          .select(concat_ws(",",
            when(col("n_nationkey") % 7 === 0,
              concat(lit("x"), col("n_nationkey").cast("string")))
              .otherwise(col("n_nationkey").cast("string")),
            col("n_name")).as("value"))
          .coalesce(1).write.mode("overwrite").text(raw)
      }
      s.read
        .schema("key INT, name STRING")
        .option("mode", "DROPMALFORMED")
        .csv(raw)
        .orderBy("key")
    }),

    // LINE-ORIENTED TEXT SOURCE — the raw-corpus ingest format
    // (one record per line, fields split in the query): documents
    // round-trip through `write.text` / `read.text` as
    // `doc_id<TAB>text` lines and parse back with split-at-first-tab.
    // The fixture corpus is newline/tab-free (asserted by the
    // roundtrip equality itself — an embedded separator would shear a
    // row and flunk the oracle). At 100 TB the text source is the
    // cheapest possible scan (no footer, no row groups, trivially
    // splittable on line boundaries) — what makes it the standard
    // landing format crawls hand to the first parse stage.
    "scan_text_lines" -> ((s, dir) => {
      val tmp = s"${scratch(s, dir)}/text_docs"
      writeOnce(tmp) {
        t(s, dir, "documents")
          .select(concat(col("doc_id").cast("string"), lit("\t"),
            col("text")).as("value"))
          .write.mode("overwrite").text(tmp)
      }
      s.read.text(tmp)
        .select(
          substring_index(col("value"), "\t", 1).cast("long").as("doc_id"),
          expr("substring(value, instr(value, '\t') + 1)").as("text"))
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }),

    // TIME TRAVEL — "the table AS OF version N" through the
    // VersionedTable commit log (§2.42): three commits (overwrite,
    // append, overwrite) and a read pinned at version 1, which must see
    // v0 ∪ v1 and be BLIND to v2 — the snapshot-isolation face the ETL
    // family's snapshot DIFF key assumes someone else provides. Old
    // files are immutable, so the historical read costs the same as a
    // current one; the oracle is the equivalent predicate on the raw
    // fixture (v0 ∪ v1 ≡ orders before 1997).
    "etl_time_travel" -> ((s, dir) => {
      import graft.sources.VersionedTable
      val root = timeTravelTable(s, dir)
      VersionedTable.readVersion(s, root, 1L)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          graft.Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // DSv2 CONNECTOR READ — the commit HISTORY of the time-travel
    // table through the custom DataSource V2 connector
    // (`format("graft.sources.HistoryDataSource")`): TableProvider →
    // ScanBuilder → one InputPartition per manifest → executor-side
    // PartitionReader parsing the writer's own grammar with no
    // SparkSession. n_files is layout-dependent (partition counts) so
    // the declared output is (version, op, n_rows) — counts the oracle
    // derives from the raw orders predicates the three commits used.
    "scan_dsv2_history" -> ((s, dir) => {
      val root = timeTravelTable(s, dir)
      s.read.format("graft.sources.HistoryDataSource").load(root)
        .select(col("version"), col("op"), col("n_rows"))
        .orderBy("version")
    }),

    // MERGE INTO — type-1 upsert AS A COMMIT: updates replace matched
    // keys, unmatched updates insert, everything else carries over —
    // etl_upsert_type1's semantics composed with the VersionedTable
    // protocol (stage uniquely, one atomic link(2) publish, and a
    // LOST RACE RE-READS AND RE-MERGES rather than blind-retrying the
    // slot, because the merged frame depends on the snapshot it was
    // computed against — the lost-update hazard commitIf exists for).
    // The oracle is the same anti-join CTE over (updates ∪ original).
    "etl_merge_into" -> ((s, dir) => {
      import graft.sources.VersionedTable
      val root = mergeTable(s, dir)
      VersionedTable.readLatest(s, root)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          graft.Det.dsum(col("price")).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // POST-VACUUM CURRENT READ — snapshot expiration proves itself:
    // four commits, a checkpoint, then vacuum(retain 2) deletes
    // versions 0/1's manifests AND data files; the current read must
    // be byte-identical to the never-vacuumed table (the retained
    // chain is intact) while time travel past retention now fails
    // loudly (pinned in VersionedTableSpec — the oracle can only see
    // the surviving answer, which is exactly the point).
    "scan_vacuum_current" -> ((s, dir) => {
      import graft.sources.VersionedTable
      val root = vacuumTable(s, dir)
      VersionedTable.readLatest(s, root)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          graft.Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // DELETE WHERE — GDPR-class row deletion AS A COMMIT (§2.78): the
    // new VersionedTable.deleteWhere commits an overwrite holding
    // every current row NOT matching the predicate, via the same
    // commitIf read-modify-write loop as MERGE (a lost race re-reads
    // and re-filters — blind retry could resurrect a concurrent
    // committer's rows). The current read must equal the fixture
    // minus the deleted class; version 0 still sees every row
    // (logical delete until vacuum — pinned in VersionedTableSpec).
    "etl_delete_where" -> ((s, dir) => {
      import graft.sources.VersionedTable
      val root = deleteTable(s, dir)
      VersionedTable.readLatest(s, root)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          graft.Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // OPTIMIZE — compaction AS A COMMIT (§2.83): v0 overwrite
    // deliberately shattered into 16 small files + v1 append in 8
    // more, then VersionedTable.optimize range-clusters the whole
    // snapshot into 2 files on o_totalprice through the commitIf loop
    // (op "optimize" = a snapshot base, like overwrite). Rows are BY
    // CONSTRUCTION unchanged — the oracle is the pre-compaction
    // content, which is exactly the invariant compaction must hold;
    // the layout faces (file count 24 → 2, tight non-overlapping
    // ranges, old versions still planning old manifests, pruning
    // biting post-optimize) are pinned in VersionedTableSpec where
    // I/O is observable.
    "etl_optimize_compact" -> ((s, dir) => {
      import graft.sources.VersionedTable
      val root = optimizeTable(s, dir)
      VersionedTable.readLatest(s, root)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          graft.Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // MANIFEST-STATS FILE PRUNING — data skipping from the commit
    // log's per-file min/max (§2.42): lineitem range-partitioned on
    // l_orderkey into a VersionedTable whose manifest records each
    // file's key range, then a range read that hands the parquet
    // reader ONLY the overlapping files (~2 of 8; the skip count is
    // pinned in VersionedTableSpec — the oracle can't see I/O, only
    // that pruning never changed the answer). The probed range is
    // RELATIVE (first quarter of the key space, integer arithmetic
    // from the manifest's own global min/max) so the prune bites
    // identically at every SF; the oracle derives the same bounds with
    // a scalar subquery.
    "scan_manifest_prune" -> ((s, dir) => {
      import graft.sources.VersionedTable
      val root = s"${scratch(s, dir)}/vtab_lineitem"
      if (VersionedTable.latestVersion(root) != 0L) {
        deleteRecursively(new java.io.File(root))
        VersionedTable.commit(s, root,
          t(s, dir, "lineitem")
            .repartitionByRange(8, col("l_orderkey")),
          "overwrite", statsCols = Seq("l_orderkey"))
      }
      // Global bounds from the manifest itself (metadata, no data I/O).
      val fileRanges = VersionedTable.fileRangesFor(s, root, 0L, "l_orderkey")
      val lo = fileRanges.map(_._2).min.toLong
      val hiAll = fileRanges.map(_._3).max.toLong
      val hi = lo + (hiAll - lo) / 4
      VersionedTable.prunedRead(s, root, 0L, "l_orderkey",
          lo.toDouble, hi.toDouble)._1
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"),
          graft.Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")
    }),

    // CSV QUOTING ROUNDTRIP (§2.73) — the delimiter-collision edge
    // the plain CSV roundtrip never exercises: fields CONTAINING the
    // separator and embedded quotes, under a non-default '|'
    // separator. The writer must quote-and-escape exactly what the
    // reader unescapes (Spark's default backslash escape — a
    // writer/reader option mismatch here silently shears columns,
    // the classic ingest bug this key pins). Embedded newlines are
    // deliberately excluded: they force multiLine=true and kill
    // line-splittable parallel reads (scan_json_multiline documents
    // that trade). Oracle reconstructs the gnarly field from the
    // fixture directly — the CSV bytes are Spark-internal.
    "scan_csv_quoted_roundtrip" -> ((s, dir) => {
      val path = s"${scratch(s, dir)}/csv_quoted"
      val schema = "n_nationkey LONG, n_name STRING, tricky STRING"
      writeOnce(path) {
        t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"),
            concat(col("n_name"), lit(", \"quoted\" |x|")).as("tricky"))
          .coalesce(1).write.option("header", "true").option("sep", "|")
          .mode("overwrite").csv(path)
      }
      s.read.option("header", "true").option("sep", "|").schema(schema)
        .csv(path)
        .select(col("n_nationkey"), col("n_name"), col("tricky"))
        .orderBy("n_nationkey")
    }),

    // MULTI-LINE JSON READ (§2.72) — the OTHER JSON file shape: one
    // document spanning the whole file (an API export / config dump —
    // a JSON ARRAY of records), which the default line-oriented
    // reader cannot parse (`multiLine=true` makes the file the unit
    // of parallelism instead of the line: one task per file, the
    // documented scale trade vs JSONL). The document is rendered
    // in-engine (to_json over a key-sorted struct array — the 5-row
    // region dim, driver-held by design) and written once to scratch;
    // the roundtrip is lossless so the oracle reads the fixture
    // directly.
    "scan_json_multiline" -> ((s, dir) => {
      val path = s"${scratch(s, dir)}/json_multiline"
      val f = new java.io.File(path, "region.json")
      if (!f.exists()) {
        new java.io.File(path).mkdirs()
        val doc = t(s, dir, "region")
          .agg(to_json(expr(
            "array_sort(collect_list(struct(r_regionkey, r_name)))"))
            .as("j"))
          .head().getString(0)
        java.nio.file.Files.writeString(f.toPath, doc): Unit
      }
      s.read.option("multiLine", "true").json(f.getPath)
        .select(col("r_regionkey"), col("r_name"))
        .orderBy("r_regionkey")
    }),

    // FILE METADATA COLUMNS (§2.71) — the `_metadata` hidden struct
    // every file source carries (file_name / file_path / file_size /
    // row_index): per-input-file lineage WITHOUT a custom reader —
    // what incident response uses to trace a bad row back to the
    // object-store key. The fixture table is a single parquet file,
    // so the per-file aggregate is layout-stable and the oracle
    // re-derives the one (name, count) row; the declared value is
    // the hidden-column plumbing itself (constant-folded projection,
    // zero data-column cost).
    "scan_file_metadata" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("_metadata.file_name").as("file_name"),
          col("l_orderkey"))
        .groupBy("file_name")
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key"))
        .orderBy("file_name")
    }),

    // SQL CTAS + CATALOG READ (§2.69) — the DDL face of the layout
    // keys' saveAsTable: `CREATE TABLE ... USING PARQUET LOCATION ...
    // AS SELECT` materializes a pre-aggregated summary table in the
    // session catalog, and the query reads it back by NAME through
    // spark.table — the workflow every downstream dashboard uses
    // (build once, query by identifier, never re-aggregate the
    // fact). Location lives in the per-application scratch dir, so a
    // fresh session's catalog and a fresh directory stay in sync
    // (CTAS into a non-empty location is an error by design —
    // immutability of a published table). Money rides the
    // cents-integer convention inside the stored table; the oracle
    // re-derives the summary from the raw fixture.
    "sql_ctas_read" -> ((s, dir) => {
      val tb = s"graft_ctas_${ident(dir)}"
      if (!s.catalog.tableExists(tb)) {
        s.sql(s"""CREATE TABLE $tb USING PARQUET
          |LOCATION '${scratch(s, dir)}/ctas_summary' AS
          |SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |    AS cents
          |FROM parquet.`$dir/orders.parquet`
          |GROUP BY o_orderstatus, o_orderpriority""".stripMargin)
      }
      s.table(tb)
        .select(col("o_orderstatus"), col("o_orderpriority"), col("n"),
          col("cents"))
        .orderBy("o_orderstatus", "o_orderpriority")
    })
  )

  val oracle: Map[String, String] = Map(
    // The fixture layout is exactly one file per table, so the file
    // name Spark's `_metadata.file_name` must surface is the known
    // literal — asserting it pins the hidden-column read against the
    // physical layout (the driver's view hides DuckDB's own filename
    // pseudo-column, and the name is deterministic anyway).
    "scan_metadata_file_audit" ->
      """SELECT 'lineitem.parquet' AS file_name, count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  min(l_orderkey) AS min_orderkey,
        |  max(l_orderkey) AS max_orderkey
        |FROM lineitem""".stripMargin,
    // The gnarly field is fixture-derivable; single backslash-quote in
    // the SQL literal renders the embedded double quotes.
    "scan_csv_quoted_roundtrip" ->
      """SELECT n_nationkey, n_name,
        |  n_name || ', "quoted" |x|' AS tricky
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    // Lossless roundtrip → oracle reads the fixture.
    "scan_json_multiline" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    // Single-file fixture table → the file name is a constant.
    "scan_file_metadata" ->
      """SELECT 'lineitem.parquet' AS file_name, count(*) AS n_rows,
        |  min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
        |FROM lineitem GROUP BY 1 ORDER BY file_name""".stripMargin,
    // The stored summary is derivable: oracle re-aggregates the fixture.
    "sql_ctas_read" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "scan_parquet" ->
      s"""SELECT ${liCols.mkString(", ")}, CAST(l_shipdate AS DATE) AS l_shipdate
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "scan_schema_prune" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber",
    // Bloom filters must be false-positive-transparent: the same
    // equality predicate over the original table.
    "scan_parquet_bloom_filter" ->
      s"""SELECT l_partkey, count(*) AS n_rows,
         |  ${sqlSum("l_extendedprice")} AS sum_price
         |FROM lineitem WHERE l_partkey = 42
         |GROUP BY 1 ORDER BY l_partkey""".stripMargin,
    // Layout-independent by construction: the same box over the
    // unsorted original must equal the z-ordered read-back.
    "scan_zorder_prune" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
        |WHERE l_orderkey BETWEEN 100 AND 700 AND l_partkey BETWEEN 20 AND 120
        |ORDER BY l_orderkey, l_partkey, l_quantity""".stripMargin,
    // The flat original — values prove the nested roundtrip, the plan
    // pin proves the leaf-only read.
    "scan_nested_prune" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    // Roundtrips are lossless → oracle reads the parquet directly.
    "scan_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "scan_csv_gzip_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "scan_json_roundtrip" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "scan_orc_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey",
    "scan_partition_prune" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en' ORDER BY doc_id",
    // Compaction is content-preserving by contract → oracle reads the
    // original table.
    "scan_compact_smallfiles" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
    // Reconstructs both branches from the original table: clean rows
    // keep their fields, mod-7 rows surface null key + the exact raw
    // line the writer produced.
    "scan_csv_permissive" ->
      """WITH good AS (SELECT CAST(n_nationkey AS BIGINT) AS key,
        |    n_name AS name, CAST(NULL AS VARCHAR) AS quarantined
        |  FROM nation WHERE n_nationkey % 7 <> 0),
        |bad AS (SELECT CAST(NULL AS BIGINT) AS key, n_name AS name,
        |    'x' || n_nationkey || ',' || n_name AS quarantined
        |  FROM nation WHERE n_nationkey % 7 = 0)
        |SELECT * FROM good UNION ALL SELECT * FROM bad
        |ORDER BY key NULLS FIRST, name""".stripMargin,
    // The generation split and the backfill defaults composed over the
    // original table — the layout (two schema generations) must be
    // invisible modulo the declared defaults.
    "scan_schema_evolution" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id % 2 = 0 THEN 'unknown' ELSE source END AS source,
        |  CASE WHEN doc_id % 2 = 0 THEN -1 ELSE n_chars END AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The migrated v2 table == the declared defaults composed over the
    // original, with the generation parity REVERSED vs
    // scan_schema_evolution (odd rows are the old layout here).
    "etl_schema_migrate" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id % 2 = 0 THEN -1 ELSE n_chars END AS n_chars,
        |  CASE WHEN doc_id % 2 = 0 THEN source ELSE 'unknown' END AS source
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Same update arithmetic over the original table: only 'en' rows
    // carry the bump, everything else passes through.
    "etl_partition_overwrite" ->
      """SELECT doc_id, lang,
        |  n_chars + CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The layout is lossless → oracle joins the plain tables.
    "scan_bucket_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_custkey, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "scan_dpp_join" ->
      """SELECT d.doc_id, d.lang, f.family, d.n_chars
        |FROM documents d
        |JOIN (VALUES ('en', 'germanic'), ('de', 'germanic'), ('es', 'romance'),
        |             ('fr', 'romance'), ('zh', 'sinitic')) AS f(lang, family)
        |  ON d.lang = f.lang
        |WHERE f.family = 'romance'
        |ORDER BY d.doc_id""".stripMargin,
    "scan_csv_dropmalformed" ->
      """SELECT n_nationkey AS key, n_name AS name FROM nation
        |WHERE n_nationkey % 7 <> 0 ORDER BY key""".stripMargin,
    "scan_partition_values" ->
      """SELECT lang, count(*) AS n_docs FROM documents
        |GROUP BY 1 ORDER BY lang""".stripMargin,
    // The oracle reads the parquet original — the text roundtrip must
    // be lossless for every row or the per-doc stats shear.
    "scan_text_lines" ->
      """SELECT doc_id, length(text) AS n_chars,
        |  len(string_split(text, ' ')) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // AS OF version 1 = v0 ∪ v1 = orders before 1997; the v2 overwrite
    // (high-price orders) must be invisible — an oracle mismatch here
    // means the snapshot resolution read the wrong commit chain.
    "etl_time_travel" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         |  ${sqlSum("o_totalprice")} AS sum_price
         |FROM orders
         |WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // The merge result re-derived relationally: updates win on key
    // collision (anti join), unmatched base rows carry over. The 1.05
    // bump is the identical double product in both engines.
    "etl_merge_into" ->
      s"""WITH upd AS (SELECT o_orderkey, o_orderstatus,
         |    o_totalprice * 1.05 AS price
         |  FROM orders WHERE o_orderpriority = '1-URGENT'),
         |base AS (SELECT o_orderkey, o_orderstatus,
         |    o_totalprice AS price
         |  FROM orders
         |  WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'),
         |m AS (SELECT * FROM upd
         |  UNION ALL
         |  SELECT * FROM base WHERE NOT EXISTS (
         |    SELECT 1 FROM upd WHERE upd.o_orderkey = base.o_orderkey))
         |SELECT o_orderstatus, count(*) AS n_orders,
         |  ${sqlSum("price")} AS sum_price
         |FROM m GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // The fixture minus the deleted class — the copy-on-write DELETE
    // must be exactly set difference on the predicate.
    "etl_delete_where" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         |  ${sqlSum("o_totalprice")} AS sum_price
         |FROM orders
         |WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Compaction must not change content: the oracle is the FULL
    // fixture aggregate — identical rows before and after OPTIMIZE.
    "etl_optimize_compact" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         |  ${sqlSum("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // The surviving snapshot: the v2 overwrite (high-price) plus the
    // v3 append (low-price) — the vacuumed history is invisible to
    // the answer, which is the invariant under test.
    "scan_vacuum_current" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         |  ${sqlSum("o_totalprice")} AS sum_price
         |FROM orders
         |WHERE o_totalprice > 300000 OR o_totalprice <= 100000
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "scan_dsv2_history" ->
      """SELECT CAST(0 AS BIGINT) AS version, 'overwrite' AS op,
        |  (SELECT count(*) FROM orders
        |   WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00') AS n_rows
        |UNION ALL SELECT 1, 'append',
        |  (SELECT count(*) FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |     AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |UNION ALL SELECT 2, 'overwrite',
        |  (SELECT count(*) FROM orders WHERE o_totalprice > 300000)
        |ORDER BY version""".stripMargin,
    // Pruning is invisible I/O — the oracle derives the same relative
    // bounds (first quarter of the key space, integer arithmetic) and
    // checks the ANSWER; VersionedTableSpec pins the files-skipped
    // count the SQL can't see.
    "scan_manifest_prune" ->
      s"""WITH b AS (SELECT min(l_orderkey) AS lo,
         |    min(l_orderkey) + (max(l_orderkey) - min(l_orderkey)) // 4 AS hi
         |  FROM lineitem)
         |SELECT l_returnflag, count(*) AS n_lines,
         |  ${sqlSum("l_extendedprice")} AS sum_price
         |FROM lineitem, b
         |WHERE l_orderkey >= lo AND l_orderkey <= hi
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
