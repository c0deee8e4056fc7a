package graft.ingest

import java.io.File

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, concat, count, expr, floor, greatest, least, lit, max, min, shiftleft, shiftrightunsigned, struct, substring_index, sum, when}

/** One committed snapshot of a versioned table: the ordered list of
  * immutable data directories that make it up, plus carried-forward
  * table properties. The version number is both in the file name (zero-
  * padded, so lexicographic listing = version order) and in the body.
  * `stats` maps dataDir → numeric column → [min, max] — the
  * Delta/Iceberg file-statistics analog at commit-dir granularity,
  * used by [[VersionedTableIO.readPruned]] to skip whole directories. */
final case class Manifest(
    version: Long, ts: Long, op: String,
    dataDirs: Seq[String], properties: Map[String, String],
    stats: Map[String, Map[String, Seq[Double]]] = Map.empty,
    dvDirs: Seq[String] = Nil,
    strStats: Map[String, Map[String, Seq[String]]] = Map.empty)

/** Versioned-table format over plain parquet — the engine's stand-in
  * for Delta Lake's transaction log (the reference writes Delta
  * everywhere: spark/jobs/alphavantage/bronze2_to_silver.py:142-152,
  * uber/drop_dup.py:97, coin_to_delta_w_cp.py:124; the harness
  * classpath has no delta jars, so the log is reimplemented from first
  * principles on public Spark + filesystem APIs).
  *
  * Layout per table:
  * {{{
  *   <root>/<table>/_graft_log/00000000000000000001.json   commit files
  *   <root>/<table>/data/<uuid>/part-*.parquet             immutable
  * }}}
  *
  * Protocol:
  *  - every write lands in a FRESH data directory; existing files are
  *    never modified — a snapshot is just a manifest listing dirs;
  *  - a commit atomically claims the next version slot by hard-linking
  *    a fully written temp file into it (link(2) is put-if-absent:
  *    EEXIST if the slot is taken), so two concurrent writers cannot
  *    both claim a version — the loser re-reads the log and retries on
  *    top of the winner (optimistic concurrency, the same shape as
  *    Delta's conditional-put commit);
  *  - readers resolve the latest (or a requested) manifest and scan
  *    exactly its dirs: a crashed write that left a data dir but no
  *    manifest is simply invisible — the old snapshot stays readable
  *    (crash consistency, asserted in VersionedTableSpec);
  *  - self-referential rewrites (MERGE/compaction read the table they
  *    replace) are safe WITHOUT staging tricks: the new snapshot's data
  *    dir is fully written from the still-immutable old dirs before the
  *    commit flips visibility;
  *  - VACUUM deletes data dirs unreferenced by the retained manifests
  *    (and crash orphans past a grace period) — time travel works as
  *    far back as retention, exactly Delta's contract.
  *
  * At 100 TB the same protocol holds on an object store: data files are
  * written once, the only mutation point is the tiny commit object, and
  * the atomic claim is pluggable ([[CommitBackend]]) — hard link
  * locally, conditional put (S3 if-none-match) on a store.
  */
final class VersionedTableIO(root: String,
    backend: CommitBackend = LocalLinkBackend) extends TableIO {
  import VersionedTableIO._

  private def tableDir(table: String) = s"$root/$table"
  private def logDir(table: String) = s"${tableDir(table)}/_graft_log"

  /** The table's commit-log directory — an append-only stream of
    * manifest files, i.e. a ready-made Structured Streaming file
    * source (see [[graft.stream.ChangeFeedGold]]). */
  def logPath(table: String): String = logDir(table)
  private def dataRoot(table: String) = s"${tableDir(table)}/data"
  private def manifestFile(table: String, v: Long) =
    new File(logDir(table), f"$v%020d.json")

  // ---- log access ------------------------------------------------------

  def versions(table: String): Seq[Long] = {
    val d = new File(logDir(table))
    if (!d.exists()) Nil
    else d.listFiles((_, n) => n.endsWith(".json")).toSeq
      .map(_.getName.stripSuffix(".json").toLong).sorted
  }

  def latestVersion(table: String): Long = {
    val vs = versions(table)
    require(vs.nonEmpty, s"versioned table '$table' has no commits")
    vs.last
  }

  def manifest(table: String, version: Long): Manifest = {
    val f = manifestFile(table, version)
    require(f.exists(),
      s"version $version of '$table' does not exist (or was vacuumed); " +
        s"available: ${versions(table).mkString(", ")}")
    mapper.readValue(f, classOf[Manifest])
  }

  private def latestManifest(table: String): Option[Manifest] =
    versions(table).lastOption.map(manifest(table, _))

  /** Atomically claim `version`: true on success, false if a concurrent
    * writer took the slot first. The claim itself is the backend's
    * put-if-absent — see [[CommitBackend]] for the local-link and
    * object-store forms. */
  private def tryCommit(table: String, m: Manifest): Boolean =
    backend.putIfAbsent(manifestFile(table, m.version),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(m))

  /** Read-modify-write retry loop: build the next manifest from the
    * current snapshot, race for the slot, re-read and rebuild on loss.
    * `build` returns the snapshot's dirs, stats for NEW dirs (stats for
    * carried-over dirs ride along from the base manifest), and a
    * properties delta — or None to abort without committing (used by
    * the idempotent path when a replay is detected mid-race). */
  private def commitLoop(table: String, op: String,
      dv: Option[Manifest] => Seq[String] = carryDv)(
      build: Option[Manifest] => (Seq[String], Map[String, Map[String, Seq[Double]]])): Manifest =
    commitLoopEx(table, op, dv)(base => {
      val (dirs, st) = build(base)
      Some((dirs, st, Map.empty[String, String]))
    }).get

  /** Default deletion-vector policy for a commit: CARRY the base
    * snapshot's DV dirs (appends/metadata commits leave deletes in
    * force). Rewrites that materialize deletes pass `clearDv`. */
  private val carryDv: Option[Manifest] => Seq[String] =
    _.flatMap(b => Option(b.dvDirs)).getOrElse(Nil)
  private val clearDv: Option[Manifest] => Seq[String] = _ => Nil

  private def commitLoopEx(table: String, op: String,
      dv: Option[Manifest] => Seq[String] = carryDv)(
      build: Option[Manifest] => Option[(Seq[String],
        Map[String, Map[String, Seq[Double]]], Map[String, String])]): Option[Manifest] = {
    var attempts = 0
    while (true) {
      // next version comes from the log LISTING, not a manifest body —
      // the file name is the committed truth a concurrent writer races on
      val vs = versions(table)
      // the base-manifest read races concurrent vacuums: a peer that
      // listed a NEWER head may drop `vs.last`'s manifest between our
      // listing and the read. That makes our listing stale, not the
      // table broken — re-list and retry, same as losing the commit
      // slot. Rethrow when the log did NOT move: then the manifest
      // really is unreadable (corrupt/permissions) and looping would
      // spin forever on a real fault.
      val base =
        try vs.lastOption.map(manifest(table, _))
        catch {
          case scala.util.control.NonFatal(e) =>
            if (versions(table) == vs) throw e
            null // stale listing — fall through to retry
        }
      if (base == null) { /* stale listing — retry counted below */ }
      else build(base) match {
        case None => return None
        case Some((dirs, newStats, propsDelta)) =>
          val dvs = dv(base)
          val dirSet = dirs.toSet ++ dvs
          // an EMPTY value in the DELTA unsets that key (how
          // dropConstraint removes its property through the same merge
          // path every other commit uses) — scoped to the delta's own
          // keys, so a pre-existing property legitimately set to ""
          // rides through unrelated commits untouched
          val unset = propsDelta.collect { case (k, v) if v.isEmpty => k }
          val m = Manifest(
            version = vs.lastOption.map(_ + 1).getOrElse(1L),
            ts = System.currentTimeMillis(), op = op,
            dataDirs = dirs,
            properties = (base.map(_.properties).getOrElse(Map.empty) ++
              propsDelta) -- unset,
            stats = (base.map(_.stats).getOrElse(Map.empty) ++ newStats)
              .view.filterKeys(dirSet).toMap,
            dvDirs = dvs,
            // string min/max ride a per-writer side channel keyed by
            // the (globally unique) rel dir: writeDataDir/clone/restore
            // seed it, the commit folds entries for THIS snapshot's
            // dirs over the base's — absent entries just mean a
            // conservative scan, never wrong results
            strStats = (base.flatMap(b => Option(b.strStats))
                .getOrElse(Map.empty) ++
              dirs.flatMap(d => Option(pendingStrStats.get(d)).map(d -> _)))
              .view.filterKeys(dirSet).toMap)
          if (tryCommit(table, m)) {
            // the committed manifest now carries these dirs' string
            // stats; drop the side-channel entries so long-lived
            // writers (streaming loops) don't grow the map unboundedly
            dirs.foreach(pendingStrStats.remove)
            return Some(m)
          }
      }
      attempts += 1
      if (attempts > 100) throw new IllegalStateException(
        s"could not commit to '$table' after $attempts attempts")
    }
    sys.error("unreachable")
  }

  // ---- reads -----------------------------------------------------------

  private def scan(spark: SparkSession, table: String, m: Manifest): DataFrame = {
    require(m.dataDirs.nonEmpty, s"version ${m.version} of '$table' is empty")
    // mergeSchema across commit dirs = write-side schema evolution:
    // columns added in later commits surface as null in earlier files
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(m.dataDirs.map(d => s"${tableDir(table)}/$d"): _*)
    if (Option(m.dvDirs).forall(_.isEmpty)) raw
    else dvSubtract(spark, table, m,
      raw.withColumn(DvPath, relFilePath)
        .withColumn(DvPos, col("_metadata.row_index")))
      .drop(DvPath, DvPos)
  }

  /** Table-relative file path of the current row — `data/<uuid>/<file>`
    * — the key deletion vectors store. Relative (not the absolute URI
    * `_metadata.file_path` yields) so hard-link CLONES of the table
    * keep their deletes: the same key resolves under either root. */
  private def relFilePath: Column =
    concat(lit("data/"),
      substring_index(col("_metadata.file_path"), "/data/", -1))

  /** Anti-join `withKeys` (carrying DvPath/DvPos columns) against the
    * snapshot's deletion vectors. For the common O(k)-delete workload
    * the DV side is tiny (positions only, no row data) and is
    * BROADCAST, so the read overhead is O(scan + |deleted positions|)
    * with no shuffle of the table. A MASS delete (say 1B masked rows
    * at 100 TB) would make that broadcast a driver/executor OOM, so
    * the plan is size-guarded from the manifest's per-DV-dir count
    * stats: above `spark.graft.dv.broadcastMaxRows` (default 2^20) —
    * or when any DV dir predates count stats — the anti-join runs as
    * a shuffled hash join on (file, pos) instead: both sides hash-
    * partition on the position key, the per-partition build side is
    * |dv|/parts, and no single JVM ever holds the full position set. */
  private def dvSubtract(spark: SparkSession, table: String, m: Manifest,
      withKeys: DataFrame): DataFrame = {
    val dv = spark.read
      .parquet(m.dvDirs.map(d => s"${tableDir(table)}/$d"): _*)
      .select(col(DvPath), col(DvPos))
    val dvRows: Option[Long] = {
      val per = m.dvDirs.map(d =>
        m.stats.get(d).flatMap(_.get(CountStat)).map(_.head.toLong))
      if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
    }
    val maxBroadcast = spark.conf
      .get(DvBroadcastMaxRowsKey, DvBroadcastMaxRowsDefault.toString).toLong
    if (dvRows.exists(_ <= maxBroadcast))
      withKeys.join(broadcast(dv), Seq(DvPath, DvPos), "left_anti")
    else
      withKeys.join(dv.hint("shuffle_hash"), Seq(DvPath, DvPos), "left_anti")
  }

  def read(spark: SparkSession, table: String): DataFrame =
    scan(spark, table, manifest(table, latestVersion(table)))

  /** Time travel by version number (Delta `VERSION AS OF`). */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame =
    scan(spark, table, manifest(table, version))

  /** Time travel by timestamp (Delta `TIMESTAMP AS OF`): the latest
    * snapshot committed at or before `tsMillis`. */
  def readAsOf(spark: SparkSession, table: String, tsMillis: Long): DataFrame = {
    val vs = versions(table).map(manifest(table, _))
      .filter(_.ts <= tsMillis)
    require(vs.nonEmpty,
      s"no commit of '$table' at or before $tsMillis")
    scan(spark, table, vs.maxBy(_.version))
  }

  def exists(spark: SparkSession, table: String): Boolean =
    versions(table).nonEmpty

  /** Data skipping: the current snapshot restricted to commit dirs
    * whose [min, max] stats for `column` overlap [lo, hi] — whole
    * directories the predicate cannot match are never listed, opened,
    * or scanned (the Delta/Iceberg file-skipping analog; at 100 TB on
    * an append-mostly table this is the difference between scanning one
    * backfill window and the whole history). Dirs with no stats for the
    * column are scanned conservatively. The exact filter is applied on
    * top, so results equal `read(...).filter(lo <= c AND c <= hi)`. */
  def readPruned(spark: SparkSession, table: String, column: String,
      lo: Double, hi: Double): DataFrame = {
    val m = manifest(table, latestVersion(table))
    val kept = prunedDirs(m, column, lo, hi)
    val base = // all dirs pruned: empty frame with the table's schema
      if (kept.isEmpty) scan(spark, table, m).limit(0)
      else scan(spark, table, m.copy(dataDirs = kept))
    base.filter(col(column) >= lo && col(column) <= hi)
  }

  /** (scanned, total) commit-dir counts [[readPruned]] would touch —
    * the observable skipping contract, asserted in specs/queries. */
  def pruneCounts(table: String, column: String,
      lo: Double, hi: Double): (Int, Int) = {
    val m = manifest(table, latestVersion(table))
    (prunedDirs(m, column, lo, hi).size, m.dataDirs.size)
  }

  /** [[readPruned]] for STRING columns — lexicographic [lo, hi]
    * bounds against the per-dir string min/max stats every write
    * records. The date-string partition pattern at 100 TB
    * (`dt BETWEEN '2024-05-01' AND '2024-08-31'`): whole months of
    * commit dirs are skipped from kilobytes of manifest, the single
    * most common skip predicate on real lakehouse tables. Dirs
    * without string stats scan conservatively; the exact filter
    * applies on top, so results always equal the plain
    * read-and-filter. */
  def readPrunedStr(spark: SparkSession, table: String, column: String,
      lo: String, hi: String): DataFrame = {
    val m = manifest(table, latestVersion(table))
    val kept = prunedDirsStr(m, column, lo, hi)
    val base =
      if (kept.isEmpty) scan(spark, table, m).limit(0)
      else scan(spark, table, m.copy(dataDirs = kept))
    base.filter(col(column) >= lo && col(column) <= hi)
  }

  /** (scanned, total) contract for [[readPrunedStr]]. */
  def pruneCountsStr(table: String, column: String,
      lo: String, hi: String): (Int, Int) = {
    val m = manifest(table, latestVersion(table))
    (prunedDirsStr(m, column, lo, hi).size, m.dataDirs.size)
  }

  private def prunedDirsStr(m: Manifest, column: String,
      lo: String, hi: String): Seq[String] = {
    val ss = Option(m.strStats).getOrElse(Map.empty)
    m.dataDirs.filter { d =>
      if (m.stats.get(d).flatMap(_.get(VersionedTableIO.CountStat))
          .exists(_.headOption.contains(0.0))) false // empty dir: skip
      else ss.get(d).flatMap(_.get(column)) match {
        case Some(Seq(mn, mx)) => mx >= lo && mn <= hi
        case _ => true // no stats: must scan
      }
    }
  }

  private def prunedDirs(m: Manifest, column: String,
      lo: Double, hi: Double): Seq[String] =
    m.dataDirs.filter { d =>
      val st = m.stats.get(d)
      if (st.flatMap(_.get(VersionedTableIO.CountStat))
          .exists(_.headOption.contains(0.0))) false // empty dir: skip
      else st.flatMap(_.get(column)) match {
        case Some(Seq(mn, mx)) => mx >= lo && mn <= hi
        case _ => true // no stats: must scan
      }
    }

  // ---- writes ----------------------------------------------------------

  /** Write `df` into a fresh immutable data dir; no manifest yet — the
    * data is invisible until a commit references it. Partition columns
    * stay regular columns (pruning at this layer comes from the
    * manifest's commit-dir min/max stats + parquet row-group stats;
    * hive-style dirs would collide across commits). Returns the dir and
    * its numeric-column stats. */
  private def writeDataDir(df: DataFrame, table: String): (String, Map[String, Seq[Double]]) = {
    val rel = s"data/${java.util.UUID.randomUUID()}"
    val abs = s"${tableDir(table)}/$rel"
    // GENERATED ALWAYS AS: compute any declared column the batch does
    // not carry (callers never hand-maintain derivatives); a batch
    // that DOES carry one is validated below instead
    val withGen = generatedColumns(table).toSeq.sortBy(_._1)
      .foldLeft(df) { case (d, (name, sql)) =>
        if (d.columns.contains(name)) d else d.withColumn(name, expr(sql))
      }
    withGen.write.parquet(abs)
    validateWrite(df.sparkSession, table, abs)
    // one stats job, not two (round-14): when string columns exist the
    // string min/max needs a data scan anyway (parquet aggregate
    // pushdown covers only numeric), so the numeric min/max rides the
    // SAME aggregate — identical values, one fewer job per write (the
    // per-batch streaming sinks pay this on every micro-batch). A
    // string-less table keeps the footer-only pushdown pass.
    val (num, str) = collectAllStats(df.sparkSession, abs)
    if (str.nonEmpty) pendingStrStats.put(rel, str)
    (rel, num)
  }

  /** Numeric + string [min, max] of a written dir in the fewest jobs:
    * one combined data-scan aggregate when string columns force a scan
    * anyway, the footer-only pushdown pass ([[collectStats]]) when the
    * schema is numeric-only. */
  private def collectAllStats(spark: SparkSession, absDir: String)
      : (Map[String, Seq[Double]], Map[String, Seq[String]]) = {
    val df = spark.read.parquet(absDir)
    val numCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }.toSeq
    val strCols = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.StringType => f.name
    }.toSeq
    if (strCols.isEmpty) return (collectStats(spark, absDir), Map.empty)
    val aggs = count(lit(1)) +:
      (numCols.flatMap(c => Seq(min(col(c)), max(col(c)))) ++
        strCols.flatMap(c => Seq(min(col(c)), max(col(c)))))
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val n = row.getLong(0).toDouble
    val countStat = Map(VersionedTableIO.CountStat -> Seq(n, n))
    val num = countStat ++ numCols.zipWithIndex.flatMap { case (c, i) =>
      (row.get(2 * i + 1), row.get(2 * i + 2)) match {
        case (mn: java.lang.Number, mx: java.lang.Number) =>
          Some(c -> Seq(mn.doubleValue(), mx.doubleValue()))
        case _ => None // all-null column: no usable bound
      }
    }.toMap
    val off = 1 + 2 * numCols.length
    val str = strCols.zipWithIndex.flatMap { case (c, i) =>
      (row.get(off + 2 * i), row.get(off + 2 * i + 1)) match {
        case (mn: String, mx: String) => Some(c -> Seq(mn, mx))
        case _ => None // all-null or empty dir: no usable bound
      }
    }.toMap
    (num, str)
  }

  /** Enforce the table's CHECK constraints on a freshly written dir —
    * BEFORE any commit references it, so a violating write aborts with
    * the old snapshot intact (Delta's InvariantViolationException
    * point). Validation reads the WRITTEN FILES, column-pruned to the
    * constraint expressions, rather than re-running the input plan
    * (which may be expensive or nondeterministic); all constraints
    * check in ONE scan via a single aggregate. ANSI CHECK semantics: a
    * row violates only when the predicate evaluates to FALSE — NULL
    * (unknown) passes, and a constraint whose columns are absent from
    * this batch's schema passes vacuously (schema evolution: the
    * merged read surfaces those columns as null). The constraint set
    * is read at write time — same read-check window as Delta. */
  private def validateWrite(spark: SparkSession, table: String,
      abs: String): Unit = {
    // CHECK constraints + generated-column equality share one scan:
    // a generated column the batch PROVIDED must match its expression
    // (null-safe — Delta's GENERATED ALWAYS AS validation)
    val cs = constraints(table) ++
      generatedColumns(table).map { case (name, sql) =>
        s"generated:$name" -> s"$name <=> ($sql)"
      }
    if (cs.isEmpty) return
    val df = spark.read.parquet(abs)
    val checkable = cs.toSeq.sortBy(_._1).flatMap { case (name, pred) =>
      try {
        val c = expr(pred)
        df.select(c).queryExecution.analyzed // unresolvable → vacuous
        Some((name, pred, c))
      } catch {
        case _: org.apache.spark.sql.AnalysisException => None
      }
    }
    if (checkable.isEmpty) return
    val aggs = checkable.map { case (_, _, c) =>
      // coalesce the SUM too: an empty batch dir aggregates to null,
      // which is zero violations, not a crash
      coalesce(sum(when(!coalesce(c, lit(true)), 1L).otherwise(0L)),
        lit(0L)) }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    checkable.zipWithIndex.foreach { case ((name, pred, _), i) =>
      if (row.getLong(i) > 0L) {
        FsOps.deleteRecursively(new File(abs))
        throw new IllegalStateException(
          s"CHECK constraint '$name' violated by ${row.getLong(i)} " +
            s"row(s): ($pred) — write aborted, no commit")
      }
    }
  }

  /** Per-column [min, max] of every numeric column in a written dir —
    * the write-side stats pass Delta performs inline. Reading the
    * FILES (not re-running the input plan) with parquet aggregate
    * pushdown enabled answers MIN/MAX from footers alone, so the pass
    * costs metadata I/O, not a data scan. */
  private def collectStats(spark: SparkSession,
      absDir: String): Map[String, Seq[Double]] = {
    val df = spark.read.parquet(absDir)
    val numCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }.toSeq
    // the pushdown flag is session state: serialize set→plan→restore so
    // concurrent writers on one session can't interleave and leak the
    // flag into (or clobber it for) unrelated queries
    VersionedTableIO.statsLock.synchronized {
      val key = "spark.sql.parquet.aggregatePushDown"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        val aggs = count(lit(1)) +:
          numCols.flatMap(c => Seq(min(col(c)), max(col(c))))
        val row = df.agg(aggs.head, aggs.tail: _*).first()
        val n = row.getLong(0).toDouble
        // row count always recorded — an EMPTY commit dir (a backfill
        // slice with no rows at this scale) is prunable for EVERY
        // predicate, where "no stats" would force a conservative scan
        val countStat = Map(VersionedTableIO.CountStat -> Seq(n, n))
        countStat ++ numCols.zipWithIndex.flatMap { case (c, i) =>
          (row.get(2 * i + 1), row.get(2 * i + 2)) match {
            case (mn: java.lang.Number, mx: java.lang.Number) =>
              Some(c -> Seq(mn.doubleValue(), mx.doubleValue()))
            case _ => None // all-null column: no usable bound
          }
        }.toMap
      } finally {
        prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
      }
    }
  }

  /** Side channel rel-dir → string-column [min,max], consumed by
    * [[commitLoopEx]] (rel names are UUIDs, so entries never collide
    * across concurrent writers; stale entries from aborted writes are
    * filtered out by the commit's dirSet). */
  private val pendingStrStats =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Seq[String]]]()


  /** Abort-path cleanup for an uncommitted data dir: the files AND the
    * pending string-stats entry (which would otherwise outlive the
    * aborted write in a long-lived instance). */
  private def discardDataDir(table: String, rel: String): Unit = {
    pendingStrStats.remove(rel)
    FsOps.deleteRecursively(new File(s"${tableDir(table)}/$rel"))
  }

  /** A [n, n] count-stat entry — what [[collectStats]] records for
    * data dirs; DV writers record the same for their sidecar dirs so
    * reads can size-guard the DV plan from the manifest alone. */
  private def countStatOf(n: Long): Map[String, Seq[Double]] =
    Map(CountStat -> Seq(n.toDouble, n.toDouble))

  private def requireWritable(table: String): Unit =
    if (latestManifest(table).exists(_.properties.get(PropAppendOnly).contains("true")))
      throw new UnsupportedOperationException(
        s"table '$table' is $PropAppendOnly=true: overwrite/merge are " +
          "forbidden (delta.appendOnly enforcement)")

  def append(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    val (rel, st) = writeDataDir(df, table)
    commitLoop(table, "append")(base =>
      (base.map(_.dataDirs).getOrElse(Nil) :+ rel, Map(rel -> st)))
    ()
  }

  def overwrite(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    requireWritable(table)
    val (rel, st) = writeDataDir(df, table)
    commitLoop(table, "overwrite", clearDv)(_ => (Seq(rel), Map(rel -> st)))
    ()
  }

  /** Snapshot rewrite with read-validation: `transform` is computed
    * from version v; the commit only lands if v is STILL the head
    * (otherwise a concurrent append's rows would silently vanish from
    * the rewritten snapshot). On conflict the whole read-transform-
    * write recomputes against the new head — Delta's
    * ConcurrentAppendException semantics, resolved by retry here. */
  private def rewriteSnapshot(spark: SparkSession, table: String,
      op: String)(transform: DataFrame => DataFrame): Unit =
    rewriteSnapshotEx(spark, table, op) { cur =>
      val (rel, st) = writeDataDir(transform(cur), table)
      (Seq(rel), Map(rel -> st))
    }

  /** [[rewriteSnapshot]] generalized to writers that produce SEVERAL
    * data dirs in one commit (e.g. [[compactZOrder]]'s one-dir-per-
    * z-bucket layout). `write` materializes the new snapshot from the
    * current one and returns the written rel dirs + their stats; the
    * commit lands only if the version it read is still the head. */
  private def rewriteSnapshotEx(spark: SparkSession, table: String,
      op: String)(
      write: DataFrame => (Seq[String], Map[String, Map[String, Seq[Double]]])): Unit = {
    var attempts = 0
    while (attempts < 10) {
      val baseVersion = latestVersion(table)
      val (rels, st) = write(readVersion(spark, table, baseVersion))
      // an effectively-empty snapshot (empty overwrite, or every row
      // masked by deletion vectors) materializes NO dirs: committing
      // dataDirs = Nil would make the head unreadable, so bail without
      // a commit — the same no-op contract as compactSmall
      if (rels.isEmpty) return
      // the rewrite read the DV-aware snapshot, so deletes are
      // MATERIALIZED in the new dirs: clear the vectors
      val committed = commitLoopEx(table, op, clearDv) { base =>
        if (base.map(_.version).contains(baseVersion))
          Some((rels, st, Map.empty[String, String]))
        else None // head moved since we read: stale result, recompute
      }
      if (committed.isDefined) return
      // nested rels (data/<uuid>/__zb=k) share one staging root: drop it
      rels.foreach(r => pendingStrStats.remove(r))
      rels.map(_.split("/").take(2).mkString("/")).distinct.foreach(r =>
        discardDataDir(table, r))
      attempts += 1
    }
    throw new IllegalStateException(
      s"$op on '$table' lost the commit race $attempts times")
  }

  /** S9 as a snapshot rewrite: read current, merge (source wins on key),
    * commit the merged result as the next version. Reading the table
    * being replaced is safe — old data dirs are immutable until VACUUM. */
  override def upsert(spark: SparkSession, source: DataFrame, table: String,
      keys: Seq[String], partitionBy: Seq[String] = Nil): Unit = {
    requireWritable(table)
    if (!exists(spark, table)) { overwrite(source, table, partitionBy); return }
    rewriteSnapshot(spark, table, "merge")(cur => merge(cur, source, keys))
  }

  /** OPTIMIZE analog: rewrite the current snapshot to `numFiles` files
    * as a new version — readers of old versions are unaffected. */
  def compact(spark: SparkSession, table: String, numFiles: Int): Unit =
    rewriteSnapshot(spark, table, "compact")(_.repartition(numFiles))

  /** OPTIMIZE ZORDER analog: range-partition + sort on `clusterCols`
    * so each rewritten file covers a narrow value range. Because the
    * rewrite is a fresh commit, its manifest stats are recomputed over
    * the clustered dir — clustering TIGHTENS the min/max bounds that
    * [[readPruned]] and parquet row-group skipping prune with. */
  def compactClustered(spark: SparkSession, table: String, numFiles: Int,
      clusterCols: Seq[String]): Unit = {
    val cols = clusterCols.map(col)
    rewriteSnapshot(spark, table, "compact")(
      _.repartitionByRange(numFiles, cols: _*).sortWithinPartitions(cols: _*))
  }

  /** OPTIMIZE, bin-packing form (Delta's default OPTIMIZE semantics):
    * rewrite ONLY the commit dirs whose row count (from manifest
    * stats) is below `minRows`, packing them into one fresh dir;
    * every large dir rides into the new manifest untouched. The
    * whole-snapshot [[compact]] is the wrong tool at 100 TB — a table
    * is mostly cold large files plus a tail of small recent appends,
    * and OPTIMIZE must cost O(small tail), not O(table). Dirs without
    * a count stat are treated as small (conservative: packing them is
    * always safe). Read-validated like every rewrite: the commit
    * lands only if the head hasn't moved since the small set was
    * chosen. No-op when fewer than two dirs qualify. */
  def compactSmall(spark: SparkSession, table: String, minRows: Long,
      numFiles: Int = 1): Unit = {
    requireWritable(table)
    var attempts = 0
    while (attempts < 10) {
      val baseVersion = latestVersion(table)
      val m = manifest(table, baseVersion)
      val small = m.dataDirs.filter(d =>
        m.stats.get(d).flatMap(_.get(CountStat)).map(_.head)
          .forall(_ < minRows.toDouble))
      if (small.size <= 1) return
      val big = m.dataDirs.filterNot(small.toSet)
      // read the smalls through the DV filter so packing MATERIALIZES
      // their deletes; vectors for the carried big dirs stay in force
      val packed = scan(spark, table, m.copy(dataDirs = small))
        .repartition(numFiles)
      val (rel, st) = writeDataDir(packed, table)
      // Carried vectors must not keep positions that reference the
      // PACKED dirs: those deletes are already materialized in `rel`,
      // and the stale positions — harmless to reads (their path keys
      // no longer resolve) — would make [[rowCount]]'s Σdata − Σdv
      // double-subtract them. Rewrite the vectors down to positions on
      // the carried big dirs (consolidating any stack into one dir);
      // no survivors → the snapshot commits with DVs fully cleared.
      val oldDvs = Option(m.dvDirs).getOrElse(Nil)
      val (newDvs, dvStats) =
        if (oldDvs.isEmpty)
          (Nil, Map.empty[String, Map[String, Seq[Double]]])
        else {
          val dvRel = s"data/${java.util.UUID.randomUUID()}"
          val dvAbs = s"${tableDir(table)}/$dvRel"
          // a DV path is data/<uuid>/<file> (or data/<uuid>/__zb=k/
          // <file> for z-ordered dirs): its owning rel dir is the 2- or
          // 3-segment prefix — O(1) per row however many dirs packed
          spark.read
            .parquet(oldDvs.map(d => s"${tableDir(table)}/$d"): _*)
            .select(col(DvPath), col(DvPos))
            .filter(
              !substring_index(col(DvPath), "/", 2).isin(small: _*) &&
              !substring_index(col(DvPath), "/", 3).isin(small: _*))
            .write.parquet(dvAbs)
          val nKept = spark.read.parquet(dvAbs).count()
          if (nKept == 0L) {
            FsOps.deleteRecursively(new File(dvAbs))
            (Nil, Map.empty[String, Map[String, Seq[Double]]])
          } else
            (Seq(dvRel), Map(dvRel -> countStatOf(nKept)))
        }
      val committed = commitLoopEx(table, "compact",
        dv = _ => newDvs) { base =>
        if (base.map(_.version).contains(baseVersion))
          Some((big :+ rel, Map(rel -> st) ++ dvStats,
            Map.empty[String, String]))
        else None // head moved: small set is stale, re-pick
      }
      if (committed.isDefined) return
      discardDataDir(table, rel)
      newDvs.foreach(discardDataDir(table, _))
      attempts += 1
    }
    throw new IllegalStateException(
      s"compactSmall('$table') lost the commit race 10 times")
  }

  /** OPTIMIZE ZORDER analog — MULTI-dimensional clustering.
    * [[compactClustered]]'s linear sort tightens stats on its leading
    * column only: a predicate on the second column still scans every
    * dir. Z-ordering interleaves the bits of all cluster columns'
    * normalized 8-bit keys into one z-value and cuts the snapshot into
    * `numDirs` z-RANGE buckets, each committed as its own data dir
    * with its own min/max stats — so [[readPruned]] on ANY clustered
    * column skips the dirs whose bit-prefix excludes the range (with 2
    * columns and 16 dirs, a quarter-range predicate on either column
    * scans 4). The reference compacts its Delta tables the same way
    * operationally (OPTIMIZE after ingest); Z-order is the shape that
    * survives 100 TB, where a second-column scan-all is the difference
    * between reading one backfill's worth of files and the whole table.
    *
    * One data pass: normalize (per-column min/max from a single agg,
    * inlined as literals), z-value via codegen'd bit ops, range-
    * partition on the z-bucket, one partitioned write; stats come from
    * parquet footers (metadata I/O). The commit is read-validated like
    * every snapshot rewrite. `numDirs` must be a power of two ≤
    * 2^(8·nCols); cluster columns must be numeric and not all-null
    * (rows with a NULL key cluster at that column's min bucket); an
    * effectively-empty snapshot (all rows DV-masked) is a no-op. */
  def compactZOrder(spark: SparkSession, table: String,
      clusterCols: Seq[String], numDirs: Int): Unit = {
    requireWritable(table)
    val nCols = clusterCols.size
    require(nCols >= 1, "compactZOrder needs at least one cluster column")
    val totalBits = 8 * nCols
    require(numDirs >= 2 && (numDirs & (numDirs - 1)) == 0 &&
      numDirs <= (1 << math.min(totalBits, 30)),
      s"numDirs must be a power of two in [2, 2^$totalBits], got $numDirs")
    val bucketBits = 31 - Integer.numberOfLeadingZeros(numDirs)
    rewriteSnapshotEx(spark, table, "compact") { cur =>
      // z-keys need a numeric domain: a string/date column would cast
      // its min/max to null and silently collapse every z-value to one
      // bucket — refuse up front instead (cluster on a NUMERIC
      // derivative, e.g. a generated epoch-day column, for dates)
      val bad = clusterCols.filterNot(c => cur.schema.fields.exists(f =>
        f.name == c &&
          f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]))
      require(bad.isEmpty, "compactZOrder cluster columns must exist " +
        s"and be numeric; offending: ${bad.mkString(", ")}")
      val bcols = count(lit(1)) +: clusterCols.indices.flatMap(j => Seq(
        min(col(clusterCols(j))).cast("double"),
        max(col(clusterCols(j))).cast("double")))
      // ONE bounds row, collected (bounded: 2·nCols doubles) and inlined
      // as literals so the z-value expression stays constant-foldable
      val b = cur.agg(bcols.head, bcols.tail: _*).first()
      val rel = s"data/${java.util.UUID.randomUUID()}"
      val abs = s"${tableDir(table)}/$rel"
      val rels: Seq[String] = if (b.getLong(0) == 0L) Nil else {
        val bounds = clusterCols.indices.map { j =>
          require(!b.isNullAt(2 * j + 1) && !b.isNullAt(2 * j + 2),
            s"compactZOrder: cluster column '${clusterCols(j)}' is " +
              "entirely null — no z-range to cluster on")
          (b.getDouble(2 * j + 1), b.getDouble(2 * j + 2))
        }
        // 8-bit key per column: exact when the domain is integral and
        // spans max-min+1 values; a monotone binning otherwise. NULL
        // keys map to the column's min (bucket-0 end) — a null would
        // otherwise propagate into a null z-value and a
        // __HIVE_DEFAULT_PARTITION__ dir the manifest can't name
        val keys = clusterCols.indices.map { j =>
          val (mn, mx) = bounds(j)
          least(lit(255), greatest(lit(0),
            floor((coalesce(col(clusterCols(j)).cast("double"), lit(mn)) - mn)
              * 256.0 / (mx - mn + 1.0))
              .cast("int")))
        }
        val zval = (0 until 8).flatMap { i =>
          keys.zipWithIndex.map { case (k, j) =>
            shiftleft(shiftrightunsigned(k, i).bitwiseAND(lit(1)),
              i * nCols + (nCols - 1 - j))
          }
        }.reduce(_ bitwiseOR _)
        cur
          .withColumn("__zb", shiftrightunsigned(zval, totalBits - bucketBits))
          .repartitionByRange(numDirs, col("__zb"))
          .write.partitionBy("__zb").parquet(abs)
        // each __zb=k subdir becomes its own manifest data dir; reading a
        // leaf dir directly never re-infers __zb, so the schema is clean.
        // Stray non-partition markers (_SUCCESS etc.) are ignored, but a
        // __zb=-prefixed dir that does NOT parse as an int (e.g.
        // __zb=__HIVE_DEFAULT_PARTITION__ from a z-value the coalesce
        // failed to make non-null) holds ROWS the manifest couldn't
        // name — silently dropping it loses data, so fail the
        // compaction loudly before anything commits
        val zbDirs = new File(abs).listFiles().toSeq
          .filter(_.getName.startsWith("__zb="))
        val malformed = zbDirs.filterNot(f =>
          f.getName.length > "__zb=".length &&
            f.getName.stripPrefix("__zb=").forall(_.isDigit))
        require(malformed.isEmpty,
          s"z-order of '$table' produced unparseable partition dirs " +
            s"(${malformed.map(_.getName).mkString(", ")}) — rows would " +
            "be silently dropped; aborting before commit")
        zbDirs.sortBy(_.getName.stripPrefix("__zb=").toInt)
          .map(f => s"$rel/${f.getName}")
      }
      // an all-rows-masked snapshot still writes an empty staging root
      // (or none at all): drop it; empty rels → rewriteSnapshotEx no-op
      if (rels.isEmpty) FsOps.deleteRecursively(new File(abs))
      (rels, rels.map(r => r -> collectStats(spark, s"${tableDir(table)}/$r")).toMap)
    }
  }

  /** CLONE (Delta `CREATE TABLE ... CLONE src` analog): materialize
    * `dst` as a new table whose first commit is `src`'s snapshot at
    * `version`. How the data files are shared is the BACKEND's
    * honest cheapest primitive ([[CommitBackend.shareFile]]): on a
    * POSIX filesystem they are HARD-LINKED — O(files) metadata
    * operations, zero data bytes, regardless of table size (the
    * 100 TB dev/staging-branch pattern: fork the production table,
    * experiment, throw away); an object store has no link primitive,
    * so the conditional-put backend models server-side COPY (one API
    * call per object, no bytes through the client) — never a
    * pretend-zero-copy that would dangle later.
    *
    * SAFER than Delta's shallow clone under EITHER backend: links
    * keep the underlying inodes alive and copies are independent
    * objects, so VACUUMing the SOURCE can never break the clone
    * (Delta's shallow clones dangle when the source is vacuumed —
    * asserted the other way here in VersionedTableSpec, against both
    * backends). Stats and properties carry over; after the clone the
    * two tables diverge independently.
    *
    * Crash-safe like every write: the shared files land before the
    * commit, so a crash mid-clone leaves only an invisible-and-
    * vacuumable orphan tree, never a half-visible table. A VACUUM
    * racing the clone and dropping the source version mid-copy makes
    * the clone ABORT (post-copy source-manifest check) rather than
    * commit with silently missing rows. */
  def cloneTable(src: String, dst: String,
      version: Option[Long] = None): Unit = {
    val srcVersion = version.getOrElse(latestVersion(src))
    val m = manifest(src, srcVersion)
    require(versions(dst).isEmpty,
      s"clone target '$dst' already has commits")
    val dvs = Option(m.dvDirs).getOrElse(Nil)
    try {
      (m.dataDirs ++ dvs).foreach { rel =>
        linkTree(new File(s"${tableDir(src)}/$rel"),
          new File(s"${tableDir(dst)}/$rel"))
      }
      // Clone-while-vacuum guard: a concurrent VACUUM that drops
      // `srcVersion` can sweep its data dirs MID-COPY — a vanished
      // file aborts the copy loudly, but a whole dir vanishing between
      // list and copy would yield an empty clone dir and SILENT row
      // loss. Vacuum deletes a version's manifest BEFORE its dirs, so
      // the manifest still existing here proves every dir copied above
      // stayed intact for the whole copy window.
      require(manifestFile(src, srcVersion).exists(),
        s"clone source '$src' v$srcVersion was vacuumed during the copy")
    } catch {
      case t: Throwable =>
        // Abort by deleting ONLY the rel dirs THIS clone linked, never
        // the whole dst table dir: the versions(dst).isEmpty check ran
        // once up front, so a concurrent writer that started creating
        // dst after it could have in-flight dirs — or a just-landed
        // first commit — under the same root; wiping tableDir(dst)
        // would destroy the peer's data. Rel names are UUIDs unique to
        // the source snapshot, so an INDEPENDENT writer's dirs never
        // collide with the ones deleted here (only a second clone of
        // the same src version shares them — and that peer aborts on
        // the same vanished-source condition that aborted us). Without
        // a commit the partial copy was never visible anyway.
        (m.dataDirs ++ dvs).foreach { rel =>
          FsOps.deleteRecursively(new File(s"${tableDir(dst)}/$rel"))
        }
        throw t
    }
    Option(m.strStats).getOrElse(Map.empty)
      .foreach { case (d, st) => pendingStrStats.put(d, st) }
    // DV keys are TABLE-RELATIVE paths, so the linked vectors keep
    // masking the same rows under the clone's root
    commitLoopEx(dst, "clone", _ => dvs) { base =>
      require(base.isEmpty, s"clone target '$dst' already has commits")
      Some((m.dataDirs, m.stats, m.properties))
    }
    ()
  }

  private def linkTree(srcDir: File, dstDir: File): Unit = {
    dstDir.mkdirs()
    Option(srcDir.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory) linkTree(f, new File(dstDir, f.getName))
      else backend.shareFile(f, new File(dstDir, f.getName))
    }
  }

  /** Metadata-only COUNT(*): the snapshot's row count summed from the
    * per-dir count stats every commit records — zero file opens, zero
    * Spark jobs (a pure log read). At 100 TB this answers the most
    * common query against the biggest tables from kilobytes of
    * manifest. None if any dir predates count stats (caller falls
    * back to a scan). */
  def rowCount(table: String, version: Long): Option[Long] = {
    val m = manifest(table, version)
    def counts(dirs: Seq[String]): Seq[Option[Long]] = dirs.map(d =>
      m.stats.get(d).flatMap(_.get(CountStat)).map(_.head.toLong))
    val data = counts(m.dataDirs)
    // every DV row masks exactly one LIVE row (writers exclude already-
    // masked positions up front, so positions never duplicate across
    // stacked vectors) — the snapshot count is Σdata − Σdv, still a
    // pure manifest read even while deletes are unmaterialized
    val dv = counts(Option(m.dvDirs).getOrElse(Nil))
    if ((data ++ dv).forall(_.isDefined))
      Some(data.flatten.sum - dv.flatten.sum)
    else None
  }

  /** Delta DELETE with DELETION VECTORS: mark matching rows deleted by
    * POSITION — (relative file path, row index) pairs in a sidecar
    * parquet dir the manifest's `dvDirs` references — without touching
    * a single data file. [[deleteWhere]] rewrites the whole snapshot;
    * at 100 TB that makes deleting 100 rows cost a table rewrite,
    * which is why Delta grew DVs. Cost here: one scan to find matches
    * + O(matched positions) written; readers anti-join the broadcast
    * position set (see [[dvSubtract]]). Deletes stack (each DELETE
    * appends a DV dir); any snapshot REWRITE (overwrite / merge /
    * update / compact / z-order) materializes them — its DV-aware
    * input already excludes the rows — and clears `dvDirs`. Time
    * travel before the delete still sees the rows. [[rowCount]] stays
    * exact while DVs are live (Σdata − Σdv from the manifest's count
    * stats — every rewrite keeps vectors consistent with their dirs);
    * only [[exportManifest]] refuses, since a plain-parquet reader
    * has no way to apply the mask. A no-match DELETE commits
    * nothing. */
  def deleteWhereVectors(spark: SparkSession, table: String,
      predicate: Column): Unit = {
    requireWritable(table)
    var attempts = 0
    while (attempts < 10) {
      val baseVersion = latestVersion(table)
      val m = manifest(table, baseVersion)
      val rel = s"data/${java.util.UUID.randomUUID()}"
      val abs = s"${tableDir(table)}/$rel"
      // positions of surviving-then-matching rows: already-deleted rows
      // are excluded up front so DV rows never duplicate
      scan(spark, table, m.copy(dvDirs = Nil))
        .withColumn(DvPath, relFilePath)
        .withColumn(DvPos, col("_metadata.row_index"))
        .transform(df =>
          if (Option(m.dvDirs).forall(_.isEmpty)) df
          else dvSubtract(spark, table, m, df))
        .filter(predicate)
        .select(col(DvPath), col(DvPos))
        .write.parquet(abs)
      val nDv = spark.read.parquet(abs).count()
      if (nDv == 0L) {
        discardDataDir(table, rel) // no matches: no commit
        return
      }
      val committed = commitLoopEx(table, "delete",
        dv = base => carryDv(base) :+ rel) { base =>
        if (base.map(_.version).contains(baseVersion))
          Some((m.dataDirs, Map(rel -> countStatOf(nDv)),
            Map.empty[String, String]))
        else None // head moved: positions may be stale, recompute
      }
      if (committed.isDefined) return
      discardDataDir(table, rel)
      attempts += 1
    }
    throw new IllegalStateException(
      s"deleteWhereVectors('$table') lost the commit race 10 times")
  }

  /** Delta UPDATE with deletion vectors: mask the matched rows by
    * position AND append their updated images — ONE commit, cost
    * O(matched rows), no snapshot rewrite (the [[updateWhere]] form
    * rewrites everything; at 100 TB updating 0.1% of a table must not
    * cost 100%). The matched set is pinned with an eager local
    * checkpoint so the mask and the images come from the SAME
    * evaluation; the appended dir goes through the normal
    * constraint-validated [[writeDataDir]] path, so a CHECK-violating
    * update still aborts whole. Stacks with prior DVs and with itself
    * (updated images live in ordinary data dirs and can be masked by
    * the next update). */
  def updateWhereVectors(spark: SparkSession, table: String,
      predicate: Column, assignments: Map[String, Column]): Unit = {
    requireWritable(table)
    var attempts = 0
    while (attempts < 10) {
      val baseVersion = latestVersion(table)
      val m = manifest(table, baseVersion)
      val matched = scan(spark, table, m.copy(dvDirs = Nil))
        .withColumn(DvPath, relFilePath)
        .withColumn(DvPos, col("_metadata.row_index"))
        .transform(df =>
          if (Option(m.dvDirs).forall(_.isEmpty)) df
          else dvSubtract(spark, table, m, df))
        .filter(predicate)
        .localCheckpoint()
      val nDv = matched.count()
      if (nDv == 0L) return
      val dvRel = s"data/${java.util.UUID.randomUUID()}"
      val dvAbs = s"${tableDir(table)}/$dvRel"
      matched.select(col(DvPath), col(DvPos)).write.parquet(dvAbs)
      val updated = assignments.foldLeft(matched.drop(DvPath, DvPos)) {
        case (df, (c, e)) => df.withColumn(c, e)
      }
      val (rel, st) =
        try writeDataDir(updated, table)
        catch { case e: Throwable => // constraint violation: no orphan
          discardDataDir(table, dvRel); throw e
        }
      val committed = commitLoopEx(table, "update",
        dv = base => carryDv(base) :+ dvRel) { base =>
        if (base.map(_.version).contains(baseVersion))
          Some((m.dataDirs :+ rel,
            Map(rel -> st, dvRel -> countStatOf(nDv)),
            Map.empty[String, String]))
        else None // head moved: matched set is stale, recompute
      }
      if (committed.isDefined) return
      discardDataDir(table, dvRel)
      discardDataDir(table, rel)
      attempts += 1
    }
    throw new IllegalStateException(
      s"updateWhereVectors('$table') lost the commit race 10 times")
  }

  /** Delta MERGE with deletion vectors (source wins on key match):
    * mask the target rows whose keys appear in `source`, append the
    * source as one new dir — ONE commit costing O(|source| +
    * matched positions), no snapshot rewrite, same result as the
    * rewrite-based [[upsert]] (spec-asserted equal). Degenerates to a
    * plain append when no keys match (insert-only merge: no DV dir
    * committed). The daily-upsert loop at 100 TB: each batch costs
    * the batch, not the table. */
  def upsertVectors(spark: SparkSession, source: DataFrame,
      table: String, keys: Seq[String]): Unit = {
    requireWritable(table)
    var attempts = 0
    while (attempts < 10) {
      val baseVersion = latestVersion(table)
      val m = manifest(table, baseVersion)
      val dvRel = s"data/${java.util.UUID.randomUUID()}"
      val dvAbs = s"${tableDir(table)}/$dvRel"
      scan(spark, table, m.copy(dvDirs = Nil))
        .withColumn(DvPath, relFilePath)
        .withColumn(DvPos, col("_metadata.row_index"))
        .transform(df =>
          if (Option(m.dvDirs).forall(_.isEmpty)) df
          else dvSubtract(spark, table, m, df))
        .join(broadcast(source.select(keys.map(col): _*).distinct()),
          keys, "left_semi")
        .select(col(DvPath), col(DvPos))
        .write.parquet(dvAbs)
      val nDv = spark.read.parquet(dvAbs).count()
      val anyMatch = nDv > 0L
      if (!anyMatch) discardDataDir(table, dvRel)
      val (rel, st) =
        try writeDataDir(source, table)
        catch { case e: Throwable =>
          if (anyMatch) discardDataDir(table, dvRel); throw e
        }
      val committed = commitLoopEx(table, "merge",
        dv = base =>
          if (anyMatch) carryDv(base) :+ dvRel else carryDv(base)) { base =>
        if (base.map(_.version).contains(baseVersion))
          Some((m.dataDirs :+ rel,
            Map(rel -> st) ++
              (if (anyMatch) Map(dvRel -> countStatOf(nDv)) else Map.empty),
            Map.empty[String, String]))
        else None // head moved: matched mask is stale, recompute
      }
      if (committed.isDefined) return
      if (anyMatch) discardDataDir(table, dvRel)
      discardDataDir(table, rel)
      attempts += 1
    }
    throw new IllegalStateException(
      s"upsertVectors('$table') lost the commit race 10 times")
  }

  /** Delta DELETE: drop rows matching `predicate` as a snapshot
    * rewrite (read-validated; concurrent appends conflict and
    * recompute rather than vanish). Time travel still sees them. */
  def deleteWhere(spark: SparkSession, table: String,
      predicate: Column): Unit = {
    requireWritable(table)
    // SQL DELETE semantics: only rows where the predicate IS TRUE go —
    // a NULL predicate (e.g. `k = 1` on a NULL k) keeps the row, which
    // plain `!predicate` would silently drop
    rewriteSnapshot(spark, table, "delete")(
      _.filter(!coalesce(predicate, lit(false))))
  }

  /** Delta UPDATE: `assignments` applied to rows matching `predicate`,
    * all other rows carried unchanged, as one snapshot rewrite. */
  def updateWhere(spark: SparkSession, table: String,
      predicate: Column,
      assignments: Map[String, Column]): Unit = {
    requireWritable(table)
    rewriteSnapshot(spark, table, "update") { cur =>
      assignments.foldLeft(cur) { case (df, (c, v)) =>
        df.withColumn(c, when(predicate, v).otherwise(df(c)))
      }
    }
  }

  /** Idempotent append — Delta's txnAppId/txnVersion contract for
    * exactly-once streaming sinks: each (writer id, sequence) pair
    * commits at most once; a replayed batch (foreachBatch is
    * at-least-once around crashes) is detected from the LATEST
    * manifest's properties and skipped, because the watermark rides
    * the same atomic commit as the data it covers. Returns true if the
    * append committed, false if it was a replay. Sequences must be
    * monotonic per writer (streaming batch ids are). */
  def appendIdempotent(df: DataFrame, table: String,
      writerId: String, sequence: Long): Boolean = {
    val key = s"txn:$writerId"
    def appliedIn(m: Option[Manifest]) =
      m.flatMap(_.properties.get(key)).map(_.toLong)
    // cheap pre-check before paying the data write
    if (appliedIn(latestManifest(table)).exists(_ >= sequence)) return false
    val (rel, st) = writeDataDir(df, table)
    val committed = commitLoopEx(table, "append") { base =>
      // re-check inside the race: a concurrent/crashed predecessor may
      // have applied this very sequence — the loser must not re-append
      if (appliedIn(base).exists(_ >= sequence)) None
      else Some((base.map(_.dataDirs).getOrElse(Nil) :+ rel,
        Map(rel -> st), Map(key -> sequence.toString)))
    }
    if (committed.isEmpty) discardDataDir(table, rel)
    committed.isDefined
  }

  /** RESTORE analog: make version `toVersion` current again as a NEW
    * commit that re-references the old data dirs — metadata-only
    * (instant, no data copied), history preserved, and the restored
    * dirs become vacuum-protected again because the head references
    * them. Safe against a VACUUM racing this restore, in four layers:
    *  0. the target dirs' mtimes are TOUCHED before anything else, so
    *     they fall under the same orphan-grace protection that shields
    *     every in-flight writer's uncommitted dirs. Ordering makes
    *     this airtight for any vacuum with a nonzero grace: a vacuum
    *     that would sweep the target deletes its MANIFEST before
    *     filtering candidate dirs by mtime, so either the restore's
    *     pre-claim check (layer 1) observes the deletion and aborts,
    *     or the touch preceded the mtime filter and the dirs read as
    *     fresh — never doomed. (A grace of 0 disables in-flight
    *     protection for ALL writers, restore included — the same
    *     documented hazard as vacuuming under active appends.)
    *  1. the target-manifest existence is re-checked inside the commit
    *     build (re-evaluated on every retry, immediately before the
    *     atomic claim) — vacuum deletes a version's manifest BEFORE its
    *     dirs, so a sweep that already started aborts the restore;
    *  2. vacuum recomputes its keep-set from the live log after
    *     dropping manifests (see [[vacuum]]), so a restore that
    *     committed first re-protects its dirs;
    *  3. if a zero-grace sweep nonetheless lands between the check and
    *     the claim, the post-commit verification below detects the
    *     swept dirs, REPAIRS the head by re-committing the pre-restore
    *     snapshot — whose manifest and dirs the sweeping vacuum
    *     necessarily retained (it was the head at the vacuum's
    *     listing) — and fails loudly. The orphaned restore version
    *     remains as a tombstone whose reads fail loudly; the HEAD
    *     stays readable. (Delta's restore-vs-vacuum has the loud
    *     failure with none of these layers.) */
  def restore(table: String, toVersion: Long): Unit = {
    requireWritable(table)
    val target = manifest(table, toVersion)
    val now = System.currentTimeMillis()
    (target.dataDirs ++ Option(target.dvDirs).getOrElse(Nil)).foreach { d =>
      // layer 0: rel dirs may be nested (data/<uuid>/__zb=k); the
      // vacuum candidate is the 2-segment data/<uuid> root — touch it
      val root = d.split("/").take(2).mkString("/")
      new File(s"${tableDir(table)}/$root").setLastModified(now)
    }
    target.dataDirs.foreach { d =>
      require(new File(s"${tableDir(table)}/$d").exists(),
        s"cannot restore '$table' to $toVersion: data dir $d was vacuumed")
    }
    Option(target.strStats).getOrElse(Map.empty)
      .foreach { case (d, st) => pendingStrStats.put(d, st) }
    val dvs = Option(target.dvDirs).getOrElse(Nil)
    val committed = commitLoopEx(table, "restore", _ => dvs) { _ =>
      require(manifestFile(table, toVersion).exists(),
        s"cannot restore '$table' to $toVersion: version was vacuumed " +
          "during the restore")
      Some((target.dataDirs, target.stats, Map.empty[String, String]))
    }.get
    val missing = (target.dataDirs ++ dvs)
      .filterNot(d => new File(s"${tableDir(table)}/$d").exists())
    if (missing.nonEmpty) {
      // layer 3: the race landed — repair the head, then fail loudly.
      // NonFatal: the pre-restore manifest itself may be vacuumed away
      // between the exists() check inside manifest() and its read
      val prev =
        try Some(manifest(table, committed.version - 1))
        catch { case NonFatal(_) => None }
      val repaired = prev.filter(_.dataDirs.forall(d =>
        new File(s"${tableDir(table)}/$d").exists())).flatMap { p =>
        Option(p.strStats).getOrElse(Map.empty)
          .foreach { case (d, st) => pendingStrStats.put(d, st) }
        // Roll back ONLY if the doomed restore is still the head: an
        // unrelated writer that committed on top of the tombstone has
        // already replaced it as the visible snapshot, and re-committing
        // the pre-restore state here would clobber that newer commit
        // (it would survive only as a non-head version). In that case
        // abort the rollback build and just throw.
        commitLoopEx(table, "restore-rollback",
          _ => Option(p.dvDirs).getOrElse(Nil))(base =>
          if (base.exists(_.version == committed.version))
            Some((p.dataDirs, p.stats, Map.empty[String, String]))
          else None)
      }
      throw new IllegalStateException(
        s"restore of '$table' to $toVersion lost to a concurrent vacuum " +
          s"(swept: ${missing.mkString(", ")}); " + (repaired match {
          case Some(r) =>
            s"the pre-restore snapshot was re-committed as head v${r.version}"
          case None =>
            "the head has since moved past the doomed restore, so no " +
              "rollback was committed"
        }))
    }
  }

  // ---- properties ------------------------------------------------------

  def setProperty(table: String, key: String, value: String): Unit = {
    commitLoopEx(table, "setProperty") { base =>
      val b = base.getOrElse(
        throw new IllegalArgumentException(s"no such table '$table'"))
      Some((b.dataDirs, Map.empty, Map(key -> value)))
    }
    ()
  }

  def properties(table: String): Map[String, String] =
    latestManifest(table).map(_.properties).getOrElse(Map.empty)

  // ---- CHECK constraints ----------------------------------------------

  /** `ALTER TABLE ADD CONSTRAINT name CHECK (predicate)` (Delta
    * invariants, stored as `constraint.<name>` properties the way
    * Delta uses `delta.constraints.<name>`): existing rows must
    * already satisfy the predicate (one validation scan, as Delta
    * does), then a metadata commit records it; every subsequent write
    * is validated before its commit and aborts on violation — bad
    * data can never become visible, which at 100 TB replaces the
    * find-the-poisoned-partition fire drill with a failed job. */
  def addConstraint(spark: SparkSession, table: String, name: String,
      predicate: String): Unit = {
    require(name.nonEmpty && !name.contains('='),
      s"bad constraint name '$name'")
    // Validate-then-commit is racy on its own: a writer whose
    // validateWrite read the PRE-constraint property set can land a
    // violating dir after our validation scan but before our property
    // commit — Delta detects this as a metadata conflict and fails one
    // side. Here the commit lands only if the head hasn't moved since
    // the scan; when it has, only the dirs ADDED since are re-scanned.
    // Data dirs are immutable, but a dir-name verdict alone is NOT
    // stable: validation reads through the head's deletion vectors, and
    // a concurrent restore() can re-commit the same dir names with
    // FEWER dvDirs — re-exposing a violating row that was masked when
    // we scanned. So verdicts are additionally keyed on the DV set
    // they were computed under: whenever the head's dvDirs is not a
    // superset of the one validated against, every verdict resets.
    var validated = Set.empty[String]
    var validatedDvs = Option.empty[Set[String]]
    var attempts = 0
    while (attempts < 10) {
      val head = latestManifest(table)
      val headDvs = head.map(m =>
        Option(m.dvDirs).getOrElse(Nil).toSet).getOrElse(Set.empty)
      if (validatedDvs.exists(v => !v.subsetOf(headDvs)))
        validated = Set.empty // masks removed: prior verdicts are stale
      val toCheck = head.map(m =>
        m.dataDirs.filterNot(validated)).getOrElse(Nil)
      head.filter(_ => toCheck.nonEmpty).foreach { m =>
        // a predicate over a column the schema doesn't have YET is
        // vacuously satisfied (rows surface it as null once schema
        // evolution introduces it) — Delta refuses these; accepting is
        // the evolution-friendly divergence, enforced the moment a
        // batch actually carries the column. DV masks apply: a
        // violating row already deleted by position doesn't block.
        val bad =
          try Some(scan(spark, table, m.copy(dataDirs = toCheck))
            .filter(!coalesce(expr(predicate), lit(true))).count())
          catch { case _: org.apache.spark.sql.AnalysisException => None }
        bad.foreach(b => require(b == 0L,
          s"cannot add CHECK constraint '$name': $b existing row(s) " +
            s"violate ($predicate)"))
      }
      validated ++= toCheck
      validatedDvs = Some(headDvs)
      val headVersion = head.map(_.version)
      val committed = commitLoopEx(table, "setProperty") { base =>
        if (base.map(_.version) != headVersion)
          None // head moved during validation: re-scan the new dirs
        else {
          val b = base.getOrElse(
            throw new IllegalArgumentException(s"no such table '$table'"))
          Some((b.dataDirs, Map.empty,
            Map(s"$PropConstraintPrefix$name" -> predicate)))
        }
      }
      if (committed.isDefined) return
      attempts += 1
    }
    throw new IllegalStateException(
      s"addConstraint('$table', '$name') lost the validation race 10 times")
  }

  /** Remove a CHECK constraint (metadata commit; empty value unsets
    * the property in the merge). */
  def dropConstraint(table: String, name: String): Unit =
    setProperty(table, s"$PropConstraintPrefix$name", "")

  /** Active CHECK constraints: name → predicate SQL. */
  def constraints(table: String): Map[String, String] =
    properties(table).collect {
      case (k, v) if k.startsWith(PropConstraintPrefix) && v.nonEmpty =>
        k.stripPrefix(PropConstraintPrefix) -> v
    }

  /** CREATE TABLE as a metadata-only commit (0 data dirs) — the home
    * for properties that must exist BEFORE the first write, e.g.
    * generated columns and appendOnly. Reads stay refused until data
    * lands (same as any empty version). */
  def createTable(table: String,
      properties: Map[String, String] = Map.empty): Unit = {
    commitLoopEx(table, "create") { base =>
      require(base.isEmpty, s"table '$table' already exists")
      Some((Nil, Map.empty, properties))
    }
    ()
  }

  /** Delta GENERATED ALWAYS AS: declare `name` as `exprSql` over the
    * row's other columns. Every subsequent write COMPUTES the column
    * when the batch lacks it (ingest never hand-maintains
    * derivatives — the partition-date pattern) and VALIDATES it
    * null-safe-equal when the batch carries it (a stale provided
    * value aborts before commit, same machinery as CHECK). Because
    * the column lands in every dir, manifest min/max stats cover it —
    * [[readPruned]] on the generated column is the Delta
    * partition-pruning-on-generated-columns behavior. The expression
    * must be deterministic (caller contract, as in Delta). */
  def addGeneratedColumn(table: String, name: String,
      exprSql: String): Unit = {
    require(name.nonEmpty && exprSql.nonEmpty, "bad generated column")
    setProperty(table, s"$PropGeneratedPrefix$name", exprSql)
  }

  /** Declared generated columns: name → expression SQL. */
  def generatedColumns(table: String): Map[String, String] =
    properties(table).collect {
      case (k, v) if k.startsWith(PropGeneratedPrefix) && v.nonEmpty =>
        k.stripPrefix(PropGeneratedPrefix) -> v
    }

  /** DESCRIBE HISTORY: one row per live version — (version, ts, op,
    * n_rows) — from manifests alone (n_rows via [[rowCount]]; no data
    * I/O, the Delta history surface). */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    versions(table)
      .map { v =>
        val m = manifest(table, v)
        (m.version, m.ts, m.op, rowCount(table, v))
      }
      .toDF("version", "ts", "op", "n_rows")
  }

  // ---- vacuum ----------------------------------------------------------

  /** Delete manifests older than the last `retainLast` versions and
    * every data dir no retained manifest references — including crash
    * orphans (dirs written by a failed commit), guarded by
    * `orphanGraceMs` so an in-flight writer's dir is not swept before
    * its commit lands. Returns the number of data dirs removed. */
  def vacuum(table: String, retainLast: Int,
      orphanGraceMs: Long = 24L * 3600 * 1000): Int = {
    require(retainLast >= 1, "must retain at least the current version")
    val vs = versions(table)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - retainLast))
    val keepSet = keep.toSet
    drop.foreach(v => manifestFile(table, v).delete())
    // Recompute the live dir set from the CURRENT log AFTER dropping
    // manifests: a restore (or any commit) that landed while manifests
    // were being dropped may have re-referenced dirs reachable only
    // through the dropped versions — sweeping those would orphan the
    // new head. Re-listing here pairs with restore's build-time
    // manifest check (restore aborts if its target manifest vanished):
    // either the restore saw the manifest and committed before this
    // listing (its head protects the dirs), or it aborts.
    val lastSeen = vs.lastOption.getOrElse(0L)
    val keepDirs = versions(table)
      .filter(v => keepSet.contains(v) || v > lastSeen)
      .flatMap { v =>
        // a CONCURRENT vacuum can delete a listed manifest before we
        // read it: that version is the peer's responsibility (it will
        // sweep or keep its dirs from ITS re-listing) — skip, don't
        // crash this sweep half-done. NonFatal, not just the require's
        // IllegalArgumentException: the delete can also land BETWEEN
        // manifest()'s exists() check and its readValue, which
        // surfaces as FileNotFoundException/IOException instead
        try {
          val m = manifest(table, v)
          m.dataDirs ++ Option(m.dvDirs).getOrElse(Nil)
        } catch { case NonFatal(_) => Nil }
      }.toSet
    val dataDir = new File(dataRoot(table))
    val candidates = Option(dataDir.listFiles()).getOrElse(Array.empty)
    val now = System.currentTimeMillis()
    val doomed = candidates.filter { d =>
      // a z-ordered commit's rels are NESTED (data/<uuid>/__zb=k): the
      // <uuid> root is live if any retained rel sits under it
      val name = s"data/${d.getName}"
      !keepDirs.exists(k => k == name || k.startsWith(s"$name/")) &&
        (now - d.lastModified()) >= orphanGraceMs
    }
    doomed.foreach(FsOps.deleteRecursively)
    doomed.length
  }

  /** Commit history, newest first — the DESCRIBE HISTORY analog. */
  def history(table: String): Seq[Manifest] =
    versions(table).reverse.map(manifest(table, _))

  // ---- external readers --------------------------------------------------

  /** Export version `version` as a PLAIN-FILE manifest any parquet
    * reader can consume — Delta's symlink-manifest pattern
    * (`GENERATE symlink_format_manifest`), the piece that lets a
    * second engine read the snapshot the way the reference shares its
    * Delta tables with Trino through the metastore
    * (trino/etc/catalog/delta.properties:1-8,
    * postgresscripts/init-metastore.sql). Writes
    * `<table>/_graft_manifests/<version>/manifest.txt` with one
    * absolute parquet-file path per line (sorted — the export is
    * byte-deterministic for a given snapshot) and returns the list.
    * A reader needs NO VersionedTableIO code: feed the lines to
    * `spark.read.parquet(files)`, Trino's hive connector, or DuckDB's
    * `read_parquet(list)`; parquet footer pushdown/row-group skipping
    * still apply because these are ordinary parquet files. The export
    * is a snapshot view: it pins version N's files, which stay
    * immutable until VACUUM drops that version (same staleness
    * contract as Delta's generated manifests). */
  def exportManifest(table: String, version: Long): Seq[String] = {
    val m = manifest(table, version)
    require(Option(m.dvDirs).forall(_.isEmpty),
      s"version $version of '$table' has live deletion vectors — a " +
        "plain-parquet reader would resurrect deleted rows; run a " +
        "rewrite (compact) to materialize them first")
    val files = m.dataDirs.flatMap { d =>
      val dir = new File(s"${tableDir(table)}/$d")
      Option(dir.listFiles((_, n) => n.endsWith(".parquet")))
        .getOrElse(Array.empty[File]).map(_.getAbsolutePath).sorted
    }
    val outDir = new File(s"${tableDir(table)}/_graft_manifests/$version")
    outDir.mkdirs()
    // same put-if-absent discipline as commits — THROUGH the table's
    // backend, so an object-store deployment exports with the same
    // conditional-put primitive it commits with: a concurrent reader
    // never observes a partial export, concurrent exporters race to
    // one winner with identical (deterministic) content
    val target = new File(outDir, "manifest.txt")
    if (!target.exists()) {
      backend.putIfAbsent(target,
        files.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    files
  }

  /** Read an exported manifest back as the file list — the helper a
    * plain-parquet consumer uses; deliberately does NOT touch the
    * commit log (readable even if the log moved on). */
  def readManifestExport(table: String, version: Long): Seq[String] = {
    val f = new File(s"${tableDir(table)}/_graft_manifests/$version/manifest.txt")
    require(f.exists(), s"no exported manifest for '$table' v$version")
    val s = new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    s.split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Change Data Feed analog: row-level changes between two committed
    * versions, derived as a keyed snapshot diff —
    * `_change_type` ∈ insert | delete | update_preimage |
    * update_postimage (Delta CDF's vocabulary). Derived-not-stored:
    * nothing extra is written at commit time; any pair of retained
    * versions can be diffed after the fact. Cost: one full-outer join
    * of the two snapshots hashed on `keys` — both sides shuffle once
    * on the key, which is the floor for a keyed diff without stored
    * change files.
    *
    * PRECONDITION: `keys` must be unique within each snapshot (the
    * MERGE/upsert write path maintains this; plain `append` can break
    * it) — duplicate keys would cross-multiply in the join and
    * misreport changes, the same contract Delta MERGE has. */
  def readChanges(spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long, keys: Seq[String]): DataFrame = {
    require(fromVersion < toVersion,
      s"fromVersion $fromVersion must precede toVersion $toVersion")
    val beforeRaw = readVersion(spark, table, fromVersion)
    val afterRaw = readVersion(spark, table, toVersion)
    // Schema evolution across the diffed range: align both snapshots to
    // the UNION of their columns (Delta CDF's "read at the latest
    // schema" contract) — a column added between the versions surfaces
    // as null on the before side, so widened rows whose old columns are
    // unchanged do NOT read as updates (null <=> null holds in the
    // struct compare below). Column order: after's (the evolved
    // schema), then any before-only columns.
    val unionCols: Seq[(String, org.apache.spark.sql.types.DataType)] = {
      val beforeTypes = beforeRaw.schema.map(f => f.name -> f.dataType)
      afterRaw.schema.map(f => f.name -> f.dataType) ++
        beforeTypes.filterNot(c => afterRaw.columns.contains(c._1))
    }
    require(keys.forall(k => unionCols.exists(_._1 == k)),
      s"diff keys ${keys.mkString(",")} missing from both snapshots")
    def align(df: DataFrame): DataFrame =
      df.select(unionCols.map { case (c, t) =>
        if (df.columns.contains(c)) col(c) else lit(null).cast(t).as(c)
      }: _*)
    val before = align(beforeRaw)
    val after = align(afterRaw)
    val valueCols = before.columns.filterNot(keys.contains)
    def packed(df: DataFrame, tag: String): DataFrame =
      df.select(keys.map(col) :+
        struct(valueCols.map(col): _*).as(s"__row_$tag"): _*)
    val joined = packed(before, "b").join(packed(after, "a"), keys, "full_outer")
    val b = col("__row_b")
    val a = col("__row_a")
    val unpackA = valueCols.map(c => a.getField(c).as(c))
    val unpackB = valueCols.map(c => b.getField(c).as(c))
    val inserts = joined.filter(b.isNull)
      .select(keys.map(col) ++ unpackA :+ lit("insert").as("_change_type"): _*)
    val deletes = joined.filter(a.isNull)
      .select(keys.map(col) ++ unpackB :+ lit("delete").as("_change_type"): _*)
    val updated = joined.filter(b.isNotNull && a.isNotNull && !(a <=> b))
    val pre = updated.select(keys.map(col) ++ unpackB :+
      lit("update_preimage").as("_change_type"): _*)
    val post = updated.select(keys.map(col) ++ unpackA :+
      lit("update_postimage").as("_change_type"): _*)
    inserts.unionByName(deletes).unionByName(pre).unionByName(post)
  }
}

object VersionedTableIO {
  val PropAppendOnly = "appendOnly"
  /** Property-key prefix for CHECK constraints (Delta's
    * `delta.constraints.` analog). */
  val PropConstraintPrefix = "constraint."
  /** Property-key prefix for GENERATED ALWAYS AS columns. */
  val PropGeneratedPrefix = "generated."
  /** Reserved stats key: per-dir row count (stored as [n, n]). */
  val CountStat = "__count"
  /** Deletion-vector column names: table-relative file path + row
    * index within that file. */
  val DvPath = "__dv_path"
  val DvPos = "__dv_pos"
  /** Conf key: max deletion-vector positions to BROADCAST on read;
    * larger (or unknown-size) vectors anti-join via shuffled hash
    * join instead (see [[VersionedTableIO.dvSubtract]]). */
  val DvBroadcastMaxRowsKey = "spark.graft.dv.broadcastMaxRows"
  val DvBroadcastMaxRowsDefault: Long = 1L << 20
  /** Guards the session-conf mutation in stats collection. */
  private[ingest] val statsLock = new Object
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }
}
