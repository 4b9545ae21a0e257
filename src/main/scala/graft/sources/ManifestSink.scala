package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util
import java.util.UUID

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.util.SerializableConfiguration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 WRITE path: a manifest-committing transactional sink
  * (`format("graft-manifest").option("path", dir)`), the Iceberg-lite
  * commit protocol in its simplest honest form.
  *
  * Tasks write their rows to uniquely-named files under `<path>/data/` and
  * report them via `WriterCommitMessage`; ONLY the driver's commit makes
  * data visible, by writing a manifest (write-temp-then-rename, atomic on
  * any correct FS) listing exactly the committed files. Failed or
  * speculative task attempts leave orphan data files that no manifest
  * references — readers (same format, BATCH_READ over the manifest union)
  * never see them. This is what "exactly-once table contents" means
  * WITHOUT a transaction log engine: visibility = manifest membership,
  * and manifest creation is a single atomic rename.
  *
  * The streaming flavor names each epoch's manifest `epoch-<id>` and
  * OVERWRITES it on redelivery: replaying a micro-batch rewrites the same
  * manifest with the rerun's files, so at-least-once delivery converges
  * to exactly-once contents (same contract as Streaming.partitionedSink,
  * restated at the connector layer). Epoch names are the idempotence key,
  * which makes the path SINGLE-STREAMING-WRITER: like Spark's own file
  * sink (whose metadata log assumes one query per directory), two
  * concurrent streaming queries landing in the same path would collide on
  * epoch names — give each query its own table path.
  *
  * Like Spark's own text/kafka sinks, the writer accepts exactly one
  * STRING column `value`; serialize upstream (`to_json`, `concat_ws`).
  */
class ManifestSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-manifest"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Manifest.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null && path.nonEmpty,
      "graft-manifest requires option(\"path\", dir)")
    new ManifestTable(path)
  }
}

private[graft] object Manifest {
  val schema: StructType =
    StructType(Seq(StructField("value", StringType, nullable = false)))

  def fs(path: String): FileSystem = new Path(path).getFileSystem(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  /** Atomically publish `lines` as `<dir>/manifests/<name>`: write a temp
    * file, then a single OVERWRITE rename (FileContext, atomic where the
    * FS is) — replacing an existing manifest of the same name is the
    * streaming-epoch idempotence, and there is never a moment where the
    * name exists without content (a delete-then-rename would open exactly
    * that visibility hole for concurrent readers).
    */
  /** Orphaned temp manifests older than this are reaped on publish: a
    * process that died between create and rename leaves its `.tmp` behind
    * (readers already ignore the suffix, so correctness never depended on
    * cleanup), and one hour is far beyond any publish's create→rename gap,
    * so a live writer's in-flight temp is never deleted.
    */
  private val tmpReapAgeMs: Long = 60L * 60 * 1000

  /** Serializes same-JVM create-exclusive publishes (see
    * [[publishTo]]'s rename note).
    */
  private val exclusiveRenameLock = new Object

  def publish(dir: String, name: String, lines: Seq[String]): Unit =
    publishTo(dir, "manifests", name, lines)

  /** [[publish]] allowing an existing manifest of the same name to be
    * replaced — ONLY for the streaming-epoch idempotence (the epoch name
    * is the redelivery key, so a replayed micro-batch must overwrite its
    * own manifest). Every other publish is create-exclusive: published
    * versions are immutable, and a name collision surfaces as an error
    * instead of silently replacing a snapshot (round-12, ADVICE — the
    * check-then-act `require` in eraseKeys could not stop a concurrent
    * publish from overwriting).
    */
  def publishReplacing(dir: String, name: String, lines: Seq[String]): Unit =
    publishTo(dir, "manifests", name, lines, overwrite = true)

  /** [[publish]] into an arbitrary sidecar subdir — same atomic
    * temp-then-rename protocol, different namespace. Readers of the
    * table proper never list sidecars (manifest membership is decided
    * by `<dir>/manifests` alone), so sidecar metadata (e.g. the
    * per-file key stats [[graft.ops.Privacy.publishKeyStats]] keeps)
    * can grow without touching visibility semantics.
    */
  def publishTo(dir: String, subdir: String, name: String,
                lines: Seq[String], overwrite: Boolean = false): Unit = {
    val f = fs(dir)
    val mdir = new Path(dir, subdir)
    f.mkdirs(mdir)
    // best-effort reap of stale orphans; failure never blocks the publish
    try {
      val horizon = System.currentTimeMillis() - tmpReapAgeMs
      f.listStatus(mdir).iterator
        .filter(s => s.isFile && s.getPath.getName.endsWith(".tmp") &&
          s.getModificationTime < horizon)
        .foreach(s => f.delete(s.getPath, false))
    } catch { case scala.util.control.NonFatal(_) => }
    val tmp = new Path(mdir, s".$name.${UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n").getBytes(UTF_8))
    finally out.close()
    val target = new Path(mdir, name)
    val fc = FileContext.getFileContext(target.toUri,
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    // default is create-exclusive: the RENAME enforces immutability (not
    // a check-then-act require), so a racing publish of the same name
    // fails loudly instead of replacing a published snapshot. The
    // exclusive path additionally serializes IN-PROCESS under a JVM-wide
    // lock (round-13): FileContext's Rename.NONE is check-then-rename on
    // a raw local FS, so two same-JVM racers could otherwise both pass
    // the check and the loser's rename would overwrite the winner —
    // exactly the window the versioned-HEAD CAS must not have.
    // Cross-process exclusivity remains the filesystem's rename
    // contract (atomic on HDFS; object stores need their own CAS).
    def renameExclusive(): Unit = exclusiveRenameLock.synchronized {
      if (f.exists(target))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          target.toString)
      fc.rename(f.makeQualified(tmp), f.makeQualified(target),
        Options.Rename.NONE)
    }
    try {
      if (overwrite)
        fc.rename(f.makeQualified(tmp), f.makeQualified(target),
          Options.Rename.OVERWRITE)
      else renameExclusive()
    } catch {
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        f.delete(tmp, false)
        throw new IllegalArgumentException(
          s"$subdir '$name' already exists in $dir — published names are " +
            "immutable; pick a fresh name", e)
      case e: java.io.IOException if !overwrite && f.exists(target) =>
        f.delete(tmp, false)
        throw new IllegalArgumentException(
          s"$subdir '$name' already exists in $dir — published names are " +
            "immutable; pick a fresh name", e)
    }
  }

  // ————————————————————————————————————————————— catalog HEAD pointer

  /** The table's CURRENT version: the manifest name-set the newest
    * pointer references, or None when no pointer has been published.
    * Resolution order: the VERSIONED pointer log `<dir>/heads/v%020d`
    * (round-13 — each commit publishes the NEXT version create-exclusive,
    * highest version wins), falling back to the legacy single mutable
    * `<dir>/HEAD` file for tables written before the versioned log
    * existed. Readers that do not pin a snapshot resolve this, and
    * [[graft.ops.Privacy.eraseKeys]] / expireSnapshots default to it
    * (round-12 — closes the whole-history-read footgun: after an erasure,
    * an unpinned caller could otherwise resurrect superseded files).
    */
  def headOf(dir: String): Option[Set[String]] = headState(dir)._2

  /** How many superseded pointer versions to keep before best-effort
    * reaping — large enough that a reader's list→read window never spans
    * the retention horizon in practice, and the reader retries on a
    * reaped-underneath read anyway.
    */
  private val headKeepVersions = 64

  /** (version, names) of the newest published pointer. Version 0 = no
    * versioned pointer yet (names then come from the legacy HEAD file,
    * or None for a pointerless table) — the expected-version token a
    * committer passes back to [[tryCasHead]].
    */
  def headState(dir: String): (Long, Option[Set[String]]) = {
    val f = fs(dir)
    val hd = new Path(dir, "heads")
    var attempt = 0
    while (true) {
      val vs =
        if (!f.exists(hd)) Nil
        else f.listStatus(hd).filter(_.isFile).map(_.getPath.getName)
          .filterNot(_.endsWith(".tmp"))
          .collect { case n if n.startsWith("v") => n.drop(1).toLong }
          .toSeq
      if (vs.isEmpty) return (0L, legacyHead(dir))
      val v = vs.max
      try {
        val in = f.open(new Path(hd, f"v$v%020d"))
        val names =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .map(_.trim).filter(_.nonEmpty).toSet
          finally in.close()
        return (v, Some(names))
      } catch {
        // the version we listed was reaped before we read it — the
        // pointer has advanced far past it; re-list (bounded: reaping
        // keeps headKeepVersions live, so one commit per retry would be
        // needed to starve this, and even then newer versions exist)
        case _: java.io.FileNotFoundException if attempt < 50 =>
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def legacyHead(dir: String): Option[Set[String]] = {
    val f = fs(dir)
    val h = new Path(dir, "HEAD")
    if (!f.exists(h)) None
    else {
      val in = f.open(h)
      val names =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(_.trim).filter(_.nonEmpty).toSet
        finally in.close()
      Some(names)
    }
  }

  /** COMPARE-AND-SWAP the pointer: publish `names` as version
    * `expect + 1`, create-exclusive — true on success, false when some
    * other committer already published that version (the caller lost
    * the race: re-read [[headState]], rebase, re-attempt). This is what
    * makes concurrent commits SAFE rather than last-writer-wins: the
    * loser finds out (round-13 — previously two concurrent landings
    * both overwrote the mutable HEAD and one generation silently
    * vanished from the current version).
    */
  def tryCasHead(dir: String, expect: Long, names: Set[String]): Boolean = {
    require(names.nonEmpty, "HEAD must reference at least one manifest")
    try {
      publishTo(dir, "heads", f"v${expect + 1}%020d", names.toSeq.sorted)
      // best-effort reap of long-superseded versions (keep the newest
      // headKeepVersions); failure never blocks the commit, and readers
      // retry a reaped-underneath read
      try {
        val f = fs(dir)
        val hd = new Path(dir, "heads")
        f.listStatus(hd).filter(_.isFile)
          .filter { s =>
            val n = s.getPath.getName
            n.startsWith("v") && !n.endsWith(".tmp") &&
              scala.util.Try(n.drop(1).toLong).toOption
                .exists(_ <= expect + 1 - headKeepVersions)
          }
          .foreach(s => f.delete(s.getPath, false))
      } catch { case scala.util.control.NonFatal(_) => }
      true
    } catch { case _: IllegalArgumentException => false }
  }

  /** Unconditionally move the pointer to `names` — a CAS loop from
    * whatever the current version is. Use only where the new value does
    * NOT depend on the old one (e.g. a restore); read-modify-write
    * committers must drive [[tryCasHead]] themselves so a lost race
    * triggers a REBASE of the value, not just a retry of the swap.
    */
  def writeHead(dir: String, names: Set[String]): Unit = {
    var done = false
    while (!done) done = tryCasHead(dir, headState(dir)._1, names)
  }

  /** Union `name` into HEAD — the append-commit pointer update, rebased
    * on conflict (the union is recomputed from the fresh pointer, so
    * concurrent appenders all end up referenced).
    */
  def advanceHead(dir: String, name: String): Unit = {
    var done = false
    while (!done) {
      val (v, cur) = headState(dir)
      done = tryCasHead(dir, v, cur.getOrElse(Set.empty) + name)
    }
  }

  /** All data files referenced by any manifest (sorted for determinism). */
  def committedFiles(dir: String): Seq[String] = committedFiles(dir, None)

  /** [[committedFiles]] restricted to a SNAPSHOT — an explicit set of
    * manifest names defining the visible table version (time travel:
    * because manifests are immutable-once-published and data files are
    * append-only, any past set of manifest names IS a consistent
    * snapshot, readable forever). Unknown names THROW: a typo'd snapshot
    * silently reading as empty would be a correctness trap.
    */
  def committedFiles(dir: String, snapshot: Option[Set[String]]): Seq[String] = {
    val f = fs(dir)
    val mdir = new Path(dir, "manifests")
    if (!f.exists(mdir)) {
      snapshot.filter(_.nonEmpty).foreach(s => throw new IllegalArgumentException(
        s"graft-manifest snapshot names ${s.mkString(",")} not found: " +
          s"$mdir does not exist"))
      return Nil
    }
    val all = f.listStatus(mdir).filter(_.isFile).map(_.getPath)
      .filterNot(_.getName.endsWith(".tmp"))
    snapshot.foreach { s =>
      val present = all.map(_.getName).toSet
      val missing = s -- present
      require(missing.isEmpty,
        s"graft-manifest snapshot names not found: ${missing.mkString(",")}")
    }
    all
      .filter(m => snapshot.forall(_.contains(m.getName)))
      .flatMap { m =>
        val in = f.open(m)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
      .filter(_.nonEmpty).sorted.toSeq
  }

  /** All lines across a sidecar subdir's non-temp files (e.g. the
    * accumulated per-file key stats) — empty when the sidecar does not
    * exist yet.
    */
  def sidecarLines(dir: String, subdir: String): Seq[String] = {
    val f = fs(dir)
    val sdir = new Path(dir, subdir)
    if (!f.exists(sdir)) return Nil
    f.listStatus(sdir).filter(_.isFile).map(_.getPath)
      .filterNot(_.getName.endsWith(".tmp"))
      .flatMap { m =>
        val in = f.open(m)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
      .filter(_.nonEmpty).toSeq
  }

  /** Rewrite a sidecar to only the lines `keep` accepts: publish ONE
    * consolidated file, then delete the superseded sidecar files. Used by
    * snapshot expiry to purge per-file stats entries of deleted data
    * files (round-12, ADVICE: a deleted file's recorded min/max can BE an
    * erased key — leaving it in `stats/` would contradict the
    * bytes-are-gone contract). Publish-then-delete: a crash in between
    * leaves duplicate lines, which the map-building readers dedupe.
    * Returns the number of lines dropped.
    */
  def rewriteSidecar(dir: String, subdir: String,
                     keep: String => Boolean): Int = {
    val f = fs(dir)
    val sdir = new Path(dir, subdir)
    if (!f.exists(sdir)) return 0
    val old = f.listStatus(sdir).filter(_.isFile).map(_.getPath)
      .filterNot(_.getName.endsWith(".tmp")).toSeq
    val lines = sidecarLines(dir, subdir)
    val kept = lines.filter(keep)
    if (kept.size == lines.size) return 0
    if (kept.nonEmpty)
      publishTo(dir, subdir, s"$subdir-${UUID.randomUUID()}", kept)
    old.foreach(p => f.delete(p, false))
    lines.size - kept.size
  }

  /** Published manifest names ordered by (modification time, name) — the
    * version log a caller captures to pin a snapshot.
    *
    * Ordering caveat (round-7, ADVICE): this APPROXIMATES commit order.
    * On filesystems with coarse (e.g. 1 s) mtime granularity, two
    * manifests published inside one tick tie on time and fall back to
    * lexicographic name order — effectively arbitrary between them.
    * Snapshot pinning is SET-based ([[Manifest.readLines]] filters by
    * name membership), so correctness never depends on this order; a
    * deployment that needs a strict total commit order should embed a
    * monotone sequence number in the manifest NAME at publish time and
    * sort on that instead.
    */
  def manifestNames(dir: String): Seq[String] = {
    val f = fs(dir)
    val mdir = new Path(dir, "manifests")
    if (!f.exists(mdir)) return Nil
    f.listStatus(mdir).filter(_.isFile)
      .filterNot(_.getPath.getName.endsWith(".tmp"))
      .sortBy(s => (s.getModificationTime, s.getPath.getName))
      .map(_.getPath.getName).toSeq
  }
}

private[sources] class ManifestTable(path: String)
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = s"graft-manifest($path)"
  override def schema(): StructType = Manifest.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.BATCH_READ)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("value", StringType)),
      s"graft-manifest writes a single STRING column `value`; " +
        s"got ${info.schema().catalogString} — serialize upstream (to_json)")
    new WriteBuilder {
      override def build(): Write = new ManifestWrite(path)
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // time travel: option("snapshot", "name1,name2,...") pins the visible
    // manifest set to a captured version (Manifest.manifestNames)
    val snapshot = Option(options.get("snapshot"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    new ScanBuilder {
      override def build(): Scan = new ManifestScan(path, snapshot)
    }
  }
}

private[sources] class ManifestWrite(path: String)
    extends Write with BatchWrite with StreamingWrite {
  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = this
  // both parent traits default this; the diamond needs one explicit pick.
  // true = task commits coordinate with the driver, so at most ONE attempt
  // of a task can deliver its message — the protocol this sink relies on
  override def useCommitCoordinator(): Boolean = true

  // executors must resolve `path` against the JOB's Hadoop configuration
  // (fs.defaultFS, credentials from spark.hadoop.*) — a fresh
  // Configuration() on the executor would point scheme-less paths at the
  // executor's local disk and strand the data
  private def conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(path, conf)
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new ManifestWriterFactory(path, conf)

  private def fileNames(messages: Array[WriterCommitMessage]): Seq[String] =
    messages.toSeq.collect {
      case FilesWritten(names) if names.nonEmpty => names
    }.flatten

  // batch: each job publishes one uniquely-named manifest (append),
  // then unions it into HEAD — the current-version pointer readers and
  // the governance ops resolve by default
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val name = s"batch-${UUID.randomUUID()}"
    Manifest.publish(path, name, fileNames(messages))
    Manifest.advanceHead(path, name)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanup(messages)

  // streaming: the manifest name IS the epoch, so redelivery overwrites
  // (the ONE publish path allowed to replace a name); the HEAD union is
  // idempotent on replay
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    Manifest.publishReplacing(path, s"epoch-$epochId", fileNames(messages))
    Manifest.advanceHead(path, s"epoch-$epochId")
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    cleanup(messages)

  // best-effort: orphans are invisible either way (manifest-only reads)
  private def cleanup(messages: Array[WriterCommitMessage]): Unit = {
    val f = Manifest.fs(path)
    fileNames(messages).foreach(n => f.delete(new Path(n), false))
  }
}

private[sources] case class FilesWritten(names: Seq[String])
    extends WriterCommitMessage

private[sources] class ManifestWriterFactory(path: String,
                                             conf: SerializableConfiguration)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(path, conf)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(path, conf)
}

/** Writes this task attempt's rows to one uniquely-named file. The UUID
  * name makes attempts collision-free: a retried/speculative attempt
  * writes a DIFFERENT file, and only the attempt whose message reaches
  * the driver's commit lands in the manifest.
  */
private[sources] class ManifestDataWriter(dir: String,
                                          conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {
  private val file = new Path(new Path(dir, "data"),
    s"part-${UUID.randomUUID()}.txt")
  private lazy val out = {
    val f = file.getFileSystem(conf.value)
    f.mkdirs(file.getParent)
    f.create(file, false)
  }
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val s = row.getUTF8String(0).toString
    // the line IS the record frame: an embedded newline would silently
    // split one row into several on read — refuse, don't corrupt
    if (s.indexOf('\n') >= 0) throw new IllegalArgumentException(
      "graft-manifest values must not contain newlines; escape upstream " +
        "(e.g. to_json)")
    out.write(s.getBytes(UTF_8))
    out.write('\n')
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    if (rows > 0) { out.close(); FilesWritten(Seq(file.toString)) }
    else FilesWritten(Nil) // nothing written: no file to publish
  }
  override def abort(): Unit = {
    if (rows > 0) {
      out.close()
      file.getFileSystem(conf.value).delete(file, false)
    }
  }
  override def close(): Unit = ()
}

private[sources] class ManifestScan(path: String,
                                    snapshot: Option[Set[String]] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = Manifest.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-manifest read $path${snapshot.fold("")(s => s" @${s.size} manifests")}"
  // an unpinned read resolves HEAD (the current version) when the table
  // has a pointer; legacy tables without one read the whole-history
  // union, which for an append-only history IS the current table
  override def planInputPartitions(): Array[InputPartition] =
    Manifest.committedFiles(path, snapshot.orElse(Manifest.headOf(path)))
      .map(f => ManifestFilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new ManifestFileReader(p.asInstanceOf[ManifestFilePartition].file, conf)
    }
  }
}

private[sources] case class ManifestFilePartition(file: String)
    extends InputPartition

private[sources] class ManifestFileReader(file: String,
                                          conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(file)
    p.getFileSystem(conf.value).open(p)
  }
  private val lines =
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  private var current: String = _

  override def next(): Boolean = {
    if (lines.hasNext) { current = lines.next(); true } else false
  }
  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(current))
  override def close(): Unit = in.close()
}
