package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The COLUMNAR manifest-lake lane (round-12): Parquet data files under
  * the same manifest visibility protocol as [[ManifestSink]], plus the
  * two read-side devices a 100 TB table actually needs — per-COLUMN
  * min/max/null-count file statistics recorded at commit, and
  * predicate-driven FILE SKIPPING at planning time (the Iceberg read
  * contract restated in graft's idiom; the text lane's `stats/` sidecar
  * knew one extracted key, this knows every column).
  *
  * Table layout under one directory:
  *  - `data/`        uniquely-named Parquet files (append-only);
  *  - `manifests/`   FULL snapshots: each generation lists every live
  *                   file (create-exclusive — immutable once published);
  *  - `schemas/<id>` field definitions `(field-id, name, type)` — field
  *                   IDS are the identity, names are per-generation
  *                   labels, which is what makes rename safe over files
  *                   written under the old name;
  *  - `meta/<gen>`   the generation → schema-id binding (time travel
  *                   reads a snapshot WITH ITS OWN schema);
  *  - `colstats/`    per-file, per-column `(min, max, nulls)` + row
  *                   count + the file's write-time schema-id, published
  *                   BEFORE the manifest that makes the file visible;
  *  - `HEAD`         the current-generation pointer (atomic swap).
  *
  * Scale shape: planning is a driver-side walk of the colstats sidecar
  * (file grain — the grain Iceberg planners hold in memory); a selective
  * predicate on a key-clustered table reads the matching files only, and
  * within each file Parquet's own row-group stats prune again (two-level
  * pruning). Pruning is INCLUSIVE ("file may contain a match"): an
  * untranslatable predicate node degrades to reading the file, never to
  * dropping it.
  */
object Lake {

  case class Field(id: Int, name: String, dataType: DataType)
  case class Schema(schemaId: Int, fields: Seq[Field]) {
    def byId: Map[Int, Field] = fields.map(f => f.id -> f).toMap
    def byName: Map[String, Field] = fields.map(f => f.name -> f).toMap
    def struct: StructType =
      StructType(fields.map(f => StructField(f.name, f.dataType)))
  }

  /** One column's file statistics: canonical-string min/max (None when
    * the column is all-NULL in the file) and the null count. Timestamps
    * canonicalize to epoch micros, dates to epoch days — monotone
    * integer encodings the driver can compare without a parser.
    */
  case class ColStat(lo: Option[String], hi: Option[String], nulls: Long)
  case class FileStat(file: String, schemaId: Int, rows: Long,
                      cols: Map[Int, ColStat])

  case class LandReport(gen: String, newFiles: Seq[String], rows: Long)
  case class EraseReport(gen: String, nFiles: Int, nCandidates: Int,
                         nUntouched: Int, newFiles: Seq[String])

  private def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")
  private def baseName(p: String): String =
    p.substring(p.lastIndexOf('/') + 1)

  // —————————————————————————————————————————————————— schema registry

  private def schemaIds(table: String): Seq[Int] = {
    val f = Manifest.fs(table)
    val d = new Path(table, "schemas")
    if (!f.exists(d)) Nil
    else f.listStatus(d).filter(_.isFile).map(_.getPath.getName)
      .filterNot(_.endsWith(".tmp")).map(_.toInt).toSeq.sorted
  }

  def schema(table: String, schemaId: Int): Schema = {
    val f = Manifest.fs(table)
    val p = new Path(new Path(table, "schemas"), schemaId.toString)
    require(f.exists(p), s"lake schema $schemaId not found in $table")
    val in = f.open(p)
    val ls =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    Schema(schemaId, ls.map { ln =>
      val a = ln.split("\t", -1)
      require(a.length == 3, s"malformed schema line: $ln")
      Field(a(0).toInt, dec(a(1)), DataType.fromJson(dec(a(2))))
    })
  }

  private def publishSchema(table: String, s: Schema): Unit =
    Manifest.publishTo(table, "schemas", s.schemaId.toString,
      s.fields.map(f => s"${f.id}\t${enc(f.name)}\t${enc(f.dataType.json)}"))

  /** The generation → schema binding (`meta/<gen>`, immutable — except
    * for streaming-epoch generations, whose name is the redelivery key
    * and whose binding is re-published verbatim on replay).
    */
  private def publishGenMeta(table: String, gen: String,
                             schemaId: Int,
                             overwrite: Boolean = false): Unit =
    Manifest.publishTo(table, "meta", gen, Seq(s"schemaId\t$schemaId"),
      overwrite = overwrite)

  def genSchemaId(table: String, gen: String): Int = {
    val f = Manifest.fs(table)
    val p = new Path(new Path(table, "meta"), gen)
    require(f.exists(p), s"lake generation '$gen' has no meta in $table")
    val in = f.open(p)
    val ls =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    ls.collectFirst { case l if l.startsWith("schemaId\t") =>
      l.split("\t")(1).toInt
    }.getOrElse(throw new IllegalStateException(
      s"meta/$gen carries no schemaId"))
  }

  /** The table's current generation: the single name HEAD points at. */
  def currentGen(table: String): String = {
    val h = Manifest.headOf(table).getOrElse(throw new IllegalStateException(
      s"$table has no HEAD pointer — not a lake table, or never landed"))
    require(h.size == 1,
      s"lake HEAD must be a single generation, got ${h.mkString(",")}")
    h.head
  }

  def currentSchema(table: String): Schema =
    schema(table, genSchemaId(table, currentGen(table)))

  // ———————————————————————————————————————————————————— column stats

  /** Monotone canonical projection for stats: min/max compute in the
    * NATIVE type (never lexicographically on strings-of-numbers), then
    * surface as a canonical string the driver can order with BigDecimal
    * (numerics, timestamps-as-micros, dates-as-days, booleans-as-0/1)
    * or binary UTF-8 bytes (strings).
    */
  private def canonCol(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c)
    // NTZ stays NTZ: min/max in the native type, surfaced as the
    // wall-clock string — a cast("timestamp") here would shift by the
    // SESSION zone while the literal side compares wall-clock micros,
    // silently pruning matching files under any non-UTC zone
    // (round-13, ADVICE)
    case TimestampNTZType => c
    case DateType => datediff(c, to_date(lit("1970-01-01")))
    case BooleanType => when(c, 1).otherwise(0)
    case _ => c
  }

  private def statLine(fs: FileStat): String = {
    val cols = fs.cols.toSeq.sortBy(_._1).map { case (id, cs) =>
      val lo = cs.lo.map(enc).getOrElse("~")
      val hi = cs.hi.map(enc).getOrElse("~")
      s"$id:$lo:$hi:${cs.nulls}"
    }.mkString(";")
    s"${enc(fs.file)}\t${fs.schemaId}\t${fs.rows}\t$cols"
  }

  private def parseStatLine(ln: String): FileStat = {
    val a = ln.split("\t", -1)
    require(a.length == 4, s"malformed colstats line: $ln")
    val cols = a(3).split(";").filter(_.nonEmpty).map { c =>
      val p = c.split(":", -1)
      require(p.length == 4, s"malformed colstats cell: $c")
      p(0).toInt -> ColStat(
        if (p(1) == "~") None else Some(dec(p(1))),
        if (p(2) == "~") None else Some(dec(p(2))),
        p(3).toLong)
    }.toMap
    FileStat(dec(a(0)), a(1).toInt, a(2).toLong, cols)
  }

  /** All recorded per-file column stats (file basename → stat). Lines
    * may be duplicated transiently during a sidecar rewrite; the map
    * build dedupes (identical content).
    */
  def fileStats(table: String): Map[String, FileStat] =
    Manifest.sidecarLines(table, "colstats").map(parseStatLine)
      .map(fs => fs.file -> fs).toMap

  /** Compute and publish stats for `files` (all written under schema
    * `sch`): ONE column-pruned pass over just those files — min/max in
    * native type, null count, row count. Published BEFORE the manifest
    * that makes the files visible, so every visible file has stats.
    */
  private def publishStats(spark: SparkSession, table: String,
                           files: Seq[String], sch: Schema): Unit = {
    if (files.isEmpty) return
    val aggs = sch.fields.flatMap { f =>
      val c = canonCol(col(f.name), f.dataType)
      Seq(min(c).cast("string").as(s"lo_${f.id}"),
        max(c).cast("string").as(s"hi_${f.id}"),
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"nu_${f.id}"))
    } :+ count(lit(1)).as("rows")
    val rows = spark.read.schema(sch.struct).parquet(files: _*)
      .groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val byFile = rows.map { r =>
      val cols = sch.fields.map { f =>
        f.id -> ColStat(
          Option(r.getAs[String](s"lo_${f.id}")),
          Option(r.getAs[String](s"hi_${f.id}")),
          r.getAs[Long](s"nu_${f.id}"))
      }.toMap
      FileStat(baseName(r.getAs[String]("__f")), sch.schemaId,
        r.getAs[Long]("rows"), cols)
    }
    // a zero-row parquet file yields no group; record it so planning
    // can prune it outright
    val empty = files.map(baseName).toSet -- byFile.map(_.file).toSet
    val all = byFile ++ empty.map(f =>
      FileStat(f, sch.schemaId, 0L, Map.empty))
    Manifest.publishTo(table, "colstats", s"cs-${UUID.randomUUID()}",
      all.sortBy(_.file).map(statLine))
  }

  // ————————————————————————————————————————————————————————— landing

  /** Move a staged write's non-empty part files into `data/` under
    * fresh collision-free names; deletes the staging dir.
    */
  private def moveIntoData(table: String, tmp: Path): Seq[String] = {
    val f = Manifest.fs(table)
    val dataDir = new Path(table, "data")
    f.mkdirs(dataDir)
    val moved = f.listStatus(tmp).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getLen > 0)
      .map { st =>
        val dest = new Path(dataDir, s"part-${UUID.randomUUID()}.parquet")
        require(f.rename(st.getPath, dest),
          s"rename failed: ${st.getPath} -> $dest")
        dest.toString
      }
    f.delete(tmp, true)
    moved
  }

  private val maxCommitAttempts = 32

  /** OPTIMISTIC-COMMIT driver (round-13): run `body` with the manifest
    * name for this attempt (`gen`, then `gen-r1`, `gen-r2`, … — each
    * attempt must publish under a FRESH name because published
    * manifests are immutable); body returns None when its
    * [[Manifest.tryCasHead]] lost the race, and the driver re-runs it
    * REBASED on the new head. A lost attempt's manifest stays behind as
    * an unreferenced name (never in any HEAD; reaped by
    * [[graft.ops.Privacy.expireSnapshots]] like any superseded
    * snapshot). Attempts are bounded — a pathological contention storm
    * fails loudly rather than spinning.
    */
  private def commitRetry[A](table: String, gen: String)
                            (body: (String, Int) => Option[A]): A = {
    var attempt = 0
    while (attempt < maxCommitAttempts) {
      val name = if (attempt == 0) gen else s"$gen-r$attempt"
      body(name, attempt) match {
        case Some(a) => return a
        case None => attempt += 1
      }
    }
    throw new IllegalStateException(
      s"lake commit of '$gen' on $table lost the HEAD race " +
        s"$maxCommitAttempts times — pathological contention")
  }

  /** Write `df` to fresh Parquet files under `data/` and publish ONE new
    * FULL generation `gen` = previous HEAD's files + the new ones, with
    * per-column stats recorded first and HEAD swapped last. First land
    * defines the table schema (field ids 1..n in df column order);
    * later lands must present the current schema's columns (any order).
    *
    * CONCURRENT-COMMIT SAFE (round-13): the HEAD swap is a versioned
    * compare-and-swap ([[Manifest.tryCasHead]]); losing the race
    * re-reads the new head, re-unions its file list with this landing's
    * files, and re-publishes under a retry name — so two concurrent
    * landings BOTH end up referenced by the final head (previously the
    * loser's generation silently vanished from the current version).
    * A concurrent SCHEMA evolution racing a land still fails loudly:
    * the data files were written under the superseded schema, and a
    * silent rebind would be a lie — re-run the landing.
    */
  def land(spark: SparkSession, table: String, df: DataFrame,
           gen: String): LandReport = {
    require(!Manifest.manifestNames(table).contains(gen),
      s"generation '$gen' already exists — published versions are immutable")
    def validate(s: Schema): Schema = {
      val missing = s.fields.map(_.name).toSet -- df.columns.toSet
      require(missing.isEmpty,
        s"land is missing current-schema columns: ${missing.mkString(",")}")
      val extra = df.columns.toSet -- s.fields.map(_.name).toSet
      require(extra.isEmpty,
        s"land carries columns outside the current schema: " +
          s"${extra.mkString(",")} — evolve first (addColumn)")
      s
    }
    val sch = schemaIds(table) match {
      case Nil =>
        val s = Schema(1, df.schema.fields.zipWithIndex.map { case (f, i) =>
          Field(i + 1, f.name, f.dataType)
        }.toIndexedSeq)
        // a concurrent FIRST land can win the schema publish; the loser
        // validates against (and lands under) the winner's schema
        try { publishSchema(table, s); s }
        catch { case _: IllegalArgumentException =>
          validate(schema(table, schemaIds(table).max)) }
      case ids =>
        // between schemas existing and HEAD existing there is a window
        // (a concurrent first land that has not CAS'd yet): fall back
        // to the newest published schema
        validate(scala.util.Try(currentSchema(table))
          .getOrElse(schema(table, ids.max)))
    }
    val aligned = df.select(sch.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    val tmp = new Path(table, s".land-${UUID.randomUUID()}")
    aligned.write.parquet(tmp.toString)
    val moved = moveIntoData(table, tmp)
    publishStats(spark, table, moved, sch)
    commitRetry(table, gen) { (name, _) =>
      val (v, head) = Manifest.headState(table)
      head.foreach { h =>
        val hid = genSchemaId(table, h.head)
        require(hid == sch.schemaId,
          s"concurrent schema evolution during land (files written " +
            s"under schema ${sch.schemaId}, head now binds $hid) — " +
            "re-run the landing against the evolved table")
      }
      val prior = head
        .map(h => Manifest.committedFiles(table, Some(h))).getOrElse(Nil)
      Manifest.publish(table, name, (prior ++ moved).sorted)
      publishGenMeta(table, name, sch.schemaId)
      if (Manifest.tryCasHead(table, v, Set(name))) {
        val n = fileStats(table)
        Some(LandReport(name, moved, moved.map(m => n(baseName(m)).rows).sum))
      } else None
    }
  }

  // ——————————————————————————————————————————————— streaming landing

  /** STREAMING LANDING (round-13): land one micro-batch as Parquet
    * files + colstats under one generation per epoch — the columnar
    * twin of the text lane's epoch protocol
    * ([[ManifestSink]] `commit(epochId, …)`): the generation name
    * `<prefix>-epoch-<batchId>` is the REDELIVERY KEY, so a replayed
    * micro-batch republishes its own generation with the rerun's files
    * (subtracting the prior delivery's files from the head it rebases
    * on) and at-least-once delivery converges to exactly-once table
    * contents. The HEAD swap is the same versioned CAS as [[land]] —
    * a concurrent batch landing racing the stream loses nothing.
    *
    * Contract boundaries (same as the text lane, stated loudly):
    *  - ONE streaming query per (table, prefix) — epoch names are the
    *    idempotence key, so two queries sharing a prefix would collide;
    *  - epoch generations are NOT immutable snapshots until superseded
    *    (a replay rewrites the name's content — pin a non-epoch
    *    generation or a copied name-set for time travel);
    *  - replays must precede maintenance: replaying an epoch whose rows
    *    a later [[eraseKeys]] already rewrote re-lands those rows
    *    (checkpoint recovery happens at stream restart, maintenance
    *    runs between streams, so the window is operational, not
    *    structural).
    *
    * Scale shape: per epoch one staged write + a metadata commit; the
    * per-epoch file list rides an `epochs/` sidecar entry (file-grain,
    * replaced on replay) so replay subtraction never scans data.
    */
  def landEpoch(spark: SparkSession, table: String, df: DataFrame,
                prefix: String, batchId: Long): LandReport = {
    val gen = s"$prefix-epoch-$batchId"
    def validate(s: Schema): Schema = {
      val missing = s.fields.map(_.name).toSet -- df.columns.toSet
      require(missing.isEmpty,
        s"landEpoch is missing current-schema columns: " +
          missing.mkString(","))
      val extra = df.columns.toSet -- s.fields.map(_.name).toSet
      require(extra.isEmpty,
        s"landEpoch carries columns outside the current schema: " +
          s"${extra.mkString(",")} — evolve first (addColumn)")
      s
    }
    val sch = schemaIds(table) match {
      case Nil =>
        val s = Schema(1, df.schema.fields.zipWithIndex.map { case (f, i) =>
          Field(i + 1, f.name, f.dataType)
        }.toIndexedSeq)
        try { publishSchema(table, s); s }
        catch { case _: IllegalArgumentException =>
          validate(schema(table, schemaIds(table).max)) }
      case ids =>
        validate(scala.util.Try(currentSchema(table))
          .getOrElse(schema(table, ids.max)))
    }
    val aligned = df.select(sch.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    val tmp = new Path(table, s".land-${UUID.randomUUID()}")
    aligned.write.parquet(tmp.toString)
    val moved = moveIntoData(table, tmp)
    publishStats(spark, table, moved, sch)
    // the prior delivery's file set (empty on first delivery) — what a
    // replay subtracts from the head before adding its own files
    val priorEpochFiles: Set[String] =
      Manifest.sidecarLines(table, "epochs")
        .map(_.split("\t", -1))
        .collect { case a if a.length == 2 && dec(a(0)) == gen => dec(a(1)) }
        .toSet
    var attempt = 0
    while (attempt < maxCommitAttempts) {
      val (v, head) = Manifest.headState(table)
      head.foreach { h =>
        val hid = genSchemaId(table, h.head)
        require(hid == sch.schemaId,
          s"concurrent schema evolution during landEpoch (files written " +
            s"under schema ${sch.schemaId}, head now binds $hid)")
      }
      val cur = head
        .map(h => Manifest.committedFiles(table, Some(h))).getOrElse(Nil)
      val files = (cur.filterNot(f =>
        priorEpochFiles.contains(baseName(f))) ++ moved).sorted
      // the ONE generation namespace allowed to replace: the epoch name
      // is the idempotence key (text-lane contract, Parquet flavor)
      Manifest.publishReplacing(table, gen, files)
      publishGenMeta(table, gen, sch.schemaId, overwrite = true)
      if (Manifest.tryCasHead(table, v, Set(gen))) {
        Manifest.publishTo(table, "epochs", gen,
          moved.map(m => s"${enc(gen)}\t${enc(baseName(m))}"),
          overwrite = true)
        val n = fileStats(table)
        return LandReport(gen, moved,
          moved.map(m => n(baseName(m)).rows).sum)
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"epoch commit '$gen' on $table lost the HEAD race " +
        s"$maxCommitAttempts times — pathological contention")
  }

  /** Drive a streaming DataFrame into the lake through
    * [[landEpoch]] — AvailableNow by default (the cron-batch shape:
    * process everything pending, then stop); checkpoint recovery
    * replays the last uncommitted epoch, which [[landEpoch]] absorbs
    * idempotently.
    */
  def streamLand(df: DataFrame, table: String, prefix: String,
                 checkpointDir: String): Unit =
    graft.streaming.Streaming.withStaticMicrobatchPlans(df.sparkSession) {
    val q = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) =>
          landEpoch(batch.sparkSession, table, batch.toDF(), prefix, id)
          ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    }

  // —————————————————————————————————————————————————— schema evolution

  /** Publish a new schema with one added (nullable) column and a new
    * generation binding the SAME file list to it: existing files simply
    * have no such field id, and the read path fills NULL — while every
    * prior generation keeps ITS schema binding, so time travel never
    * sees the new column.
    */
  def addColumn(table: String, name: String, dataType: DataType,
                gen: String): Schema =
    evolve(table, gen) { s =>
      require(!s.fields.exists(_.name == name),
        s"column '$name' already exists")
      Schema(s.schemaId + 1,
        s.fields :+ Field(s.fields.map(_.id).max + 1, name, dataType))
    }

  /** Rename a column WITHOUT rewriting a byte: the field ID is the
    * identity, so files written under the old name keep reading — the
    * read path maps physical name → current name per file by id.
    */
  def renameColumn(table: String, from: String, to: String,
                   gen: String): Schema =
    evolve(table, gen) { s =>
      require(s.fields.exists(_.name == from), s"no column '$from'")
      require(!s.fields.exists(_.name == to),
        s"column '$to' already exists")
      Schema(s.schemaId + 1,
        s.fields.map(f => if (f.name == from) f.copy(name = to) else f))
    }

  /** Schema-evolution commit — CAS'd like every other commit
    * (round-13): each attempt recomputes the change against the head's
    * CURRENT schema and claims a fresh schema id create-exclusively
    * (two concurrent evolutions colliding on an id surface as a retry,
    * not a silent overwrite), and a lost HEAD race re-runs the whole
    * attempt so the published generation always binds the file list it
    * actually read.
    */
  private def evolve(table: String, gen: String)
                    (change: Schema => Schema): Schema = {
    require(!Manifest.manifestNames(table).contains(gen),
      s"generation '$gen' already exists — published versions are immutable")
    commitRetry(table, gen) { (name, _) =>
      val (v, head) = Manifest.headState(table)
      val cur = head.getOrElse(throw new IllegalStateException(
        s"$table has no HEAD pointer — not a lake table, or never landed"))
      require(cur.size == 1,
        s"lake HEAD must be a single generation, got ${cur.mkString(",")}")
      val next0 = change(schema(table, genSchemaId(table, cur.head)))
      val next = next0.copy(schemaId = (schemaIds(table) :+ 0).max + 1)
      val idClaimed =
        try { publishSchema(table, next); true }
        catch { case _: IllegalArgumentException => false } // id raced away
      if (!idClaimed) None // next attempt recomputes against fresh state
      else {
        Manifest.publish(table, name,
          Manifest.committedFiles(table, Some(cur)))
        publishGenMeta(table, name, next.schemaId)
        if (Manifest.tryCasHead(table, v, Set(name))) Some(next) else None
      }
    }
  }

  // ————————————————————————————————————————————————————————— planning

  /** Split a snapshot's files into (selected, skipped) under `predicate`
    * — the driver-side planning walk. Inclusive semantics: a file is
    * skipped ONLY when its stats PROVE no row can match; files without
    * stats and predicate nodes the translator does not understand
    * degrade to selected.
    */
  def planFiles(table: String, snapshot: Option[String],
                predicate: Option[Column]): (Seq[String], Seq[String]) = {
    val gen = snapshot.getOrElse(currentGen(table))
    val files = Manifest.committedFiles(table, Some(Set(gen)))
    predicate match {
      case None => (files, Nil)
      case Some(p) =>
        val stats = fileStats(table)
        val sch = schema(table, genSchemaId(table, gen))
        files.partition { f =>
          stats.get(baseName(f)).forall(st =>
            mayMatch(PB.tree(p), st, sch))
        }
    }
  }

  /** Read a lake table at a snapshot (default: HEAD), with optional
    * stats-driven file skipping. Files written under older schemas are
    * read with THEIR physical schema and mapped to the snapshot's
    * column names by field id (added columns fill NULL, renamed columns
    * alias) — one scan group per write-schema, unioned. The predicate is
    * re-applied as a row filter (pruning is only may-contain), where
    * Catalyst pushes it through the per-group aliases into each Parquet
    * scan: two-level pruning, file grain here, row-group grain there.
    */
  def read(spark: SparkSession, table: String,
           snapshot: Option[String] = None,
           predicate: Option[Column] = None): DataFrame = {
    val gen = snapshot.getOrElse(currentGen(table))
    val want = schema(table, genSchemaId(table, gen))
    val (selected, _) = planFiles(table, snapshot, predicate)
    val stats = fileStats(table)
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], want.struct)
    val groups = selected.groupBy(f =>
      stats.get(baseName(f)).map(_.schemaId).getOrElse(want.schemaId))
    val parts = groups.toSeq.sortBy(_._1).map { case (sid, files) =>
      val phys = if (sid == want.schemaId) want else schema(table, sid)
      val cols = want.fields.map { f =>
        phys.byId.get(f.id) match {
          case Some(w) => col(w.name).cast(f.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }
      spark.read.schema(phys.struct).parquet(files: _*).select(cols: _*)
    }
    val base = if (parts.isEmpty) empty else parts.reduce(_ unionAll _)
    predicate.fold(base)(base.filter)
  }

  // ————————————————————————————————————————————————————————— erasure

  /** KEY-TARGETED DELETION on the columnar lane — [[graft.ops.Privacy
    * .eraseKeys]]'s contract with candidacy decided from the PER-COLUMN
    * stats (no text key extraction): rewrite only the files whose
    * `keyCol` range can contain one of `keys`, anti-joining the key set;
    * untouched files are listed by reference, the post-delete table
    * publishes as one new generation in the CURRENT schema, and HEAD
    * swaps. Rows whose key is NULL are kept (unkeyable ≠ erasable).
    * Physical purge of superseded files is [[graft.ops.Privacy
    * .expireSnapshots]], which rewrites this lane's colstats sidecar
    * too.
    */
  def eraseKeys(spark: SparkSession, table: String, keyCol: String,
                keys: Seq[Any], gen: String): EraseReport = {
    require(keys.nonEmpty, "eraseKeys needs at least one key")
    require(!keys.contains(null), "erasure keys must be non-null")
    require(!Manifest.manifestNames(table).contains(gen),
      s"generation '$gen' already exists — published versions are immutable")
    // the rewrite depends on the table CONTENT, so a lost HEAD race
    // re-runs the WHOLE attempt from the new head (round-13): an erase
    // racing a landing must erase over the landed files too, never
    // publish a post-erase generation that silently omits them. A lost
    // attempt's rewritten files become unreferenced orphans, reaped by
    // expiry's orphan-age pass.
    commitRetry(table, gen) { (name, _) =>
      val (v, head) = Manifest.headState(table)
      val cur = head.getOrElse(throw new IllegalStateException(
        s"$table has no HEAD pointer — not a lake table, or never landed"))
      val want = schema(table, genSchemaId(table, cur.head))
      val field = want.byName.getOrElse(keyCol,
        throw new IllegalArgumentException(s"no column '$keyCol' in $table"))
      val files = Manifest.committedFiles(table, Some(cur))
      val stats = fileStats(table)
      val (candidates, untouched) = files.partition { f =>
        stats.get(baseName(f)) match {
          case Some(st) =>
            keys.exists(k => statMayEqual(st, field, want, k))
          case None => true // unstatted (shouldn't happen): rewrite, stay safe
        }
      }
      val newFiles: Seq[String] =
        if (candidates.isEmpty) Nil
        else {
          val keysDf = spark.createDataFrame(
            spark.sparkContext.parallelize(
              keys.map(k => org.apache.spark.sql.Row(k)), 1),
            StructType(Seq(StructField("__k", field.dataType))))
          // candidate files may span write-schemas: route through the
          // id-mapped read restricted to just those files
          val cand = readFiles(spark, table, want, candidates, stats)
            .join(broadcast(keysDf), col(keyCol) === col("__k"), "left_anti")
            .select(want.fields.map(f => col(f.name)): _*)
          val tmp = new Path(table, s".erase-${UUID.randomUUID()}")
          cand.write.parquet(tmp.toString)
          val moved = moveIntoData(table, tmp)
          publishStats(spark, table, moved, want)
          moved
        }
      Manifest.publish(table, name, (untouched ++ newFiles).sorted)
      publishGenMeta(table, name, want.schemaId)
      if (Manifest.tryCasHead(table, v, Set(name)))
        Some(EraseReport(name, files.size, candidates.size,
          untouched.size, newFiles))
      else None
    }
  }

  /** The id-mapped multi-schema scan over an explicit file subset. */
  private def readFiles(spark: SparkSession, table: String, want: Schema,
                        files: Seq[String],
                        stats: Map[String, FileStat]): DataFrame = {
    val groups = files.groupBy(f =>
      stats.get(baseName(f)).map(_.schemaId).getOrElse(want.schemaId))
    groups.toSeq.sortBy(_._1).map { case (sid, fs) =>
      val phys = if (sid == want.schemaId) want else schema(table, sid)
      val cols = want.fields.map { f =>
        phys.byId.get(f.id) match {
          case Some(w) => col(w.name).cast(f.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }
      spark.read.schema(phys.struct).parquet(fs: _*).select(cols: _*)
    }.reduce(_ unionAll _)
  }


  // ——————————————————————————————————— compaction + incremental read

  case class CompactReport(gen: String, nFilesBefore: Int, nCompacted: Int,
                           nUntouched: Int, newFiles: Seq[String])

  /** COMPACTION — the small-files half of lake maintenance (erasure
    * rewrites and fine-grained landings leave files below the efficient
    * scan grain): rewrite every live file smaller than
    * `smallerThanBytes` into `targetFiles` fresh files, leave larger
    * files untouched (by reference, byte-identical), publish ONE new
    * generation and swap HEAD. `clusterBy` re-range-partitions the
    * rewrite on the table's cluster key so the per-file column stats
    * stay TIGHT — compaction must not undo file skipping. Superseded
    * small files purge on the next [[graft.ops.Privacy.expireSnapshots]]
    * like any other superseded file. Needs ≥ 2 qualifying files (one
    * small file gains nothing); returns the current generation
    * unchanged otherwise.
    */
  def compact(spark: SparkSession, table: String, smallerThanBytes: Long,
              gen: String, clusterBy: Seq[String] = Nil,
              targetFiles: Int = 1): CompactReport = {
    require(!Manifest.manifestNames(table).contains(gen),
      s"generation '$gen' already exists — published versions are immutable")
    // content-dependent commit: re-run whole attempts on a lost HEAD
    // race, like eraseKeys (round-13)
    commitRetry(table, gen) { (name, _) =>
      val (v, head) = Manifest.headState(table)
      val cur = head.getOrElse(throw new IllegalStateException(
        s"$table has no HEAD pointer — not a lake table, or never landed"))
      val want = schema(table, genSchemaId(table, cur.head))
      val files = Manifest.committedFiles(table, Some(cur))
      val f = Manifest.fs(table)
      val (small, big) = files.partition(p =>
        f.getFileStatus(new Path(p)).getLen < smallerThanBytes)
      if (small.size < 2)
        return CompactReport(cur.head, files.size, 0, files.size, Nil)
      val stats = fileStats(table)
      val slice = readFiles(spark, table, want, small, stats)
      val arranged =
        if (clusterBy.nonEmpty)
          slice.repartitionByRange(targetFiles, clusterBy.map(col): _*)
        else slice.coalesce(targetFiles)
      val tmp = new Path(table, s".compact-${UUID.randomUUID()}")
      arranged.write.parquet(tmp.toString)
      val moved = moveIntoData(table, tmp)
      publishStats(spark, table, moved, want)
      Manifest.publish(table, name, (big ++ moved).sorted)
      publishGenMeta(table, name, want.schemaId)
      if (Manifest.tryCasHead(table, v, Set(name)))
        Some(CompactReport(name, files.size, small.size, big.size, moved))
      else None
    }
  }

  /** INCREMENTAL READ — the files `to` references that `from` does not,
    * read as a DataFrame in `to`'s schema: the append-only
    * changed-data slice between two snapshots, which is what a cron
    * batch consumes instead of rescanning the table (the
    * AvailableNow-over-the-lake shape; on a compacted or erased range
    * the diff contains REWRITTEN files — this is an append-only device,
    * pair it with generation lineage when rewrites are in play).
    */
  def addedFiles(table: String, fromGen: String,
                 toGen: String): Seq[String] =
    (Manifest.committedFiles(table, Some(Set(toGen))).toSet --
      Manifest.committedFiles(table, Some(Set(fromGen)))).toSeq.sorted

  def readAdded(spark: SparkSession, table: String, fromGen: String,
                toGen: String): DataFrame = {
    val want = schema(table, genSchemaId(table, toGen))
    val added = addedFiles(table, fromGen, toGen)
    if (added.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], want.struct)
    else readFiles(spark, table, want, added, fileStats(table))
  }

  // ———————————————————————————————————— predicate → stats evaluation

  private type Pred = org.apache.spark.sql.graftbridge.PredBridge.Node
  private val PB = org.apache.spark.sql.graftbridge.PredBridge

  /** Inclusive may-match of a predicate tree (the [[PB]] neutral AST —
    * Spark 4 Columns carry by-name function nodes, bridged there)
    * against one file's stats. Conservative by construction: any node
    * outside the translatable core returns true (read the file).
    *
    * Conventions: cl = sign(lit − lo), ch = sign(lit − hi).
    */
  private def mayMatch(e: Pred, st: FileStat, sch: Schema): Boolean = {
    val eq: (Int, Int) => Boolean = (cl, ch) => cl >= 0 && ch <= 0
    e match {
      case PB.Fn("and", Seq(l, r)) =>
        mayMatch(l, st, sch) && mayMatch(r, st, sch)
      case PB.Fn("or", Seq(l, r)) =>
        mayMatch(l, st, sch) || mayMatch(r, st, sch)
      // lo ≤ lit ≤ hi — symmetric in argument order
      case PB.Fn("=" | "==", Seq(x, y)) =>
        ineq(x, y, st, sch)(eq, eq)
      // null-safe equality: `col <=> NULL` matches exactly the NULL rows
      // — which is exactly what an all-NULL column's file contains, so
      // the comparison path's all-NULL prune would silently drop every
      // matching row (round-13, ADVICE). NULL-literal goes through the
      // isNull logic; a non-null literal is ordinary equality (there the
      // all-NULL prune IS correct: no non-null value present).
      case PB.Fn("<=>", Seq(x, y)) =>
        def nullMay(nm: String): Boolean = sch.byName.get(nm)
          .flatMap(f => st.cols.get(f.id)).forall(_.nulls > 0)
        (x, y) match {
          case (PB.Attr(n), l: PB.Lit) if l.value == null => nullMay(n)
          case (l: PB.Lit, PB.Attr(n)) if l.value == null => nullMay(n)
          case _ => ineq(x, y, st, sch)(eq, eq)
        }
      // attr > lit: ∃ row > lit ⟺ hi > lit ⟺ ch < 0
      // lit > attr (attr < lit): lo < lit ⟺ cl > 0
      case PB.Fn(">", Seq(x, y)) => ineq(x, y, st, sch)(
        (_, ch) => ch < 0, (cl, _) => cl > 0)
      // attr ≥ lit: hi ≥ lit ⟺ ch ≤ 0; lit ≥ attr: lo ≤ lit ⟺ cl ≥ 0
      case PB.Fn(">=", Seq(x, y)) => ineq(x, y, st, sch)(
        (_, ch) => ch <= 0, (cl, _) => cl >= 0)
      // attr < lit: lo < lit ⟺ cl > 0; lit < attr: hi > lit ⟺ ch < 0
      case PB.Fn("<", Seq(x, y)) => ineq(x, y, st, sch)(
        (cl, _) => cl > 0, (_, ch) => ch < 0)
      // attr ≤ lit: lo ≤ lit ⟺ cl ≥ 0; lit ≤ attr: hi ≥ lit ⟺ ch ≤ 0
      case PB.Fn("<=", Seq(x, y)) => ineq(x, y, st, sch)(
        (cl, _) => cl >= 0, (_, ch) => ch <= 0)
      case PB.Fn("in", PB.Attr(n) +: vs)
          if vs.forall(_.isInstanceOf[PB.Lit]) =>
        vs.exists(v => bound(n, v.asInstanceOf[PB.Lit], st, sch)(eq))
      case PB.Fn("isNull" | "isnull", Seq(PB.Attr(n))) =>
        sch.byName.get(n)
          .flatMap(f => st.cols.get(f.id)).forall(_.nulls > 0)
      case PB.Fn("isNotNull" | "isnotnull", Seq(PB.Attr(n))) =>
        sch.byName.get(n)
          .flatMap(f => st.cols.get(f.id))
          .forall(c => st.rows - c.nulls > 0)
      case _ => true
    }
  }

  /** Binary comparison dispatch: `x OP y` with the attribute on either
    * side — `fAttrLit` evaluates attr-OP-lit, `fLitAttr` the mirrored
    * lit-OP-attr; both receive (cl, ch) = (sign(lit−lo), sign(lit−hi)).
    */
  private def ineq(x: Pred, y: Pred, st: FileStat, sch: Schema)
                  (fAttrLit: (Int, Int) => Boolean,
                   fLitAttr: (Int, Int) => Boolean): Boolean = (x, y) match {
    case (PB.Attr(n), l: PB.Lit) => bound(n, l, st, sch)(fAttrLit)
    case (l: PB.Lit, PB.Attr(n)) => bound(n, l, st, sch)(fLitAttr)
    case _ => true
  }

  /** Evaluate `f(cmp(lit, lo), cmp(lit, hi))` for attribute `name`;
    * true (no prune) when stats, types or values are unusable; false is
    * only reachable with proof. All-NULL columns can match no
    * comparison predicate → prunable when nulls == rows.
    */
  private def bound(name: String, l: PB.Lit, st: FileStat, sch: Schema)
                   (f: (Int, Int) => Boolean): Boolean = {
    val field = sch.byName.get(name)
    if (field.isEmpty) return true
    val cs = st.cols.get(field.get.id)
    if (cs.isEmpty) return st.rows > 0 // statted-empty file: no match
    if (st.rows - cs.get.nulls <= 0) return false // all NULL: cmp never true
    (cs.get.lo, cs.get.hi) match {
      case (Some(lo), Some(hi)) =>
        (for {
          cl <- cmpCanon(field.get.dataType, l, lo)
          ch <- cmpCanon(field.get.dataType, l, hi)
        } yield f(cl, ch)).getOrElse(true)
      case _ => true
    }
  }

  /** Compare a literal's catalyst value to a canonical stat string under
    * the COLUMN's type ordering. None = incomparable (no pruning).
    * Numerics (incl. timestamp micros / date days / boolean 0-1) compare
    * as BigDecimal; strings compare as unsigned UTF-8 bytes (Spark's
    * binary collation — the executor-side min/max order).
    */
  private def cmpCanon(colType: DataType, l: PB.Lit,
                       stat: String): Option[Int] = {
    val v = l.value
    val vt = l.dataType
    if (v == null) return None
    def num(x: Any, t: DataType): Option[BigDecimal] = t match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(BigDecimal(x.toString))
      case FloatType =>
        val d = x.asInstanceOf[Float].toDouble
        if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d))
      case DoubleType =>
        val d = x.asInstanceOf[Double]
        if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d))
      case _: DecimalType =>
        Some(x.asInstanceOf[org.apache.spark.sql.types.Decimal].toBigDecimal)
      case TimestampType | TimestampNTZType =>
        Some(BigDecimal(x.toString)) // internal: Long micros
      case DateType => Some(BigDecimal(x.toString)) // internal: Int days
      case BooleanType => Some(if (x.asInstanceOf[Boolean]) 1 else 0)
      case _ => None
    }
    def statNum: Option[BigDecimal] =
      scala.util.Try(BigDecimal(stat)).toOption
    (colType, vt) match {
      case (StringType, StringType) =>
        Some(binCmp(v.toString, stat))
      // NTZ vs NTZ: wall-clock micros (the literal's internal Long)
      // against the wall-clock stat string — tz-free on both sides.
      // Stats written before round-13 encoded session-shifted micros;
      // those fail the LocalDateTime parse and degrade to no-prune.
      case (TimestampNTZType, TimestampNTZType) =>
        scala.util.Try {
          val ldt = java.time.LocalDateTime.parse(stat.replace(' ', 'T'))
          val statMicros =
            ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              ldt.getNano / 1000L
          Integer.signum(
            java.lang.Long.compare(v.asInstanceOf[Long], statMicros))
        }.toOption
      case (ct, _) if numericish(ct) && numericish(vt) &&
          tsCompatible(ct, vt) =>
        for (a <- num(v, vt); b <- statNum) yield a.compare(b)
      case _ => None
    }
  }

  private def numericish(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | TimestampType | TimestampNTZType | DateType |
         BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Timestamp micros and date days are both "numbers", but comparing a
    * DATE literal's days to a TIMESTAMP column's micros would be wrong
    * by 86400·10⁶ — only same-unit pairs compare. NTZ micros are
    * WALL-CLOCK micros (its own unit: an instant-micros literal against
    * an NTZ column, or vice versa, differs by the session zone — those
    * pairs degrade to no-prune; same-type NTZ pairs take the dedicated
    * [[cmpCanon]] case before this guard is consulted).
    */
  private def tsCompatible(ct: DataType, vt: DataType): Boolean = {
    def unit(t: DataType): Int = t match {
      case TimestampType => 1
      case DateType => 2
      case BooleanType => 3
      case TimestampNTZType => 4
      case _ => 0
    }
    unit(ct) == unit(vt)
  }

  /** Unsigned UTF-8 byte comparison — Spark's string ordering. */
  private def binCmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return Integer.signum(d)
      i += 1
    }
    Integer.signum(x.length - y.length)
  }

  /** May file `st` contain a row whose `field` equals `key`? (erasure
    * candidacy — EqualTo semantics via [[bound]]).
    */
  private def statMayEqual(st: FileStat, field: Field, sch: Schema,
                           key: Any): Boolean =
    bound(field.name, PB.litNode(key), st, sch)(
      (cl, ch) => cl >= 0 && ch <= 0)
}
