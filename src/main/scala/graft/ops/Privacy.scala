package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-governance re-identification audits — the pre-release checks a
  * dataset owner runs before a corpus (or its metadata) leaves the
  * trust boundary. Both operators quantify linkage risk against a
  * chosen set of quasi-identifier (QI) columns: attributes that are
  * individually innocuous but jointly identifying (the Sweeney
  * zip/birthdate/sex result).
  *
  * Shape at scale: each audit is two chained hash aggregations (row →
  * QI group, group → histogram), both with map-side partial
  * aggregation — one shuffle at QI-group grain, a second at histogram
  * grain (≤ distinct sizes rows). Corpus-linear, no windows, no joins:
  * this runs casually over the full 100 TB table.
  */
object Privacy {

  /** k-anonymity histogram: group rows by the QI tuple, then fold group
    * sizes to (group_size, n_groups, n_rows, at_risk) — `at_risk` marks
    * sizes below `k`, i.e. equivalence classes small enough that a QI
    * match re-identifies a person among fewer than k candidates. The
    * release gate is "no at_risk rows"; the histogram (rather than a
    * bare pass/fail) shows HOW FAR the table is from k-anonymous, which
    * is what decides between suppression and coarser bucketing.
    *
    * NULL QI values group together (Spark's groupBy null semantics,
    * matching SQL GROUP BY) — a null is itself a linkable value.
    */
  def kAnonymityHistogram(df: DataFrame, qi: Seq[Column],
                          k: Int): DataFrame = {
    require(qi.nonEmpty, "at least one quasi-identifier column required")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("__sz"))
      .groupBy(col("__sz").as("group_size"))
      .agg(count(lit(1)).as("n_groups"), sum(col("__sz")).as("n_rows"))
      .withColumn("at_risk", col("group_size") < k)
      .orderBy("group_size")
  }

  /** l-diversity histogram: per QI group, the number of DISTINCT values
    * of the `sensitive` attribute, folded to (l_distinct, n_groups,
    * n_rows, at_risk) — `at_risk` marks groups below `l`, i.e. classes
    * where a QI match discloses the sensitive value (l = 1: everyone in
    * the class shares it — k-anonymity alone does not prevent this
    * homogeneity attack, which is the whole reason l-diversity exists).
    *
    * NULL sensitive values are NOT counted as a distinct value
    * (count-distinct SQL semantics, identical in any replaying engine):
    * a group whose sensitive attribute is entirely null reads l = 0 —
    * flagged at-risk, which is the conservative direction.
    */
  def lDiversityHistogram(df: DataFrame, qi: Seq[Column],
                          sensitive: Column, l: Int): DataFrame = {
    require(qi.nonEmpty, "at least one quasi-identifier column required")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(qi: _*)
      .agg(countDistinct(sensitive).as("__l"), count(lit(1)).as("__sz"))
      .groupBy(col("__l").as("l_distinct"))
      .agg(count(lit(1)).as("n_groups"), sum(col("__sz")).as("n_rows"))
      .withColumn("at_risk", col("l_distinct") < l)
      .orderBy("l_distinct")
  }

  // ——————————————————————————————————————————— key-targeted deletion

  /** What [[eraseKeys]] did: the published manifest name, the file
    * counts the pruning decided, and the rewritten files it landed.
    * `nUntouched + newFiles.size` = the post-delete table's file count;
    * `nUntouched > 0` on a clustered table is the pruning working.
    */
  case class EraseReport(manifest: String, nFiles: Int, nCandidates: Int,
                         nUntouched: Int, newFiles: Seq[String])

  /** Spark's string ordering is BINARY (unsigned UTF-8 bytes); driver-
    * side stats comparisons must use the SAME order or a file could be
    * misclassified as untouched. Java's String.compareTo (UTF-16 code
    * units) agrees on ASCII but diverges on supplementary characters —
    * so compare bytes, not chars.
    */
  private def binLte(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length <= y.length
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")
  private def baseName(p: String): String =
    p.substring(p.lastIndexOf('/') + 1)

  /** Per-file key statistics for a graft-manifest table, maintained
    * INCREMENTALLY as a `stats/` sidecar (the Iceberg manifest-stats
    * device at its simplest): each call scans ONLY the committed data
    * files that have no stats yet — one column-pruned pass per file,
    * ever — computes (min, max, n) of `keyOf(value)` per file, and
    * publishes the new entries atomically. At steady state (stats
    * published after each landing) an erasure pass reads NO untouched
    * data: candidacy is decided from the sidecar alone. Returns the
    * full map file-basename → (min, max, n); a zero-row file carries
    * n = 0 and can never be a candidate.
    */
  def publishKeyStats(spark: org.apache.spark.sql.SparkSession,
                      table: String, keyOf: Column => Column)
      : Map[String, (String, String, Long)] =
    keyStats(spark, table, keyOf,
      graft.sources.Manifest.committedFiles(table,
        graft.sources.Manifest.headOf(table)))

  private def keyStats(spark: org.apache.spark.sql.SparkSession,
                       table: String, keyOf: Column => Column,
                       files: Seq[String])
      : Map[String, (String, String, Long)] = {
    val existing: Map[String, (String, String, Long)] =
      graft.sources.Manifest.sidecarLines(table, "stats").map { ln =>
        val p = ln.split("\t", -1)
        require(p.length == 4, s"malformed stats line: $ln")
        dec(p(0)) -> ((dec(p(1)), dec(p(2)), p(3).toLong))
      }.toMap
    val need = files.filterNot(f => existing.contains(baseName(f)))
    if (need.isEmpty) return existing
    val rows = spark.read.text(need: _*)
      .select(input_file_name().as("__f"),
        keyOf(col("value")).cast("string").as("__k"))
      .filter(col("__k").isNotNull)
      .groupBy(col("__f"))
      .agg(min(col("__k")).as("__lo"), max(col("__k")).as("__hi"),
        count(lit(1)).as("__n"))
      .collect()
    val fresh = rows.map(r => baseName(r.getString(0)) ->
      ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    // files yielding no keyed rows (empty, or all-NULL keys): n = 0
    // sentinel — never a candidate, but recorded so they are never
    // re-scanned
    val empties = need.map(baseName).filterNot(fresh.contains)
      .map(b => b -> (("", "", 0L))).toMap
    val all = fresh ++ empties
    graft.sources.Manifest.publishTo(table, "stats",
      s"stats-${java.util.UUID.randomUUID()}",
      all.toSeq.sortBy(_._1).map { case (f, (lo, hi, n)) =>
        s"${enc(f)}\t${enc(lo)}\t${enc(hi)}\t$n" })
    existing ++ all
  }

  /** KEY-TARGETED DELETION (GDPR erasure) on a graft-manifest table:
    * given a key list, rewrite ONLY the data files whose per-file
    * min/max key stats can contain one of the keys, and publish the
    * post-delete table as ONE new full manifest `gen` — untouched
    * files are listed by reference (never read, never rewritten,
    * byte-identical on disk), candidate files are replaced by their
    * anti-joined rewrites under fresh names in `data/`. Old data files
    * are NOT deleted, so every previously captured snapshot still
    * reads its exact pre-delete table (q233's time-travel contract);
    * physical purge of the superseded files is a later retention pass,
    * once no live snapshot references them.
    *
    * `from` pins the version being erased (an explicit manifest-name
    * set); None — the default — resolves the table's HEAD pointer
    * (round-12: the whole-history union is no longer reachable by
    * default; a table without HEAD and without an explicit `from`
    * REFUSES to erase, because after any prior erasure or compaction
    * the union would resurrect superseded files). On publish the HEAD
    * pointer swaps to the new generation, so a subsequent default-
    * argument erase reads the post-delete table.
    *
    * Correctness contracts: keys must be non-null (rows whose key
    * extraction yields NULL are kept — an unkeyable row is not
    * erasable); candidacy compares strings in Spark's BINARY order on
    * both sides (driver [[binLte]] = unsigned UTF-8 bytes, exactly the
    * executor min/max collation), so pruning can never misclassify;
    * `gen` must not collide with an existing manifest name
    * (immutability — snapshots are forever).
    *
    * Scale shape: candidacy is a driver-side walk of the stats sidecar
    * (file grain — the same grain Iceberg's planner holds in memory);
    * the rewrite reads ONLY candidate files and anti-joins the
    * broadcast-or-shuffled key set on the extracted key; the commit is
    * one atomic manifest rename. On a key-clustered layout (the
    * [[graft.ops.Layout]] z-order/range discipline) an erasure request
    * for one user touches a handful of files out of millions.
    */
  def eraseKeys(spark: org.apache.spark.sql.SparkSession, table: String,
                keyOf: Column => Column, keys: Seq[String], gen: String,
                from: Option[Set[String]] = None): EraseReport = {
    require(keys.nonEmpty, "eraseKeys needs at least one key")
    require(!keys.contains(null), "erasure keys must be non-null")
    require(!graft.sources.Manifest.manifestNames(table).contains(gen),
      s"manifest '$gen' already exists — published versions are immutable")
    // default-HEAD erasure is a read-modify-write commit: CAS the swap
    // and RE-RUN the whole attempt on a lost race (round-13 — an erase
    // racing a landing must re-plan over the landed files, never
    // publish a post-erase version that silently omits them). An
    // explicit pinned `from` keeps the unconditional swap: the caller
    // chose the version to erase over.
    var attempt = 0
    while (from.isEmpty && attempt < 32) {
      val (v, head) = graft.sources.Manifest.headState(table)
      val version = head.getOrElse(throw new IllegalStateException(
        s"$table has no HEAD pointer and no explicit `from` — refusing " +
          "the whole-history read (after any erasure or compaction it " +
          "would resurrect superseded files); pass the current version"))
      val name = if (attempt == 0) gen else s"$gen-r$attempt"
      val rep = eraseKeysAt(spark, table, keyOf, keys, name, version)
      if (graft.sources.Manifest.tryCasHead(table, v, Set(name))) return rep
      attempt += 1
    }
    if (from.isEmpty) throw new IllegalStateException(
      s"erasure commit of '$gen' on $table lost the HEAD race 32 times")
    val rep = eraseKeysAt(spark, table, keyOf, keys, gen, from.get)
    graft.sources.Manifest.writeHead(table, Set(gen))
    rep
  }

  /** One erasure attempt over an explicit version — publishes the
    * post-delete manifest but does NOT move the pointer.
    */
  private def eraseKeysAt(spark: org.apache.spark.sql.SparkSession,
                          table: String, keyOf: Column => Column,
                          keys: Seq[String], gen: String,
                          version: Set[String]): EraseReport = {
    val files = graft.sources.Manifest.committedFiles(table, Some(version))
    val stats = keyStats(spark, table, keyOf, files)
    val sorted = keys.distinct.sortWith((a, b) => binLte(a, b) && a != b)
    def mayContain(f: String): Boolean = stats.get(baseName(f)) match {
      case Some((_, _, 0L)) => false
      case Some((lo, hi, _)) =>
        // first key ≥ lo, if any, must also be ≤ hi
        sorted.find(k => binLte(lo, k)).exists(k => binLte(k, hi))
      case None => true // unstatted (shouldn't happen): rewrite, stay safe
    }
    val (candidates, untouched) = files.partition(mayContain)
    val newFiles: Seq[String] =
      if (candidates.isEmpty) Nil
      else {
        import org.apache.spark.sql.Encoders
        val keysDf = spark.createDataset(sorted)(Encoders.STRING)
          .toDF("__k")
        val kept = spark.read.text(candidates: _*)
          .join(keysDf, keyOf(col("value")).cast("string") === col("__k"),
            "left_anti")
          .select(col("value"))
        val f = graft.sources.Manifest.fs(table)
        val tmp = new org.apache.hadoop.fs.Path(table,
          s".erase-${java.util.UUID.randomUUID()}")
        kept.write.text(tmp.toString)
        val dataDir = new org.apache.hadoop.fs.Path(table, "data")
        f.mkdirs(dataDir)
        val moved = f.listStatus(tmp).toSeq
          .filter(s => s.isFile && s.getLen > 0 &&
            s.getPath.getName.startsWith("part-"))
          .map { st =>
            val dest = new org.apache.hadoop.fs.Path(dataDir,
              s"part-${java.util.UUID.randomUUID()}.txt")
            require(f.rename(st.getPath, dest),
              s"rename failed: ${st.getPath} -> $dest")
            dest.toString
          }
        f.delete(tmp, true)
        moved
      }
    graft.sources.Manifest.publish(table, gen,
      (untouched ++ newFiles).sorted)
    EraseReport(gen, files.size, candidates.size, untouched.size, newFiles)
  }

  /** What [[expireSnapshots]] did: manifests removed, data files
    * physically deleted, data files kept (referenced by a kept
    * manifest), and young unreferenced files spared by the age guard.
    */
  case class ExpireReport(droppedManifests: Seq[String],
                          deletedFiles: Seq[String], keptFiles: Int,
                          sparedYoung: Seq[String], droppedStats: Int = 0)

  /** SNAPSHOT EXPIRY — the physical-purge half of the GDPR story
    * ([[eraseKeys]] is the logical half: it supersedes files but
    * deletes nothing, so old snapshots stay readable). Given the set
    * of manifest names to KEEP, delete every other manifest and every
    * data file no kept manifest references — after this, the erased
    * rows' bytes are GONE from disk, which is what erasure ultimately
    * requires. Expired snapshot names then THROW on read (the
    * committedFiles unknown-name contract) instead of silently reading
    * partial data.
    *
    * Two deletion classes, deliberately different rules:
    *  - files referenced by a DROPPED manifest (and by no kept one)
    *    are known-dead the moment their manifest goes — deleted
    *    immediately, whatever their age (this is what makes an
    *    erase-then-expire actually remove the erased bytes);
    *  - files referenced by NO manifest at all (orphans) are deleted
    *    only when older than `orphanAgeMs`: a live writer's in-flight
    *    task file exists before its commit publishes a manifest, and
    *    reaping it would corrupt that commit (the temp-manifest
    *    reaper's 1-hour discipline — far beyond any write→commit gap,
    *    so a genuine orphan is reaped on the next expiry).
    * Files referenced by a kept manifest are never deleted.
    *
    * Driver-side file-grain metadata walk (the Iceberg expire-snapshots
    * grain); no data is read.
    */
  def expireSnapshots(table: String, keep: Set[String],
                      orphanAgeMs: Long = 60L * 60 * 1000): ExpireReport = {
    require(keep.nonEmpty, "expireSnapshots needs at least one kept " +
      "snapshot — expiring everything would delete the table; drop the " +
      "directory instead if that is intended")
    val all = graft.sources.Manifest.manifestNames(table)
    val missing = keep -- all.toSet
    require(missing.isEmpty,
      s"kept snapshot names not found: ${missing.mkString(",")}")
    val live = graft.sources.Manifest
      .committedFiles(table, Some(keep)).map(baseName).toSet
    val dropped = all.filterNot(keep.contains)
    val deadReferenced = (
      if (dropped.isEmpty) Set.empty[String]
      else graft.sources.Manifest
        .committedFiles(table, Some(dropped.toSet)).map(baseName).toSet
    ) -- live
    val f = graft.sources.Manifest.fs(table)
    val dataDir = new org.apache.hadoop.fs.Path(table, "data")
    val horizon = System.currentTimeMillis() - orphanAgeMs
    val (deleted, spared) =
      if (!f.exists(dataDir)) (Nil, Nil)
      else {
        val statuses = f.listStatus(dataDir).toSeq.filter(_.isFile)
          .filterNot(s => live.contains(s.getPath.getName))
        val (dead, orphans) =
          statuses.partition(s => deadReferenced.contains(s.getPath.getName))
        val (oldOrphans, young) =
          orphans.partition(_.getModificationTime < horizon)
        (dead ++ oldOrphans).foreach(s => f.delete(s.getPath, false))
        ((dead ++ oldOrphans).map(_.getPath.toString),
          young.map(_.getPath.toString))
      }
    dropped.foreach(n => f.delete(
      new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(table,
        "manifests"), n), false))
    // purge BOTH stats sidecars of every file that no longer exists: a
    // deleted file's recorded min/max can BE an erased key, and leaving
    // it in stats/ (text lane) or colstats/ (columnar lake lane) would
    // contradict the bytes-are-gone contract (round-12, ADVICE). Kept:
    // live files and the young spared orphans (their stats stay true).
    // Both formats lead with the URL-encoded file basename.
    val surviving = live ++ spared.map(baseName).toSet
    val droppedStats = Seq("stats", "colstats").map(sub =>
      graft.sources.Manifest.rewriteSidecar(table, sub,
        ln => surviving.contains(dec(ln.split("\t", -1)(0))))).sum
    // dropped generations' meta bindings (lake lane) go with them
    val metaDir = new org.apache.hadoop.fs.Path(table, "meta")
    if (f.exists(metaDir)) dropped.foreach(n =>
      f.delete(new org.apache.hadoop.fs.Path(metaDir, n), false))
    // HEAD now points at exactly the kept snapshots — the dropped names
    // no longer exist, and a stale pointer would refuse every read
    graft.sources.Manifest.writeHead(table, keep)
    ExpireReport(dropped, deleted, live.size, spared, droppedStats)
  }

  /** [[expireSnapshots]] keeping the table's CURRENT version: resolves
    * the HEAD pointer (refusing when there is none — expiry without a
    * pinned current version would have to guess what to keep). The
    * everyday retention call: after [[eraseKeys]] swapped HEAD to the
    * post-delete generation, this purges everything the current table
    * no longer references.
    */
  def expireSnapshots(table: String): ExpireReport =
    expireSnapshots(table, graft.sources.Manifest.headOf(table)
      .getOrElse(throw new IllegalStateException(
        s"$table has no HEAD pointer — pass the kept snapshot set " +
          "explicitly")))
}
