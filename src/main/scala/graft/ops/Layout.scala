package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * parquet footers carry per-file/per-row-group min/max for every column,
  * and the scan skips a file whose range misses the predicate. A sort on
  * one column makes THAT column's ranges tight and leaves every other
  * column's range at full width; interleaving the bits of several columns
  * into one Z-value (a space-filling curve) and range-partitioning on it
  * makes EVERY interleaved column's per-file range narrow at once, so
  * selective predicates on any clustered dimension prune.
  */
object Layout {

  /** Z-value (Morton code) of `cols`: the low `bits` bits of each column
    * bit-interleaved, column 0 in the lowest lanes. Pure integer
    * shift/mask arithmetic — stays inside whole-stage codegen and is
    * reproducible in any engine with `>>`, `&`, `<<` (oracle-checked in
    * SparkEntry q90).
    *
    * Columns must be non-negative integers; values at or above 2^bits
    * saturate to the top cell of their dimension (clamping, not wrapping,
    * keeps the curve monotone at the edges so range partitioning still
    * groups large outliers together).
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits*cols must fit a positive long, got $bits*${cols.size}")
    val n = cols.size
    val max = (1L << bits) - 1
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(
      shiftrightunsigned(least(c.cast("long"), lit(max)), b).bitwiseAND(lit(1L)),
      b * n + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Cluster `df` into `numPartitions` output partitions along the Z-order
    * curve of `cols`, each partition internally Z-sorted — the layout to
    * `write.parquet` so later scans prune on any of the clustered columns.
    *
    * One range-partitioning shuffle (its sampler reads only the Z-value),
    * then a local sort; no global sort, no driver-side work, so the cost
    * profile is identical to `repartitionByRange` at any scale. The helper
    * column is projected away AFTER the local sort, which preserves row
    * order (a projection adds no exchange).
    */
  def zOrderBy(df: DataFrame, cols: Seq[Column], numPartitions: Int,
               bits: Int = 16): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be > 0, got $numPartitions")
    df.withColumn("__z", zValue(cols, bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Compact a parquet directory's small files into `dest` at roughly
    * `targetBytes` per file — the table-maintenance pass that keeps a
    * streaming or incremental sink scannable. Micro-batch sinks and
    * per-partition appends accrete thousands of KB-sized files; at 100 TB
    * the resulting footer/open-file overhead dominates scan time long
    * before data volume does.
    *
    * File count comes from the source's actual on-disk bytes (driver-side
    * FS metadata listing, no data read); rows move through one
    * round-robin repartition. Pass `clusterBy` to restore (or establish)
    * Z-order clustering in the same rewrite — compaction is the natural
    * moment to fix layout, since the data is being rewritten anyway.
    * Writes to a separate `dest` so the swap is an atomic rename/pointer
    * flip for the caller, never a read-and-overwrite of the source.
    */
  def compactTo(spark: SparkSession, src: String, dest: String,
                targetBytes: Long = 128L << 20,
                clusterBy: Seq[Column] = Nil): Long = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val p = new Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // compare FULLY-QUALIFIED paths: "/t" vs "file:///t" vs "/x/../t" are
    // the same directory, and letting one through would have Overwrite
    // delete the source out from under its own lazy read
    require(fs.makeQualified(p) != fs.makeQualified(new Path(dest)),
      "compactTo writes to a separate destination; compact-in-place would " +
        "read and clobber the same files")
    val bytes = fs.getContentSummary(p).getLength
    val nFilesL = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    require(nFilesL <= Int.MaxValue,
      s"targetBytes=$targetBytes yields $nFilesL output files for $bytes " +
        "bytes — raise targetBytes (partition counts are Int-bounded)")
    val nFiles = nFilesL.toInt
    val df = spark.read.parquet(src)
    val arranged =
      if (clusterBy.nonEmpty) zOrderBy(df, clusterBy, nFiles)
      else df.repartition(nFiles)
    arranged.write.mode(SaveMode.Overwrite).parquet(dest)
    nFiles
  }
}
