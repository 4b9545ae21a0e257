package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector generating a deterministic synthetic document
  * corpus (`spark.read.format("graft-docgen").option("rows", n)`) — the
  * dbgen-style source a 100 TB pipeline needs to smoke-test itself at any
  * scale WITHOUT storing petabytes of fixture data. Every value is a pure
  * function of `doc_id`, so two reads (any partitioning, any cluster)
  * produce the identical corpus.
  *
  * This is the full V2 read surface, honestly implemented:
  *  - `planInputPartitions` splits the id range into `partitions`
  *    contiguous slices — generation is embarrassingly parallel and scales
  *    with the executor count, never the driver;
  *  - `SupportsPushDownRequiredColumns`: unprojected columns are never
  *    generated (reading ids off a trillion-row corpus costs no text
  *    synthesis at all);
  *  - `SupportsPushDownFilters`: range/equality predicates on `doc_id`
  *    clamp the generated id range, and slices outside it are SKIPPED at
  *    planning time (the V2 analogue of partition pruning) — residual
  *    predicates stay in the plan for Spark to re-check.
  *
  * Also readable as a micro-batch STREAM (`spark.readStream.format(
  * "graft-docgen")`): the offset is the next doc_id, batches advance by
  * `rowsPerBatch`, and AvailableNow drains the remainder — a replayable,
  * checkpoint-recoverable fixture stream for exactly-once sink testing.
  *
  * Options: `rows` (corpus size, default 1000), `partitions` (read
  * parallelism, default 8), `rowsPerBatch` (streaming batch size,
  * default 1000).
  */
class DocGenSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-docgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocGen.schema
  // Without this, Spark rejects any user-supplied .schema(...) before
  // getTable is ever called and the validation below could never fire —
  // accepting external metadata is what routes the user schema here.
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // A user-supplied .schema(...) must be validated, not silently dropped:
    // the generator produces exactly DocGen.schema, so anything else would
    // read garbage. (Spark passes inferSchema's result here on the normal
    // path, so this only fires on an explicit mismatching user schema.)
    require(schema == DocGen.schema,
      s"graft-docgen generates a fixed schema ${DocGen.schema.simpleString}; " +
        s"user-specified schema ${schema.simpleString} does not match")
    // getTable receives the case-PRESERVED map; option("Rows", ...) must
    // mean rows, same as the CaseInsensitiveStringMap inferSchema gets
    val opts = new CaseInsensitiveStringMap(properties)
    new DocGenTable(
      opts.getOrDefault("rows", "1000").toLong,
      opts.getOrDefault("partitions", "8").toInt,
      opts.getOrDefault("rowsPerBatch", "1000").toLong)
  }
}

private[sources] class DocGenTable(rows: Long, partitions: Int,
                                   rowsPerBatch: Long)
    extends Table with SupportsRead {
  require(rows >= 0 && partitions > 0 && rowsPerBatch > 0,
    s"need rows >= 0, partitions > 0, rowsPerBatch > 0; " +
      s"got rows=$rows partitions=$partitions rowsPerBatch=$rowsPerBatch")
  override def name(): String = s"graft-docgen($rows)"
  override def schema(): StructType = DocGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(rows, partitions, rowsPerBatch)
}

private[sources] class DocGenScanBuilder(rows: Long, partitions: Int,
                                         rowsPerBatch: Long)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = DocGen.schema
  private var pushed: Array[Filter] = Array.empty
  // generated ids live in [lo, hi); filters only ever shrink the range
  private var lo: Long = 0L
  private var hi: Long = rows

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // saturating successor: v+1 on Long.MaxValue must not wrap to MinValue
  // (doc_id > MaxValue would otherwise scan everything, <= MaxValue nothing)
  private def succ(v: Long): Long =
    if (v == Long.MaxValue) Long.MaxValue else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, succ(v)); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, succ(v)); true
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, succ(v)); true
      case _ => false
    }
    pushed = accepted
    rejected // residuals: Spark keeps evaluating these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new DocGenScan(rows, partitions, rowsPerBatch, required, pushed, lo, hi)
}

private[sources] class DocGenScan(rows: Long, partitions: Int,
                                  rowsPerBatch: Long,
                                  required: StructType, pushed: Array[Filter],
                                  lo: Long, hi: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docgen rows=$rows, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  /** Split [from, until) ∩ [lo, hi) into ≤ `partitions` even slices. */
  private[sources] def sliceRange(from: Long, until: Long): Array[InputPartition] = {
    val n = until - from
    val step = math.max(1L, (n + partitions - 1) / partitions)
    (from until until by step)
      .map(s => (math.max(s, lo), math.min(s + step, math.min(hi, until))))
      .filter { case (s, e) => s < e } // slices outside the pushed range: skipped
      .map { case (s, e) => DocGenPartition(s, e): InputPartition }
      .toArray
  }

  override def planInputPartitions(): Array[InputPartition] = sliceRange(0L, rows)
  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required.fieldNames)

  /** Streaming mode: the same corpus delivered as a bounded micro-batch
    * stream, `rowsPerBatch` ids per batch. The offset IS the next doc_id,
    * so recovery from a checkpoint replays exactly the unconsumed suffix —
    * determinism makes redelivery idempotent by construction (the
    * replayable fixture stream for exactly-once sink tests at any size).
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new DocGenMicroBatchStream(this, rows, rowsPerBatch)
}

private[sources] case class DocGenOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class DocGenMicroBatchStream(scan: DocGenScan, rows: Long,
                                              rowsPerBatch: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private var drainAll = false // AvailableNow: one batch to the end
  override def prepareForTriggerAvailableNow(): Unit = drainAll = true

  override def initialOffset(): Offset = DocGenOffset(0L)
  // admission control: the engine hands us the last committed offset, so
  // pagination is stateless here and restart-safe by construction
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[DocGenOffset].n
    DocGenOffset(if (drainAll) rows else math.min(rows, s + rowsPerBatch))
  }
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "admission-control source: latestOffset(start, limit)")
  override def deserializeOffset(json: String): Offset =
    DocGenOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    scan.sliceRange(start.asInstanceOf[DocGenOffset].n,
      end.asInstanceOf[DocGenOffset].n)
  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class DocGenPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class DocGenReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new DocGenReader(p.asInstanceOf[DocGenPartition], fields)
}

private[sources] class DocGenReader(p: DocGenPartition, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private var id = p.start - 1
  // resolve field names to int codes ONCE: the per-row loop below is the
  // connector's only hot path and must not re-dispatch on strings
  private val codes: Array[Int] = fields.map {
    case "doc_id" => 0
    case "text" => 1
    case "lang" => 2
    case "source" => 3
    case "n_chars" => 4
  }
  private val needsText = codes.exists(c => c == 1 || c == 4)

  override def next(): Boolean = { id += 1; id < p.end }

  override def get(): InternalRow = {
    // text is synthesized once per row even when both text and n_chars are
    // projected; when neither is, it is never synthesized at all
    val text = if (needsText) DocGen.text(id) else null
    val vals = new Array[Any](codes.length)
    var i = 0
    while (i < codes.length) {
      vals(i) = codes(i) match {
        case 0 => id
        case 1 => UTF8String.fromString(text)
        case 2 => UTF8String.fromString(DocGen.lang(id))
        case 3 => UTF8String.fromString(DocGen.source(id))
        case 4 => text.length.toLong
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }
  override def close(): Unit = ()
}

/** The deterministic content functions — pure in `doc_id` (splitmix64-style
  * integer mixing, no RNG state), shared by every partition reader.
  */
private[sources] object DocGen {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val langs = Array("en", "es", "fr", "de", "zh")
  private val vocab: Array[String] = {
    val syllables = Array("ka", "lo", "mi", "tu", "ren", "da", "so", "ve")
    (0 until 64).map(i =>
      syllables(i % 8) + syllables((i / 8) % 8) + (if (i % 3 == 0) "n" else ""))
      .toArray
  }

  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def h(id: Long, salt: Long): Long = mix(id * 31 + salt)

  // >>> 33 keeps the operand non-negative, so % is a true modulus
  def lang(id: Long): String = langs(((h(id, 1) >>> 33) % 5).toInt)
  def source(id: Long): String = s"src${((h(id, 2) >>> 33) % 20)}"
  def text(id: Long): String = {
    val n = 5 + ((h(id, 3) >>> 33) % 28).toInt
    val sb = new StringBuilder
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(vocab(((h(id, 100 + j) >>> 33) % 64).toInt))
      j += 1
    }
    sb.toString
  }
}
