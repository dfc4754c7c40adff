package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a deterministic synthetic-corpus generator.
  *
  * `spark.read.format("corpusgen").option("rows", 1e9.toLong)
  *   .option("partitions", 2048).option("seed", 7).load()`
  * yields `(doc_id BIGINT, text STRING)` with content a pure function of
  * `(doc_id, seed)` — the same rows at ANY partition count, so operator
  * results are reproducible while the scan scales to arbitrary width.
  *
  * Why it exists: benchmarking the curation/dedup operators at 100 TB
  * needs inputs far bigger than any fixture; generating them IN the scan
  * (like Spark's own `range`) costs zero storage and no ingest job, and
  * each `InputPartition` is an independent id range, so a 1000-executor
  * cluster generates in parallel with no shuffle, no small-files problem,
  * and no driver involvement beyond planning the ranges.
  *
  * The V2 surface implemented is the minimal real one — TableProvider →
  * Table(SupportsRead) → ScanBuilder → Scan/Batch → InputPartition +
  * PartitionReaderFactory — i.e. the same contract any external system
  * connector (JDBC shard reader, object-store manifest scanner) plugs
  * into Spark with.
  */
class CorpusGen extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "corpusgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CorpusGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CorpusGenTable()
}

object CorpusGen {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  // same flavor as the driver fixtures: small vocabulary, space-separated
  private val vocab: Array[String] =
    ("key agg row scan slow fast table value part hash merge batch spark " +
      "query window data column join line customer group big vector the a " +
      "order filter small").split(" ")

  /** splitmix64 — a well-known public-domain mixer; full 64-bit avalanche
    * so doc_id i and i+1 produce unrelated texts. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic text for (doc_id, seed): 20–119 vocabulary words. */
  def text(id: Long, seed: Long): String = {
    var state = mix(id ^ mix(seed))
    val n = 20 + (((state >>> 33) % 100L).toInt)
    val sb = new java.lang.StringBuilder(n * 6)
    var i = 0
    while (i < n) {
      state = mix(state)
      if (i > 0) sb.append(' ')
      sb.append(vocab(((state >>> 33) % vocab.length).toInt))
      i += 1
    }
    sb.toString
  }
}

final class CorpusGenTable extends Table with SupportsRead {
  override def name(): String = "corpusgen"
  override def schema(): StructType = CorpusGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val rows = options.getLong("rows", 1000L)
    val parts = options.getInt("partitions", 8)
    val seed = options.getLong("seed", 42L)
    new CorpusGenScanBuilder(rows, parts, seed)
  }
}

/** Honors Catalyst's column pruning (a `count(*)`/id-only scan never
  * generates text — generation is the whole cost of this source, the
  * same reason a parquet scan's `ReadSchema` matters at 100 TB) AND
  * doc_id range-filter pushdown: `doc_id BETWEEN a AND b` intersects the
  * generated id ranges, so out-of-range rows are never produced at all —
  * the DSv2 analogue of partition pruning. */
final class CorpusGenScanBuilder(rows: Long, parts: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = CorpusGen.schema
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, rest) = filters.partition {
      case GreaterThan("doc_id", v) => asLong(v).isDefined
      case GreaterThanOrEqual("doc_id", v) => asLong(v).isDefined
      case LessThan("doc_id", v) => asLong(v).isDefined
      case LessThanOrEqual("doc_id", v) => asLong(v).isDefined
      case EqualTo("doc_id", v) => asLong(v).isDefined
      case _ => false
    }
    sup.foreach {
      case GreaterThan(_, v) => lo = math.max(lo, asLong(v).get + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, asLong(v).get)
      case LessThan(_, v) => hi = math.min(hi, asLong(v).get)
      case LessThanOrEqual(_, v) => hi = math.min(hi, asLong(v).get + 1)
      case EqualTo(_, v) =>
        lo = math.max(lo, asLong(v).get); hi = math.min(hi, asLong(v).get + 1)
      case _ => ()
    }
    accepted = sup
    rest // residual filters Spark must still evaluate
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    new CorpusGenScan(rows, parts, seed, required, lo, hi)
}

final class CorpusGenScan(rows: Long, parts: Int, seed: Long,
    required: StructType, lo: Long, hi: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"corpusgen(rows=$rows, partitions=$parts, seed=$seed, " +
      s"cols=${required.fieldNames.mkString(",")}, range=[$lo,$hi))"

  /** Contiguous id ranges — equal-sized, so no generation skew — each
    * clamped to the pushed-down [lo, hi) id window. */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = math.max(1, parts)
    (0 until p).flatMap { i =>
      val rlo = math.max(rows * i / p, lo)
      val rhi = math.min(rows * (i + 1) / p, hi)
      if (rlo < rhi)
        Some(CorpusRange(rlo, rhi, seed, required.fieldNames): InputPartition)
      else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    CorpusReaderFactory
}

final case class CorpusRange(lo: Long, hi: Long, seed: Long,
    cols: Array[String]) extends InputPartition

object CorpusReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[CorpusRange]
    new PartitionReader[InternalRow] {
      private var cur = r.lo - 1
      override def next(): Boolean = { cur += 1; cur < r.hi }
      override def get(): InternalRow = {
        val vals = r.cols.map {
          case "doc_id" => cur.asInstanceOf[AnyRef]
          case "text" => UTF8String.fromString(CorpusGen.text(cur, r.seed))
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
