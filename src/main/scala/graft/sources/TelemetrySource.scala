package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY §2.1 S1/S3 depth — a full DataSource V2 connector: the shape a
  * live WCS/REST fetcher would take (each partition fetches and decodes
  * its slice where the executor runs), here generating deterministic
  * synthetic telemetry so it is testable offline.
  *
  *   spark.read.format("graft.sources.TelemetrySource")
  *     .option("rows", 10000).option("partitions", 8).load()
  *
  * Implements the two V2 optimizations that matter at 100 TB:
  *   - column pruning (SupportsPushDownRequiredColumns): a projection of
  *     2 of 4 columns generates only those 2
  *   - filter pushdown on the id column (SupportsPushDownFilters):
  *     pushed range predicates shrink each partition's generation range
  *     at the SOURCE, the analogue of parquet row-group skipping —
  *     accepted filters are removed from the Spark-side plan entirely
  *
  * Planning yields `partitions` input splits, so parallelism is a
  * first-class source property, not an afterthought repartition.
  */
class TelemetrySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = TelemetrySource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TelemetryTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object TelemetrySource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sensor", StringType, nullable = false),
    StructField("ts_epoch_s", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Deterministic row kernel — the stand-in for fetch+decode. */
  def valueAt(id: Long): Double = {
    val h = (id * 2654435761L) & 0xffffffffL
    math.round((h.toDouble / 0xffffffffL.toDouble) * 10000.0) / 100.0
  }
  def sensorAt(id: Long): String = s"sensor_${id % 16}"
  def tsAt(id: Long): Long = 1704067200L + id * 60
}

class TelemetryTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"telemetry($rows)"
  override def schema(): StructType = TelemetrySource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TelemetryScanBuilder(rows, partitions,
      options.getLong("rowsPerBatch", math.max(1L, rows / 4)))
}

class TelemetryScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {

  private var requiredSchema: StructType = TelemetrySource.schema
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[aggregate.Aggregation] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  /** Accept id-range filters (they shrink the generation range); reject
    * everything else back to Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = accepted
    rejected // Spark re-applies only these
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** Aggregate pushdown (the V2 analogue of answering count/min/max from
    * parquet footer stats): an ungrouped COUNT(*) / MIN(id) / MAX(id)
    * over the (filter-narrowed) id range is CLOSED-FORM — count is the
    * range span, min/max its ends — so the source answers it without
    * generating a single row. Anything else is declined back to Spark. */
  private def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference =>
        nr.fieldNames.sameElements(Array("id"))
      case _ => false
    }

  private def canAnswer(agg: aggregate.Aggregation): Boolean =
    agg.groupByExpressions().isEmpty && agg.aggregateExpressions().nonEmpty &&
      agg.aggregateExpressions().forall {
        case _: aggregate.CountStar => true
        case m: aggregate.Min => isId(m.column)
        case m: aggregate.Max => isId(m.column)
        case _ => false
      }

  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean = canAnswer(agg)

  override def pushAggregation(agg: aggregate.Aggregation): Boolean = {
    if (!canAnswer(agg)) return false
    pushedAgg = Some(agg)
    true
  }

  override def build(): Scan = pushedAgg match {
    case Some(agg) => new TelemetryAggScan(agg, math.max(lo, 0L), math.max(hi, lo))
    case None =>
      new TelemetryScan(requiredSchema, math.max(lo, 0L), math.max(hi, lo), partitions, rowsPerBatch)
  }
}

/** The pushed-aggregate scan: ONE partition, ONE row, zero generated
  * rows — count/min/max answered from the range arithmetic alone. */
class TelemetryAggScan(agg: aggregate.Aggregation, lo: Long, hi: Long) extends Scan with Batch {
  override def readSchema(): StructType = StructType(agg.aggregateExpressions().map {
    case _: aggregate.CountStar => StructField("count(*)", LongType, nullable = false)
    case _: aggregate.Min => StructField("min(id)", LongType, nullable = true)
    case _: aggregate.Max => StructField("max(id)", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"TelemetryAggScan[$lo,$hi) pushed=${agg.aggregateExpressions().mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(TelemetryPartition(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new TelemetryAggReaderFactory(agg)
}

class TelemetryAggReaderFactory(agg: aggregate.Aggregation) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TelemetryPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val first = !emitted; emitted = true; first }
      override def get(): InternalRow = {
        val span = math.max(0L, p.end - p.start)
        InternalRow.fromSeq(agg.aggregateExpressions().toSeq.map {
          case _: aggregate.CountStar => span: java.lang.Long
          case _: aggregate.Min => if (span > 0) (p.start: java.lang.Long) else null
          case _: aggregate.Max => if (span > 0) (p.end - 1: java.lang.Long) else null
        })
      }
      override def close(): Unit = ()
    }
  }
}

class TelemetryScan(requiredSchema: StructType, lo: Long, hi: Long, partitions: Int,
    rowsPerBatch: Long = Long.MaxValue)
    extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TelemetryMicroBatchStream(requiredSchema, lo, hi, partitions, rowsPerBatch)
  override def description(): String = s"TelemetryScan[$lo,$hi) cols=${requiredSchema.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, partitions)
    val span = math.max(0L, hi - lo)
    (0 until n).map { p =>
      val start = lo + span * p / n
      val end = lo + span * (p + 1) / n
      TelemetryPartition(start, end): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TelemetryReaderFactory(requiredSchema)
}

case class TelemetryPartition(start: Long, end: Long) extends InputPartition

class TelemetryReaderFactory(requiredSchema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TelemetryPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        // generate ONLY the pruned columns
        val values = requiredSchema.fieldNames.map {
          case "id"         => id: java.lang.Long
          case "sensor"     => UTF8String.fromString(TelemetrySource.sensorAt(id))
          case "ts_epoch_s" => TelemetrySource.tsAt(id): java.lang.Long
          case "value"      => TelemetrySource.valueAt(id): java.lang.Double
        }
        InternalRow.fromSeq(values.toSeq)
      }
      override def close(): Unit = ()
    }
  }
}

/** S1 × T depth — the custom connector's STREAMING read path: the same
  * deterministic telemetry served as a rate-limited micro-batch stream.
  * Offsets are plain row ids; each trigger advances the available offset
  * by `rowsPerBatch` (the maxFilesPerTrigger analogue), and
  * planInputPartitions splits the [start, end) offset range across the
  * configured partitions — so a live fetcher would pull its slice where
  * the executor runs, exactly like the batch path. Offsets are
  * checkpointable (json = the row id), making recovery exactly-once:
  * re-planning [committed, end) regenerates identical rows.
  */
class TelemetryMicroBatchStream(requiredSchema: StructType, lo: Long, hi: Long,
    partitions: Int, rowsPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class RowOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }
  // rate limit: each latestOffset() call exposes one more batch worth
  private var planned: Long = lo

  override def initialOffset(): Offset = RowOffset(lo)
  override def latestOffset(): Offset = {
    planned = math.min(hi, math.max(planned, lo) + rowsPerBatch)
    RowOffset(planned)
  }
  override def deserializeOffset(json: String): Offset = RowOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RowOffset].v
    val e = end.asInstanceOf[RowOffset].v
    val n = math.max(1, partitions)
    val span = math.max(0L, e - s)
    (0 until n).map { p =>
      TelemetryPartition(s + span * p / n, s + span * (p + 1) / n): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TelemetryReaderFactory(requiredSchema)
}
