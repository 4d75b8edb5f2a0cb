package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSource V2 micro-batch source for an append-only changelog file —
  * the Spark-native counterpart of the reference's binlog reader
  * (reference: reader/MySQLBinlogReader.scala:63-123 — a single-threaded
  * `BinaryLogClient` pushing ordered events into a backpressured queue).
  *
  * Mapping:
  *   - the binlog file          → an append-only text log, one CSV event
  *     per line `pos,tbl,pk,op,tsMillis,value` (a binlog IS a sequential
  *     log; a single ordered reader is the semantic, reference
  *     reader/BinlogReader.scala:10-13)
  *   - `BinlogPosition`         → [[LineOffset]] (line count consumed) —
  *     the Structured Streaming `Offset` that checkpoint restart resumes
  *     from, replacing the reference's cdc_offsets table
  *     (coordinator/MySQLOffsetStore.scala:98-141)
  *   - reader queue backpressure (1000-event buffer) → admission control:
  *     `maxPerBatch` caps each micro-batch (reference
  *     MySQLBinlogReader.scala:27,69)
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-binlog")
  *     .option("path", "/data/changelog.log")
  *     .option("maxPerBatch", "1000").load()
  * }}}
  */
class BinlogFileSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-binlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = BinlogFileSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table = {
    val opts = properties.asScala
    new BinlogTable(
      opts.getOrElse("path", throw new IllegalArgumentException("graft-binlog requires 'path'")),
      opts.get("maxPerBatch").map(_.toLong).getOrElse(Long.MaxValue))
  }
}

object BinlogFileSource {
  /** The changelog envelope (ts carried as epoch millis). */
  val schema: StructType = StructType(Seq(
    StructField("tbl", StringType),
    StructField("pk", LongType),
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("pos", LongType),
    StructField("value", DoubleType)))

  def renderLine(tbl: String, pk: Long, op: String, tsMs: Long, pos: Long, value: Double): String =
    s"$pos,$tbl,$pk,$op,$tsMs,$value"

  private[sources] def countLines(path: String): Long = {
    if (!Files.exists(Paths.get(path))) 0L
    else {
      val s = Files.lines(Paths.get(path))
      try s.count() finally s.close()
    }
  }
}

private[sources] class BinlogTable(path: String, maxPerBatch: Long) extends Table with SupportsRead {
  override def name(): String = s"graft-binlog($path)"
  override def schema(): StructType = BinlogFileSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BinlogFileSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new BinlogMicroBatchStream(path, maxPerBatch)
      }
    }
}

/** Offset = number of lines fully consumed (total order, like a binlog
  * file position).
  */
case class LineOffset(lines: Long) extends Offset {
  override def json(): String = lines.toString
}

private[sources] class BinlogMicroBatchStream(path: String, maxPerBatch: Long)
  extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = LineOffset(0L)

  /** Basic-API entry point; the engine uses the admission-control
    * overload below when SupportsAdmissionControl is implemented.
    */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  /** Next batch end: available lines, admission-capped relative to the
    * batch START offset (reader-queue backpressure analogue; correct
    * across checkpoint restarts because the engine supplies the start).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LineOffset].lines
    val avail = BinlogFileSource.countLines(path)
    val cap = limit match {
      case m: ReadMaxRows => math.min(avail, s + m.maxRows())
      case _ => avail
    }
    LineOffset(math.max(s, cap))
  }

  override def getDefaultReadLimit: ReadLimit =
    if (maxPerBatch == Long.MaxValue) ReadLimit.allAvailable() else ReadLimit.maxRows(maxPerBatch)

  override def reportLatestOffset(): Offset = LineOffset(BinlogFileSource.countLines(path))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LineOffset].lines
    val e = end.asInstanceOf[LineOffset].lines
    if (e <= s) Array.empty else Array(BinlogInputPartition(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory = new BinlogReaderFactory

  override def deserializeOffset(json: String): Offset = LineOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

private[sources] case class BinlogInputPartition(path: String, startLine: Long, endLine: Long)
  extends InputPartition

private[sources] class BinlogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BinlogInputPartition]
    new PartitionReader[InternalRow] {
      private val stream = Files.lines(Paths.get(p.path), StandardCharsets.UTF_8)
      private val it = stream.skip(p.startLine).limit(p.endLine - p.startLine).iterator()
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          val parts = it.next().split(",", 6)
          current = InternalRow(
            UTF8String.fromString(parts(1)),
            parts(2).toLong,
            UTF8String.fromString(parts(3)),
            parts(4).toLong,
            parts(0).toLong,
            parts(5).toDouble)
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = stream.close()
    }
  }
}
