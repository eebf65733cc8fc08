package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Kafka-shaped ingest test double — a file-backed partitioned commit
  * log exposed through DataSource V2 as BOTH a batch table and a
  * `MicroBatchStream` with admission control.
  *
  * The sandbox has no broker, but a 100 TB pipeline's ingest tier is
  * log-shaped, so the SOURCE CONTRACT is implemented for real and only
  * the transport is a local directory:
  *   - records are `(partition INT, offset LONG, ts LONG, key BINARY,
  *     value BINARY)` — the Kafka wire shape;
  *   - offsets are per-partition, dense, and monotone; a stream offset
  *     is the map partition→nextOffset serialized as JSON, exactly like
  *     the Kafka source's offset format;
  *   - `maxRecordsPerTrigger` bounds each microbatch via
  *     [[SupportsAdmissionControl]] (rows split across partitions
  *     proportionally to their backlog, ≥1 per non-empty backlog);
  *   - restart resumes from the checkpointed offset with no loss or
  *     re-delivery (exactly-once up to the sink), pinned in the spec.
  *
  * Storage: `<root>/meta.json` holds the partition count; partition
  * `p<i>` holds append-created segment files named
  * `<baseOffset>-<recordCount>.log`, so the listing ALONE yields every
  * partition's next offset — no data files are opened on the
  * `latestOffset` path (at scale that poll runs per trigger).
  * Segments are length-prefixed binary records; a crashed producer
  * leaves a torn file invisible (files are written to a `.tmp` name and
  * renamed, the closest a local FS gets to a commit).
  *
  * Usage: `LogTopic.create/append` to produce;
  * `spark.readStream.format("graftlog").option("path", root)` or
  * `spark.read.format("graftlog")` to consume.
  */
class LogTopicSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LogTopic.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val root = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graftlog requires option 'path'"))
    new LogTopicTable(root)
  }
}

object LogTopic {

  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true)))

  final case class Record(ts: Long, key: Array[Byte], value: Array[Byte])

  def create(root: String, partitions: Int): Unit = {
    require(partitions > 0, "partitions must be positive")
    val d = new java.io.File(root)
    d.mkdirs()
    (0 until partitions).foreach(i => new java.io.File(d, s"p$i").mkdirs())
    val w = new java.io.FileWriter(new java.io.File(d, "meta.json"))
    try w.write(s"""{"partitions":$partitions}""") finally w.close()
  }

  def partitionCount(root: String): Int = {
    val s = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(root, "meta.json").toPath), "UTF-8")
    """"partitions":(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"bad meta.json at $root"))
  }

  /** Segment files are `<baseOffset>-<count>.log`; next offset is
    * base+count of the highest-base segment (0 for an empty partition).
    */
  def nextOffset(root: String, partition: Int): Long = {
    val dir = new java.io.File(root, s"p$partition")
    val segs = Option(dir.listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case SegName(base, count) => Some((base.toLong, count.toLong))
        case _ => None
      })
    if (segs.isEmpty) 0L else segs.map { case (b, c) => b + c }.max
  }

  private val SegName = """(\d{20})-(\d+)\.log""".r

  /** Append one batch of records to one partition as a single new
    * segment (write-then-rename). Returns the batch's base offset.
    */
  def append(root: String, partition: Int, records: Seq[Record]): Long = {
    require(records.nonEmpty, "empty append")
    val base = nextOffset(root, partition)
    val dir = new java.io.File(root, s"p$partition")
    val name = f"$base%020d-${records.size}.log"
    val tmp = new java.io.File(dir, s"$name.tmp")
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp)))
    try {
      records.zipWithIndex.foreach { case (r, i) =>
        out.writeLong(base + i)
        out.writeLong(r.ts)
        writeBytes(out, r.key)
        writeBytes(out, r.value)
      }
    } finally out.close()
    if (!tmp.renameTo(new java.io.File(dir, name)))
      throw new java.io.IOException(s"rename failed for $tmp")
    base
  }

  /** Remove every committed segment (and torn `.tmp`) in one partition —
    * the producer-retry reset. A re-executed producer task truncates the
    * partitions it owns before re-appending, which makes its side effect
    * idempotent under task retry: the retry rewrites the partition from
    * scratch instead of appending a second copy. Concurrent DUPLICATE
    * attempts (speculation) would still interleave — producers own their
    * partitions exclusively and run with speculation off, the same
    * single-writer-per-partition discipline a real log's idempotent
    * producer enforces with sequence numbers.
    */
  def truncate(root: String, partition: Int): Unit = {
    val dir = new java.io.File(root, s"p$partition")
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".log") || f.getName.endsWith(".tmp"))
      .foreach(_.delete())
  }

  /** Hash-partitioned produce (murmur-free: Kafka's default partitioner
    * is key-hash mod N; any stable hash satisfies the contract).
    */
  def produce(root: String, records: Seq[Record]): Unit = {
    val n = partitionCount(root)
    records.groupBy(r => math.floorMod(util.Arrays.hashCode(r.key), n))
      .foreach { case (p, rs) => append(root, p, rs) }
  }

  private def writeBytes(out: java.io.DataOutputStream, b: Array[Byte]): Unit =
    if (b == null) out.writeInt(-1)
    else { out.writeInt(b.length); out.write(b) }

  private def readBytes(in: java.io.DataInputStream): Array[Byte] = {
    val n = in.readInt()
    if (n < 0) null
    else {
      val b = new Array[Byte](n)
      in.readFully(b)
      b
    }
  }

  /** Read one partition's records in `[from, until)`, offset order. */
  def read(root: String, partition: Int, from: Long, until: Long): Iterator[(Long, Long, Array[Byte], Array[Byte])] = {
    val dir = new java.io.File(root, s"p$partition")
    val segs = Option(dir.listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case SegName(base, count) => Some((base.toLong, count.toLong, f))
        case _ => None
      })
      .filter { case (b, c, _) => b < until && b + c > from }
      .sortBy(_._1)
    segs.iterator.flatMap { case (_, _, f) =>
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(new java.io.FileInputStream(f)))
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Byte], Array[Byte])]
      try {
        var more = true
        while (more) {
          try {
            val off = in.readLong()
            val ts = in.readLong()
            val key = readBytes(in)
            val value = readBytes(in)
            if (off >= from && off < until) rows += ((off, ts, key, value))
            if (off >= until - 1) more = false
          } catch { case _: java.io.EOFException => more = false }
        }
      } finally in.close()
      rows.iterator
    }
  }
}

private final class LogTopicTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"graftlog($root)"
  override def schema(): StructType = LogTopic.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LogScanBuilder(root, options)
}

private final class LogScanBuilder(root: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder {
  override def build(): Scan = new LogScan(root, options)
}

/** Offset = per-partition next-offset map, JSON `{"0":12,"1":7}`. */
private final case class LogOffsets(next: Map[Int, Long]) extends Offset {
  override def json(): String =
    next.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

private object LogOffsets {
  private val Entry = """"(\d+)":(\d+)""".r
  def parse(json: String): LogOffsets =
    LogOffsets(Entry.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
  def current(root: String): LogOffsets = {
    val n = LogTopic.partitionCount(root)
    LogOffsets((0 until n).map(p => p -> LogTopic.nextOffset(root, p)).toMap)
  }
  def zero(root: String): LogOffsets = {
    val n = LogTopic.partitionCount(root)
    LogOffsets((0 until n).map(_ -> 0L).toMap)
  }
}

private final case class LogSlice(root: String, partition: Int, from: Long, until: Long)
    extends InputPartition

private final class LogScan(root: String, options: CaseInsensitiveStringMap)
    extends Scan {
  override def readSchema(): StructType = LogTopic.schema
  override def description(): String = s"graftlog $root"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val end = LogOffsets.current(root)
      end.next.toSeq.sortBy(_._1).map { case (p, until) =>
        LogSlice(root, p, 0L, until): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = new LogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LogMicroBatchStream(root, options)
}

private final class LogMicroBatchStream(root: String, options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val maxPerTrigger: Option[Long] =
    Option(options.get("maxRecordsPerTrigger")).map(_.toLong)

  // Trigger.AvailableNow: the engine's wrapper IGNORES read limits for
  // sources that don't implement SupportsTriggerAvailableNow themselves
  // (it logs "read limit is ignored" and drains in one batch), so the
  // tip is captured here and every admission decision is capped at it —
  // the same contract the Kafka source implements
  @volatile private var availableNowCap: Option[LogOffsets] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(LogOffsets.current(root))

  override def initialOffset(): Offset = LogOffsets.zero(root)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  // admission-control sources get latestOffset(start, limit); the
  // no-arg form still serves any engine path that wants the true tip
  override def latestOffset(): Offset = LogOffsets.current(root)

  /** Cap the batch at the read limit, splitting the allowance across
    * partitions proportionally to backlog (every non-empty backlog
    * advances by ≥1, so one hot partition cannot starve the rest —
    * same fairness contract as Kafka's maxOffsetsPerTrigger).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LogOffsets]
    val avail = availableNowCap.getOrElse(LogOffsets.current(root))
    val lag = avail.next.map { case (p, o) =>
      p -> math.max(0L, o - from.next.getOrElse(p, 0L))
    }
    val total = lag.values.sum
    val cap = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => Long.MaxValue
    }
    if (total <= cap) avail
    else {
      val granted = lag.map { case (p, l) =>
        p -> (if (l == 0) 0L else math.max(1L, l * cap / total))
      }
      LogOffsets(from.next.map { case (p, o) =>
        p -> math.min(o + granted.getOrElse(p, 0L),
          avail.next.getOrElse(p, o))
      })
    }
  }

  override def reportLatestOffset(): Offset = LogOffsets.current(root)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LogOffsets]
    val e = end.asInstanceOf[LogOffsets]
    e.next.toSeq.sortBy(_._1).flatMap { case (p, until) =>
      val from = s.next.getOrElse(p, 0L)
      if (until > from) Some(LogSlice(root, p, from, until): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new LogReaderFactory
  override def deserializeOffset(json: String): Offset = LogOffsets.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private final class LogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[LogSlice]
    val it = LogTopic.read(s.root, s.partition, s.from, s.until)
    new PartitionReader[InternalRow] {
      private var cur: (Long, Long, Array[Byte], Array[Byte]) = _
      override def next(): Boolean = {
        if (it.hasNext) { cur = it.next(); true } else false
      }
      override def get(): InternalRow = new GenericInternalRow(
        Array[Any](s.partition, cur._1, cur._2, cur._3, cur._4))
      override def close(): Unit = ()
    }
  }
}
