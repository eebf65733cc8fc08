package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-documents DataSourceV2 — the "plug a custom
  * format into the engine" extension point (connector API), complementing
  * the parquet scans (S1-S3), in-memory sources (S6), and the generator
  * tool (S5). The reference's equivalent surface is its row→case-class
  * projection layer (`DataReader.scala:14-36`); DSv2 is where that lives
  * in a Spark-native engine.
  *
  * Scale shape: `partitions` independent splits, each generating its row
  * range from a pure integer mix of (seed, row id) — no driver-side data,
  * no shuffle, embarrassingly parallel like any real columnar source.
  * Implements `SupportsPushDownRequiredColumns`: a projection that needs
  * only `doc_id` never materializes the text (PlanSpec-style test asserts
  * the scan's output columns).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.SyntheticDocsSource")
  *   .option("rows", 10000).option("partitions", 8).option("seed", 42)
  *   .load()
  * }}}
  */
class SyntheticDocsSource extends TableProvider {
  // accept user-specified schemas (validated as projections in getTable);
  // without this Spark rejects .schema(...) before getTable ever runs
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocsSource.fullSchema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // honor a caller-supplied .schema(...) when it is a compatible
    // projection of fullSchema; reject anything else loudly — silently
    // serving fullSchema against a divergent user schema corrupts reads
    schema.fields.foreach { f =>
      val declared = SyntheticDocsSource.fullSchema.fields
        .find(_.name == f.name)
        .getOrElse(throw new IllegalArgumentException(
          s"unknown column '${f.name}': synthetic_docs serves " +
            SyntheticDocsSource.fullSchema.fieldNames.mkString(", ")))
      require(declared.dataType == f.dataType,
        s"column '${f.name}' is ${declared.dataType.simpleString}, " +
          s"requested ${f.dataType.simpleString}")
    }
    // properties keeps the caller's ORIGINAL key case (unlike the
    // CaseInsensitiveStringMap inferSchema receives) — wrap it, or
    // .option("Rows", ...) silently falls back to the default
    val opts = new CaseInsensitiveStringMap(properties)
    new SyntheticDocsSource.SynthTable(
      opts.getOrDefault("rows", "1000").toLong,
      opts.getOrDefault("partitions", "4").toInt,
      opts.getOrDefault("seed", "42").toLong,
      schema)
  }
}

object SyntheticDocsSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val langs = Array("en", "de", "es", "fr", "zh")
  private val vocab: Array[String] = Array(
    "spark", "data", "table", "join", "merge", "window", "batch", "stream",
    "vector", "agg", "group", "line", "small", "big", "slow", "fast",
    "customer", "order", "part", "query", "scan", "filter", "sort", "hash",
    "the", "a", "and", "of")

  /** 64-bit integer mix (splitmix64 finalizer) — pure, seedable,
    * partition-independent.
    */
  def mix(seed: Long, x: Long): Long = {
    var z = seed + x * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def genLang(seed: Long, id: Long): String =
    langs(((mix(seed, id * 3 + 1) % langs.length + langs.length) % langs.length).toInt)

  def genText(seed: Long, id: Long): String = {
    val h = mix(seed, id * 3 + 2)
    val n = 20 + ((h % 41 + 41) % 41).toInt
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      val w = mix(seed, id * 1024 + i)
      sb.append(vocab(((w % vocab.length + vocab.length) % vocab.length).toInt))
      i += 1
    }
    sb.toString
  }

  private class SynthTable(rows: Long, partitions: Int, seed: Long,
      declared: StructType)
      extends Table with SupportsRead {
    override def name(): String = s"synthetic_docs($rows, $partitions, $seed)"
    override def schema(): StructType = declared
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new SynthScanBuilder(rows, partitions, seed, declared)
  }

  private class SynthScanBuilder(rows: Long, partitions: Int, seed: Long,
      declared: StructType)
      extends ScanBuilder with SupportsPushDownRequiredColumns {
    private var required: StructType = declared
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    override def build(): Scan = new SynthScan(rows, partitions, seed, required)
  }

  private case class SynthRange(start: Long, end: Long, seed: Long)
      extends InputPartition

  private class SynthScan(
      rows: Long, partitions: Int, seed: Long, required: StructType)
      extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"synthetic_docs pruned=${required.fieldNames.mkString(",")}"
    override def planInputPartitions(): Array[InputPartition] = {
      val per = (rows + partitions - 1) / partitions
      (0 until partitions).map { p =>
        SynthRange(p * per, math.min(rows, (p + 1) * per), seed)
      }.filter(r => r.end > r.start).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new SynthReaderFactory(required)
  }

  private class SynthReaderFactory(required: StructType)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val r = partition.asInstanceOf[SynthRange]
      // one generator closure per REQUIRED column: pruned columns are
      // never computed, not just dropped
      val gens: Array[Long => Any] = required.fields.map { f =>
        f.name match {
          case "doc_id" => (id: Long) => id
          case "lang" => (id: Long) => UTF8String.fromString(genLang(r.seed, id))
          case "text" => (id: Long) => UTF8String.fromString(genText(r.seed, id))
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }
      }
      new PartitionReader[InternalRow] {
        private var id = r.start - 1
        override def next(): Boolean = { id += 1; id < r.end }
        override def get(): InternalRow =
          InternalRow.fromSeq(gens.map(g => g(id)).toSeq)
        override def close(): Unit = ()
      }
    }
  }
}
