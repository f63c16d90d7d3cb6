package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 connector — the Spark extension surface the
  * catalog did not yet exercise (the reference reads only text files,
  * `Proof.scala:95-105`; custom connectors are [EXT] north-star surface).
  *
  * `graft-synth` serves a deterministic synthetic table
  * (id, bucket, score, word) generated row-locally from the row id (the
  * q115/q216 portable md5 uniform, so a DuckDB oracle can regenerate the
  * identical rows), and implements the three scan optimizations a real
  * connector owes the optimizer:
  *
  *   - **filter pushdown** (`SupportsPushDownFilters`): id-range
  *     predicates narrow the generated range at the SOURCE; accepted
  *     filters are consumed (not re-evaluated post-scan), everything
  *     else is returned as residual for Spark to apply.
  *   - **partition pruning**: the row space is split into a fixed
  *     partition grid (as a file source splits files); grid cells wholly
  *     outside the pushed range are never planned — the DSv2 analogue of
  *     skipping parquet row groups.
  *   - **column pruning** (`SupportsPushDownRequiredColumns`): the
  *     reader materializes ONLY requested fields in requested order —
  *     unrequested columns cost nothing (the md5 for `score` is skipped
  *     entirely when `score` is pruned).
  *
  * At 100 TB the same shape holds for any generated/external system scan:
  * pushdown turns a full-corpus read into a range read, and the partition
  * grid gives Spark the parallelism units to schedule.
  */
class SynthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("word", StringType, nullable = false)))

  val words: Array[String] =
    Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")

  /** Portable md5 uniform in (0,1) over "synth:<id>" — dyadic, exact in
    * double, regenerable in DuckDB.
    */
  def mdUniform(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"synth:$id".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val v = java.lang.Long.parseLong(hex.substring(0, 13), 16)
    (v.toDouble + 0.5) / 4503599627370496.0
  }
}

class SynthTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts)
}

class SynthScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var accepted = Array.empty[Filter]
  private var required: StructType = SynthSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (acc, residual) = filters.partition {
      case GreaterThan("id", _: Number) => true
      case GreaterThanOrEqual("id", _: Number) => true
      case LessThan("id", _: Number) => true
      case LessThanOrEqual("id", _: Number) => true
      case EqualTo("id", _: Number) => true
      case _ => false
    }
    acc.foreach {
      case GreaterThan(_, v: Number)        => lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual(_, v: Number) => lo = math.max(lo, v.longValue)
      case LessThan(_, v: Number)           => hi = math.min(hi, v.longValue)
      case LessThanOrEqual(_, v: Number)    => hi = math.min(hi, v.longValue + 1)
      case EqualTo(_, v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case _ => ()
    }
    accepted = acc
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new SynthScan(rows, parts, lo, hi, required)
}

case class SynthPartition(start: Long, end: Long) extends InputPartition

class SynthScan(rows: Long, parts: Int, lo: Long, hi: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth pushedIdRange=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  /** Fixed grid over [0, rows), cells intersected with the pushed range;
    * cells wholly outside are pruned (never planned, never scheduled).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val chunk = math.max(1L, (rows + parts - 1) / parts)
    (0L until rows by chunk).flatMap { s =>
      val e = math.min(s + chunk, rows)
      val cs = math.max(s, lo); val ce = math.min(e, hi)
      if (cs < ce) Some(SynthPartition(cs, ce)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

class SynthReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SynthReader(partition.asInstanceOf[SynthPartition], required)
}

class SynthReader(p: SynthPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private var cur = p.start - 1
  private val fields = required.fieldNames

  override def next(): Boolean = { cur += 1; cur < p.end }

  override def get(): InternalRow = {
    val vals: Array[Any] = fields.map {
      case "id"     => cur
      case "bucket" => (cur % 97).toInt
      case "score"  => SynthSource.mdUniform(cur)
      case "word"   => UTF8String.fromString(SynthSource.words((cur % 8).toInt))
      case other    => throw new IllegalArgumentException(s"unknown column $other")
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = ()
}
