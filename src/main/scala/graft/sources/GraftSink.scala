package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A complete DataSource V2 WRITE connector — the commit-protocol half of
  * the extension surface `graft-synth` covers for reads (the reference
  * writes via coalesce(1) CSV only, Proof.scala:139-150; a custom sink
  * with transactional publish is [EXT] north-star surface).
  *
  * `graft-sink` writes rows as CSV through the full V2 write contract:
  *
  *   - each task's [[DataWriter]] streams rows to a STAGED file
  *     (`_staging/<queryId>-p<partition>-a<attempt>.csv`); nothing is
  *     visible to readers while any task is running;
  *   - task commit closes the staged file and returns its name as the
  *     [[WriterCommitMessage]]; task abort deletes it — a failed or
  *     speculative attempt can never publish;
  *   - job [[BatchWrite.commit]] atomically PUBLISHES exactly the staged
  *     files named in the commit messages (move into the target dir +
  *     `_SUCCESS` manifest); job abort deletes the whole staging dir.
  *
  * This is the same two-phase shape every production sink (file commit
  * protocols, Iceberg/Delta snapshot commits) implements: correctness
  * under task retry, speculation, and job failure comes from "stage
  * per-attempt, publish only driver-acknowledged attempts", not from
  * tasks writing to final locations.
  *
  * Supported column types: long/int/double/string (CSV cells, `|`
  * separated — the driver-side round-trip query re-reads with an explicit
  * schema).
  */
class GraftSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sink"
  // write-only source: the schema comes from the DataFrame being written
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil)
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SinkTable(schema, properties.get("path"))
}

class SinkTable(writeSchema: StructType, path: String) extends Table with SupportsWrite {
  require(path != null, "graft-sink requires a 'path' option")
  override def name(): String = s"graft_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SinkWriteBuilder(info.schema(), path, info.queryId())
}

class SinkWriteBuilder(schema: StructType, path: String, queryId: String)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new SinkBatchWrite(schema, path, queryId)
  }
}

case class SinkStagedFile(name: String) extends WriterCommitMessage

class SinkBatchWrite(schema: StructType, path: String, queryId: String)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new SinkWriterFactory(schema, path, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Path.of(path)
    java.nio.file.Files.createDirectories(dir)
    val published = messages.collect { case SinkStagedFile(n) =>
      val from = dir.resolve("_staging").resolve(n)
      val to = dir.resolve(n.replace(".csv", "") + ".part.csv")
      java.nio.file.Files.move(from, to,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      to.getFileName.toString
    }
    java.nio.file.Files.writeString(dir.resolve("_SUCCESS"),
      published.sorted.mkString("\n"))
    deleteStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = deleteStaging()

  private def deleteStaging(): Unit = {
    val st = java.nio.file.Path.of(path, "_staging")
    if (java.nio.file.Files.exists(st)) {
      st.toFile.listFiles().foreach(_.delete())
      java.nio.file.Files.deleteIfExists(st)
    }
  }
}

class SinkWriterFactory(schema: StructType, path: String, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SinkWriter(schema, path, queryId, partitionId, taskId)
}

class SinkWriter(schema: StructType, path: String, queryId: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  // attempt-unique staged name: a speculative or retried attempt stages
  // its OWN file; only the attempt whose message reaches the driver is
  // ever published
  private val name = s"$queryId-p$partitionId-a$taskId.csv"
  private val staging = java.nio.file.Path.of(path, "_staging")
  java.nio.file.Files.createDirectories(staging)
  private val out = java.nio.file.Files.newBufferedWriter(staging.resolve(name))

  override def write(row: InternalRow): Unit = {
    val cells = schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case LongType    => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType  => row.getDouble(i).toString
        case StringType  => row.getUTF8String(i).toString
        case dt => throw new UnsupportedOperationException(s"graft-sink: $dt")
      }
    }
    out.write(cells.mkString("|")); out.write("\n")
  }

  override def commit(): WriterCommitMessage = { out.close(); SinkStagedFile(name) }

  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(staging.resolve(name))
  }

  override def close(): Unit = ()
}
