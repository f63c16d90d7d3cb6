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
  *   - each task's [[DataWriter]] streams rows to a STAGED file under a
  *     staging dir NAMESPACED BY JOB
  *     (`_staging/<queryId>/p<partition>-a<attempt>.csv`); nothing is
  *     visible to readers while any task is running, and two concurrent
  *     jobs writing the same path can never touch each other's staged
  *     files (round-8 advice: a shared _staging dir let one job's
  *     commit/abort delete another's stage);
  *   - task commit closes the staged file and returns its name as the
  *     [[WriterCommitMessage]]; task abort deletes it — a failed or
  *     speculative attempt can never publish;
  *   - job [[BatchWrite.commit]] moves exactly the staged files named in
  *     the commit messages into the target dir, then publishes the
  *     `_SUCCESS` manifest via write-to-staging + ATOMIC_MOVE rename —
  *     the manifest rename is the job's single atomic publish point;
  *     job abort deletes only this job's staging subtree.
  *
  * READER CONTRACT: `_SUCCESS` lists exactly the files of the LATEST
  * committed job; readers must select the files it names (as q290 does),
  * never glob `*.part.csv` — the directory accretes parts across jobs
  * (append-only data files; the manifest is the pointer swap). A driver
  * crash between file moves and the manifest rename leaves orphan parts
  * that no manifest names — invisible to manifest readers, but NOT
  * self-reclaiming: published names embed the per-job queryId, so no
  * later job ever overwrites them (round-9 advice). They are a pure
  * disk leak until out-of-band maintenance deletes every `*.part.csv`
  * absent from the current `_SUCCESS` while no job is in flight —
  * in-commit GC is deliberately omitted because it would race a
  * concurrent job between ITS file moves and ITS manifest rename.
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
    val staging = dir.resolve("_staging").resolve(queryId)
    java.nio.file.Files.createDirectories(dir)
    val published = messages.collect { case SinkStagedFile(n) =>
      val to = dir.resolve(s"$queryId-${n.replace(".csv", "")}.part.csv")
      java.nio.file.Files.move(staging.resolve(n), to,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      to.getFileName.toString
    }
    // manifest-last, rename-atomic: stage the manifest beside the data
    // files, then one ATOMIC_MOVE makes the whole job visible — readers
    // that consume only manifest-listed files can never observe a torn
    // commit (round-8 advice: per-file moves + non-atomic manifest write
    // published "per file", not "per job")
    val tmp = staging.resolve("_SUCCESS.tmp")
    java.nio.file.Files.writeString(tmp, published.sorted.mkString("\n"))
    java.nio.file.Files.move(tmp, dir.resolve("_SUCCESS"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    deleteStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = deleteStaging()

  /** Deletes only THIS job's staging subtree — concurrent jobs on the
    * same path keep theirs. The shared `_staging` parent is deliberately
    * LEFT IN PLACE even when empty: deleting it races a concurrent job's
    * `createDirectories` (parent created, momentarily empty before that
    * job's own subdir lands, deleted here → its first staged-file write
    * fails with NoSuchFileException). One empty marker dir is the price
    * of a lock-free protocol (round-9 advice).
    */
  private def deleteStaging(): Unit = {
    val st = java.nio.file.Path.of(path, "_staging", queryId)
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
  // ever published. The dir is namespaced by job (queryId) so concurrent
  // jobs on one path cannot stage over each other.
  private val name = s"p$partitionId-a$taskId.csv"
  private val staging = java.nio.file.Path.of(path, "_staging", queryId)
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
