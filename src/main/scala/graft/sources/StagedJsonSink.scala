package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SURVEY §2.1 S8 depth — DataSource V2 WRITE path with an explicit
  * two-phase commit: each task stages its output as
  * `_staging_<task>_<attempt>.jsonl`; only the driver's job-level
  * `commit` renames staged files to `part-*.jsonl`, and task/job `abort`
  * deletes staged output. This is the protocol that makes task retries
  * and speculative execution safe at 1000 executors — a retried attempt
  * stages under a distinct name and at most one attempt's file is ever
  * published.
  *
  *   df.write.format("graft.sources.StagedJsonSink")
  *     .option("path", dir).mode("append").save()
  *
  * JSON-lines output is the reference's sink format
  * (S8, /root/reference/containers/shared_schema.py:114-132).
  */
class StagedJsonSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new StagedJsonTable(schema, properties.get("path"))
}

class StagedJsonTable(schema: StructType, path: String) extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "StagedJsonSink requires a 'path' option")
  override def name(): String = s"staged_json($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = new Write {
      override def toBatch: BatchWrite = new StagedJsonBatchWrite(info.schema(), path)
    }
  }
}

/** Driver-side coordinator: publishes staged files on commit, removes
  * them on abort. */
class StagedJsonBatchWrite(schema: StructType, path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new File(path).mkdirs()
    new StagedJsonWriterFactory(schema, path)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case StagedFile(staged) =>
      val src = Paths.get(staged)
      val dst = Paths.get(staged.replace("_staging_", "part-"))
      Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case StagedFile(staged) => Files.deleteIfExists(Paths.get(staged)) }
}

case class StagedFile(stagedPath: String) extends WriterCommitMessage

class StagedJsonWriterFactory(schema: StructType, path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new StagedJsonWriter(schema, path, partitionId, taskId)
}

/** Task-side writer: stages locally-named output; `commit` hands the
  * staged path to the driver, `abort` deletes it. */
class StagedJsonWriter(schema: StructType, path: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val staged = s"$path/_staging_${partitionId}_$taskId.jsonl"
  private val out = new java.io.PrintWriter(new File(staged), "UTF-8")

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Type-directed JSON encoding. Non-finite doubles have no JSON
    * representation → null (matches Spark's own JSON writer default);
    * binary → base64 (the reference's `sanitize_binary_data`, S8);
    * timestamps/dates → ISO-8601 strings; nested array/struct/map
    * recurse. Anything else is rejected loudly rather than emitted as
    * invalid JSON. */
  private def jsonValue(v: Any, dt: DataType): String =
    if (v == null) "null"
    else dt match {
      case org.apache.spark.sql.types.StringType => quote(v.toString)
      case org.apache.spark.sql.types.BooleanType |
           org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        v.toString
      case org.apache.spark.sql.types.FloatType =>
        val f = v.asInstanceOf[Float]
        if (java.lang.Float.isFinite(f)) f.toString else "null"
      case org.apache.spark.sql.types.DoubleType =>
        val d = v.asInstanceOf[Double]
        if (java.lang.Double.isFinite(d)) d.toString else "null"
      case _: org.apache.spark.sql.types.DecimalType =>
        v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal.toPlainString
      case org.apache.spark.sql.types.DateType =>
        quote(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        val micros = v.asInstanceOf[Long]
        val secs = Math.floorDiv(micros, 1000000L)
        val nanos = Math.floorMod(micros, 1000000L) * 1000L
        quote(java.time.LocalDateTime.ofEpochSecond(secs, nanos.toInt,
          java.time.ZoneOffset.UTC).toString)
      case org.apache.spark.sql.types.BinaryType =>
        quote(java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]]))
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until arr.numElements()).map { i =>
          if (arr.isNullAt(i)) "null" else jsonValue(arr.get(i, et), et)
        }.mkString("[", ",", "]")
      case st: StructType =>
        val r = v.asInstanceOf[InternalRow]
        st.fields.zipWithIndex.map { case (f, i) =>
          val fv = if (r.isNullAt(i)) "null" else jsonValue(r.get(i, f.dataType), f.dataType)
          s"${quote(f.name)}:$fv"
        }.mkString("{", ",", "}")
      case org.apache.spark.sql.types.MapType(org.apache.spark.sql.types.StringType, vt, _) =>
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val keys = m.keyArray(); val vals = m.valueArray()
        (0 until m.numElements()).map { i =>
          val mv = if (vals.isNullAt(i)) "null" else jsonValue(vals.get(i, vt), vt)
          s"${quote(keys.getUTF8String(i).toString)}:$mv"
        }.mkString("{", ",", "}")
      case other =>
        throw new UnsupportedOperationException(
          s"StagedJsonSink cannot encode ${other.simpleString} as JSON")
    }

  override def write(row: InternalRow): Unit = {
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      val v = if (row.isNullAt(i)) null else row.get(i, f.dataType)
      s""""${f.name}":${jsonValue(v, f.dataType)}"""
    }
    out.println(fields.mkString("{", ",", "}"))
  }

  override def commit(): WriterCommitMessage = { out.close(); StagedFile(staged) }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(Paths.get(staged)) }
  override def close(): Unit = out.close()
}
