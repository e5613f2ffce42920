package graft

import java.io.File
import java.nio.file.Files
import graft.sources.{StagedFile, StagedJsonBatchWrite, StagedJsonWriter}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** V2 write path: end-to-end through df.write.format, two-phase commit
  * leaves only published part files, task abort leaves nothing. */
class StagedJsonSinkSpec extends SparkSpecBase {

  test("df.write publishes committed part files readable as JSON lines") {
    val dir = Files.createTempDirectory("sink_v2").toString
    val df = Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .repartition(4)
    df.write.format("graft.sources.StagedJsonSink")
      .option("path", dir).mode("append").save()

    val files = new File(dir).listFiles.map(_.getName).sorted
    assert(files.nonEmpty && files.forall(_.startsWith("part-")), files.mkString(","))
    assert(!files.exists(_.contains("_staging_"))) // nothing left staged

    val back = spark.read.json(dir)
    assert(back.count() == df.count())
    assert(back.agg(sum("n_chars")).head().getLong(0) ==
      df.agg(sum("n_chars")).head().getLong(0))
  }

  test("task abort deletes the staged file; job abort removes staged outputs") {
    val dir = Files.createTempDirectory("sink_abort").toString
    new File(dir).mkdirs()
    val schema = StructType(Seq(StructField("id", LongType), StructField("s", StringType)))

    val w = new StagedJsonWriter(schema, dir, 0, 7L)
    w.write(InternalRow(1L, UTF8String.fromString("x")))
    w.abort()
    assert(new File(dir).listFiles.isEmpty) // staged file gone

    val w2 = new StagedJsonWriter(schema, dir, 1, 8L)
    w2.write(InternalRow(2L, UTF8String.fromString("y")))
    val msg = w2.commit()
    new StagedJsonBatchWrite(schema, dir).abort(Array(msg))
    assert(new File(dir).listFiles.isEmpty) // job abort cleaned the staged file
  }

  test("json escaping survives quotes, backslashes, and control chars") {
    val dir = Files.createTempDirectory("sink_esc").toString
    import spark.implicits._
    val df = Seq((1L, "he said \"hi\\\"\n\tdone")).toDF("id", "s")
    df.write.format("graft.sources.StagedJsonSink").option("path", dir).mode("append").save()
    val back = spark.read.json(dir).orderBy("id")
    assert(back.select("s").as[String].head() == "he said \"hi\\\"\n\tdone")
  }
}
