package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

import graft.sources.{RestConf, RestSource}

/** SURVEY §2.1 S1–S6 at the 100 TB shape: [[graft.sources.RestSource]]
  * takes its url list as an option string — right for a handful of
  * endpoints, wrong for a million-request table. This operator is the
  * production form: the url list IS a DataFrame column, and the fetch
  * is a `mapPartitions` pass — each partition's rows fetched where the
  * executor runs with the same pooled-client + retry/backoff kernel the
  * V2 source uses ([[RestSource.fetch]]). Repartition the request table
  * first to set fetch parallelism; a routed priority column upstream
  * and [[PriorityBudget]] around the action complete the reference's
  * orchestration story.
  *
  * Failure semantics are identical to the source: transport failures
  * and HTTP errors become columns (status/error), never task failures.
  */
object RestFetch {

  val fetchedFields: Seq[StructField] = Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true),
    StructField("attempts", IntegerType, nullable = false),
    StructField("error", StringType, nullable = true))

  /** Append (status, content_type, body, attempts, error) to every row
    * by GETting `urlCol`. All other columns pass through unchanged. */
  def fetchRows(
      df: DataFrame,
      urlCol: String,
      connectTimeoutMs: Long = 5000L,
      requestTimeoutMs: Long = 10000L,
      retries: Int = 2,
      retryBackoffMs: Long = 100L): DataFrame = {
    val inSchema = df.schema
    val urlIdx = inSchema.fieldIndex(urlCol)
    val outSchema = StructType(inSchema.fields ++ fetchedFields)
    val conf = RestConf(
      urls = Array.empty, urlsPerPartition = 1,
      connectTimeoutMs = connectTimeoutMs, requestTimeoutMs = requestTimeoutMs,
      retries = retries, retryBackoffMs = retryBackoffMs)
    df.mapPartitions { rows =>
      rows.map { row =>
        val url = row.getString(urlIdx)
        val f = RestSource.fetch(conf, url)
        Row.fromSeq(row.toSeq ++ Seq(f.status, f.contentType, f.body, f.attempts, f.error))
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
