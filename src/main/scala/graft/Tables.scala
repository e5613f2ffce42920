package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver fixture tables (TESTDATA.md / FIXTURES.md §A).
  *
  * All engine I/O is columnar Parquet (SURVEY.md §2.1 S9); Catalyst pushes
  * filters and prunes columns into these scans, so operators downstream
  * should never `select *` more than they need.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong` it arrives as long nanos. The
    * fixture data is µs-aligned, so integer-divide to micros (NOT a double
    * divide — 1.7e18 ns exceeds double's 53-bit mantissa) and convert to a
    * proper TimestampType column.
    */
  def events: DataFrame = {
    val raw = table("events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
