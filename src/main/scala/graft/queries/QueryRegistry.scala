package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation over the fixture
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle query.
  * The driver hash-compares the two at sf0.01 (column names sorted before
  * hashing — so Spark aliases and SQL aliases MUST match exactly).
  */
final case class Q(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryRegistry {
  /** All query groups, in SURVEY.md §2 order. */
  def all: Seq[Q] =
    SourceQueries.all ++
      CoreQueries.all ++
      TpchQueries.all ++
      ValidateQueries.all ++
      ScalarQueries.all ++
      AggQueries.all ++
      TimeSeriesQueries.all ++
      PivotQueries.all ++
      RasterQueries.all ++
      TextQueries.all ++
      RetrievalQueries.all ++
      DedupQueries.all ++
      CurationQueries.all ++
      SelectionQueries.all ++
      GraphQueries.all ++
      MonitorQueries.all ++
      SimilarityQueries.all ++
      VectorQueries.all ++
      StreamQueries.all ++
      MultimodalQueries.all ++
      SqlEntryQueries.all ++
      E2EQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
