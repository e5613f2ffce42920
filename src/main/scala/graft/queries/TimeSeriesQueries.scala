package graft.queries

object TimeSeriesQueries {
  def all: Seq[Q] = Seq()
}
