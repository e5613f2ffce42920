package graft.queries

object PivotQueries {
  def all: Seq[Q] = Seq()
}
