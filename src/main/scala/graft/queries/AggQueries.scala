package graft.queries

object AggQueries {
  def all: Seq[Q] = Seq()
}
