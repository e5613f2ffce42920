package graft.queries

object ScalarQueries {
  def all: Seq[Q] = Seq()
}
