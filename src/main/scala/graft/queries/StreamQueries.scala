package graft.queries

object StreamQueries {
  def all: Seq[Q] = Seq()
}
