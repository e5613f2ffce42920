package graft.queries

object MultimodalQueries {
  def all: Seq[Q] = Seq()
}
