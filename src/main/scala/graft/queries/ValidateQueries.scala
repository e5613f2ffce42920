package graft.queries

object ValidateQueries {
  def all: Seq[Q] = Seq()
}
