package graft.queries

object RasterQueries {
  def all: Seq[Q] = Seq()
}
