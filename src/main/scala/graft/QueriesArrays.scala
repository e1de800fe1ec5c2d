package graft

/** §2.3 array/image operator queries over embeddings (filled in batch 2). */
object QueriesArrays {
  val all: Seq[Queries.Entry] = Seq()
}
