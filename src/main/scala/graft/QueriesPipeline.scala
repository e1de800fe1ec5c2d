package graft

/** Training-data-pipeline extensions: dedup / similarity / text /
  * multimodal / streaming / MLlib (filled in batch 4+). */
object QueriesPipeline {
  val all: Seq[Queries.Entry] = Seq()
}
