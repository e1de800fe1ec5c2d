package graft

/** §2.5-§2.7 aggregation/window/set-op queries (filled in batch 3). */
object QueriesAggWindow {
  val all: Seq[Queries.Entry] = Seq()
}
