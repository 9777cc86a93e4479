package graft.ets

/** `spark.ml` wrapper ETs (SURVEY.md §2.4 ML list). Filled in a later
  * milestone this round; empty so [[ETRegistry]] compiles standalone.
  */
object MlETs {
  def all: Seq[ET] = Nil
}
