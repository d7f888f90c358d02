package graft.ops

import graft.{Decl, Pack}

object SortsSets extends Pack {
  def decls: Seq[Decl] = Seq()
}
