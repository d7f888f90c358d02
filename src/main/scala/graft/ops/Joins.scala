package graft.ops

import graft.{Decl, Pack}

object Joins extends Pack {
  def decls: Seq[Decl] = Seq()
}
