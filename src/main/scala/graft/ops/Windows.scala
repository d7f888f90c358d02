package graft.ops

import graft.{Decl, Pack}

object Windows extends Pack {
  def decls: Seq[Decl] = Seq()
}
