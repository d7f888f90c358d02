package graft.ops

import graft.{Decl, Pack}

object StreamOps extends Pack {
  def decls: Seq[Decl] = Seq()
}
