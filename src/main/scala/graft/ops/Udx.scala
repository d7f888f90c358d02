package graft.ops

import graft.{Decl, Pack}

object Udx extends Pack {
  def decls: Seq[Decl] = Seq()
}
