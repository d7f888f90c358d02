package graft.ops

import graft.{Decl, Pack}

object LlmOps extends Pack {
  def decls: Seq[Decl] = Seq()
}
