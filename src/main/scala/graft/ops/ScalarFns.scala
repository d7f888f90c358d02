package graft.ops

import graft.{Decl, Pack}

object ScalarFns extends Pack {
  def decls: Seq[Decl] = Seq()
}
