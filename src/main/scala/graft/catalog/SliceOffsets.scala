package graft.catalog

/** The ONE streaming-offset JSON grammar, shared by both sources'
  * offset types ([[SeqOffset]] for the table tail, `CdcOffset` for
  * `graft-cdc`): `{"seq":N}` = N commits fully delivered;
  * `{"seq":N,"idx":K}` = the first K files (stable path order) of
  * seq N's genesis-STATE unit delivered; `{"seq":N,"idx":K,
  * "unit":"added"}` = same for an oversized append's ADDED unit.
  * Checkpoint compatibility depends on render and parse staying
  * byte-identical across the two sources, so both live here — a
  * grammar change or parse fix is one edit, never four. */
object SliceOffsets {

  private val Re = """\{"seq":(\d+)(?:,"idx":(\d+)(,"unit":"added")?)?\}""".r

  def render(seq: Long, fileIdx: Int, added: Boolean): String =
    if (fileIdx < 0) s"""{"seq":$seq}"""
    else if (!added) s"""{"seq":$seq,"idx":$fileIdx}"""
    else s"""{"seq":$seq,"idx":$fileIdx,"unit":"added"}"""

  /** (seq, fileIdx, added); None when `json` is not this grammar
    * (callers decide whether a legacy form or a loud failure is
    * next). */
  def parse(json: String): Option[(Long, Int, Boolean)] = json.trim match {
    case Re(s, null, _) => Some((s.toLong, -1, false))
    case Re(s, i, null) => Some((s.toLong, i.toInt, false))
    case Re(s, i, _) => Some((s.toLong, i.toInt, true))
    case _ => None
  }
}
