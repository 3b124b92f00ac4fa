package graft.operators

/** One parsed WebVTT cue: integer milliseconds, payload line count. */
case class VttCue(startMs: Long, endMs: Long, nLines: Int)

/** WebVTT (timed-text) parser — the CAPTION modality beside the six
  * binary codecs: video corpora ship subtitle sidecars, and a curation
  * pipeline filters on cue statistics (caption density, coverage,
  * overlap — auto-generated captions overlap, human ones rarely do)
  * long before any ASR model sees the audio.
  *
  * Strict grammar, deliberately: the header line must start with
  * `WEBVTT`, every cue needs a `HH:MM:SS.mmm --> MM:SS.mmm`-style
  * timing line (hours optional per spec §6.2, settings after the end
  * timestamp ignored), end must be ≥ start, and a malformed cue fails
  * the WHOLE parse — at ingest a torn sidecar should surface as one
  * in-band miss, not silently contribute half its cues to the
  * statistics. Timestamps are exact integer milliseconds.
  *
  * Spec: W3C WebVTT (public). Pure string walk, O(len) per document.
  */
object SubtitleCodec {

  private val Timing =
    """(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})\s+-->\s+(?:(\d+):)?(\d{2}):(\d{2})\.(\d{3})(?:\s.*)?""".r

  private def ms(h: String, m: String, s: String, f: String): Long =
    (if (h == null) 0L else h.toLong) * 3600000L +
      m.toLong * 60000L + s.toLong * 1000L + f.toLong

  /** Parse a full VTT document into cues. None on a missing/alien
    * header or ANY malformed cue block. */
  def vttCues(text: String): Option[Seq[VttCue]] = {
    if (text == null) return None
    val lines = text.split("\n", -1).map(_.stripSuffix("\r"))
    // the spec's header grammar: "WEBVTT" followed by end-of-line,
    // space, or tab — a bare prefix match would accept alien files
    // whose first token merely STARTS with WEBVTT ("WEBVTTfoo")
    if (lines.isEmpty || !(lines(0) == "WEBVTT" ||
        lines(0).startsWith("WEBVTT ") || lines(0).startsWith("WEBVTT\t")))
      return None
    val cues = Seq.newBuilder[VttCue]
    var i = 1
    while (i < lines.length) {
      if (lines(i).trim.isEmpty) i += 1 // block separator
      else if (lines(i).startsWith("NOTE")) { // comment block: skip
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
      } else {
        // cue block: optional identifier line, then the timing line
        val timingAt =
          if (lines(i).contains("-->")) i
          else if (i + 1 < lines.length && lines(i + 1).contains("-->")) i + 1
          else return None
        lines(timingAt) match {
          case Timing(h1, m1, s1, f1, h2, m2, s2, f2) =>
            val a = ms(h1, m1, s1, f1)
            val b = ms(h2, m2, s2, f2)
            if (b < a) return None
            var j = timingAt + 1
            var n = 0
            while (j < lines.length && lines(j).trim.nonEmpty) {
              n += 1; j += 1
            }
            cues += VttCue(a, b, n)
            i = j
          case _ => return None
        }
      }
    }
    Some(cues.result())
  }
}
