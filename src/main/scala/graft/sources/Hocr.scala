package graft.sources

import graft.model.OcrLine
import scala.util.matching.Regex

/** hOCR (XHTML OCR output) page parsing + column detection.
  *
  * Replaces the reference's `hocr-detect-columns` dependency
  * (city-directories.js:11,224-226; pin package-lock.json:1114) with a
  * self-contained, deterministic implementation. The capability contract
  * (SURVEY.md O-29/O-30): given a page's hOCR and an expected
  * `columnCount`, yield the page's OCR lines, each with `bbox`,
  * `completeText`, and a `columnIndex` that is None for lines that don't
  * start at a detected column edge (indented continuations) — those are
  * filtered out downstream (city-directories.js:236); pages where
  * detection fails yield None (filtered at city-directories.js:233).
  *
  * Parsing is regex-based rather than a DOM parse: hOCR in the wild is
  * only nominally XHTML, and per-line regex scanning is allocation-light —
  * this code runs inside a `flatMap` on executors for every page of a
  * 100 TB corpus, so no DOM trees.
  */
object Hocr {

  /** Start tag of an `ocr_line` element — attribute order and quote style
    * vary. Lines are extracted by sequential scanning between consecutive
    * line start-tags (hOCR lines are laid out sequentially), which copes
    * with nested `ocrx_word` spans without needing balanced-tag parsing.
    */
  private val lineStartRe: Regex =
    """<(?:span|div|p)\b[^>]*class=['"][^'"]*ocr_line[^'"]*['"][^>]*>""".r
  private val titleAttrRe: Regex =
    """title=['"]([^'"]*)['"]""".r
  private val bboxRe: Regex =
    """bbox (\d+) (\d+) (\d+) (\d+)""".r
  private val tagRe: Regex = "<[^>]+>".r
  private val wsRe: Regex = "\\s+".r

  /** Raw parsed line before column assignment. */
  final case class RawLine(bbox: Array[Int], text: String)

  def parseLines(hocr: String): Seq[RawLine] = {
    // The line element's own title holds the line bbox; inner ocrx_word
    // spans are stripped and their texts joined (reference `completeText`).
    val starts = lineStartRe.findAllMatchIn(hocr).toVector
    starts.zipWithIndex.flatMap { case (m, i) =>
      val contentEnd =
        if (i + 1 < starts.length) starts(i + 1).start else hocr.length
      val inner = hocr.substring(m.end, contentEnd)
      val bbox = titleAttrRe.findFirstMatchIn(m.matched)
        .flatMap(t => bboxRe.findFirstMatchIn(t.group(1)))
        .map(b => Array(b.group(1).toInt, b.group(2).toInt,
                        b.group(3).toInt, b.group(4).toInt))
      val text = wsRe.replaceAllIn(
        unescape(tagRe.replaceAllIn(inner, " ")), " ").trim
      bbox.filter(_ => text.nonEmpty).map(RawLine(_, text))
    }
  }

  // &amp; must be unescaped LAST: doing it first turns a literal
  // "&amp;lt;" into "&lt;" and then (wrongly) into "<"
  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&amp;", "&")

  /** Detect `columnCount` columns from the distribution of line left edges
    * and assign each line a column index.
    *
    * Algorithm (ours; the reference delegates to `hocr-detect-columns`):
    * sort lines by x0, split the x0 axis at the (columnCount-1) widest
    * gaps; detection succeeds iff each of those column breaks is a REAL
    * gap (> `tolerance` px) — clusters themselves may be wide, because
    * indented continuation lines legitimately sit deep inside a column.
    * A line belongs to a column if its x0 is within `tolerance` of the
    * cluster's left edge; indented lines (x0 deeper than that) get
    * columnIndex = None, mirroring the reference's
    * `columnIndex !== undefined` filter.
    *
    * Deterministic, O(n log n) per page, no state shared across pages —
    * embarrassingly parallel across a cluster.
    */
  def detectColumns(lines: Seq[RawLine], columnCount: Int,
                    tolerance: Int = 40): Option[Seq[OcrLine]] = {
    if (lines.isEmpty || columnCount < 1) return None
    val xs = lines.map(_.bbox(0)).sorted
    if (columnCount == 1) {
      val left = xs.head
      return Some(assign(lines, Seq(left), tolerance))
    }
    if (xs.distinct.size < columnCount) return None
    // gaps between consecutive sorted x0s; split at the k-1 widest
    val gaps = xs.sliding(2).zipWithIndex
      .map { case (Seq(a, b), i) => (b - a, i) }.toSeq
    val cuts = gaps.sortBy(-_._1).take(columnCount - 1).map(_._2).sorted
    // every column break must be a real gap; otherwise the expected
    // column structure does not exist on this page → detection fails
    if (cuts.exists { i => gaps(i)._1 <= tolerance }) return None
    val bounds = (Seq(0) ++ cuts.map(_ + 1) :+ xs.length)
    val clusters = bounds.sliding(2).map {
      case Seq(a, b) => xs.slice(a, b)
    }.toSeq
    // a cluster's left edge anchors the column; deeper x0s in the same
    // cluster are indented continuations and stay unassigned (`assign`)
    Some(assign(lines, clusters.map(_.head), tolerance))
  }

  private def assign(lines: Seq[RawLine], lefts: Seq[Int],
                     tolerance: Int): Seq[OcrLine] =
    lines.map { l =>
      val x0 = l.bbox(0)
      val idx = lefts.zipWithIndex
        .find { case (left, _) => x0 >= left && x0 <= left + tolerance }
        .map(_._2)
      OcrLine(idx, l.bbox, l.text)
    }

  /** Full page step: parse + detect. None = detection failed (page is
    * dropped, city-directories.js:233).
    */
  def detectPage(hocr: String, columnCount: Int): Option[Seq[OcrLine]] =
    detectColumns(parseLines(hocr), columnCount)
}
