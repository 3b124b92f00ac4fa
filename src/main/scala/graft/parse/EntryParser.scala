package graft.parse

import graft.model.{Location, ParsedEntry}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Native replacement for the reference's external CRF entry parser
  * (entry-parser.js:7-91 spawns `python3 parse.py --training ...` and
  * FIFO-pairs results with inputs; output shape consumed at
  * city-directories.js:291,377-379).
  *
  * The CRF's training data is not reproducible, so parity here is the
  * output CONTRACT — `{subjects[], occupations[], locations[{value}]}` —
  * plus deterministic, documented extraction rules over the classic city-
  * directory entry grammar `"SURNAME Forename[, occupation][, address…]"`:
  *
  *  - segments are comma-separated, trimmed, empties dropped;
  *  - a segment is an ADDRESS if it starts with a house number, starts
  *    with an h/r home-marker followed by a number ("h 45 Broadway"), or
  *    ends with a street designator (st, av, bway, pl, …);
  *  - the first non-address segment is the SUBJECT (person name);
  *  - remaining non-address segments are OCCUPATIONS.
  *
  * Runs as a plain Scala function inside codegen'd projection via `udf`
  * (row-local, no state, no shuffle) — SURVEY.md O-32 design (b): no
  * Python at runtime. For genuine external parsers, `PipeParser` keeps
  * the reference's per-partition process semantics as an escape hatch.
  */
object EntryParser {

  private val streetWords: Set[String] = Set(
    "st", "street", "av", "ave", "avenue", "bway", "broadway", "pl",
    "place", "rd", "road", "la", "lane", "ct", "court", "sq", "square",
    "row", "alley", "bowery", "blvd", "boulevard", "ter", "terrace",
    "dr", "drive", "pk", "park", "slip", "wharf", "pier", "mkt", "market")

  private val houseNumRe = "^\\d+([\\s,].*)?$".r
  private val homeMarkerRe = "^(h|r|h\\.|r\\.)\\s+\\d.*".r

  def isAddress(segment: String): Boolean = {
    val s = segment.trim.toLowerCase
    if (s.isEmpty) false
    else if (houseNumRe.pattern.matcher(s).matches) true
    else if (homeMarkerRe.pattern.matcher(s).matches) true
    else {
      val lastWord = s.split("[\\s.]+").lastOption.getOrElse("")
      streetWords.contains(lastWord)
    }
  }

  /** Parse one OCR entry line into the contract shape. Never throws;
    * degenerate input yields empty arrays (the reference's CRF likewise
    * always answers — errors stay in-band, SURVEY.md §4).
    */
  def parse(text: String): ParsedEntry = {
    if (text == null) return ParsedEntry(Nil, Nil, Nil)
    val segments = text.split(',').iterator
      .map(_.trim).filter(_.nonEmpty).toList
    var subject: Option[String] = None
    val occupations = List.newBuilder[String]
    val locations = List.newBuilder[Location]
    segments.foreach { seg =>
      if (isAddress(seg)) locations += Location(seg)
      else if (subject.isEmpty) subject = Some(seg)
      else occupations += seg
    }
    ParsedEntry(subject.toList, occupations.result(), locations.result())
  }

  /** Column form returning
    * struct(subjects array<string>, occupations array<string>,
    *        locations array<struct<value string>>).
    */
  val parseUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => parse(text))

  def parseEntry(text: Column): Column = parseUdf(text)
}
