package graft.sources

import graft.model.DirectoryMeta
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.util.matching.Regex

/** Manifest ingestion: an HTML/Markdown-rendered page with a `<table>` of
  * directory volumes (reference `download` → `parseTable`,
  * city-directories.js:108-133,147-149).
  *
  * Header-driven schema inference: `thead th` texts are the column names,
  * `tbody td` texts the values, zipped per row (city-directories.js:111-119)
  * — the reference's own "schema on read". Values are trimmed with empty →
  * null (:116-117), page/column counts int-cast (:124-126), the year union
  * parsed with the `[y, y+1]` rule (:121,127), and rows missing any of the
  * five required keys dropped (:130).
  *
  * The fetch itself is driver-side by design: a manifest is one small page
  * (SURVEY.md O-1) — the resulting Dataset is then broadcast into the
  * archive scan. No cluster resources are spent on a kilobyte of HTML.
  */
object Manifest {

  private val theadRe: Regex = "(?s)<thead\\b[^>]*>(.*?)</thead>".r
  private val tbodyRe: Regex = "(?s)<tbody\\b[^>]*>(.*?)</tbody>".r
  private val trRe: Regex = "(?s)<tr\\b[^>]*>(.*?)</tr>".r
  private val thRe: Regex = "(?s)<th\\b[^>]*>(.*?)</th>".r
  private val tdRe: Regex = "(?s)<td\\b[^>]*>(.*?)</td>".r
  private val tagRe: Regex = "<[^>]+>".r

  private def cellText(html: String): Option[String] = {
    val t = tagRe.replaceAllIn(html, "").trim
    if (t.isEmpty) None else Some(t) // O-13: empty → absent
  }

  /** `"1850/51"` → (1850, 1851) — reference computes `years[0] + 1`
    * (city-directories.js:127); `"1850"` → (1850, 1850).
    */
  def parseYear(s: String): Option[(Int, Int)] = {
    val parts = s.split('/')
    parts(0).trim.toIntOption.map { y0 =>
      if (parts.length == 2) (y0, y0 + 1) else (y0, y0)
    }
  }

  def parseTable(html: String): Seq[DirectoryMeta] = {
    val keys = theadRe.findFirstMatchIn(html).toSeq
      .flatMap(m => thRe.findAllMatchIn(m.group(1)))
      .flatMap(m => cellText(m.group(1)))
    val body = tbodyRe.findFirstMatchIn(html).map(_.group(1)).getOrElse("")
    trRe.findAllMatchIn(body).flatMap { tr =>
      val values = tdRe.findAllMatchIn(tr.group(1))
        .map(m => cellText(m.group(1))).toSeq
      val row: Map[String, String] =
        keys.zip(values).collect { case (k, Some(v)) => k -> v }.toMap
      for {
        uuid <- row.get("uuid")
        (yMin, yMax) <- row.get("year").flatMap(parseYear)
        if yMin != 0 // JS truthiness: year 0 is invalid (city-directories.js:130)
        sp <- row.get("startPage").flatMap(_.toIntOption) if sp != 0
        ep <- row.get("endPage").flatMap(_.toIntOption) if ep != 0
        cc <- row.get("columnCount").flatMap(_.toIntOption) if cc != 0
      } yield DirectoryMeta(uuid, yMin, yMax, sp, ep, cc)
    }.toSeq
  }

  def load(spark: SparkSession, html: String): Dataset[DirectoryMeta] = {
    import spark.implicits._
    spark.createDataset(parseTable(html))
  }

  /** O-7: the pretty-printed JSON manifest checkpoint the reference
    * writes between download and parse (`directories.json`,
    * city-directories.js:151). Driver-side by design — it is one small
    * file.
    */
  def saveJson(manifest: Seq[DirectoryMeta], path: String): Unit = {
    val rows = manifest.map { m =>
      s"""  {
         |    "uuid": "${m.uuid}",
         |    "yearMin": ${m.yearMin},
         |    "yearMax": ${m.yearMax},
         |    "startPage": ${m.startPage},
         |    "endPage": ${m.endPage},
         |    "columnCount": ${m.columnCount}
         |  }""".stripMargin
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      rows.mkString("[\n", ",\n", "\n]"))
  }

  /** O-6: load the JSON manifest checkpoint (`require(directories.json)`,
    * city-directories.js:188) — a multiLine JSON array read with the
    * explicit schema.
    */
  def loadJson(spark: SparkSession, path: String): Dataset[DirectoryMeta] = {
    import spark.implicits._
    spark.read
      .option("multiLine", true)
      .schema("uuid STRING, yearMin INT, yearMax INT, startPage INT, " +
        "endPage INT, columnCount INT")
      .json(path)
      .as[DirectoryMeta]
  }
}
