package graft.sources

import graft.model.DirectoryMeta
import org.scalatest.funsuite.AnyFunSuite

class ManifestSpec extends AnyFunSuite {

  val html: String =
    """<html><body><table>
      |<thead><tr><th>uuid</th><th>year</th><th>startPage</th><th>endPage</th><th>columnCount</th></tr></thead>
      |<tbody>
      |<tr><td>u1</td><td>1850/51</td><td>10</td><td>200</td><td>2</td></tr>
      |<tr><td>u2</td><td>1851</td><td> 5 </td><td>180</td><td>3</td></tr>
      |<tr><td></td><td>1852</td><td>1</td><td>2</td><td>2</td></tr>
      |<tr><td>u4</td><td>1853</td><td></td><td>2</td><td>2</td></tr>
      |</tbody></table></body></html>""".stripMargin

  test("parseTable: year union, trims, casts, validity filter") {
    val rows = Manifest.parseTable(html)
    assert(rows == Seq(
      DirectoryMeta("u1", 1850, 1851, 10, 200, 2),
      DirectoryMeta("u2", 1851, 1851, 5, 180, 3)))
  }

  test("JSON manifest checkpoint roundtrips (O-6/O-7)") {
    val spark = graft.TestSpark.spark
    val rows = Manifest.parseTable(html)
    val path = java.nio.file.Files
      .createTempFile("directories", ".json").toString
    Manifest.saveJson(rows, path)
    val loaded = Manifest.loadJson(spark, path).collect().toSeq
      .sortBy(_.uuid)
    assert(loaded == rows.sortBy(_.uuid))
  }

  test("year union semantics: +1, not the printed suffix") {
    // reference computes years[0]+1 even for '1899/00' (city-directories.js:127)
    assert(Manifest.parseYear("1899/00").contains((1899, 1900)))
    assert(Manifest.parseYear("1850/51").contains((1850, 1851)))
    assert(Manifest.parseYear("1850").contains((1850, 1850)))
    assert(Manifest.parseYear("junk").isEmpty)
  }
}
