package graft.fixtures

import java.io.{BufferedOutputStream, ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
import graft.model.{GeoAddress, Geometry}

/** Deterministic synthetic city-directory corpus (FIXTURES.md §A): hOCR
  * volume archives + manifest HTML + geocoder dimension. The reference
  * ships zero test data (SURVEY.md §5), so parity goldens run against
  * this fixture. Also backs the flagship `SparkEntry.entry`.
  *
  * Shape per FIXTURES.md A2: 2 volumes (one with a split "1850/51" year),
  * pages inside and outside the body range, a non-.hocr entry to skip,
  * 2 columns per page, plus indented continuation lines that column
  * detection must leave unassigned.
  */
object CityDirFixture {

  val entriesPerPage = 6

  /** Classic entry grammar rows: (name, occupation, addresses). */
  val people: Seq[(String, String, Seq[String])] = Seq(
    ("Smith John", "carpenter", Seq("123 Broadway")),
    ("Jones Mary", "milliner", Seq("45 W 23d st")),
    ("Brown Wm.", "grocer", Seq("7 Bowery", "h 19 Pearl st")),
    ("Davis Geo", "smith", Seq("201 Water st")),
    ("Miller Ann", "teacher", Seq("88 Canal st")),
    ("Wilson Jas", "porter", Seq("3 Maiden lane")))

  def line(text: String, x0: Int, y0: Int): String = {
    val x1 = x0 + 12 * text.length
    val y1 = y0 + 30
    s"""      <span class='ocr_line' title='bbox $x0 $y0 $x1 $y1'>${text}</span>"""
  }

  /** One two-column hOCR page; entry texts get deterministic OCR noise
    * (dot runs) so the dot-collapse op has work to do.
    */
  def hocrPage(pageNum: Int, width: Int = 2400, height: Int = 3800): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<html><body>\n")
    sb.append(s"  <div class='ocr_page' title='bbox 0 0 $width $height'>\n")
    people.zipWithIndex.foreach { case ((name, occ, addrs), i) =>
      val col = i % 2
      val row = i / 2
      val x0 = if (col == 0) 100 else 1300
      val y0 = 200 + row * 120
      val text = s"$name..., $occ, ${addrs.mkString(", ")}"
      sb.append(line(s"p$pageNum $text", x0, y0)).append('\n')
      if (i == 1) {
        // indented continuation line — must get columnIndex = None
        sb.append(line("continued entry text", x0 + 220, y0 + 40)).append('\n')
      }
    }
    sb.append("  </div>\n</body></html>\n")
    sb.toString
  }

  final case class Volume(uuid: String, year: String, startPage: Int,
                          endPage: Int, columnCount: Int, pages: Seq[Int])

  val volumes: Seq[Volume] = Seq(
    // pages 1 and 9 fall outside the body range 2..8 → pruned in the scan
    Volume("vol-a-0001", "1850/51", 2, 8, 2, Seq(1, 2, 3, 9)),
    Volume("vol-b-0002", "1851", 2, 8, 2, Seq(2, 4)))

  def manifestHtml: String = {
    val rows = volumes.map { v =>
      s"<tr><td>${v.uuid}</td><td>${v.year}</td><td>${v.startPage}</td>" +
        s"<td>${v.endPage}</td><td>${v.columnCount}</td></tr>"
    }.mkString("\n")
    s"""<html><body><table>
       |<thead><tr><th>uuid</th><th>year</th><th>startPage</th><th>endPage</th><th>columnCount</th></tr></thead>
       |<tbody>
       |$rows
       |</tbody></table></body></html>""".stripMargin
  }

  /** Geocoder dimension covering some (not all) fixture addresses, so both
    * found and not-found branches are exercised.
    */
  def dimension: Seq[GeoAddress] = Seq(
    GeoAddress("addr-1", "123 Broadway", "street-bway", "Broadway",
      "123 broadway", Geometry("Point", Seq(Seq(-74.0104, 40.7069)))),
    GeoAddress("addr-2", "45 West 23rd Street", "street-w23", "West 23rd Street",
      "45 west 23d street", Geometry("Point", Seq(Seq(-73.9916, 40.7420)))),
    GeoAddress("addr-3", "7 Bowery", "street-bowery", "Bowery",
      "7 bowery", Geometry("Point", Seq(Seq(-73.9967, 40.7145)))),
    GeoAddress("addr-4", "201 Water Street", "street-water", "Water Street",
      "201 water street", Geometry("Point", Seq(Seq(-74.0031, 40.7073)))),
    GeoAddress("addr-5", "19 Pearl Street", "street-pearl", "Pearl Street",
      "19 pearl street", Geometry("Point", Seq(Seq(-74.0120, 40.7040)))))

  def writeTarGz(path: String, entries: Seq[(String, String)]): Unit = {
    val bos = new ByteArrayOutputStream()
    val tar = new TarArchiveOutputStream(new GzipCompressorOutputStream(bos))
    entries.foreach { case (name, content) =>
      val bytes = content.getBytes(StandardCharsets.UTF_8)
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length.toLong)
      tar.putArchiveEntry(e)
      tar.write(bytes)
      tar.closeArchiveEntry()
    }
    tar.close()
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try out.write(bos.toByteArray) finally out.close()
  }

  /** Write the whole fixture corpus under `dir` (idempotent). */
  def ensure(dir: String): Unit = {
    val marker = Paths.get(dir, ".complete")
    if (Files.exists(marker)) return
    Files.createDirectories(Paths.get(dir))
    volumes.foreach { v =>
      val entries = v.pages.map { p =>
        (s"${v.uuid}/$p.img${p}000.page-uuid-${v.uuid.takeRight(4)}-$p.processed.hocr",
          hocrPage(p))
      } :+ (s"${v.uuid}/notes.txt", "not an hocr entry — must be skipped")
      writeTarGz(s"$dir/${v.uuid}.tar.gz", entries)
    }
    Files.writeString(Paths.get(dir, "manifest.html"), manifestHtml)
    Files.writeString(marker, "ok")
  }
}
