package graft.model

/** Typed stage records for the city-directory pipeline.
  *
  * Each case class mirrors one stage boundary of the reference dataflow
  * (SURVEY.md §1.1): the reference passes untyped JS objects between
  * Highland stream stages; here every boundary has an explicit schema via
  * case-class `Encoder`s, so Catalyst can prune/push down and the contract
  * is compile-checked.
  */

/** One manifest row (reference `parseTable`, city-directories.js:108-133).
  *
  * The reference's `year` is a union `int | [int, int]` (split volumes like
  * "1850/51", city-directories.js:121,127). Normalized here to a
  * (yearMin, yearMax) pair at ingest — note the reference's semantics are
  * `[y, y+1]`, NOT the printed suffix.
  */
final case class DirectoryMeta(
    uuid: String,
    yearMin: Int,
    yearMax: Int,
    startPage: Int,
    endPage: Int,
    columnCount: Int)

/** One hOCR page extracted from a volume archive
  * (reference `readCityDirectory`, city-directories.js:17-70).
  */
final case class PageRecord(
    uuid: String,
    yearMin: Int,
    yearMax: Int,
    startPage: Int,
    endPage: Int,
    columnCount: Int,
    pageNum: Int,
    imageId: String,
    pageUuid: String,
    hocr: String)

/** One OCR line with its detected column (reference consumes
  * `hocr-detect-columns` output at city-directories.js:235-246).
  * `columnIndex` is None for lines not assigned to any detected column
  * (indented continuations) — those are filtered out downstream.
  */
final case class OcrLine(
    columnIndex: Option[Int],
    bbox: Array[Int],
    text: String)

/** One directory-entry line, the `lines.ndjson` record after `parse`
  * (city-directories.js:234-248; contract README.md:59-145).
  */
final case class LineRecord(
    uuid: String,
    yearMin: Int,
    yearMax: Int,
    imageId: String,
    pageUuid: String,
    pageNum: Int,
    bbox: Array[Int],
    text: String)

/** Parser output shape (reference entry-parser.js:44-49, consumed at
  * city-directories.js:291,377-379).
  */
final case class Location(value: String)
final case class ParsedEntry(
    subjects: Seq[String],
    occupations: Seq[String],
    locations: Seq[Location])

final case class ParsedLine(
    uuid: String,
    yearMin: Int,
    yearMax: Int,
    imageId: String,
    pageUuid: String,
    pageNum: Int,
    bbox: Array[Int],
    text: String,
    parsed: ParsedEntry)

/** Geometry, normalized: a Point is stored with a single outer element in
  * `coordinates` so Point and MultiPoint share one Spark schema (the
  * reference keeps GeoJSON's ragged union, city-directories.js:325-336;
  * `GeoJson.toJson` restores the exact GeoJSON shape at the sink).
  */
final case class Geometry(`type`: String, coordinates: Seq[Seq[Double]])

/** Geocoder dimension row (stands in for the `nyc-streets` + `addresses`
  * datasets the reference geocoder indexes, city-directories.dataset.json:27-30).
  */
final case class GeoAddress(
    addressId: String,
    addressName: String,
    streetId: String,
    streetName: String,
    normalizedKey: String,
    geometry: Geometry)

/** Result-or-error union of one address lookup
  * (city-directories.js:298-309): `found=true` carries `result`,
  * `found=false` carries `error`.
  */
final case class GeoProperties(
    address: GeoRef,
    street: GeoRef)
final case class GeoRef(id: String, name: String)
final case class GeoResult(properties: GeoProperties, geometry: Geometry)
final case class Geocoded(
    found: Boolean,
    result: Option[GeoResult],
    error: Option[String])
