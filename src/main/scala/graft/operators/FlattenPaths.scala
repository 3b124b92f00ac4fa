package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** The reference dataset contract's `flattenPaths` hints
  * (city-directories.dataset.json:31-46): JSONPaths like
  * `$.data.geocoded[0].id` that downstream consumers apply to the nested
  * transform output to get a tabular/CSV projection (SURVEY.md §1.2 maps
  * them to a `select` of nested fields + `element_at`).
  *
  * Spark-first shape: each path compiles ONCE, at plan time, to a native
  * column expression — `GetStructField` for name segments,
  * `try_element_at` for `[i]` segments (absent indices are null, the
  * JSONPath semantics; plain `element_at` would throw under ANSI) — so
  * the flatten is a single codegen'd projection, no JSON round-trip, no
  * UDF, and column pruning still reaches the scan (reading
  * `$.data.volumeUuid` from parquet reads ONE leaf column). A terminal
  * that is still nested (e.g. `$.data.bbox`, an array) is JSON-encoded
  * with `to_json`, the CSV-safe tabular form.
  */
object FlattenPaths {

  /** One parsed path segment: a struct field name or an array index. */
  sealed private trait Seg
  private final case class Field(name: String) extends Seg
  private final case class Index(i: Int) extends Seg

  /** Parse the supported JSONPath subset: `$.name.name[i].name…` —
    * exactly the grammar the reference's hints use. Rejects anything
    * else loudly (a silently-skipped hint would drop a column the
    * downstream CSV consumer expects).
    */
  private def parse(path: String): Seq[Seg] = {
    require(path.startsWith("$."),
      s"flattenPath must start with '$$.': $path")
    val segRe = raw"([^.\[\]]+)|\[(\d+)\]".r
    val body = path.drop(2)
    val segs = segRe.findAllMatchIn(body).map { m =>
      if (m.group(1) != null) Field(m.group(1)) else Index(m.group(2).toInt)
    }.toSeq
    val rebuilt = segs.map {
      case Field(n) => n
      case Index(i) => s"[$i]"
    }.mkString(".").replace(".[", "[")
    require(rebuilt == body && segs.nonEmpty &&
        segs.head.isInstanceOf[Field],
      s"unsupported flattenPath syntax: $path")
    segs
  }

  /** The flattened column name for a path:
    * `$.data.geocoded[0].id` → `data_geocoded_0_id` (CSV-header-safe,
    * round-trippable back to the path).
    */
  def columnName(path: String): String =
    parse(path).map {
      case Field(n) => n
      case Index(i) => i.toString
    }.mkString("_")

  /** Compile a path to its native column expression. */
  def pathColumn(path: String): Column =
    parse(path) match {
      case Field(root) +: rest =>
        rest.foldLeft(col(root)) {
          case (c, Field(n)) => c.getField(n)
          // JSONPath indices are 0-based; element_at is 1-based.
          case (c, Index(i)) => try_element_at(c, lit(i + 1))
        }
      case other => throw new IllegalArgumentException(other.toString)
    }

  /** Apply the hints: one output column per path (named via
    * [[columnName]]), nested terminals JSON-encoded, `keep` columns
    * passed through in front. One projection; Catalyst prunes the scan
    * to exactly the referenced leaves.
    */
  def flatten(df: DataFrame, paths: Seq[String],
              keep: Seq[String] = Nil): DataFrame = {
    require(paths.nonEmpty, "flatten needs at least one path")
    val names = paths.map(columnName)
    require(names.distinct.size == names.size,
      s"flattenPaths collide after renaming: $names")
    val proj = df.select(keep.map(col) ++
      paths.zip(names).map { case (p, n) => pathColumn(p).as(n) }: _*)
    // JSON-encode terminals that are still nested (array/struct/map) —
    // the tabular contract wants scalar cells
    val out = proj.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: StructType | _: MapType
            if names.contains(f.name) => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    proj.select(out.toIndexedSeq: _*)
  }
}
