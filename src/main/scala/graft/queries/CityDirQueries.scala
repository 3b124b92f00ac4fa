package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.CityDirOps

/** Oracle-gated exercises of the reference-parity operators (SURVEY.md §2)
  * over the driver's tables. The real pipeline (tar/hOCR → parse → geocode
  * → transform) is covered end-to-end by ScalaTest goldens; these queries
  * put the SAME operator implementations under the DuckDB hash-compare by
  * deriving reference-shaped inputs (year-union strings, page ranges,
  * bboxes, manifests) deterministically from the test tables — the
  * synthesis expression is reproduced verbatim in the oracle SQL, so the
  * operator itself is the only thing under test.
  */
object CityDirQueries {

  /** Deterministic year-union string from an order row: every third order
    * is a split volume ("1995/96").
    */
  private def yearStr: Column = {
    val y = year(col("o_orderdate"))
    when(col("o_orderkey") % 3 === 0,
      concat(y.cast("string"), lit("/"),
        substring((y + 1).cast("string"), 3, 2)))
      .otherwise(y.cast("string"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O-15/O-16: year-union normalization, `[y, y+1]` rule.
    "cd1_year_norm" -> ((s, d) => {
      orders(s, d)
        .select(col("o_orderkey"), CityDirOps.yearNorm(yearStr).as("yn"))
        .select(col("o_orderkey"),
          col("yn.yearMin").as("year_min"), col("yn.yearMax").as("year_max"))
    }),

    // O-23: interval CONTAINMENT filter on the normalized union — via
    // the fused native predicate (one parse per row; the declarative
    // yearNorm+yearInterval form re-runs the regex tree per struct
    // field in the substituted Filter; PropertySpec asserts equality).
    "cd2_interval_filter" -> ((s, d) => {
      orders(s, d)
        .filter(graft.functions.YearInRange.yearInRange(
          yearStr, Some(1995), Some(1996)))
        .select(col("o_orderkey"))
    }),

    // O-18: deterministic id minting with JS-truthiness guards.
    "cd3_id_mint" -> ((s, d) => {
      val li = lineitem(s, d)
      val yMin = year(col("l_shipdate"))
      val yMax = when(col("l_orderkey") % 5 === 0, yMin + 1).otherwise(yMin)
      val bbox = array(col("l_partkey") % 100, col("l_suppkey") % 100,
        (col("l_partkey") + col("l_suppkey")) % 100, col("l_linenumber") * 10)
      li.select(col("l_orderkey"), col("l_linenumber"),
        CityDirOps.mintId(yMin, yMax, col("l_linenumber") % 4, bbox).as("id"))
    }),

    // O-13 + O-17: trim-to-null + dot-run collapse.
    "cd4_clean_text" -> ((s, d) => {
      val noisy = concat(lit("  "),
        regexp_replace(col("text"), " ", "..."), lit("  "))
      documents(s, d).select(col("doc_id"),
        CityDirOps.trimToNull(CityDirOps.collapseDots(noisy)).as("cleaned"))
    }),

    // O-20: first/last element projection over a split array.
    "cd5_first_element" -> ((s, d) => {
      val words = split(col("text"), " ")
      documents(s, d).select(col("doc_id"),
        CityDirOps.firstElement(words).as("first_word"),
        element_at(words, -1).as("last_word"))
    }),

    // O-25: body-page range filter.
    "cd6_page_range" -> ((s, d) => {
      lineitem(s, d)
        .filter(CityDirOps.pageInRange(col("l_linenumber"), lit(2), lit(5)))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    }),

    // O-22: manifest validity (all keys present and JS-truthy).
    "cd7_manifest_valid" -> ((s, d) => {
      val p = part(s, d)
      p.select(col("p_partkey"),
          col("p_partkey").cast("string").as("uuid"),
          (col("p_size") % 7).as("startPage"),
          col("p_size").as("endPage"),
          (col("p_partkey") % 4).as("columnCount"),
          lit(1850).as("yearMin"))
        .filter(CityDirOps.manifestValid(col("uuid"), col("yearMin"),
          col("startPage"), col("endPage"), col("columnCount")))
        .select(col("p_partkey"))
    }),

    // O-33: geocode-shaped broadcast lookup join — explode per-doc
    // address candidates (first 3 words), left-join a dimension derived
    // from the corpus (words with global count >= 200), re-aggregate
    // found/missed per doc keeping misses in-band.
    "cd8_geocode_join" -> ((s, d) => {
      val docs = documents(s, d)
      val words = docs.select(explode(slice(split(col("text"), " "), 1, 3)).as("w"))
      val dim = words.groupBy("w").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 200).select(col("w").as("key"))
      val exploded = docs.select(col("doc_id"),
        explode(slice(split(col("text"), " "), 1, 3)).as("w"))
      exploded.join(broadcast(dim), exploded("w") === dim("key"), "left")
        .groupBy("doc_id")
        .agg(sum(when(col("key").isNotNull, 1).otherwise(0)).as("n_found"),
             sum(when(col("key").isNull, 1).otherwise(0)).as("n_missed"))
    }),

    // O-31/O-40: tagged-union fan-out (object / relation / log).
    "cd9_tagged_union" -> ((s, d) => {
      val docs = documents(s, d)
      val objects = docs.select(
        lit("object").as("type"),
        concat(lit("doc."), col("doc_id")).as("id"),
        element_at(split(col("text"), " "), 1).as("name"),
        lit(null).cast("string").as("from"),
        lit(null).cast("string").as("to"),
        lit(null).cast("string").as("error"))
      val relations = docs.select(
        lit("relation").as("type"),
        lit(null).cast("string").as("id"),
        lit(null).cast("string").as("name"),
        concat(lit("doc."), col("doc_id")).as("from"),
        col("source").as("to"),
        lit(null).cast("string").as("error"))
      val logs = docs.filter(col("n_chars") < 100).select(
        lit("log").as("type"),
        concat(lit("doc."), col("doc_id")).as("id"),
        lit(null).cast("string").as("name"),
        lit(null).cast("string").as("from"),
        lit(null).cast("string").as("to"),
        lit("short document").as("error"))
      objects.unionByName(relations).unionByName(logs)
    }),

    // Property-graph traversal over the reference's output model: the
    // transform step EMITS nodes + edges (SURVEY §1.1.4); this query
    // CONSUMES them — person nodes joined through their st:in-shaped
    // edges, grouped per target: distinct persons, edge count, first
    // name alphabetically. Nodes/edges derived like cd9.
    "cd12_graph_traverse" -> ((s, d) => {
      val docs = documents(s, d)
      val objects = docs.select(
        concat(lit("doc."), col("doc_id")).as("id"),
        element_at(split(col("text"), " "), 1).as("name"))
      val relations = docs.select(
        concat(lit("doc."), col("doc_id")).as("from"),
        col("source").as("to"))
      relations.join(objects,
          relations("from") === objects("id"))
        .groupBy(col("to"))
        .agg(countDistinct(col("from")).as("n_persons"),
          count(lit(1)).as("n_edges"),
          min(col("name")).as("first_name"))
    }),

    // O-5/O-8: JSON codec both directions — from_json with an explicit
    // schema, transform, re-encode with to_json (NDJSON line framing is
    // the built-in json sink, exercised in PipelineSpec).
    "cd11_json_codec" -> ((s, d) => {
      val ev = events(s, d)
      val k = from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k")
      ev.select(col("event_id"),
        to_json(struct((k * 2).as("k2"), col("event_type").as("t")))
          .as("out_json"))
    }),

    // flattenPaths output contract (city-directories.dataset.json:31-46):
    // a reference-shaped nested record (data struct with arrays of
    // structs) flattened by the dataset's own JSONPath hint grammar —
    // name segments, [i] segments (absent index → null), nested
    // terminal → JSON — into the tabular/CSV projection downstream
    // consumers read. The nested synthesis is reproduced verbatim in
    // the oracle, so the flattener is the only thing under test.
    "cd13_flatten" -> ((s, d) => {
      val words = split(col("text"), " ")
      val nested = documents(s, d).select(col("doc_id"), struct(
        concat(lit("vol-"), col("source")).as("volumeUuid"),
        (col("doc_id") % 100).cast("int").as("pageNum"),
        array((col("n_chars") % 50).cast("int"),
          (col("doc_id") % 7).cast("int")).as("bbox"),
        transform(slice(words, 1, 2), w => struct(w.as("value")))
          .as("locations"),
        transform(slice(words, 1, 2), w => struct(
          concat(lit("addr."), w).as("id"),
          concat(lit("st."), substring(w, 1, 3)).as("streetId")))
          .as("geocoded")).as("data"))
      graft.operators.FlattenPaths.flatten(nested, Seq(
        "$.data.volumeUuid", "$.data.pageNum", "$.data.bbox",
        "$.data.locations[0].value", "$.data.locations[1].value",
        "$.data.geocoded[0].id", "$.data.geocoded[0].streetId",
        "$.data.geocoded[1].id"), keep = Seq("doc_id"))
    }),

    // O-33 fuzzy variant: the geocodeFuzzy operator itself under the
    // DuckDB oracle — exact broadcast lookup first, then the
    // house-number-blocked bounded-edit-distance rescue (<= 2 edits,
    // ties to the lexicographically smallest key), misses in-band.
    // Inputs are derived pre-normalized (lowercase alpha first words,
    // the abbreviation lexicon excluded on BOTH sides) so the oracle
    // replays the match semantics with levenshtein alone, no
    // normalization regex chain; corruption is planted
    // deterministically — every 3rd doc +1 edit (fuzzy rescue), every
    // 11th +3 edits (past maxEdit → in-band miss).
    "cd14_geocode_fuzzy" -> ((s, d) => {
      import s.implicits._
      val abbrev = graft.geocode.Geocoder.abbreviations.map(_._1)
      val docs = documents(s, d)
      val fw = docs.select(col("doc_id"),
          element_at(split(col("text"), " "), 1).as("w"))
        .filter(col("w").rlike("^[a-z]+$") &&
          !col("w").isInCollection(abbrev))
      val dimw = fw.groupBy("w").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 10)
      val houses = s.range(0, 4)
        .select((col("id") + 10).cast("string").as("h"))
      val dim = dimw.crossJoin(broadcast(houses))
        .select(concat(col("h"), lit(" "), col("w")).as("key"))
        .select(
          concat(lit("a."), col("key")).as("addressId"),
          col("key").as("addressName"),
          concat(lit("s."), col("key")).as("streetId"),
          col("key").as("streetName"),
          col("key").as("normalizedKey"),
          struct(lit("Point").as("type"),
            array(array(lit(0.0), lit(0.0))).as("coordinates"))
            .as("geometry"))
        .as[graft.model.GeoAddress]
      val idx = graft.geocode.Geocoder.buildFuzzyIndex(s, dim)
      val suffix = when(col("doc_id") % 11 === 0, lit("qqq"))
        .when(col("doc_id") % 3 === 0, lit("q")).otherwise(lit(""))
      val fact = fw.select(col("doc_id"),
        array(struct(concat((col("doc_id") % 4 + 10).cast("string"),
          lit(" "), col("w"), suffix).as("value"))).as("locs"))
      val g = element_at(col("geocoded"), 1)
      graft.geocode.Geocoder.geocodeFuzzy(fact, idx, "locs")
        .select(col("doc_id"), g.getField("found").as("found"),
          g.getField("result").getField("properties").getField("address")
            .getField("id").as("address_id"),
          g.getField("error").as("error"))
    }),

    // O-35: per-group geometry collect — Point vs MultiPoint by
    // cardinality, coordinates canonically ordered.
    "cd10_multipoint" -> ((s, d) => {
      documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_points"),
          array_join(transform(sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")), "-").as("coords"))
        .withColumn("geom_type",
          when(col("n_points") === 1, "Point").otherwise("MultiPoint"))
    })
  )

  val oracles: Map[String, String] = Map(
    "cd1_year_norm" ->
      """SELECT o_orderkey, year(o_orderdate) AS year_min,
           CASE WHEN o_orderkey % 3 = 0 THEN year(o_orderdate) + 1
                ELSE year(o_orderdate) END AS year_max
         FROM orders""",
    "cd2_interval_filter" ->
      """SELECT o_orderkey FROM (
           SELECT o_orderkey, year(o_orderdate) AS mn,
             CASE WHEN o_orderkey % 3 = 0 THEN year(o_orderdate) + 1
                  ELSE year(o_orderdate) END AS mx
           FROM orders)
         WHERE mn >= 1995 AND mx <= 1996""",
    "cd3_id_mint" ->
      """SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber % 4 = 0 THEN NULL ELSE
             (CASE WHEN l_orderkey % 5 = 0
                   THEN year(l_shipdate)::VARCHAR || '-' || (year(l_shipdate)+1)::VARCHAR
                   ELSE year(l_shipdate)::VARCHAR END)
             || '.' || (l_linenumber % 4)::VARCHAR || '.'
             || (l_partkey % 100)::VARCHAR || '-' || (l_suppkey % 100)::VARCHAR
             || '-' || ((l_partkey + l_suppkey) % 100)::VARCHAR
             || '-' || (l_linenumber * 10)::VARCHAR
           END AS id
         FROM lineitem""",
    "cd4_clean_text" ->
      """SELECT doc_id,
           nullif(trim(regexp_replace('  ' || regexp_replace(text, ' ', '...', 'g') || '  ',
                                      '\.+', '.', 'g')), '') AS cleaned
         FROM documents""",
    "cd5_first_element" ->
      """SELECT doc_id,
           string_split(text, ' ')[1] AS first_word,
           string_split(text, ' ')[-1] AS last_word
         FROM documents""",
    "cd6_page_range" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
         WHERE l_linenumber BETWEEN 2 AND 5 GROUP BY l_returnflag""",
    "cd7_manifest_valid" ->
      """SELECT p_partkey FROM part
         WHERE p_partkey IS NOT NULL
           AND (p_size % 7) <> 0 AND p_size <> 0 AND (p_partkey % 4) <> 0""",
    "cd8_geocode_join" ->
      """WITH words AS (
           SELECT doc_id, unnest(string_split(text, ' ')[1:3]) AS w
           FROM documents),
         dim AS (
           SELECT w AS key FROM words GROUP BY w HAVING count(*) >= 200)
         SELECT doc_id,
           sum(CASE WHEN key IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_found,
           sum(CASE WHEN key IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_missed
         FROM words LEFT JOIN dim ON words.w = dim.key
         GROUP BY doc_id""",
    "cd9_tagged_union" ->
      """SELECT 'object' AS type, 'doc.' || doc_id AS id,
              string_split(text, ' ')[1] AS name,
              NULL::VARCHAR AS "from", NULL::VARCHAR AS "to",
              NULL::VARCHAR AS error
         FROM documents
         UNION ALL
         SELECT 'relation', NULL, NULL, 'doc.' || doc_id, source, NULL
         FROM documents
         UNION ALL
         SELECT 'log', 'doc.' || doc_id, NULL, NULL, NULL, 'short document'
         FROM documents WHERE n_chars < 100""",
    "cd12_graph_traverse" ->
      """WITH objects AS (
           SELECT 'doc.' || doc_id AS id,
             string_split(text, ' ')[1] AS name
           FROM documents),
         relations AS (
           SELECT 'doc.' || doc_id AS f, source AS t FROM documents)
         SELECT t AS "to", count(DISTINCT f) AS n_persons,
           count(*) AS n_edges, min(name) AS first_name
         FROM relations JOIN objects ON f = id
         GROUP BY t""",
    "cd11_json_codec" ->
      """SELECT event_id,
           to_json(struct_pack(
             k2 := json_extract_string(props, '$.k')::INTEGER * 2,
             t := event_type)) AS out_json
         FROM events""",
    "cd13_flatten" ->
      """SELECT doc_id,
           'vol-' || source AS data_volumeUuid,
           (doc_id % 100)::INT AS data_pageNum,
           to_json([(n_chars % 50)::INT, (doc_id % 7)::INT])::VARCHAR
             AS data_bbox,
           string_split(text, ' ')[1] AS data_locations_0_value,
           string_split(text, ' ')[2] AS data_locations_1_value,
           'addr.' || string_split(text, ' ')[1] AS data_geocoded_0_id,
           'st.' || substr(string_split(text, ' ')[1], 1, 3)
             AS data_geocoded_0_streetId,
           'addr.' || string_split(text, ' ')[2] AS data_geocoded_1_id
         FROM documents""",
    "cd10_multipoint" ->
      """SELECT source, count(*) AS n_points,
           string_agg(doc_id::VARCHAR, '-' ORDER BY doc_id) AS coords,
           CASE WHEN count(*) = 1 THEN 'Point' ELSE 'MultiPoint' END AS geom_type
         FROM documents GROUP BY source""",
    // exact-first / fuzzy-rescue replay: the house-number block is the
    // leading digit run; candidate ranking is (levenshtein, key) with
    // the <= 2 bound — DuckDB's levenshtein is the same unit-cost edit
    // distance the operator's bounded implementation computes
    "cd14_geocode_fuzzy" ->
      """WITH fw AS (SELECT doc_id, string_split(text,' ')[1] AS w
                     FROM documents
                     WHERE regexp_matches(string_split(text,' ')[1],
                             '^[a-z]+$')
                       AND string_split(text,' ')[1] NOT IN
                         ('av','ave','st','bway','pl','rd','la','ct',
                          'sq','w','e','n','s')),
         dimw AS (SELECT w FROM fw GROUP BY w HAVING count(*) >= 10),
         dim AS (SELECT (10 + h)::VARCHAR || ' ' || w AS key
                 FROM dimw CROSS JOIN (SELECT unnest(range(0,4)) AS h)),
         fact AS (SELECT doc_id,
                    (10 + doc_id % 4)::VARCHAR || ' ' || w ||
                      CASE WHEN doc_id % 11 = 0 THEN 'qqq'
                           WHEN doc_id % 3 = 0 THEN 'q'
                           ELSE '' END AS key
                  FROM fw),
         ex AS (SELECT f.doc_id, f.key, d.key AS ekey
                FROM fact f LEFT JOIN dim d ON d.key = f.key),
         fz AS (SELECT e.doc_id, d.key AS fkey,
                  row_number() OVER (PARTITION BY e.doc_id
                    ORDER BY levenshtein(e.key, d.key), d.key) AS rn
                FROM ex e JOIN dim d
                  ON e.ekey IS NULL
                 AND regexp_extract(d.key, '^[0-9]+') =
                     regexp_extract(e.key, '^[0-9]+')
                 AND levenshtein(e.key, d.key) <= 2),
         fz1 AS (SELECT doc_id, fkey FROM fz WHERE rn = 1)
         SELECT e.doc_id,
           (e.ekey IS NOT NULL OR fz1.fkey IS NOT NULL) AS found,
           CASE WHEN e.ekey IS NOT NULL THEN 'a.' || e.ekey
                WHEN fz1.fkey IS NOT NULL THEN 'a.' || fz1.fkey
           END AS address_id,
           CASE WHEN e.ekey IS NULL AND fz1.fkey IS NULL
                THEN 'Address not found: ' || e.key
           END AS error
         FROM ex e LEFT JOIN fz1 ON fz1.doc_id = e.doc_id"""
  )
}
