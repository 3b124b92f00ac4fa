package graft.parse

import graft.model.{Location, ParsedEntry}
import org.scalatest.funsuite.AnyFunSuite

class EntryParserSpec extends AnyFunSuite {

  test("classic entry: name, occupation, address") {
    assert(EntryParser.parse("Smith John, carpenter, 123 Broadway") ==
      ParsedEntry(Seq("Smith John"), Seq("carpenter"),
        Seq(Location("123 Broadway"))))
  }

  test("multiple addresses incl. home marker") {
    val p = EntryParser.parse("Brown Wm., grocer, 7 Bowery, h 19 Pearl st")
    assert(p.subjects == Seq("Brown Wm."))
    assert(p.occupations == Seq("grocer"))
    assert(p.locations == Seq(Location("7 Bowery"), Location("h 19 Pearl st")))
  }

  test("street-designator segment without house number is an address") {
    val p = EntryParser.parse("Jones Mary, milliner, Maiden lane")
    assert(p.locations == Seq(Location("Maiden lane")))
  }

  test("no address, multiple occupations") {
    val p = EntryParser.parse("Davis Geo, smith, blacksmith")
    assert(p.subjects == Seq("Davis Geo"))
    assert(p.occupations == Seq("smith", "blacksmith"))
    assert(p.locations.isEmpty)
  }

  test("degenerate inputs never throw") {
    assert(EntryParser.parse(null) == ParsedEntry(Nil, Nil, Nil))
    assert(EntryParser.parse("") == ParsedEntry(Nil, Nil, Nil))
    assert(EntryParser.parse(",,,") == ParsedEntry(Nil, Nil, Nil))
  }
}
