package graft.operators

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Torn-build guard on the persisted-index fixtures: a build that died
  * between table writes (or a concurrent rebuild in another process)
  * must fail loudly at access time, never answer from partial data.
  */
class IndexMarkerSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("fixture writes a completion marker and checks it on access") {
    val dir = IvfFixture.ivfDir(spark, sfDir)
    val marker = Paths.get(dir, IvfFixture.MarkerName)
    assert(Files.exists(marker), s"build must leave $marker")

    // simulate a torn dir: marker gone, data files still present
    Files.delete(marker)
    val e = intercept[IllegalArgumentException] {
      IvfFixture.ivfDir(spark, sfDir)
    }
    assert(e.getMessage.contains("torn build"))

    // restore for other suites sharing this JVM's memoized fixture
    Files.write(marker, Array.emptyByteArray)
    assert(IvfFixture.ivfDir(spark, sfDir) == dir)
  }

  test("band index fixture carries the same guard") {
    val dir = BandIndexFixture.dir(spark, sfDir)
    assert(Files.exists(Paths.get(dir, IvfFixture.MarkerName)))
  }
}
