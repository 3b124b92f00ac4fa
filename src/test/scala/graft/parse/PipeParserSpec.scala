package graft.parse

import graft.SparkSpec

class PipeParserSpec extends SparkSpec {
  import spark.implicits._

  test("pipe: per-partition external process, FIFO pairing preserved") {
    // external "parser": upper-cases each input line (order-preserving,
    // like the reference's python CRF process)
    val ds = spark.createDataset(1 to 100).map(i => s"line$i")
      .repartition(4)
    val out = PipeParser.pipe(ds,
      Seq("sh", "-c", "tr '[:lower:]' '[:upper:]'"))(identity)
    val rows = out.collect()
    assert(rows.length == 100)
    // FIFO: every record paired with ITS OWN transformed line
    assert(rows.forall { case (in, res) => res == in.toUpperCase })
  }

  test("pipe: empty partitions spawn no process") {
    val ds = spark.createDataset(Seq("a")).repartition(8)
    val out = PipeParser.pipe(ds, Seq("cat"))(identity).collect()
    assert(out.toSeq == Seq(("a", "a")))
  }
}
