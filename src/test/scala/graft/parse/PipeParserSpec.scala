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

  test("pipe: process dying mid-stream fails the task, not silence") {
    val ds = spark.createDataset(1 to 50).map(i => s"line$i").coalesce(1)
    val ex = intercept[org.apache.spark.SparkException] {
      // answers exactly one line, then exits — 49 records unanswered
      PipeParser.pipe(ds, Seq("sh", "-c", "read l; echo \"$l\""))(identity)
        .collect()
    }
    assert(ex.getMessage.contains("unanswered") ||
      Option(ex.getCause).exists(_.getMessage.contains("unanswered")))
  }

  test("pipe: process dying before reading ANY input still errors (no silent empty partition)") {
    val ds = spark.createDataset(1 to 20).map(i => s"line$i").coalesce(1)
    val ex = intercept[org.apache.spark.SparkException] {
      // exits immediately: stdout EOFs possibly before the writer ran
      PipeParser.pipe(ds, Seq("sh", "-c", "exit 3"))(identity).collect()
    }
    assert(ex.getMessage.contains("unanswered") ||
      Option(ex.getCause).exists(_.getMessage.contains("unanswered")))
  }

  test("pipe: process emitting more lines than inputs errors instead of hanging") {
    val ds = spark.createDataset(Seq("one")).coalesce(1)
    val ex = intercept[org.apache.spark.SparkException] {
      PipeParser.pipe(ds,
        Seq("sh", "-c", "read l; echo \"$l\"; echo extra1; echo extra2"),
        drainTimeoutSec = 2)(identity).collect()
    }
    assert(ex.getMessage.contains("more output lines") ||
      Option(ex.getCause).exists(_.getMessage.contains("more output lines")))
  }

  test("pipe: empty partitions spawn no process") {
    val ds = spark.createDataset(Seq("a")).repartition(8)
    val out = PipeParser.pipe(ds, Seq("cat"))(identity).collect()
    assert(out.toSeq == Seq(("a", "a")))
  }
}
