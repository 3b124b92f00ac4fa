package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

/** Dev probe: split a lane's bench cost into (construct = fn(), i.e.
  * read.parquet + DataFrame building) vs (execute = the forced action),
  * and time bare `spark.read.parquet` calls, to size the per-lane fixed
  * overhead across the 268-lane catalog. Harness diagnostics only.
  */
object LaneOverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      val cols = df.schema.fields.map { f =>
        f.dataType match {
          case _: MapType => to_json(col(f.name))
          case _          => col(f.name)
        }
      }
      df.select(xxhash64(cols.toIndexedSeq: _*).as("_h"))
        .agg(bit_xor(col("_h"))).collect()
      ()
    }

    // bare read.parquet timing, warm
    for (t <- Seq("lineitem", "documents", "events", "embeddings")) {
      spark.read.parquet(s"$sfDir/$t.parquet") // warm fs/codec paths
    }
    for (t <- Seq("lineitem", "documents", "events", "embeddings")) {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.read.parquet(s"$sfDir/$t.parquet")
        (System.nanoTime() - t0) / 1e6
      }
      println(f"read.parquet($t): min=${times.min}%.1f ms avg=${times.sum / 5}%.1f ms")
    }

    val names = if (args.nonEmpty) args.toSeq else Seq(
      "cd5_first_element", "q1_agg", "q8_having", "tx20_tfidf",
      "tx5_approx_distinct", "ev18_anomaly", "mm5_decode_pq",
      "dq14_kanonymity", "ss3_lsh_bucket", "dd6_clusters")
    // warm pass
    names.foreach(n => force(SparkEntry.queries(n)(spark, sfDir)))
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val splits = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        force(df)
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6)
      }
      val c = splits.map(_._1).min; val e = splits.map(_._2).min
      println(f"$n%-24s construct=$c%7.1f ms execute=$e%7.1f ms")
    }
    Leases.releaseAll()
    spark.stop()
  }
}
