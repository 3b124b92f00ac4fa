package graft.parse

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Dataset
import scala.collection.mutable

/** Per-partition external-process parser — the exact semantic twin of the
  * reference's `EntryParser` Transform stream (entry-parser.js): one
  * process per partition, one input line per record on stdin, one JSON
  * result line on stdout, strict FIFO pairing of results with inputs
  * (entry-parser.js:34,41-42,76-78).
  *
  * This is `RDD.pipe()` semantics with the pairing kept intact: a writer
  * thread feeds stdin while the task thread consumes stdout, so the
  * process's pipe buffers can't deadlock. Order is preserved WITHIN a
  * partition (all the reference ever guaranteed was order within its
  * single stream); nothing is promised across partitions.
  *
  * Escape hatch only (SURVEY.md O-32 design (a)): the default parser is
  * the native `EntryParser`, which keeps the hot path inside codegen and
  * spawns no processes.
  */
object PipeParser {

  /** Run `cmd` once per partition; yield (record, rawResultLine) pairs.
    * `extract` turns a record into the line written to the process.
    * `drainTimeoutSec` bounds how long an output line may wait for its
    * queued input record — only a misbehaving process (more output
    * lines than inputs) ever hits it.
    */
  def pipe[T](ds: Dataset[T], cmd: Seq[String], drainTimeoutSec: Int = 60)(
      extract: T => String): Dataset[(T, String)] = {
    implicit val enc: org.apache.spark.sql.Encoder[(T, String)] =
      org.apache.spark.sql.Encoders.tuple(
        ds.encoder, org.apache.spark.sql.Encoders.STRING)
    ds.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val proc = new ProcessBuilder(cmd: _*)
          .redirectErrorStream(false).start()
        // an abandoned partition iterator (limit/take, stage failure)
        // would otherwise leak the process and its pipe buffers on a
        // long-lived executor
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            if (proc.isAlive) proc.destroyForcibly()
          })
        val stdin = new BufferedWriter(new OutputStreamWriter(
          proc.getOutputStream, StandardCharsets.UTF_8))
        val stdout = new BufferedReader(new InputStreamReader(
          proc.getInputStream, StandardCharsets.UTF_8))
        // FIFO queue of in-flight records (entry-parser.js `objectQueue`);
        // the writer thread owns stdin, the task thread owns stdout.
        val queue = new java.util.concurrent.LinkedBlockingQueue[T]()
        @volatile var writerError: Throwable = null
        val writer = new Thread(() => {
          try {
            it.foreach { rec =>
              queue.put(rec)
              stdin.write(extract(rec)); stdin.write('\n')
            }
            stdin.flush()
          } catch {
            // a dead process breaks the pipe mid-write; remember it so
            // the task thread can fail loudly instead of yielding a
            // truncated partition
            case t: Throwable => writerError = t
          } finally {
            try stdin.close() // _flush closes stdin (entry-parser.js:86-89)
            catch { case _: java.io.IOException => }
          }
        })
        writer.setDaemon(true)
        writer.start()
        new Iterator[(T, String)] {
          private var nextLine: String = stdout.readLine()
          override def hasNext: Boolean = {
            if (nextLine == null) {
              // writer.join() first: queue contents aren't final until
              // the writer thread is done (an immediately-dying process
              // can EOF stdout before the writer ran at all — checking
              // the queue without joining would silently drop the
              // partition's records)
              writer.join()
              proc.waitFor(); stdout.close()
              // a process that died mid-stream would otherwise silently
              // drop its in-flight records — the reference treats an
              // unwritable parser as an error (entry-parser.js:82)
              if (writerError != null || !queue.isEmpty)
                throw new IllegalStateException(
                  s"external parser exited with ${proc.exitValue()} " +
                    s"leaving ${queue.size()} record(s) unanswered" +
                    (if (writerError != null) s" (writer: $writerError)"
                     else ""))
            }
            nextLine != null
          }
          override def next(): (T, String) = {
            // the record for output line N is enqueued before line N is
            // written to stdin, so a well-behaved process can never get
            // ahead of the queue; a bounded poll turns a misbehaving
            // process (more output lines than inputs) into an error
            // instead of a hung task
            val rec = queue.poll(drainTimeoutSec.toLong,
              java.util.concurrent.TimeUnit.SECONDS)
            if (rec == null)
              throw new IllegalStateException(
                "external parser emitted more output lines than inputs")
            val out = (rec, nextLine)
            nextLine = stdout.readLine()
            out
          }
        }
      }
    }
  }
}
