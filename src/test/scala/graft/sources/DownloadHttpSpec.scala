package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.DirectoryMeta

/** O-1/O-3 over a REAL socket: an in-process JDK HttpServer plays the
  * archive host, and [[Download.httpFetch]] + [[Download.downloadAll]]
  * run the production path end-to-end — 200 lands the `<uuid>.tar.gz`
  * bytes exactly, a flaky host (500, 500, 200) succeeds through the
  * retry schedule, and a hard 404 exhausts the policy and dead-letters
  * to the reference's `<uuid>.xml` quarantine contract
  * (city-directories.js:93-94) with no `.tar.gz` left behind. Request
  * counts are asserted server-side, so the retry policy's attempt
  * arithmetic is pinned by what actually hit the wire.
  */
class DownloadHttpSpec extends AnyFunSuite {

  private def meta(uuid: String) =
    DirectoryMeta(uuid, 1850, 1851, 1, 10, 2)

  test("downloadAll over HTTP: 200 lands bytes, flaky-500 retries to success, 404 dead-letters") {
    val hits = new ConcurrentHashMap[String, Integer]()
    val okBody = "tar-gz-payload-bytes".getBytes(StandardCharsets.UTF_8)
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/vol/", (ex: HttpExchange) => {
      val name = ex.getRequestURI.getPath.stripPrefix("/vol/")
      val uuid = name.stripSuffix(".tar.gz")
      val n = hits.merge(uuid, 1, (a, b) => a + b)
      try {
        uuid match {
          case "ok" =>
            ex.sendResponseHeaders(200, okBody.length.toLong)
            ex.getResponseBody.write(okBody)
          case "flaky" if n <= 2 =>
            val msg = "transient".getBytes(StandardCharsets.UTF_8)
            ex.sendResponseHeaders(500, msg.length.toLong)
            ex.getResponseBody.write(msg)
          case "flaky" =>
            ex.sendResponseHeaders(200, okBody.length.toLong)
            ex.getResponseBody.write(okBody)
          case _ =>
            val msg = "no such volume".getBytes(StandardCharsets.UTF_8)
            ex.sendResponseHeaders(404, msg.length.toLong)
            ex.getResponseBody.write(msg)
        }
      } finally ex.close()
    })
    server.start()
    val port = server.getAddress.getPort
    val dir = Files.createTempDirectory("graft-dl-http").toString
    try {
      val results = Download.downloadAll(
        dir,
        Seq(meta("ok"), meta("flaky"), meta("gone")),
        Download.httpFetch(u => s"http://127.0.0.1:$port/vol/$u.tar.gz"),
        parallelism = 4,
        retry = Download.RetryPolicy(maxAttempts = 3, baseDelayMs = 1L))
        .map(r => r.uuid -> r).toMap

      // 200: bytes land under the manifest name, first attempt
      assert(results("ok").ok && results("ok").attempts == 1)
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(dir, "ok.tar.gz")), okBody))

      // flaky 500,500,200: succeeds on the third wire attempt
      assert(results("flaky").ok && results("flaky").attempts == 3)
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(dir, "flaky.tar.gz")), okBody))

      // hard 404: policy exhausted, quarantine contract — `<uuid>.xml`
      // holds the error, no `.tar.gz` remains, the run still resolves
      assert(!results("gone").ok && results("gone").attempts == 3)
      assert(Files.exists(Paths.get(dir, "gone.xml")))
      assert(!Files.exists(Paths.get(dir, "gone.tar.gz")))
      val dead = new String(
        Files.readAllBytes(Paths.get(dir, "gone.xml")),
        StandardCharsets.UTF_8)
      assert(dead.contains("HTTP 404"), dead)

      // what actually hit the wire matches the attempt arithmetic
      assert(hits.get("ok") == 1, hits)
      assert(hits.get("flaky") == 3, hits)
      assert(hits.get("gone") == 3, hits)
    } finally {
      server.stop(0)
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(dir))
    }
  }
}
