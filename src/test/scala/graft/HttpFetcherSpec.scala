package graft

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CrawlParse, HttpFetcher, WarcRecords}

/** S4 — the production HTTP WARC fetcher against an in-process HTTP stub:
  * Range-header parity with the reference's point-fetch
  * (commoncrawl_scraper.py:173), gzipped-record parsing, error→"" drop
  * semantics (:179-181), and the full fetch→parse pipeline through
  * [[CrawlParse.ingest]]. No external network. */
class HttpFetcherSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def warcRecord(warcType: String, httpBody: String): Array[Byte] = {
    val body = httpBody.getBytes(StandardCharsets.UTF_8)
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8) ++ body
    val hdr = (s"WARC/1.0\r\nWARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: <urn:test:1>\r\nContent-Length: ${http.length}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    hdr ++ http ++ "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
  }

  private def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  private val html =
    "<html><title>Harbour Mining</title><body>ABN 51 824 753 556 " +
      "contact info@harbourmining.com.au postcode 2000 NSW</body></html>"

  private def withServer(payload: String => Array[Byte])(
      f: (String, () => Option[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastRange: Option[String] = None
    server.createContext("/", (ex: HttpExchange) => {
      lastRange = Option(ex.getRequestHeaders.getFirst("Range"))
      val out = payload(ex.getRequestURI.getPath)
      if (out == null) {
        ex.sendResponseHeaders(404, -1)
      } else {
        ex.sendResponseHeaders(206, out.length.toLong)
        ex.getResponseBody.write(out)
      }
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", () => lastRange)
    finally server.stop(0)
  }

  test("fetch sends the reference's Range header and extracts the response body") {
    val payload = gzip(warcRecord("response", html))
    withServer(_ => payload) { (base, lastRange) =>
      val got = new HttpFetcher(base).fetch("crawl/segment/file.warc.gz", 5000, 1234)
      assert(got == html)
      // bytes=offset-(offset+length-1), commoncrawl_scraper.py:173
      assert(lastRange().contains("bytes=5000-6233"))
    }
  }

  test("request/metadata records before the response record are skipped") {
    val payload = gzip(
      warcRecord("request", "GET / HTTP/1.1") ++
        warcRecord("response", html))
    withServer(_ => payload) { (base, _) =>
      assert(new HttpFetcher(base).fetch("f.warc.gz", 0, 100) == html)
    }
  }

  test("uncompressed records parse too") {
    withServer(_ => warcRecord("response", html)) { (base, _) =>
      assert(new HttpFetcher(base).fetch("f.warc", 0, 100) == html)
    }
  }

  test("HTTP errors, unreachable hosts, and garbage payloads all drop to empty") {
    withServer(_ => null) { (base, _) => // 404
      assert(new HttpFetcher(base).fetch("missing.warc.gz", 0, 10) == "")
    }
    withServer(_ => Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)) { (base, _) =>
      assert(new HttpFetcher(base).fetch("corrupt.warc.gz", 0, 10) == "")
    }
    // connection refused (nothing listens on the ephemeral port we closed)
    assert(new HttpFetcher("http://127.0.0.1:1").fetch("f.warc.gz", 0, 10) == "")
  }

  private def warcRecordRaw(httpHeaders: String, body: Array[Byte]): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\n$httpHeaders\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8) ++ body
    (s"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: ${http.length}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8) ++ http ++
      "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
  }

  private def chunked(payload: Array[Byte], chunkSize: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    payload.grouped(chunkSize).foreach { c =>
      out.write(s"${c.length.toHexString}\r\n".getBytes(StandardCharsets.US_ASCII))
      out.write(c)
      out.write("\r\n".getBytes(StandardCharsets.US_ASCII))
    }
    out.write("0\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  test("chunked transfer-encoding is decoded (warcio content_stream parity)") {
    val rec = warcRecordRaw("Transfer-Encoding: chunked",
      chunked(html.getBytes(StandardCharsets.UTF_8), 7))
    val got = WarcRecords.firstResponseBody(rec)
    assert(got == html) // no hex size lines or chunk CRLFs leak into text
  }

  test("chunked + gzip content-encoding compose; deflate decodes too") {
    val rec = warcRecordRaw(
      "Transfer-Encoding: chunked\r\nContent-Encoding: gzip",
      chunked(gzip(html.getBytes(StandardCharsets.UTF_8)), 11))
    assert(WarcRecords.firstResponseBody(rec) == html)
    val bos = new ByteArrayOutputStream()
    val d = new java.util.zip.DeflaterOutputStream(bos)
    d.write(html.getBytes(StandardCharsets.UTF_8)); d.close()
    val rec2 = warcRecordRaw("Content-Encoding: deflate", bos.toByteArray)
    assert(WarcRecords.firstResponseBody(rec2) == html)
  }

  test("a 'chunked' header over a non-chunked body passes through (lenient fallback)") {
    val rec = warcRecordRaw("Transfer-Encoding: chunked",
      "plain text, not actually chunked".getBytes(StandardCharsets.UTF_8))
    assert(WarcRecords.firstResponseBody(rec) == "plain text, not actually chunked")
  }

  test("malformed UTF-8 bytes are dropped, not replaced (decode errors=ignore parity)") {
    val good = "ok".getBytes(StandardCharsets.UTF_8)
    val body = good ++ Array(0xff.toByte, 0xfe.toByte) ++ good
    val http = "HTTP/1.1 200 OK\r\n\r\n".getBytes(StandardCharsets.UTF_8) ++ body
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: ${http.length}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8) ++ http
    assert(WarcRecords.firstResponseBody(rec) == "okok")
  }

  test("full ingest pipeline: index rows -> HTTP fetch -> parsed company fields") {
    val payload = gzip(warcRecord("response", html))
    withServer(_ => payload) { (base, _) =>
      import spark.implicits._
      val index = Seq(
        ("https://harbourmining.com.au", "seg/a.warc.gz", 0L, 1000L),
        ("https://wattle.net.au", "seg/b.warc.gz", 2000L, 1000L))
        .toDF("url", "warc_filename", "offset", "length")
      val got = CrawlParse.ingest(index, new HttpFetcher(base))
        .select("url", "domain", "abn", "title", "postcode")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4))).sortBy(_._1)
      assert(got.length == 2)
      assert(got.head == ("https://harbourmining.com.au", "harbourmining.com.au",
        "51824753556", "Harbour Mining", "2000"))
    }
  }
}
