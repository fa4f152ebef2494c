package graft.sources

import java.io.ByteArrayInputStream
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.ByteBuffer
import java.nio.charset.{CodingErrorAction, StandardCharsets}
import java.time.Duration
import java.util.zip.GZIPInputStream

/** S4 — production WARC record point-fetch (the HTTP implementation behind
  * the [[CrawlParse.Fetcher]] boundary; tests inject stubs): one Range GET
  * per (file, offset, length) index row, mirroring the reference loop
  * (/root/reference/extract/commoncrawl_scraper.py:167-181) —
  *   - Range header `bytes=offset..offset+length-1` (:173),
  *   - 30 s timeout (:174),
  *   - HTTP error status → "" (`raise_for_status`, :175, caught :179),
  *   - first `WARC-Type: response` record's HTTP payload, decoded as
  *     UTF-8 with malformed bytes DROPPED (decode errors="ignore", :178),
  *   - any failure → "" so the row is dropped downstream (:179-181, P3).
  *
  * Scale shape: the JDK HttpClient is created lazily per executor JVM
  * (@transient lazy) and shared by every row the partition processes —
  * connection pooling / keep-alive come from the client, so a partition
  * of index rows against the same host reuses sockets instead of paying a
  * TLS handshake per row. The reference fetches serially on one thread;
  * here parallelism is the partition fan-out of
  * [[CrawlParse.fetchPages]], so throughput scales with executors while
  * this class stays a plain blocking call.
  */
final class HttpFetcher(
    baseUrl: String,
    timeoutSeconds: Long = 30L) extends CrawlParse.Fetcher {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  override def fetch(warcFile: String, offset: Long, length: Long): String =
    try {
      val url =
        if (baseUrl.endsWith("/")) baseUrl + warcFile
        else baseUrl + "/" + warcFile
      val req = HttpRequest.newBuilder(URI.create(url))
        .header("Range", s"bytes=$offset-${offset + length - 1}")
        .timeout(Duration.ofSeconds(timeoutSeconds))
        .GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() >= 400) ""
      else WarcRecords.firstResponseBody(resp.body())
    } catch { case _: Exception => "" }
}

/** Minimal WARC reader for point-fetched byte ranges: gunzip if the bytes
  * are a gzip stream (multi-member concatenation is handled), walk the
  * records, and return the first `WARC-Type: response` record's HTTP
  * payload (status line + headers stripped). The reference delegates this
  * to warcio's ArchiveIterator (commoncrawl_scraper.py:176-178); a
  * CC point-fetch range holds one complete record (sometimes preceded by
  * request/metadata records), so a linear walk suffices.
  */
object WarcRecords {

  def firstResponseBody(raw: Array[Byte]): String = {
    if (raw == null || raw.isEmpty) return ""
    val bytes = gunzipIfNeeded(raw)
    var pos = 0
    while (pos < bytes.length) {
      // skip the CRLF CRLF record separators
      while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n'))
        pos += 1
      if (pos >= bytes.length) return ""
      val hdrEnd = indexOf(bytes, pos, CrlfCrlf)
      if (hdrEnd < 0) return ""
      val headers = new String(bytes, pos, hdrEnd - pos, StandardCharsets.US_ASCII)
      val hmap = headers.split("\r\n").iterator
        .map(_.split(":", 2))
        .collect { case Array(k, v) => k.trim.toLowerCase -> v.trim }
        .toMap
      val len = hmap.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
      if (len < 0) return ""
      val blockStart = hdrEnd + 4
      val blockEnd = math.min(blockStart + len, bytes.length.toLong).toInt
      if (hmap.get("warc-type").exists(_.equalsIgnoreCase("response"))) {
        // the block is an HTTP response message: drop its status line and
        // headers, keep the entity body
        val httpHdrEnd = indexOf(bytes, blockStart, CrlfCrlf)
        val bodyStart =
          if (httpHdrEnd >= 0 && httpHdrEnd + 4 <= blockEnd) httpHdrEnd + 4
          else blockStart
        return decodeUtf8Ignore(bytes, bodyStart, blockEnd - bodyStart)
      }
      pos = blockEnd
    }
    ""
  }

  private val CrlfCrlf = "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)

  private def indexOf(haystack: Array[Byte], from: Int, needle: Array[Byte]): Int = {
    var i = math.max(from, 0)
    val limit = haystack.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && haystack(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def gunzipIfNeeded(raw: Array[Byte]): Array[Byte] =
    if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
      try new GZIPInputStream(new ByteArrayInputStream(raw)).readAllBytes()
      catch { case _: Exception => Array.emptyByteArray }
    else raw

  /** UTF-8 decode with malformed/unmappable input DROPPED — byte-for-byte
    * parity with python's `decode("utf-8", errors="ignore")` (:178);
    * Java's default replacement char would instead inject U+FFFD. */
  private def decodeUtf8Ignore(bytes: Array[Byte], off: Int, len: Int): String = {
    if (len <= 0) return ""
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.IGNORE)
      .onUnmappableCharacter(CodingErrorAction.IGNORE)
    dec.decode(ByteBuffer.wrap(bytes, off, len)).toString
  }
}
