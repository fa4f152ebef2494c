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
  * to warcio's ArchiveIterator + `content_stream()`
  * (commoncrawl_scraper.py:176-178), which also decodes the HTTP message's
  * `Transfer-Encoding: chunked` framing and gzip/deflate
  * `Content-Encoding` — both replicated here (captured CC payloads keep
  * the origin server's framing, so chunk-size lines would otherwise leak
  * into the extracted text). A CC point-fetch range holds one complete
  * record (sometimes preceded by request/metadata records), so a linear
  * walk suffices.
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
      val hmap = headerMap(bytes, pos, hdrEnd)
      val len = hmap.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
      if (len < 0) return ""
      val blockStart = hdrEnd + 4
      val blockEnd = math.min(blockStart + len, bytes.length.toLong).toInt
      if (hmap.get("warc-type").exists(_.equalsIgnoreCase("response"))) {
        // the block is an HTTP response message: drop its status line and
        // headers, decode the entity body's framing/encoding
        val httpHdrEnd = indexOf(bytes, blockStart, CrlfCrlf)
        if (httpHdrEnd < 0 || httpHdrEnd + 4 > blockEnd)
          return decodeUtf8Ignore(bytes, blockStart, blockEnd - blockStart)
        val http = headerMap(bytes, blockStart, httpHdrEnd)
        var body = java.util.Arrays.copyOfRange(bytes, httpHdrEnd + 4, blockEnd)
        if (http.get("transfer-encoding")
              .exists(_.toLowerCase.contains("chunked")))
          body = dechunk(body)
        http.get("content-encoding").map(_.trim.toLowerCase).foreach {
          case "gzip" | "x-gzip" => body = gunzipLenient(body)
          case "deflate" => body = inflateLenient(body)
          case _ => // identity / unknown: pass through, as warcio does
        }
        return decodeUtf8Ignore(body, 0, body.length)
      }
      pos = blockEnd
    }
    ""
  }

  private def headerMap(bytes: Array[Byte], from: Int, until: Int): Map[String, String] =
    new String(bytes, from, until - from, StandardCharsets.US_ASCII)
      .split("\r\n").iterator
      .map(_.split(":", 2))
      .collect { case Array(k, v) => k.trim.toLowerCase -> v.trim }
      .toMap

  /** RFC 7230 chunked-framing decode. Lenient like warcio's
    * ChunkedDataReader: an unparseable FIRST chunk-size line means the
    * body was not actually chunked (pass it through untouched); a
    * mid-stream truncation/malformation returns what was decoded so far. */
  private def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var pos = 0
    var first = true
    while (pos < body.length) {
      val lineEnd = indexOf(body, pos, Crlf)
      if (lineEnd < 0) return if (first) body else out.toByteArray
      val line = new String(body, pos, lineEnd - pos, StandardCharsets.US_ASCII)
      val sizeHex = line.split(";", 2)(0).trim // chunk extensions ignored
      val size =
        try java.lang.Long.parseLong(sizeHex, 16)
        catch { case _: NumberFormatException =>
          return if (first) body else out.toByteArray }
      if (size == 0) return out.toByteArray // terminator (trailers ignored)
      first = false
      val dataStart = lineEnd + 2
      if (dataStart >= body.length) return out.toByteArray
      val dataEnd = math.min(dataStart + size, body.length.toLong).toInt
      out.write(body, dataStart, dataEnd - dataStart)
      pos = dataEnd + 2 // skip the chunk's trailing CRLF
    }
    out.toByteArray
  }

  private def gunzipLenient(body: Array[Byte]): Array[Byte] =
    try new GZIPInputStream(new ByteArrayInputStream(body)).readAllBytes()
    catch { case _: Exception => body } // warcio falls back to raw bytes

  private def inflateLenient(body: Array[Byte]): Array[Byte] =
    try new java.util.zip.InflaterInputStream(
      new ByteArrayInputStream(body)).readAllBytes()
    catch {
      case _: Exception =>
        // many servers send raw-deflate (no zlib wrapper); retry nowrap
        try new java.util.zip.InflaterInputStream(
          new ByteArrayInputStream(body),
          new java.util.zip.Inflater(true)).readAllBytes()
        catch { case _: Exception => body }
    }

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)
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
