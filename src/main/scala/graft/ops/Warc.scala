package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pure-JVM WARC (Web ARChive, ISO 28500 / WARC/1.1) record codec —
  * the crawl lake's FRONT-DOOR format: what Common-Crawl-shaped
  * corpora actually arrive as, one step upstream of the HTML
  * extraction the scrub flagships already grade. Spec-walk of the
  * public IIPC WARC/1.1 specification (the same from-the-spec
  * convention as ops/Flac, ops/Mp3, ops/Multimodal):
  *
  *   record   = version CRLF *(header CRLF) CRLF payload CRLF CRLF
  *   version  = "WARC/1.1" (we accept any WARC/0.x-1.x on read)
  *   header   = field-name ":" SP field-value (Content-Length REQUIRED;
  *              WARC-Type / WARC-Record-ID / WARC-Date are mandatory
  *              per spec §5 and enforced on [[pack]], tolerated-if-
  *              absent on [[parse]] — real crawls contain sloppy
  *              writers, but framing errors are never tolerated)
  *   a WARC FILE is records back to back; the .warc.gz form is one
  *   gzip MEMBER per record (spec annex C recommends record-at-time
  *   compression so readers can split on member boundaries); members
  *   concatenate, so decompress-then-parse handles both framings.
  *
  * Everything fails LOUDLY with a contextual "WARC: ..." message
  * (truncated header block, missing/garbled Content-Length, payload
  * running off the buffer, missing record terminator) — the codec
  * convention: a corrupt crawl file must name itself, not surface as
  * an index error three operators downstream.
  *
  * Scale shape: a WARC file is the parallelism unit (the archive
  * convention caps files at ~1 GB), so [[records]] reads via
  * binaryFile and explodes records per file in the SCAN stage
  * (mapPartitions, zero shuffles) — per-task memory is file-sized,
  * never corpus-sized, and 100 TB of crawl = ~100k files scanning in
  * parallel.
  */
object Warc {

  private val Crlf = "\r\n".getBytes("ISO-8859-1")

  /** One parsed record: raw header pairs in file order (names
    * case-preserved; [[header]] looks up case-insensitively per spec
    * §4) plus the exact payload bytes. */
  final case class Record(headers: Seq[(String, String)], payload: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def recordType: String = header("WARC-Type").getOrElse("")
    def targetUri: String = header("WARC-Target-URI").getOrElse("")
  }

  /** Serialize records to one WARC/1.1 file's bytes. Each record's
    * headers must already carry the spec-mandatory fields except
    * Content-Length, which is computed here (the one header a caller
    * cannot get wrong). Deterministic by construction — no clocks,
    * no randomness — so packed bytes are hash-gradable. */
  def pack(records: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (hdrs, payload) =>
      for (m <- Seq("WARC-Type", "WARC-Record-ID", "WARC-Date"))
        require(hdrs.exists(_._1.equalsIgnoreCase(m)),
          s"WARC: pack requires the mandatory $m header (spec §5)")
      require(!hdrs.exists(_._1.equalsIgnoreCase("Content-Length")),
        "WARC: pack computes Content-Length itself; do not pass it")
      out.write("WARC/1.1".getBytes("ISO-8859-1")); out.write(Crlf)
      hdrs.foreach { case (k, v) =>
        require(!k.exists(c => c == '\r' || c == '\n' || c == ':') &&
            !v.exists(c => c == '\r' || c == '\n'),
          s"WARC: header '$k' contains CR/LF/colon — unencodable")
        out.write(s"$k: $v".getBytes("UTF-8")); out.write(Crlf)
      }
      out.write(s"Content-Length: ${payload.length}".getBytes("ISO-8859-1"))
      out.write(Crlf); out.write(Crlf)
      out.write(payload)
      out.write(Crlf); out.write(Crlf)
    }
    out.toByteArray
  }

  /** Parse one WARC file's bytes (plain, already-gunzipped) into
    * records. Loud on every framing violation; an empty file is an
    * empty record list (a zero-record WARC is just zero bytes). */
  def parse(bytes: Array[Byte]): Seq[Record] = {
    val recs = Seq.newBuilder[Record]
    var pos = 0
    def line(from: Int): (String, Int) = {
      var i = from
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length)
        throw new IllegalArgumentException(
          s"WARC: header line at offset $from runs off the ${bytes.length}-byte buffer " +
            "(truncated file?)")
      (new String(bytes, from, i - from, "UTF-8"), i + 2)
    }
    while (pos < bytes.length) {
      val (version, p1) = line(pos)
      if (!version.startsWith("WARC/"))
        throw new IllegalArgumentException(
          s"WARC: expected a WARC/x.y version line at offset $pos, got '${version.take(32)}'")
      var p = p1
      val hdrs = Seq.newBuilder[(String, String)]
      var open = true
      while (open) {
        val (l, np) = line(p); p = np
        if (l.isEmpty) open = false
        else {
          val c = l.indexOf(':')
          if (c < 1)
            throw new IllegalArgumentException(
              s"WARC: malformed header line '${l.take(64)}' (no colon)")
          hdrs += ((l.substring(0, c).trim, l.substring(c + 1).trim))
        }
      }
      val rec = hdrs.result()
      val clen = rec.collectFirst {
        case (k, v) if k.equalsIgnoreCase("Content-Length") => v
      }.getOrElse(throw new IllegalArgumentException(
        "WARC: record has no Content-Length header — unframeable"))
      val n = try clen.toLong.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"WARC: garbled Content-Length '$clen'")
      }
      if (n < 0 || p + n + 4 > bytes.length)
        throw new IllegalArgumentException(
          s"WARC: payload of $n bytes at offset $p runs off the ${bytes.length}-byte buffer")
      val payload = java.util.Arrays.copyOfRange(bytes, p, p + n)
      p += n
      if (!(bytes(p) == '\r' && bytes(p + 1) == '\n' &&
            bytes(p + 2) == '\r' && bytes(p + 3) == '\n'))
        throw new IllegalArgumentException(
          s"WARC: record terminator (CRLF CRLF) missing after payload at offset $p " +
            "— Content-Length disagrees with the actual payload")
      pos = p + 4
      recs += Record(rec, payload)
    }
    recs.result()
  }

  /** Gzip `bytes` as ONE member — callers gzip record-at-a-time and
    * concatenate for the spec-recommended .warc.gz framing. */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(bytes); gz.close()
    bo.toByteArray
  }

  /** Decompress ALL gzip members of a .warc.gz (GZIPInputStream walks
    * concatenated members), yielding the plain WARC byte stream for
    * [[parse]]. Loud on a non-gzip prefix. */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xFF) != 0x1F || (bytes(1) & 0xFF) != 0x8B)
      throw new IllegalArgumentException(
        "WARC: not a gzip stream (bad magic) — read .warc files with parse directly")
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Parse a file that may be plain .warc or record-gzipped .warc.gz
    * — the two on-disk framings one crawl lake mixes freely. */
  def parseAuto(bytes: Array[Byte]): Seq[Record] =
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B)
      parse(gunzipAll(bytes))
    else parse(bytes)

  /** Split an application/http payload into (status-code, body): the
    * extraction step between the WARC frame and the HTML text — a
    * response record's payload is the full HTTP message (spec §6.3),
    * so the crawl pipeline needs the entity body, not the headers.
    * Loud when no header/body split exists or the status line is not
    * HTTP-shaped. */
  def httpBody(payload: Array[Byte]): (Int, Array[Byte]) = {
    var i = 0
    while (i + 3 < payload.length &&
        !(payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')) i += 1
    if (i + 3 >= payload.length)
      throw new IllegalArgumentException(
        "WARC: HTTP payload has no header/body split (CRLF CRLF) — not an HTTP message?")
    val head = new String(payload, 0, i, "ISO-8859-1")
    val statusLine = head.takeWhile(c => c != '\r' && c != '\n')
    val parts = statusLine.split(" ", 3)
    if (parts.length < 2 || !parts(0).startsWith("HTTP/"))
      throw new IllegalArgumentException(
        s"WARC: payload status line '${statusLine.take(64)}' is not HTTP")
    val status = try parts(1).toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"WARC: garbled HTTP status '${parts(1)}'")
    }
    (status, java.util.Arrays.copyOfRange(payload, i + 4, payload.length))
  }

  /** Wrap an entity body as a minimal deterministic HTTP/1.1 response
    * message — the inverse of [[httpBody]] for fixture/round-trip
    * use. */
  def httpWrap(status: Int, contentType: String, body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    val h = head.getBytes("ISO-8859-1")
    val out = new Array[Byte](h.length + body.length)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(body, 0, out, h.length, body.length)
    out
  }

  /** Crawl-lake SOURCE: every record of every `*.warc` / `*.warc.gz`
    * file under `pathGlob` as rows (file, record_idx, warc_type,
    * record_id, target_uri, content_length, payload) — binaryFile
    * scan, records exploded in the scan stage (one task per file,
    * the archive parallelism unit; per-task memory is file-sized).
    * Downstream: `httpBody` + `graft_html_extract` turn response
    * rows into the scrub flagships' input. */
  def records(spark: SparkSession, pathGlob: String): DataFrame =
    explodeRecords(spark.read.format("binaryFile").load(pathGlob))

  /** STREAMING twin of [[records]]: watch `pathGlob` for newly
    * arriving .warc/.warc.gz files (the binaryFile source's fixed
    * schema needs no user schema) and explode each file's records in
    * the scan stage as it lands — the crawl lake's continuous front
    * door, consumed by [[CrawlStream.ingestWarc]]. */
  def recordsStream(spark: SparkSession, pathGlob: String): DataFrame =
    // binaryFile's schema is FIXED by the format, but the streaming
    // source API still demands it spelled out (no stream-time inference)
    explodeRecords(spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(pathGlob))

  private def explodeRecords(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (path, bytes) =>
          parseAuto(bytes).iterator.zipWithIndex.map { case (r, i) =>
            (path, i.toLong, r.recordType,
              r.header("WARC-Record-ID").getOrElse(""),
              r.targetUri,
              r.payload.length.toLong, r.payload)
          }
        }
      }
      .toDF("file", "record_idx", "warc_type", "record_id", "target_uri",
        "content_length", "payload")
  }
}
