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
      // bounds-check the LONG before narrowing: a 2^32+4 length must
      // fail loudly, not truncate to 4 and silently re-frame the rest
      // of the buffer as fake records
      val nL = try clen.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"WARC: garbled Content-Length '$clen'")
      }
      if (nL < 0 || nL > (bytes.length - p - 4).toLong)
        throw new IllegalArgumentException(
          s"WARC: payload of $nL bytes at offset $p runs off the ${bytes.length}-byte buffer")
      val n = nL.toInt
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

  /** Decompress ALL gzip members of a .warc.gz, yielding the plain
    * WARC byte stream for [[parse]]. Spec-walked member loop
    * (RFC 1952) rather than GZIPInputStream: the JDK stream treats an
    * unreadable NEXT-member header as clean end-of-stream, so a bit
    * flip in member 2's magic would silently drop every record after
    * member 1 — here every member's header, deflate body, CRC-32 and
    * ISIZE trailer must parse or the file fails loudly, and trailing
    * garbage is an error, never an implicit EOF. */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xFF) != 0x1F || (bytes(1) & 0xFF) != 0x8B)
      throw new IllegalArgumentException(
        "WARC: not a gzip stream (bad magic) — read .warc files with parse directly")
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    def u8(i: Int): Int = {
      if (i >= bytes.length) throw new IllegalArgumentException(
        s"WARC: gzip member truncated at offset $i")
      bytes(i) & 0xFF
    }
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int): Long = (u16le(i).toLong | (u16le(i + 2).toLong << 16)) & 0xFFFFFFFFL
    var member = 0
    while (pos < bytes.length) {
      val start = pos
      if (u8(pos) != 0x1F || u8(pos + 1) != 0x8B)
        throw new IllegalArgumentException(
          s"WARC: gzip member $member at offset $pos has bad magic " +
            f"${u8(pos)}%02x${u8(pos + 1)}%02x — corrupt member boundary, refusing to drop the tail")
      if (u8(pos + 2) != 8)
        throw new IllegalArgumentException(
          s"WARC: gzip member $member uses compression method ${u8(pos + 2)} (only 8 = deflate exists)")
      val flg = u8(pos + 3)
      if ((flg & 0xE0) != 0)
        throw new IllegalArgumentException(
          s"WARC: gzip member $member sets reserved FLG bits ($flg)")
      pos += 10 // magic, CM, FLG, MTIME(4), XFL, OS
      if ((flg & 4) != 0) pos += 2 + u16le(pos)            // FEXTRA
      for (bit <- Seq(8, 16) if (flg & bit) != 0) {        // FNAME, FCOMMENT
        while (u8(pos) != 0) pos += 1
        pos += 1
      }
      if ((flg & 2) != 0) pos += 2                         // FHCRC
      if (pos >= bytes.length) throw new IllegalArgumentException(
        s"WARC: gzip member $member header runs off the buffer")
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, pos, bytes.length - pos)
      val crc = new java.util.zip.CRC32()
      val buf = new Array[Byte](1 << 16)
      var isize = 0L
      try {
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"WARC: gzip member $member deflate stream is corrupt at input offset " +
                  s"${pos + inf.getBytesRead.toInt}: ${e.getMessage}") }
          if (n == 0 && inf.needsInput() && !inf.finished())
            throw new IllegalArgumentException(
              s"WARC: gzip member $member deflate stream truncated")
          out.write(buf, 0, n); crc.update(buf, 0, n); isize += n
        }
        pos += inf.getBytesRead.toInt
      } finally inf.end()
      if (u32le(pos) != crc.getValue)
        throw new IllegalArgumentException(
          s"WARC: gzip member $member (offset $start) CRC-32 mismatch — corrupt payload")
      if (u32le(pos + 4) != (isize & 0xFFFFFFFFL))
        throw new IllegalArgumentException(
          s"WARC: gzip member $member ISIZE ${u32le(pos + 4)} != decompressed length $isize")
      pos += 8
      member += 1
    }
    out.toByteArray
  }

  /** Parse a file that may be plain .warc or record-gzipped .warc.gz
    * — the two on-disk framings one crawl lake mixes freely. */
  def parseAuto(bytes: Array[Byte]): Seq[Record] =
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B)
      parse(gunzipAll(bytes))
    else parse(bytes)

  /** One parsed HTTP response message: status, raw header pairs
    * (names case-preserved), entity body bytes. [[charset]] reads the
    * Content-Type `charset=` parameter — absent means the HTTP
    * default; an unsupported name fails loudly rather than mojibake
    * the corpus. */
  final case class HttpResponse(status: Int, headers: Seq[(String, String)],
                                body: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def charset: java.nio.charset.Charset =
      header("Content-Type")
        .flatMap(_.split(';').map(_.trim).collectFirst {
          case p if p.toLowerCase.startsWith("charset=") =>
            p.substring(8).trim.stripPrefix("\"").stripSuffix("\"")
        })
        .map { name =>
          try java.nio.charset.Charset.forName(name)
          catch { case _: Exception => throw new IllegalArgumentException(
            s"WARC: unsupported HTTP charset '$name' — decode would corrupt the text") }
        }
        .getOrElse(java.nio.charset.StandardCharsets.UTF_8)
    def bodyText: String = new String(body, charset)
  }

  /** Parse an application/http payload — the extraction step between
    * the WARC frame and the text: a response record's payload is the
    * full HTTP message (spec §6.3), so the crawl pipeline needs the
    * status (error pages are not corpus documents), the charset (a
    * large fraction of real crawls is not UTF-8), and the entity
    * body. Loud when no header/body split exists or the status line
    * is not HTTP-shaped. */
  def httpResponse(payload: Array[Byte]): HttpResponse = {
    var i = 0
    while (i + 3 < payload.length &&
        !(payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')) i += 1
    if (i + 3 >= payload.length)
      throw new IllegalArgumentException(
        "WARC: HTTP payload has no header/body split (CRLF CRLF) — not an HTTP message?")
    val head = new String(payload, 0, i, "ISO-8859-1")
    val lines = head.split("\r\n")
    val statusLine = lines.head
    val parts = statusLine.split(" ", 3)
    if (parts.length < 2 || !parts(0).startsWith("HTTP/"))
      throw new IllegalArgumentException(
        s"WARC: payload status line '${statusLine.take(64)}' is not HTTP")
    val status = try parts(1).toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"WARC: garbled HTTP status '${parts(1)}'")
    }
    val hdrs = lines.tail.toSeq.map { l =>
      val c = l.indexOf(':')
      if (c < 1) throw new IllegalArgumentException(
        s"WARC: malformed HTTP header line '${l.take(64)}' (no colon)")
      (l.substring(0, c).trim, l.substring(c + 1).trim)
    }
    HttpResponse(status, hdrs, java.util.Arrays.copyOfRange(payload, i + 4, payload.length))
  }

  /** The (status, body) slice of [[httpResponse]] — kept for callers
    * that frame their own decode. */
  def httpBody(payload: Array[Byte]): (Int, Array[Byte]) = {
    val r = httpResponse(payload)
    (r.status, r.body)
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
