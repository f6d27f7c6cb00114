package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC-1.1) corpus ingest with record quarantine —
  * the container real crawl corpora actually arrive in (Common Crawl
  * ships `.warc.gz` segments): each record is a version line
  * (`WARC/1.0`), named headers, a `Content-Length`-delimited payload,
  * and a blank-line terminator.
  *
  * Design rules (the [[JsonlSource.readWithQuarantine]] contract,
  * applied to a binary record format):
  *  - a record that violates the format (bad version line, malformed
  *    header, missing/unparseable Content-Length, truncated payload,
  *    missing terminator) lands in the QUARANTINE output with its raw
  *    bytes preserved (capped at [[QuarantineCap]]) and a named error —
  *    nothing is silently dropped, nothing kills the batch;
  *  - after a corrupt record the parser RESYNCS at the next line
  *    starting with `WARC/` and continues — one bad record costs one
  *    quarantine row, not the rest of the file;
  *  - headers are preserved IN ORDER and byte-exact (ISO-8859-1 — the
  *    identity byte↔char map; header names per spec are ASCII), so a
  *    clean parse round-trips: [[render]] of the parsed records
  *    reproduces the input file bit-for-bit (WarcSourceSpec).
  *
  * Scale shape: WARC's production layout is many ~1 GB segment files,
  * each gzip-compressed PER RECORD (gzip members concatenate, and
  * `GZIPInputStream` reads across member boundaries) — the format is
  * inherently FILE-parallel, not byte-range-splittable like JSONL. The
  * reader is `binaryFiles` → one streaming parse per file: memory is
  * bounded per RECORD (the payload array), never per file, so a task
  * holds one record regardless of segment size. This is the one
  * genuinely imperative per-partition loop in the ingest layer — a
  * record-boundary splitter over a byte stream — and uses the RDD seam
  * for exactly that before handing a DataFrame to the declarative
  * pipeline.
  *
  * Declared envelope: WARC header line folding (continuation lines) is
  * not parsed — a folded line quarantines its record loudly; the
  * fixture slice and Common Crawl's own writers do not emit folds. */
object WarcSource {

  /** One WARC header, order-preserved. */
  final case class Hdr(name: String, value: String)

  /** One parse outcome: a clean record (`corrupt` = false, `raw` empty)
    * or a quarantined byte region (`corrupt` = true, fields empty,
    * `raw` = the offending bytes up to [[QuarantineCap]], `err`
    * naming the violation). `offset` is the record's first byte in the
    * (decompressed) stream. */
  final case class WarcRec(file: String, offset: Long, version: String,
                           headers: Seq[Hdr], payload: Array[Byte],
                           corrupt: Boolean, raw: Array[Byte],
                           err: String)

  /** Max preserved bytes for one quarantined region — the rest is
    * skipped to the resync point and counted in `err`, never held. */
  val QuarantineCap: Int = 1 << 20

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Byte-stream cursor: position tracking + line reads that hand back
    * the RAW bytes consumed (terminator included), so a failed record
    * can be quarantined byte-exact. */
  private final class Cursor(in: InputStream) {
    private val buf = new BufferedInputStream(in, 1 << 16)
    var pos: Long = 0L
    /** (text sans `\r?\n`, raw bytes consumed) — None at EOF. */
    def readLine(): Option[(String, Array[Byte])] = {
      val out = new ByteArrayOutputStream(80)
      var b = buf.read()
      if (b < 0) return None
      while (b >= 0 && b != '\n') { out.write(b); b = buf.read() }
      if (b >= 0) out.write(b)
      val raw = out.toByteArray
      pos += raw.length
      var end = raw.length
      if (end > 0 && raw(end - 1) == '\n') end -= 1
      if (end > 0 && raw(end - 1) == '\r') end -= 1
      Some((new String(raw, 0, end, Ascii), raw))
    }
    /** Up to n bytes (short at EOF), read in bounded chunks —
      * allocation tracks bytes ACTUALLY READ, never the declared
      * length, so a corrupt multi-GB Content-Length in a 1 KB file
      * costs 1 KB, not an executor OOM. */
    def readUpTo(n: Long): Array[Byte] = {
      val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var remaining = n
      var short = false
      while (remaining > 0 && !short) {
        val want = math.min(remaining, 1L << 16).toInt
        val chunk = new Array[Byte](want)
        var got = 0
        var r = 0
        while (got < want && r >= 0) {
          r = buf.read(chunk, got, want - got)
          if (r > 0) got += r
        }
        if (got > 0)
          chunks += (if (got == want) chunk
                     else java.util.Arrays.copyOf(chunk, got))
        if (got < want) short = true
        remaining -= got
      }
      val total = chunks.iterator.map(_.length.toLong).sum
      pos += total
      val out = new Array[Byte](total.toInt)
      var at = 0
      chunks.foreach { c =>
        System.arraycopy(c, 0, out, at, c.length); at += c.length
      }
      out
    }
  }

  /** Capped capture buffer for one quarantine region. Holds
    * REFERENCES (the parser never mutates a consumed array) and
    * assembles only when the quarantine path actually reads `bytes` —
    * the overwhelmingly common clean record pays one list cons per
    * line, not a memcpy of its whole body. */
  private final class Capture {
    private val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    private var kept = 0
    private var dropped = 0L
    def note(bytes: Array[Byte]): Unit = {
      val room = QuarantineCap - kept
      if (room >= bytes.length) { parts += bytes; kept += bytes.length }
      else {
        if (room > 0) {
          parts += java.util.Arrays.copyOf(bytes, room); kept += room
        }
        dropped += bytes.length - math.max(room, 0)
      }
    }
    def bytes: Array[Byte] = {
      val out = new ByteArrayOutputStream(kept)
      parts.foreach(p => out.write(p, 0, p.length))
      out.toByteArray
    }
    def truncationNote: String =
      if (dropped == 0) "" else s" (raw truncated, $dropped bytes dropped)"
  }

  /** Streaming record parse of one (decompressed) WARC byte stream —
    * bounded memory per record, quarantine-and-resync on violation.
    * Package-visible so the spec can drive it over fixture bytes
    * directly. */
  private[sources] def parseStream(file: String,
                                   in: InputStream): Iterator[WarcRec] =
    new Iterator[WarcRec] {
      private val cur = new Cursor(in)
      // a resync line belongs to the NEXT record — carry it across
      private var carried: Option[(String, Array[Byte], Long)] = None
      private var pending: Option[WarcRec] = None
      private var eof = false

      private def nextLine(): Option[(String, Array[Byte], Long)] =
        carried match {
          case Some(l) => carried = None; Some(l)
          case None =>
            val at = cur.pos
            cur.readLine().map { case (t, raw) => (t, raw, at) }
        }

      private def quarantine(start: Long, cap: Capture,
                             err: String): WarcRec = {
        // resync: skip to the next WARC/ line (carried) or EOF
        var line = nextLine()
        while (line.isDefined && !line.get._1.startsWith("WARC/")) {
          cap.note(line.get._2)
          line = nextLine()
        }
        carried = line
        WarcRec(file, start, null, Nil, Array.emptyByteArray,
          corrupt = true, cap.bytes, err + cap.truncationNote)
      }

      private def parseOne(): Option[WarcRec] = {
        // tolerate blank padding between records
        var first = nextLine()
        while (first.isDefined && first.get._1.isEmpty) first = nextLine()
        if (first.isEmpty) return None
        val (version, vRaw, start) = first.get
        val cap = new Capture
        cap.note(vRaw)
        if (!version.startsWith("WARC/"))
          return Some(quarantine(start, cap,
            s"expected WARC/ version line, got '${version.take(40)}'"))
        // an offending line that is itself a WARC/ version line belongs
        // to the NEXT record: carry it instead of capturing it, or the
        // quarantine's resync would swallow that whole (possibly valid)
        // record — violating "one bad record costs one quarantine row"
        def offending(l: (String, Array[Byte], Long)): Unit =
          if (l._1.startsWith("WARC/")) carried = Some(l)
          else cap.note(l._2)
        // headers until the blank line
        val hdrs = scala.collection.mutable.ArrayBuffer.empty[Hdr]
        var line = nextLine()
        while (line.isDefined && line.get._1.nonEmpty) {
          val (t, raw, _) = line.get
          val i = t.indexOf(':')
          if (i <= 0) {
            offending(line.get)
            return Some(quarantine(start, cap,
              s"malformed header line '${t.take(40)}'"))
          }
          cap.note(raw)
          hdrs += Hdr(t.substring(0, i).trim, t.substring(i + 1).trim)
          line = nextLine()
        }
        if (line.isEmpty)
          return Some(quarantine(start, cap, "EOF inside header block"))
        cap.note(line.get._2)
        val lenStr = hdrs.find(_.name.equalsIgnoreCase("Content-Length"))
          .map(_.value)
        val len = lenStr.flatMap(_.toLongOption)
          .filter(l => l >= 0 && l < Int.MaxValue)
        if (len.isEmpty)
          return Some(quarantine(start, cap,
            s"missing/invalid Content-Length '${lenStr.getOrElse("")}'"))
        val payload = cur.readUpTo(len.get)
        cap.note(payload)
        if (payload.length < len.get)
          return Some(quarantine(start, cap,
            s"payload truncated: ${payload.length} of ${len.get} bytes"))
        // the record terminator: two empty lines (CRLF CRLF)
        for (_ <- 1 to 2) {
          val t = nextLine()
          if (t.isEmpty || t.get._1.nonEmpty) {
            t.foreach(offending)
            return Some(quarantine(start, cap,
              "missing record terminator after payload"))
          }
          cap.note(t.get._2)
        }
        Some(WarcRec(file, start, version, hdrs.toSeq, payload,
          corrupt = false, Array.emptyByteArray, null))
      }

      def hasNext: Boolean = {
        if (pending.isEmpty && !eof) {
          pending = parseOne()
          if (pending.isEmpty) { eof = true; in.close() }
        }
        pending.isDefined
      }
      def next(): WarcRec = {
        if (!hasNext) throw new NoSuchElementException
        val r = pending.get; pending = None; r
      }
    }

  /** Re-render a clean record to bytes — the round-trip witness (and a
    * minimal WARC writer): version line, headers in preserved order,
    * blank line, payload, terminator. */
  def render(version: String, headers: Seq[Hdr],
             payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + 256)
    val head = (version +: headers.map(h => s"${h.name}: ${h.value}"))
      .mkString("", "\r\n", "\r\n\r\n")
    out.write(head.getBytes(Ascii))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(Ascii))
    out.toByteArray
  }

  /** Every record of every file under `path` (glob ok), clean and
    * quarantined in ONE DataFrame (`corrupt` splits them — the
    * JsonlSource one-pass posture; [[read]] is the two-output view).
    * `.gz` files decompress transparently, multi-member streams
    * included (Common Crawl's record-per-member layout); offsets then
    * index the DECOMPRESSED stream. File-level parallelism — see the
    * object doc for why that is the format's own grain. */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext.binaryFiles(path)
      .flatMap { case (f, pds) =>
        val base = pds.open()
        val in =
          if (f.endsWith(".gz")) new GZIPInputStream(base, 1 << 16)
          else base
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: java.io.IOException => () }
          })
        parseStream(f, in)
      }
    spark.createDataset(rdd)(Encoders.product[WarcRec]).toDF()
  }

  /** The clean-record projection over a [[readRaw]]-shaped frame:
    * (file, offset, version, headers) plus the convenience extracts
    * (warc_type, record_id, target_uri, warc_date, content_type,
    * content_length) and the payload. Pure column logic — shared by
    * the batch and streaming paths. */
  private def cleanView(all: DataFrame): DataFrame = {
    def h(name: String): Column =
      try_element_at(filter(col("headers"),
        x => lower(x.getField("name")) === name), lit(1))
        .getField("value")
    all.where(!col("corrupt"))
      .select(col("file"), col("offset"), col("version"), col("headers"),
        h("warc-type").as("warc_type"),
        h("warc-record-id").as("record_id"),
        h("warc-target-uri").as("target_uri"),
        h("warc-date").as("warc_date"),
        h("content-type").as("content_type"),
        h("content-length").cast("long").as("content_length"),
        col("payload"))
  }

  /** (clean, quarantine): clean carries [[cleanView]]'s columns;
    * quarantine carries (file, offset, raw, err) with the offending
    * bytes intact — same contract as JsonlSource's corrupt output. */
  def read(spark: SparkSession,
           path: String): (DataFrame, DataFrame) = {
    val all = readRaw(spark, path)
    val quarantine = all.where(col("corrupt"))
      .select(col("file"), col("offset"), col("raw"), col("err"))
    (cleanView(all), quarantine)
  }

  /** Body of an `application/http` payload: everything past the HTTP
    * envelope's blank line (the whole payload if none). Byte→string is
    * UTF-8 with replacement — the curation funnel's text contract. */
  def httpBody(payload: Column): Column = {
    val s = payload.cast("string")
    val at = locate("\r\n\r\n", s)
    when(at > 0, s.substr(at + lit(4), length(s))).otherwise(s)
  }

  /** The curation-funnel ingest projection over a [[cleanView]] frame:
    * response records as (record_id, url, warc_date, text) — text via
    * [[httpBody]] for HTTP payloads, raw payload text otherwise. */
  private def documentsView(clean: DataFrame): DataFrame =
    clean.where(lower(col("warc_type")) === "response")
      .select(col("record_id"), col("target_uri").as("url"),
        col("warc_date"),
        when(col("content_type").startsWith("application/http"),
          httpBody(col("payload")))
          .otherwise(col("payload").cast("string")).as("text"))

  /** The curation-funnel ingest view of `path`: response records as
    * (record_id, url, warc_date, text). Feed it `UrlOps.normalize` /
    * `CurateStages.qualityDedup` — the same seam `pipeline_curate`'s
    * JSONL ingest uses (WarcSourceSpec composes it end to end). */
  def documents(spark: SparkSession, path: String): DataFrame =
    documentsView(read(spark, path)._1)

  /** Record rows from ANY frame carrying (path, content) columns —
    * the seam between Spark's `binaryFile` source (batch or
    * streaming) and the record parser. Each file-row parses through
    * the same [[parseStream]] the batch reader uses; memory here is
    * bounded per FILE-ROW (the binaryFile source materializes whole
    * files — Spark's contract for that source), vs [[readRaw]]'s
    * per-record bound. Use readRaw for huge batch segments; use this
    * where binaryFile is the only transport (streaming). */
  def parseBinary(files: DataFrame): DataFrame =
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])](
        Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (f, bytes) =>
        val base = new java.io.ByteArrayInputStream(bytes)
        val in =
          if (f.endsWith(".gz")) new GZIPInputStream(base, 1 << 16)
          else base
        parseStream(f, in)
      }(Encoders.product[WarcRec]).toDF()

  /** STREAMING WARC ingest → the curation funnel, with zero funnel
    * changes: crawl segments landing in the watched `dir` parse
    * per micro-batch (quarantine-and-resync semantics identical to
    * batch), the response documents project through [[documentsView]],
    * and each document re-renders as ONE JSONL line — exactly the
    * line contract `StreamingCuration.start` already ingests, so the
    * five-stage funnel (contract parse → rules → NB → near-dedup →
    * budget → profile) runs on crawl drops unchanged. `doc_id` is
    * xxhash64 of the WARC record id (the funnel keys on a long id;
    * 64-bit collisions are the standard fingerprint trade, same as
    * the corpus-diff row). Schema for the funnel side:
    * (doc_id long, record_id string, url string, text string).
    *
    * NOTHING is silently lost: a corrupt WARC region renders as a
    * deliberately NON-JSON line (`WARC-QUARANTINE\t<file>\t<offset>\t
    * <base64 raw>\t<err>`), which the funnel's own stage-1 contract
    * parse quarantines — so WARC-level corruption lands in the same
    * observable `quarantine/batch=<id>` ledger as malformed JSONL,
    * raw bytes preserved, with zero funnel changes. */
  def streamDocumentLines(spark: SparkSession, dir: String,
                          glob: String = "*.warc*",
                          options: Map[String, String] = Map.empty)
      : DataFrame = {
    // binaryFile's schema is FIXED by the source; the streaming reader
    // still demands it be stated (no inference pass on a stream)
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val recs = parseBinary(
      spark.readStream.format("binaryFile").schema(binarySchema)
        .option("pathGlobFilter", glob).options(options).load(dir))
    val docs = documentsView(cleanView(recs))
      .select(to_json(struct(
        xxhash64(col("record_id")).as("doc_id"),
        col("record_id"), col("url"), col("text"))).as("value"))
    val quarantined = recs.where(col("corrupt"))
      .select(concat(lit("WARC-QUARANTINE\t"), col("file"), lit("\t"),
        col("offset").cast("string"), lit("\t"), base64(col("raw")),
        lit("\t"), col("err")).as("value"))
    docs.unionByName(quarantined)
  }
}
