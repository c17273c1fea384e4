package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.table

/** Multimodal-column plumbing: media as opaque BINARY payloads + typed
  * metadata, with decode/feature-extract/frame-sample passes.
  *
  * Image payloads (PNG/JPEG/GIF/BMP) go through a REAL decode — the
  * JDK's ImageIO, no external codec needed — producing true dimensions
  * and a pixel-luminance histogram. Audio payloads go through a REAL
  * RIFF/WAVE PCM parse (pure JVM, no FFI): amplitude histogram +
  * sample-point "frames". Video payloads get a REAL MP4/ISO-BMFF
  * container probe (brand, duration, track count, presentation dims —
  * the facts a pipeline filters on before paying for GPU decode);
  * frame DECODE (which would need ffmpeg via FFI) and undecodable
  * records fall back to a clearly-marked deterministic byte-level
  * STUB, so the pipeline shape — schema, partition-wise batching,
  * feature layout — is identical for every mime.
  * mapPartitions is the JVM analog of Python's mapInPandas:
  * per-partition batch iteration, no per-row setup cost.
  */
object Multimodal {

  /** Typed media record: payload + metadata the pipeline carries around. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String,
                         width: Int, height: Int)

  /** Extracted features: histogram "embedding" + sampled "frames".
    * `decoded` marks records whose payload went through a REAL codec
    * (ImageIO) rather than the byte-level fallback.
    */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, mime: String,
                           hist: Array[Double], frames: Array[Long],
                           grid: Array[Long], ahash: Long,
                           thumb_w: Int, thumb_h: Int, decoded: Boolean)

  /** Average-hash over an 8x8 luminance/amplitude grid: bit i (row-major)
    * set iff grid(i) >= the integer mean — the classic aHash, the
    * cheapest perceptual fingerprint; near-identical images (re-encodes,
    * minor crops/scales) land within a few Hamming bits, so the hash
    * feeds the simhash-style pigeonhole dedup tier directly.
    */
  def ahashOf(grid: Array[Long]): Long = {
    val mean = grid.sum / 64L
    // all-equal grid (empty payload, uniformly flat image): >= mean is
    // true at every cell, which would hash every such record to
    // 0xFFFF... and cluster empty/undecoded records as near-dups of
    // dark images in the pigeonhole dedup tier — emit 0 instead, the
    // "no structure" fingerprint
    if (grid.forall(_ == grid(0))) return 0L
    var h = 0L
    var i = 0
    while (i < 64) { if (grid(i) >= mean) h |= 1L << i; i += 1 }
    h
  }

  /** Media table synthesized deterministically from documents: the text's
    * UTF-8 bytes stand in for an encoded image. Metadata (mime, dims) is
    * derived arithmetic — SQL-expressible, so this layer is oracle-checked.
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      octet_length(col("text")).as("n_bytes"),
      when(octet_length(col("text")) % 4 === 0, "image/png")
        .when(octet_length(col("text")) % 4 === 1, "image/jpeg")
        .when(octet_length(col("text")) % 4 === 2, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      (lit(64) + octet_length(col("text")) % 512).as("width"),
      (lit(64) + (octet_length(col("text")) * 7) % 512).as("height"))

  /** Oracle-checked projection of the metadata layer (no binary column —
    * the payload is exercised by multimodalFeatures and the spec).
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    mediaMeta(s, dir).drop("payload")

  /** A header-declared image larger than this (pixels) is NOT decoded —
    * a corrupt or hostile record in an untrusted corpus must not be able
    * to demand a multi-GB raster allocation and kill the task. 64 MPix
    * ≈ 256 MB ARGB, a sane per-record ceiling; oversized records take
    * the byte-level fallback and keep their metadata.
    */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP — no
    * external codec needed): luminance histogram over actual pixels,
    * "frame samples" = luminance at five fixed raster positions, true
    * width/height from the decoded raster. Returns None when the payload
    * isn't a decodable image (ImageIO probes the magic bytes) or
    * declares dimensions over MaxDecodePixels, which routes the record
    * to the byte-level fallback below.
    */
  private def decodeImage(payload: Array[Byte])
      : Option[(Array[Double], Array[Long], Array[Long], Int, Int)] =
    try {
      // MemoryCacheImageInputStream, NOT ImageIO.read(InputStream): the
      // default path spills through a disk-backed FileCache temp file per
      // record — pointless I/O on a corpus pass when the payload is
      // already a byte array.
      val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      // close() releases the stream's memory cache eagerly — its javadoc
      // requires it; leaving it to GC accumulates one cache per record
      // over a corpus pass
      val img = try {
        // Header-only dimension probe BEFORE any raster allocation.
        val readers = javax.imageio.ImageIO.getImageReaders(stream)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try {
            reader.setInput(stream, true, true)
            val (dw, dh) = (reader.getWidth(0), reader.getHeight(0))
            if (dw.toLong * dh > MaxDecodePixels || dw <= 0 || dh <= 0) null
            else reader.read(0)
          } finally reader.dispose()
        }
      } finally stream.close()
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val n = w.toLong * h
        if (n == 0L) None
        else {
          def lum(x: Int, y: Int): Int = {
            val rgb = img.getRGB(x, y)
            (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
          }
          val hist = new Array[Double](16)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { hist(lum(x, y) >> 4) += 1; x += 1 }
            y += 1
          }
          var j = 0
          while (j < 16) { hist(j) /= n; j += 1 }
          val frames = Array(0L, n / 4, n / 2, 3 * n / 4, n - 1).map { o =>
            val p = math.min(o, n - 1)
            lum((p % w).toInt, (p / w).toInt).toLong
          }
          // REAL pixel resize: 8x8 nearest-neighbor (top-left anchor —
          // deterministic, spec-recomputable) luminance thumbnail
          val grid = new Array[Long](64)
          var g = 0
          while (g < 64) {
            grid(g) = lum(((g % 8) * w) / 8, ((g / 8) * h) / 8).toLong
            g += 1
          }
          Some((hist, frames, grid, w, h))
        }
      }
    } catch { case _: Exception => None }

  /** PCM sample cap — [[MaxDecodePixels]]'s audio twin: a hostile
    * data-chunk length must not demand an unbounded decode loop.
    */
  val MaxDecodeSamples: Long = 64L * 1024 * 1024

  /** REAL audio decode: RIFF/WAVE PCM header parse + amplitude histogram
    * + sample-point "frames", pure JVM (~the codec work ffmpeg would do
    * for compressed audio; PCM needs none). Strictly validated — wrong
    * magic, non-PCM format codes, 24-bit samples, chunk lengths past the
    * payload, or zero samples all return None and take the byte-level
    * fallback, so a corrupt record can never fail the stage OR silently
    * masquerade as decoded.
    *
    * Channels are interleaved in PCM data; the histogram and frame
    * samples read the interleaved stream directly (amplitude statistics
    * are channel-agnostic). 16-bit bins: (s + 32768) >> 12; 8-bit
    * (unsigned storage, per the WAV spec): (byte - 128 + 128) >> 4 —
    * both land in the same 16-bin layout as the image luminance
    * histogram, so downstream feature consumers see one shape.
    */
  private def decodeWav(payload: Array[Byte])
      : Option[(Array[Double], Array[Long], Array[Long])] =
    try {
      def u16(i: Int): Int =
        (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
      def u32(i: Int): Long =
        (payload(i) & 0xffL) | ((payload(i + 1) & 0xffL) << 8) |
          ((payload(i + 2) & 0xffL) << 16) | ((payload(i + 3) & 0xffL) << 24)
      if (payload.length < 44) return None
      if (!(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
            payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
            payload(10) == 'V' && payload(11) == 'E')) return None
      var pos = 12
      var bits = -1
      var fmtOk = false
      var dataOff = -1
      var dataLen = 0L
      while (pos + 8 <= payload.length && (!fmtOk || dataOff < 0)) {
        val id = new String(payload, pos, 4, "US-ASCII")
        val sz = u32(pos + 4)
        val body = pos + 8
        if (body + sz > payload.length) return None // truncated/hostile
        if (id == "fmt " && sz >= 16) {
          val audioFormat = u16(body)
          bits = u16(body + 14)
          if (audioFormat != 1 || (bits != 8 && bits != 16)) return None
          fmtOk = true
        } else if (id == "data") { dataOff = body; dataLen = sz }
        pos = body + sz.toInt + (sz.toInt & 1) // RIFF pads odd chunks
      }
      if (!fmtOk || dataOff < 0) return None
      val n = dataLen / (bits / 8)
      if (n <= 0 || n > MaxDecodeSamples) return None
      def sample(i: Long): Int =
        if (bits == 8) (payload(dataOff + i.toInt) & 0xff) - 128
        else {
          val o = dataOff + 2 * i.toInt
          ((payload(o) & 0xff) | (payload(o + 1) << 8)).toShort.toInt
        }
      val hist = new Array[Double](16)
      var i = 0L
      while (i < n) {
        val v = sample(i)
        hist(if (bits == 8) (v + 128) >> 4 else (v + 32768) >> 12) += 1
        i += 1
      }
      var j = 0
      while (j < 16) { hist(j) /= n; j += 1 }
      val frames = Array(0L, n / 4, n / 2, 3 * n / 4, n - 1)
        .map(o => sample(math.min(o, n - 1)).toLong)
      // waveform thumbnail: 64 evenly spaced samples rescaled to the
      // image grid's 0..255 range, so every modality shares one shape
      val grid = new Array[Long](64)
      var g = 0
      while (g < 64) {
        val v = sample(math.min((g * n) / 64, n - 1))
        grid(g) = (if (bits == 8) v + 128 else (v + 32768) >> 8).toLong
        g += 1
      }
      Some((hist, frames, grid))
    } catch { case _: Exception => None }

  /** Parsed MP4/ISO-BMFF container metadata — the box-level facts a
    * training pipeline filters on BEFORE shipping bytes to a GPU decode
    * tier (resolution, duration, track count). No sample decode.
    */
  case class Mp4Meta(brand: String, timescale: Long, durationMs: Long,
                     nTracks: Int, width: Int, height: Int)

  /** REAL MP4/ISO-BMFF container probe, pure JVM: walks the top-level
    * box sequence (64-bit largesize and size-0-to-EOF handled), descends
    * into moov for mvhd (v0/v1 timescale + duration) and per-trak tkhd
    * (16.16 fixed-point presentation dims; first visual track wins).
    * Strictly bounds-checked — a hostile size field truncates the walk
    * rather than reading out of range. Returns None for anything that
    * is not a plausible MP4 (no ftyp, no usable mvhd), routing the
    * record to the byte-level fallback. Frame/sample DECODE remains the
    * documented ffmpeg seam; this probe only reads container structure.
    */
  def mp4Meta(p: Array[Byte]): Option[Mp4Meta] =
    try {
      def be32(i: Int): Long =
        ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
          ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
      def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
      if (p.length < 16) return None
      var brand: String = null
      var timescale = 0L
      var duration = -1L
      var nTracks = 0
      var w = 0
      var h = 0
      def walk(start: Long, end: Long, depth: Int): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          var sz = be32(pos.toInt)
          val typ = new String(p, pos.toInt + 4, 4, "ISO-8859-1")
          var hdr = 8L
          if (sz == 1) {
            if (pos + 16 > end) return
            sz = be64(pos.toInt + 8); hdr = 16
          } else if (sz == 0) sz = end - pos
          if (sz < hdr || pos + sz > end) return // hostile size field
          val body = (pos + hdr).toInt
          val boxEnd = pos + sz
          typ match {
            case "ftyp" if brand == null && body + 4 <= boxEnd =>
              brand = new String(p, body, 4, "ISO-8859-1")
            case "moov" if depth == 0 => walk(body, boxEnd, 1)
            case "trak" if depth == 1 =>
              nTracks += 1; walk(body, boxEnd, 2)
            case "mvhd" if depth == 1 && body < boxEnd =>
              if ((p(body) & 0xff) == 1 && body + 32 <= boxEnd) {
                timescale = be32(body + 20); duration = be64(body + 24)
              } else if (body + 24 <= boxEnd) {
                timescale = be32(body + 12); duration = be32(body + 16)
              }
            case "tkhd" if depth == 2 && body < boxEnd =>
              val off = if ((p(body) & 0xff) == 1) 88 else 76
              if (body + off + 8 <= boxEnd) {
                val tw = (be32(body + off) >> 16).toInt
                val th = (be32(body + off + 4) >> 16).toInt
                // audio/metadata tracks carry 0x0 dims; first visual wins
                if (w == 0 && tw > 0 && th > 0) { w = tw; h = th }
              }
            case _ =>
          }
          pos += sz
        }
      }
      walk(0, p.length, 0)
      if (brand == null || timescale <= 0 || duration < 0) None
      else Some(Mp4Meta(brand, timescale, duration * 1000 / timescale,
        nTracks, w, h))
    } catch { case _: Exception => None }

  /** REAL video frame decode for MJPEG-in-AVI, pure JVM — the RIFF
    * chunk walk of [[decodeWav]] generalized to AVI's LIST structure,
    * plus per-frame ImageIO JPEG decode. AVI stores each compressed
    * video frame as a self-contained '##dc'/'##db' chunk inside the
    * 'movi' LIST (optionally nested in 'rec ' interleave groups), and
    * MJPEG frames are plain JFIF payloads — so frame extraction needs
    * zero FFI. Five frames are sampled at the image tier's fixed
    * positions (first/quarter/mid/three-quarter/last of the SEQUENCE):
    *  - hist: mean of the sampled frames' luminance histograms (each
    *    normalized, so the mean is too);
    *  - frames: each sampled frame's raster-midpoint luminance — the
    *    temporal analog of the image tier's five spatial positions;
    *  - grid: the middle sampled frame's 8x8 thumbnail (the poster
    *    frame), so video aHash is comparable with image aHash.
    * Strictly bounds-checked like the other parsers; any sampled frame
    * that fails the JPEG decode (or an empty movi) returns None and the
    * record takes the byte-level fallback. Non-MJPEG codecs (H.264…)
    * have no in-JVM decoder and stay behind the ffmpeg seam in
    * [[decodeStub]].
    */
  private def decodeAviFrames(payload: Array[Byte])
      : Option[(Array[Double], Array[Long], Array[Long], Int, Int)] =
    try {
      def u32(i: Int): Long =
        (payload(i) & 0xffL) | ((payload(i + 1) & 0xffL) << 8) |
          ((payload(i + 2) & 0xffL) << 16) | ((payload(i + 3) & 0xffL) << 24)
      if (payload.length < 12) return None
      if (!(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
            payload(3) == 'F' && payload(8) == 'A' && payload(9) == 'V' &&
            payload(10) == 'I' && payload(11) == ' ')) return None
      val ranges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def walk(start: Int, end: Int): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val id = new String(payload, pos, 4, "US-ASCII")
          val sz = u32(pos + 4)
          val body = pos + 8
          if (body + sz > end) return // truncated/hostile size field
          if (id == "LIST" && sz >= 4) {
            val lt = new String(payload, body, 4, "US-ASCII")
            if (lt == "movi" || lt == "rec ") walk(body + 4, body + sz.toInt)
          } else if (id(0) >= '0' && id(0) <= '9' && id(1) >= '0' &&
                     id(1) <= '9' && (id.endsWith("dc") || id.endsWith("db"))
                     && sz > 0)
            ranges += ((body, sz.toInt))
          pos = body + sz.toInt + (sz.toInt & 1) // RIFF pads odd chunks
        }
      }
      walk(12, payload.length)
      val n = ranges.length
      if (n == 0) return None
      val sampled = Array(0, n / 4, n / 2, 3 * n / 4, n - 1)
        .map(i => ranges(math.min(i, n - 1)))
        .map { case (off, len) =>
          decodeImage(java.util.Arrays.copyOfRange(payload, off, off + len))
        }
      if (sampled.exists(_.isEmpty)) return None // a frame ImageIO rejects
      val decoded = sampled.map(_.get)
      val hist = new Array[Double](16)
      decoded.foreach(d => (0 until 16).foreach(j => hist(j) += d._1(j) / 5))
      // per-frame midpoint luminance: index 2 of the image tier's five
      // fixed raster positions
      val frames = decoded.map(_._2(2))
      val (_, _, grid, w, h) = decoded(2) // middle frame = poster
      Some((hist, frames, grid, w, h))
    } catch { case _: Exception => None }

  /** FALLBACK decode for payloads no in-JVM codec handles (video frame
    * decode for non-MJPEG codecs — a real implementation hands those to
    * ffmpeg via FFI here; MJPEG-in-AVI decodes for real in
    * [[decodeAviFrames]] — plus undecodable images/audio): a
    * deterministic byte-level histogram, so tests and rows-only checks
    * are stable.
    */
  // format: off
  private def decodeStub(payload: Array[Byte])
      : (Array[Double], Array[Long], Array[Long]) = {
    if (payload.isEmpty)
      return (new Array[Double](16), new Array[Long](5), new Array[Long](64))
    // non-image codec seam: [[ffmpegKeyframes]] is the wired subprocess
    // path when [[ffmpegBinary]] probes a binary (absent in this
    // sandbox — COVERAGE.md records the probe result); this stub is the
    // deterministic fallback the ORACLE-CHECKED queries always use, so
    // results never depend on the host's codec inventory:
    val hist = new Array[Double](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1; i += 1 }
    val n = math.max(payload.length, 1)
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    // "frame sampling": first/quarter/mid/three-quarter/last byte offsets
    val frames = Array(0, n / 4, n / 2, 3 * n / 4, n - 1)
      .map(o => (payload(math.min(o, payload.length - 1)) & 0xff).toLong)
    val grid = Array.tabulate(64)(g =>
      (payload(math.min((g * payload.length) / 64,
        payload.length - 1)) & 0xff).toLong)
    (hist, frames, grid)
  }
  // format: on

  /** Feature extraction over any (doc_id, payload, mime, width, height)
    * media frame — partition-wise batch processing through the typed
    * Dataset API. Image mimes go through the REAL ImageIO decode (true
    * dims override the metadata claim); audio mimes through the REAL
    * RIFF/WAVE PCM parse (metadata dims kept — audio has no raster);
    * everything else (and undecodable records) falls back to the
    * byte-level stub.
    */
  def extractFeatures(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media
      .select(col("doc_id"), col("payload"), col("mime"), col("width"),
        col("height"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          // null-tolerant: a row with NULL payload/mime flows through the
          // fallback, it must not fail the stage
          val payload =
            if (r.payload == null) Array.emptyByteArray else r.payload
          val mime = if (r.mime == null) "" else r.mime
          val (hist, frames, grid, w, h, decoded) =
            if (mime.startsWith("image/")) decodeImage(payload) match {
              case Some((hs, fr, gd, dw, dh)) => (hs, fr, gd, dw, dh, true)
              case None =>
                val (hs, fr, gd) = decodeStub(payload)
                (hs, fr, gd, r.width, r.height, false)
            } else if (mime.startsWith("audio/")) decodeWav(payload) match {
              case Some((hs, fr, gd)) => (hs, fr, gd, r.width, r.height, true)
              case None =>
                val (hs, fr, gd) = decodeStub(payload)
                (hs, fr, gd, r.width, r.height, false)
            } else if (mime.startsWith("video/")) {
              // MJPEG-in-AVI gets a REAL sampled-frame decode (true
              // raster dims, pixel features, decoded=true). Other
              // containers: MP4 probe only — true presentation dims
              // from tkhd override the metadata claim when the payload
              // parses, hist/frames stay byte-level and `decoded` stays
              // false since no SAMPLE decode ran (the ffmpeg seam)
              decodeAviFrames(payload) match {
                case Some((hs, fr, gd, vw, vh)) => (hs, fr, gd, vw, vh, true)
                case None =>
                  val (hs, fr, gd) = decodeStub(payload)
                  mp4Meta(payload) match {
                    case Some(m) if m.width > 0 =>
                      (hs, fr, gd, m.width, m.height, false)
                    case _ => (hs, fr, gd, r.width, r.height, false)
                  }
              }
            } else {
              val (hs, fr, gd) = decodeStub(payload)
              (hs, fr, gd, r.width, r.height, false)
            }
          // resize: clamp dims to a thumbnail box, aspect ratio kept
          // (the 8x8 `grid` is the real pixel resample; these are the
          // serving-layer dims)
          val scale = math.min(1.0, 128.0 / math.max(w, h))
          MediaFeatures(r.doc_id, payload.length, r.mime, hist, frames,
            grid, ahashOf(grid),
            math.max(1, (w * scale).toInt),
            math.max(1, (h * scale).toInt),
            decoded = decoded)
        }
      }
      .toDF()
  }

  /** Array-typed features over the synthetic media table (the spec
    * asserts on raw values).
    */
  def multimodalFeaturesRaw(s: SparkSession, dir: String): DataFrame =
    extractFeatures(s, mediaMeta(s, dir))

  /** Oracle-checked slice of the features pass (the partial-oracle
    * split): every column here is computed by the REAL [[extractFeatures]]
    * path — mapPartitions batching, decode ATTEMPTS against ImageIO /
    * the WAV parser / the MP4 probe, fallback routing — yet is exactly
    * SQL-mirrorable on the synthetic corpus, where no text payload
    * parses under any real codec (verified: no document starts with
    * RIFF or carries an ftyp box), so every record deterministically
    * takes the byte-level fallback. Mirrored: n_bytes, mime, the five
    * frame samples and the 64-cell byte grid (exact integer byte
    * values — the corpus is pure ASCII, so DuckDB character codes ARE
    * the UTF-8 bytes), the serving-layer thumb dims, the `decoded`
    * flag (false everywhere — asserting the real decoders were TRIED
    * and correctly refused text bytes rather than being skipped), and
    * since round 10 the full float histogram and the bit-packed aHash:
    *  - hist_0..hist_15 export as separate DOUBLE columns, NOT a
    *    rounded-decimal string: each value is count/n — an exact
    *    integer count (a sum of 1.0s, exact in a double far below
    *    2^53) divided by an exact integer, ONE IEEE-754 division both
    *    engines perform bit-identically — so the doubles hash equal at
    *    FULL precision with no rounding device at all (a decimal-
    *    rounded string would reintroduce the shortest-repr-vs-binary
    *    tie-break asymmetry between engines that the rounding devices
    *    exist to dodge);
    *  - ahash is integer bit-packing over the mirrored grid, expressed
    *    in SQL as a 64-term CASE sum (bit 63 via the signed-overflow
    *    identity: setting the sign bit adds -2^63).
    * Nothing computed by the features pass is unchecked on the
    * synthetic corpus; the legacy `multimodal_features` query keeps
    * the array-string rendering shape (rows-only) as the driver-facing
    * canonical-string form.
    */
  def multimodalFeaturesChecked(s: SparkSession, dir: String): DataFrame = {
    val histCols = (0 until 16).map(j => col("hist")(j).as(s"hist_$j"))
    multimodalFeaturesRaw(s, dir).select(
      Seq(col("doc_id"), col("n_bytes"), col("mime"),
        array_join(transform(col("frames"), _.cast("string")), ",")
          .as("frames"),
        array_join(transform(col("grid"), _.cast("string")), ",")
          .as("grid")) ++ histCols ++ Seq(
        col("ahash"),
        col("thumb_w"), col("thumb_h"), col("decoded")): _*)
  }

  /** DuckDB mirror of [[multimodalFeaturesChecked]]: byte-fallback
    * features recomputed from documents arithmetic. trunc() before the
    * INT cast because DuckDB's double→INT cast rounds where Scala's
    * .toInt truncates. hist bins count high nibbles (byte >> 4 =
    * ascii // 16 on the ASCII corpus) over ALL positions; the
    * denominator is greatest(n, 1) — [[decodeStub]]'s
    * max(payload.length, 1) — so empty docs yield 0.0 bins, not a
    * division error. ahash mirrors [[ahashOf]]: 0 when every grid cell
    * is equal (the no-structure fingerprint), else Σ 2^i over cells >=
    * the integer mean, with bit 63 as (-2^63+0) via the BIGINT-safe
    * literal (-9223372036854775807 - 1).
    */
  def multimodalFeaturesCheckedOracleSql: String = {
    val histSelects = (0 until 16).map { j =>
      s"""        CAST(len(list_filter(nib, x -> x = $j)) AS DOUBLE)
          / CAST(greatest(n, 1) AS DOUBLE) AS hist_$j,"""
    }.mkString("\n")
    val ahashTerms = (0 until 64).map { i =>
      val bit =
        if (i == 63) "(-9223372036854775807 - 1)" else (1L << i).toString
      s"CASE WHEN gl[${i + 1}] >= gmean THEN CAST($bit AS BIGINT) " +
        s"ELSE CAST(0 AS BIGINT) END"
    }.mkString("\n          + ")
    s"""
      WITH d AS (
        SELECT doc_id, text, CAST(strlen(text) AS INT) AS n,
          64 + CAST(strlen(text) AS INT) % 512 AS w,
          64 + (CAST(strlen(text) AS INT) * 7) % 512 AS h
        FROM documents),
      g AS (
        SELECT *,
          list_transform(range(0, 64),
            g -> ascii(substr(text,
              CAST(least((g * n) // 64, n - 1) AS INT) + 1, 1))) AS gl,
          list_transform(range(1, CAST(n AS BIGINT) + 1),
            i -> ascii(substr(text, CAST(i AS INT), 1)) // 16) AS nib
        FROM d),
      m AS (
        SELECT *, CAST(list_sum(gl) // 64 AS BIGINT) AS gmean FROM g)
      SELECT doc_id, n AS n_bytes,
        CASE WHEN n % 4 = 0 THEN 'image/png'
             WHEN n % 4 = 1 THEN 'image/jpeg'
             WHEN n % 4 = 2 THEN 'audio/wav'
             ELSE 'video/mp4' END AS mime,
        array_to_string(list_transform([0, n // 4, n // 2, 3 * n // 4,
            n - 1],
          o -> CAST(ascii(substr(text, CAST(least(o, n - 1) AS INT) + 1,
            1)) AS VARCHAR)), ',') AS frames,
        array_to_string(list_transform(gl,
          v -> CAST(v AS VARCHAR)), ',') AS grid,
$histSelects
        CASE WHEN len(list_distinct(gl)) = 1 THEN CAST(0 AS BIGINT)
          ELSE CAST($ahashTerms AS BIGINT) END AS ahash,
        CAST(greatest(1, trunc(w * least(1.0, 128.0 / greatest(w, h))))
          AS INT) AS thumb_w,
        CAST(greatest(1, trunc(h * least(1.0, 128.0 / greatest(w, h))))
          AS INT) AS thumb_h,
        false AS decoded
      FROM m"""
  }

  /** Driver-facing features query, fully oracle-checked since r10
    * (previously the registry's one rows-only entry). Arrays are
    * canonicalized to joined strings — the driver's oracle harness
    * can't sort/hash ARRAY outputs — and the histogram renders in
    * MICRO-UNIT integers, floor(h * 1e6 + 0.5), the spelled half-up
    * device proven on projectEmbeddings: both engines compute the
    * identical double h = count/n (one IEEE division), so the floor of
    * the identical product is the identical integer — unlike a
    * decimal-rounded string, whose shortest-repr-vs-binary tie
    * handling differs between engines.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    multimodalFeaturesRaw(s, dir).select(
      col("doc_id"), col("n_bytes"), col("mime"),
      array_join(transform(col("hist"),
        x => floor(x * lit(1e6) + lit(0.5)).cast("long").cast("string")),
        ",").as("hist_micro"),
      array_join(transform(col("frames"), _.cast("string")), ",")
        .as("frames"),
      array_join(transform(col("grid"), _.cast("string")), ",")
        .as("grid"),
      col("ahash"),
      col("thumb_w"), col("thumb_h"), col("decoded"))

  /** DuckDB mirror of [[multimodalFeatures]] — the checked-slice mirror
    * plus the micro-unit histogram string, with the multiply-add-floor
    * sequence spelled in the exact order the Spark side evaluates.
    */
  def multimodalFeaturesOracleSql: String = {
    val histMicro = (0 until 16).map { j =>
      "CAST(CAST(floor(CAST(len(list_filter(nib, x -> x = " + j +
        ")) AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE) * 1000000.0" +
        " + 0.5) AS BIGINT) AS VARCHAR)"
    }.mkString("[", ",\n          ", "]")
    val ahashTerms = (0 until 64).map { i =>
      val bit =
        if (i == 63) "(-9223372036854775807 - 1)" else (1L << i).toString
      s"CASE WHEN gl[${i + 1}] >= gmean THEN CAST($bit AS BIGINT) " +
        s"ELSE CAST(0 AS BIGINT) END"
    }.mkString("\n          + ")
    s"""
      WITH d AS (
        SELECT doc_id, text, CAST(strlen(text) AS INT) AS n,
          64 + CAST(strlen(text) AS INT) % 512 AS w,
          64 + (CAST(strlen(text) AS INT) * 7) % 512 AS h
        FROM documents),
      g AS (
        SELECT *,
          list_transform(range(0, 64),
            g -> ascii(substr(text,
              CAST(least((g * n) // 64, n - 1) AS INT) + 1, 1))) AS gl,
          list_transform(range(1, CAST(n AS BIGINT) + 1),
            i -> ascii(substr(text, CAST(i AS INT), 1)) // 16) AS nib
        FROM d),
      m AS (
        SELECT *, CAST(list_sum(gl) // 64 AS BIGINT) AS gmean FROM g)
      SELECT doc_id, n AS n_bytes,
        CASE WHEN n % 4 = 0 THEN 'image/png'
             WHEN n % 4 = 1 THEN 'image/jpeg'
             WHEN n % 4 = 2 THEN 'audio/wav'
             ELSE 'video/mp4' END AS mime,
        array_to_string($histMicro, ',') AS hist_micro,
        array_to_string(list_transform([0, n // 4, n // 2, 3 * n // 4,
            n - 1],
          o -> CAST(ascii(substr(text, CAST(least(o, n - 1) AS INT) + 1,
            1)) AS VARCHAR)), ',') AS frames,
        array_to_string(list_transform(gl,
          v -> CAST(v AS VARCHAR)), ',') AS grid,
        CASE WHEN len(list_distinct(gl)) = 1 THEN CAST(0 AS BIGINT)
          ELSE CAST($ahashTerms AS BIGINT) END AS ahash,
        CAST(greatest(1, trunc(w * least(1.0, 128.0 / greatest(w, h))))
          AS INT) AS thumb_w,
        CAST(greatest(1, trunc(h * least(1.0, 128.0 / greatest(w, h))))
          AS INT) AS thumb_h,
        false AS decoded
      FROM m"""
  }

  // ------------------------------------------------ ffmpeg FFI seam
  // The subprocess path for codecs no in-JVM decoder handles (H.264
  // etc.). The PLUMBING — probe, bounded subprocess per payload,
  // deadlock-free stdin/stdout pumping, timeout kill, MJPEG stream
  // split — is real and spec-tested against a stand-in binary; only
  // the codec itself requires a host ffmpeg, which the sandbox lacks
  // (probe result recorded in COVERAGE.md).

  /** Probe for an ffmpeg binary at runtime: GRAFT_FFMPEG overrides,
    * else the conventional install paths, else PATH. None = the seam
    * stays on [[decodeStub]].
    */
  def ffmpegBinary(): Option[String] = {
    def exec(p: String): Boolean = {
      val f = new java.io.File(p)
      f.isFile && f.canExecute
    }
    sys.env.get("GRAFT_FFMPEG").filter(exec)
      .orElse(Seq("/usr/bin/ffmpeg", "/usr/local/bin/ffmpeg",
        "/opt/homebrew/bin/ffmpeg").find(exec))
      .orElse(sys.env.getOrElse("PATH", "").split(':')
        .map(d => s"$d/ffmpeg").find(exec))
  }

  /** Keyframe extraction through ONE bounded subprocess: payload on
    * stdin, up to `maxFrames` frames back as an MJPEG stream on stdout
    * (`-f image2pipe -codec:v mjpeg`), split into per-frame JPEG byte
    * arrays — each then decodable by the in-JVM ImageIO path the image
    * operators already use. Scale posture: called per row inside
    * mapPartitions, so parallelism = Spark tasks, each task running at
    * most ONE subprocess at a time; stdin feeds from a separate thread
    * (a process blocked writing stdout while the driver blocks writing
    * stdin is the classic pipe deadlock); stdout drains concurrently
    * with a hard size cap; the wall-clock timeout destroys the process
    * tree — a hung codec costs one task `timeoutMs`, never a hung
    * executor. None = probe/decode failure (callers fall back to
    * [[decodeStub]]).
    */
  def ffmpegKeyframes(binary: String, payload: Array[Byte],
                      maxFrames: Int = 5, timeoutMs: Long = 20000L,
                      maxOutBytes: Int = 64 << 20)
      : Option[Seq[Array[Byte]]] = {
    val cmd = java.util.Arrays.asList(binary, "-hide_banner",
      "-loglevel", "error", "-i", "pipe:0",
      "-frames:v", maxFrames.toString, "-f", "image2pipe",
      "-codec:v", "mjpeg", "pipe:1")
    try {
      val p = new ProcessBuilder(cmd).start()
      val feeder = new Thread(() => {
        try { p.getOutputStream.write(payload); p.getOutputStream.close() }
        catch { case _: java.io.IOException => () } // process exited early
      }, "graft-ffmpeg-stdin")
      feeder.setDaemon(true); feeder.start()
      val out = new java.io.ByteArrayOutputStream()
      @volatile var truncated = false
      val drainer = new Thread(() => {
        try {
          val in = p.getInputStream
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0 && !truncated) {
            if (out.size() + n > maxOutBytes) truncated = true
            else out.write(buf, 0, n)
            n = in.read(buf)
          }
        } catch { case _: java.io.IOException => () }
      }, "graft-ffmpeg-stdout")
      drainer.setDaemon(true); drainer.start()
      val finished =
        p.waitFor(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      if (!finished || truncated) { p.destroyForcibly(); return None }
      drainer.join(1000)
      if (p.exitValue() != 0) None
      else Some(splitMjpegStream(out.toByteArray)).filter(_.nonEmpty)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Split a concatenated MJPEG stream on JPEG SOI/EOI markers
    * (FFD8...FFD9). Marker bytes can occur inside entropy-coded data in
    * principle; ffmpeg's image2pipe emits clean frame boundaries, and a
    * misparsed frame fails its ImageIO decode downstream rather than
    * corrupting anything silently.
    */
  def splitMjpegStream(b: Array[Byte])
      : Seq[Array[Byte]] = {
    val frames = Vector.newBuilder[Array[Byte]]
    var i = 0
    var start = -1
    while (i + 1 < b.length) {
      val m = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
      if (m == 0xffd8 && start < 0) { start = i; i += 2 }
      else if (m == 0xffd9 && start >= 0) {
        frames += java.util.Arrays.copyOfRange(b, start, i + 2)
        start = -1; i += 2
      } else i += 1
    }
    frames.result()
  }
}
