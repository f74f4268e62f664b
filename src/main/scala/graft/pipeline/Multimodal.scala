package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns for training-data pipelines: image/audio/video travel
 * as opaque `BINARY` columns with a typed metadata struct, processed
 * batch-at-a-time inside `mapPartitions` so the decode library (when one
 * exists) amortizes per-partition init — the Spark-native shape for
 * non-columnar payloads.
 *
 * Image decode/resize is REAL for PNG/JPEG (and any other format the JDK's
 * `javax.imageio` registry carries — public JDK surface, headless-safe).
 * Audio decode is REAL for WAV PCM (`WavCodec`: pure-JVM RIFF parse, 8/16
 * bit, any channel count). Frame sampling is REAL for animated GIF
 * (`GifCodec`: multi-frame ImageIO read + delta-frame compositing) and for
 * MJPEG-in-AVI (`AviMjpegCodec`: RIFF chunk walk + per-frame JPEG decode)
 * — the two motion containers a stock JDK can demux. Payloads outside
 * those (mp3/flac/mp4/webm, the gate's text-bytes stand-ins) fall back to
 * the clearly-marked deterministic stub (`FakeCodec`) for images/frames
 * and to NULL stats for audio, so the pipeline shape stays total and
 * testable. The call sites (mapPartitions batch loop) never change — swap
 * the codec object for a JNI/ffmpeg binding to widen format coverage.
 */
object Multimodal {

  /** Real image codec over `javax.imageio` (PNG/JPEG/BMP/GIF in any stock
    * JDK). All methods return None when no registered reader understands
    * the bytes — callers fall back to `FakeCodec`. */
  object ImageIoCodec {
    // in-memory streams only: the default disk-backed ImageInputStream
    // cache adds a temp file per decode on the bulk path
    javax.imageio.ImageIO.setUseCache(false)

    /** NonFatal, not just IOException: imageio readers throw unchecked
      * exceptions (AIOOBE, CMMException, …) on truncated/crafted payloads
      * whose headers parse but bodies are corrupt — one such blob must not
      * kill a 10M-image job; it falls back like any undecodable payload. */
    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null || bytes.isEmpty) None
      else
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case scala.util.control.NonFatal(_) => None }

    def imageDims(bytes: Array[Byte]): Option[(Int, Int)] =
      decode(bytes).map(i => (i.getWidth, i.getHeight))

    /** Deterministic test-image encoder (probe/decode gates): a solid-color
      * w×h image through the stock ImageIO writer for `fmt` — only the
      * header facts (format, dims) are contract, so encoder byte drift
      * across JDKs cannot break an oracle built on the closed-form dims. */
    def encodeSolid(fmt: String, w: Int, h: Int, seed: Long): Array[Byte] =
      encodeSolidRgb(fmt, w, h, ((seed * 2654435761L) & 0xFFFFFF).toInt)

    /** `encodeSolid` with an explicit RGB — alignment gates (q136) need
      * exact pure-channel pixels, not a seed-hashed color. Lossless
      * formats (png/bmp) round-trip the channel values exactly. */
    def encodeSolidRgb(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb))
      g.fillRect(0, 0, w, h)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }

    /** Decode → scale to (w, h) → re-encode PNG. */
    def resizePng(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decode(bytes).map { img =>
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }

    /** 8-bin luminance histogram over decoded pixels, row-count normalized
      * — a real (if trivial) visual feature standing where an embedding
      * model's forward pass would run. */
    def features(bytes: Array[Byte]): Option[Array[Float]] =
      decode(bytes).map(featuresOf)

    /** Histogram from an already-decoded image (the bulk path decodes ONCE
      * per row and derives dims + features from the same BufferedImage). */
    def featuresOf(img: java.awt.image.BufferedImage): Array[Float] = {
      val h = new Array[Float](8)
      val (w, ht) = (img.getWidth, img.getHeight)
      // bulk row reads: getRGB(x, y) pays a per-CALL color-model convert;
      // the row variant returns the SAME default-sRGB ints (API contract)
      val row = new Array[Int](w)
      var y = 0
      while (y < ht) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          h(lum / 32) += 1f
          x += 1
        }
        y += 1
      }
      val n = math.max(1f, (w * ht).toFloat)
      h.map(_ / n)
    }
  }

  /** Deterministic 24-bit BMP synthesizer for the perceptual-hash gate:
    * a 36×32 canvas of 9×8 gray cells (4×4 px each) whose brightness
    * walks ±1 from 128 along each row, so the image's dHash bit
    * (r, c) = [cell(r, c+1) brighter than cell(r, c)] equals the closed
    * form `bitOf(id, r*8+c)` — the oracle recomputes `bitOf` in SQL, so
    * a header-offset, bottom-up-row or box-average bug in the decode →
    * downsample → compare chain cannot hash-match. BMP because it is
    * byte-trivial to EMIT by hand (no compression) yet decodes through
    * the very same `ImageIoCodec`/`javax.imageio` path a crawl uses. */
  object BmpCodec {
    val GridW = 9 // dHash compares 9 columns → 8 bits per row
    val GridH = 8
    /** Cell edge in pixels — parameterized so specs can verify dHash
      * scale-invariance with a pixel-doubled twin of the same id. */
    def width(cell: Int): Int = GridW * cell
    def height(cell: Int): Int = GridH * cell

    /** Closed-form dHash bit k of id. Base pattern: two congruences with
      * coprime moduli XORed (61·53 > 256 keeps all 256 id%256 patterns
      * distinct); one bit flipped at (id/256)%64 gives every id a
      * hamming-2 family — ids equal mod 256 are near-dups, everything
      * else sits ~32 bits away. */
    def bitOf(id: Long, k: Int): Boolean = {
      val g = (id % 256).toInt
      val base = (((g + 1) * (k + 3)) % 61 < 30) ^ (((g + 7) * (k + 11)) % 53 < 26)
      base ^ (k == ((id / 256) % 64).toInt)
    }

    /** Brightness of grid cell (r, c), c ∈ [0, 9): ±1 walk from 128 along
      * the row (stays in [120, 136] — far from clipping). */
    def cellValue(id: Long, r: Int, c: Int): Int = {
      var v = 128; var i = 0
      while (i < c) { v += (if (bitOf(id, r * 8 + i)) 1 else -1); i += 1 }
      v
    }

    /** The BMP bytes: BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up
      * BGR rows. At cell=4 a row is 36·3 = 108 bytes — already 4-byte
      * aligned; other cell sizes pad explicitly per the format. */
    def synthesize(id: Long, cell: Int = 4): Array[Byte] = {
      val w = width(cell); val h = height(cell)
      val rowBytes = (w * 3 + 3) & ~3
      val dataSize = rowBytes * h
      val b = java.nio.ByteBuffer.allocate(54 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
        .putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      var y = h - 1 // bottom-up storage; decoded row y = logical row y
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val v = cellValue(id, y / cell, x / cell).toByte
          b.put(v).put(v).put(v)
          x += 1
        }
        var p = w * 3
        while (p < rowBytes) { b.put(0: Byte); p += 1 }
        y -= 1
      }
      b.array()
    }
  }

  /** Perceptual difference-hash (dHash): box-average the decoded image to
    * a 9×8 gray grid, set bit r*8+c iff cell (r, c+1) is strictly
    * brighter than (r, c). 64 bits packed row-major LSB-first into two
    * unsigned 32-bit halves (lo = rows 0–3) so engines without unsigned
    * 64-bit math can still XOR/popcount them, plus the row-major hex
    * string for human-readable clustering keys. */
  object PHash {
    def dHash(img: java.awt.image.BufferedImage): (Long, Long, String) = {
      val w = img.getWidth; val h = img.getHeight
      val avg = Array.ofDim[Double](BmpCodec.GridH, BmpCodec.GridW)
      var r = 0
      while (r < BmpCodec.GridH) {
        var c = 0
        while (c < BmpCodec.GridW) {
          // floor-boundary boxes tile the image exactly; integer luma
          // sum (299/587/114 per mille — same weights as featuresOf)
          // divided once keeps equal-channel grays EXACT (sum = n·v·1000)
          val x0 = c * w / BmpCodec.GridW; val x1 = (c + 1) * w / BmpCodec.GridW
          val y0 = r * h / BmpCodec.GridH; val y1 = (r + 1) * h / BmpCodec.GridH
          var sum = 0L; var n = 0L
          val bw = x1 - x0
          val row = if (bw > 0) new Array[Int](bw) else null
          var y = y0
          while (y < y1 && bw > 0) {
            img.getRGB(x0, y, bw, 1, row, 0, bw) // bulk row: same ints as getRGB(x, y)
            var x = 0
            while (x < bw) {
              val rgb = row(x)
              sum += ((rgb >> 16) & 0xFF) * 299L + ((rgb >> 8) & 0xFF) * 587L +
                (rgb & 0xFF) * 114L
              n += 1; x += 1
            }
            y += 1
          }
          avg(r)(c) = if (n == 0) 0.0 else sum.toDouble / (n * 1000.0)
          c += 1
        }
        r += 1
      }
      var lo = 0L; var hi = 0L
      val hex = new java.lang.StringBuilder(16)
      r = 0
      while (r < BmpCodec.GridH) {
        var byte = 0
        var c = 0
        while (c < 8) {
          if (avg(r)(c + 1) > avg(r)(c)) byte |= 1 << c
          c += 1
        }
        if (r < 4) lo |= byte.toLong << (8 * r) else hi |= byte.toLong << (8 * (r - 4))
        hex.append(f"$byte%02x")
        r += 1
      }
      (hi, lo, hex.toString)
    }
  }

  /** Real animated-GIF frame extraction — pure JVM (`javax.imageio`'s GIF
    * reader demuxes the only motion format the stock JDK understands).
    * GIF frames may be DELTAS (a sub-rectangle at an offset over the
    * previous canvas), so each stored frame is composited onto a
    * logical-screen canvas at its ImageDescriptor offset and snapshotted;
    * restore-to-background/previous disposal is approximated by
    * draw-over (the common case for screen-capture/meme GIFs; a frame
    * SAMPLER tolerates the rare artifact). */
  object GifCodec {
    /** GIF87a/89a magic. */
    def isGif(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length > 6 &&
        bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'

    /** All frames as fully-composed RGB snapshots, or None when the
      * payload isn't a decodable GIF. */
    def frames(bytes: Array[Byte]): Option[Vector[java.awt.image.BufferedImage]] = {
      if (!isGif(bytes)) return None
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        // iis closes on EVERY exit — including a throw from reader
        // acquisition — or a long-running executor leaks one stream
        // per malformed payload
        try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, false)
          val n = reader.getNumImages(true)
          if (n <= 0) return None
          var canvas: java.awt.image.BufferedImage = null
          val out = Vector.newBuilder[java.awt.image.BufferedImage]
          var i = 0
          while (i < n) {
            val frame = reader.read(i)
            val (x, y) = frameOffset(reader, i)
            if (canvas == null) {
              val (cw, ch) = logicalScreen(reader)
                .getOrElse((x + frame.getWidth, y + frame.getHeight))
              canvas = new java.awt.image.BufferedImage(
                math.max(cw, x + frame.getWidth), math.max(ch, y + frame.getHeight),
                java.awt.image.BufferedImage.TYPE_INT_RGB)
            }
            val g = canvas.createGraphics()
            g.drawImage(frame, x, y, null); g.dispose()
            val snap = new java.awt.image.BufferedImage(
              canvas.getWidth, canvas.getHeight,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = snap.createGraphics()
            g2.drawImage(canvas, 0, 0, null); g2.dispose()
            out += snap
            i += 1
          }
          Some(out.result())
        } finally reader.dispose()
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Sampled frames re-encoded as PNG, keyed by SOURCE frame index. */
    def sampleFramesPng(bytes: Array[Byte], everyN: Int): Option[Seq[(Int, Array[Byte])]] =
      frames(bytes).map(_.zipWithIndex.collect {
        case (f, i) if i % math.max(1, everyN) == 0 =>
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(f, "png", bos)
          i -> bos.toByteArray
      })

    private def frameOffset(reader: javax.imageio.ImageReader, i: Int): (Int, Int) =
      try {
        val tree = reader.getImageMetadata(i)
          .getAsTree("javax_imageio_gif_image_1.0").asInstanceOf[org.w3c.dom.Element]
        val ds = tree.getElementsByTagName("ImageDescriptor")
        if (ds.getLength == 0) (0, 0)
        else {
          val e = ds.item(0).asInstanceOf[org.w3c.dom.Element]
          (e.getAttribute("imageLeftPosition").toInt,
            e.getAttribute("imageTopPosition").toInt)
        }
      } catch { case scala.util.control.NonFatal(_) => (0, 0) }

    private def logicalScreen(reader: javax.imageio.ImageReader): Option[(Int, Int)] =
      try {
        val tree = reader.getStreamMetadata
          .getAsTree("javax_imageio_gif_stream_1.0").asInstanceOf[org.w3c.dom.Element]
        val ds = tree.getElementsByTagName("LogicalScreenDescriptor")
        if (ds.getLength == 0) None
        else {
          val e = ds.item(0).asInstanceOf[org.w3c.dom.Element]
          Some((e.getAttribute("logicalScreenWidth").toInt,
            e.getAttribute("logicalScreenHeight").toInt))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real WAV (RIFF/WAVE) PCM decode — pure JVM, no codec library: a RIFF
    * chunk walk (word-aligned, order-independent) to `fmt ` + `data`, then
    * PCM samples normalized to [-1, 1) (16-bit signed LE / 2^15, 8-bit
    * unsigned offset-128 / 2^7). Closes the one modality `readMedia`
    * ingests but nothing decoded; compressed audio (mp3/flac) still has no
    * stock-JVM decoder and falls through to None. */
  object WavCodec {
    /** RIFF....WAVE magic. */
    def isWav(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length > 44 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

    /** Decoded PCM: `samples(channel)(frame)`, normalized to [-1, 1). */
    final case class Pcm(sampleRate: Int, channels: Int, bitsPerSample: Int,
        samples: Array[Array[Double]]) {
      def frames: Int = if (samples.isEmpty) 0 else samples(0).length
    }

    /** Per-file audio stats — the cheap "forward pass" of an audio crawl:
      * duration from the header, RMS/peak over all channels, zero
      * crossings (strict sign flips) on channel 0. */
    final case class Stats(sampleRate: Int, channels: Int, frames: Long,
        durationMs: Long, rms: Double, peak: Double, zeroCrossings: Long)

    private def le32(b: Array[Byte], p: Int): Int =
      (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
        ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
    private def le16(b: Array[Byte], p: Int): Int =
      (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)

    /** PCM frames, or None for non-WAV / non-PCM / malformed payloads (a
      * bad blob must not kill a crawl — same contract as ImageIoCodec). */
    def decode(bytes: Array[Byte]): Option[Pcm] = {
      if (!isWav(bytes)) return None
      try {
        var pos = 12
        var fmt: Option[(Int, Int, Int, Int)] = None // format, ch, rate, bits
        var data: Option[(Int, Int)] = None          // offset, len
        val end = math.min(bytes.length.toLong, 8L + le32(bytes, 4)).toInt
        while (pos + 8 <= end && (fmt.isEmpty || data.isEmpty)) {
          val id = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
          val size = le32(bytes, pos + 4)
          if (size < 0) return None
          val body = pos + 8
          id match {
            case "fmt " if size >= 16 && body + 16 <= end =>
              fmt = Some((le16(bytes, body), le16(bytes, body + 2),
                le32(bytes, body + 4), le16(bytes, body + 14)))
            case "data" =>
              data = Some((body, math.min(size.toLong, (end - body).toLong).toInt))
            case _ => ()
          }
          pos = body + size + (size & 1) // RIFF chunks are word-aligned
        }
        for {
          (format, ch, rate, bits) <- fmt
          (off, len) <- data
          if format == 1 && ch >= 1 && rate > 0 && (bits == 8 || bits == 16)
        } yield {
          val bytesPerSample = bits / 8
          val blockAlign = ch * bytesPerSample
          val frames = len / blockAlign
          val out = Array.ofDim[Double](ch, frames)
          var f = 0
          while (f < frames) {
            var c = 0
            while (c < ch) {
              val p = off + f * blockAlign + c * bytesPerSample
              out(c)(f) =
                if (bits == 16) le16(bytes, p).toShort / 32768.0
                else ((bytes(p) & 0xFF) - 128) / 128.0
              c += 1
            }
            f += 1
          }
          Pcm(rate, ch, bits, out)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Stats from decoded PCM. RMS/peak span ALL channels (interleaved
      * energy); zero crossings count strict sign flips (product < 0) on
      * channel 0 — zeros neither cross nor reset. */
    def stats(pcm: Pcm): Stats = {
      var sumSq = 0.0; var peak = 0.0; var n = 0L
      var c = 0
      while (c < pcm.channels) {
        val s = pcm.samples(c)
        var i = 0
        while (i < s.length) {
          val v = s(i)
          sumSq += v * v
          if (math.abs(v) > peak) peak = math.abs(v)
          n += 1; i += 1
        }
        c += 1
      }
      var zc = 0L
      if (pcm.channels > 0) {
        val s0 = pcm.samples(0)
        var i = 1
        while (i < s0.length) {
          if (s0(i - 1) * s0(i) < 0) zc += 1
          i += 1
        }
      }
      Stats(pcm.sampleRate, pcm.channels, pcm.frames.toLong,
        if (pcm.sampleRate > 0) pcm.frames.toLong * 1000L / pcm.sampleRate else 0L,
        if (n > 0) math.sqrt(sumSq / n) else 0.0, peak, zc)
    }

    /** Canonical 44-byte-header PCM16 WAV from interleaved-by-channel
      * samples — the fixture encoder (spec golden bytes pin the decoder
      * against it, so an encode/decode byte-order bug cannot cancel out). */
    def encodePcm16(sampleRate: Int, samples: Array[Array[Short]]): Array[Byte] = {
      val ch = samples.length
      require(ch >= 1, "encodePcm16: at least one channel")
      val frames = samples(0).length
      val dataLen = frames * ch * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(ch.toShort).putInt(sampleRate)
        .putInt(sampleRate * ch * 2).putShort((ch * 2).toShort).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var f = 0
      while (f < frames) {
        var c = 0
        while (c < ch) { bb.putShort(samples(c)(f)); c += 1 }
        f += 1
      }
      bb.array()
    }

    /** DFT spectrum of the first `n` samples (zero-padded) of channel 0:
      * (dominantBin, dominantHz, centroidHz, bandFractions). Naive
      * O(n²/2) real DFT — n is a small analysis window (default 256), so
      * per-row cost is bounded regardless of file length; the classic
      * audio "forward pass" features (dominant pitch, spectral centroid,
      * octave-ish band energy fractions) without any codec library.
      * Deterministic: ties on bin energy break toward the LOWER bin. */
    def spectrum(pcm: Pcm, n: Int = 256, bands: Int = 8):
        (Int, Double, Double, Array[Double]) = {
      require(n >= 2 && bands >= 1 && n % (2 * bands) == 0,
        s"spectrum: need n >= 2 and bands dividing n/2; got n=$n bands=$bands")
      val s = new Array[Double](n)
      val src = if (pcm.channels > 0) pcm.samples(0) else Array.empty[Double]
      var i = 0
      while (i < n && i < src.length) { s(i) = src(i); i += 1 }
      val half = n / 2
      // twiddle tables: the DFT angle is 2π·(k·t mod n)/n, so n cos/sin
      // entries replace the n²/2 trig calls that dominated the naive
      // form (measured 10.9 → ~0.4 s on the q100 gate's 5000 rows)
      val cosTab = new Array[Double](n)
      val sinTab = new Array[Double](n)
      var j = 0
      while (j < n) {
        val ang = 2.0 * math.Pi * j / n
        cosTab(j) = math.cos(ang)
        sinTab(j) = math.sin(ang)
        j += 1
      }
      val energy = new Array[Double](half)
      var k = 0
      while (k < half) {
        var re = 0.0; var im = 0.0
        var t = 0
        var idx = 0 // (k·t) mod n without multiplication in the loop
        while (t < n) {
          re += s(t) * cosTab(idx)
          im -= s(t) * sinTab(idx)
          idx += k
          if (idx >= n) idx -= n
          t += 1
        }
        energy(k) = re * re + im * im
        k += 1
      }
      var dom = 0
      var total = 0.0
      var weighted = 0.0
      val binHz = pcm.sampleRate.toDouble / n
      k = 0
      while (k < half) {
        if (energy(k) > energy(dom)) dom = k
        total += energy(k)
        weighted += k * binHz * energy(k)
        k += 1
      }
      val fractions = new Array[Double](bands)
      val perBand = half / bands
      k = 0
      while (k < half) { fractions(k / perBand) += energy(k); k += 1 }
      if (total > 0) { var b = 0; while (b < bands) { fractions(b) /= total; b += 1 } }
      (dom, dom * binHz, if (total > 0) weighted / total else 0.0, fractions)
    }

    /** Deterministic mono sine fixture: EXACTLY `cycles` periods inside a
      * `windowN`-sample analysis window (frequency = cycles·rate/windowN),
      * so the DFT concentrates all signal energy in bin `cycles` — int16
      * quantization adds only ~1e-11 relative noise, far below a 2-decimal
      * rounding of the centroid. The q100 oracle's closed form. */
    def synthesizeSine(id: Long, rate: Int = 8000, windowN: Int = 256,
        amp: Int = 8000): Array[Byte] = {
      val cycles = (3 + id % 60).toInt
      val s = new Array[Short](windowN)
      var i = 0
      while (i < windowN) {
        s(i) = math.round(amp * math.sin(2.0 * math.Pi * cycles * i / windowN)).toShort
        i += 1
      }
      encodePcm16(rate, Array(s))
    }

    /** Deterministic mono square-wave fixture keyed by id — every stat is
      * a CLOSED FORM of id (rate, frames, amplitude, half-period below),
      * so a SQL oracle can verify the decode without parsing bytes:
      * rms = peak = amp/2^15 exactly (every sample is ±amp; the mean of n
      * equal squares is exact in IEEE double), zero_crossings =
      * (frames-1) // halfPeriod (signs flip exactly at multiples of it). */
    def synthesizeSquare(id: Long): Array[Byte] = {
      val rate = 8000 + (id % 5).toInt * 2000
      val frames = 200 + (id % 300).toInt
      val amp = (1000 + (id % 20).toInt * 500).toShort
      val half = 2 + (id % 10).toInt
      val s = new Array[Short](frames)
      var i = 0
      while (i < frames) {
        s(i) = if ((i / half) % 2 == 0) amp else (-amp).toShort
        i += 1
      }
      encodePcm16(rate, Array(s))
    }
  }

  /** Real MJPEG-in-AVI frame extraction — the GifCodec pattern on the
    * second container a stock JVM can handle: AVI is RIFF (same chunk walk
    * as WavCodec, plus LIST recursion), and MJPEG frames are plain JPEGs
    * in `##dc`/`##db` chunks that `javax.imageio` decodes individually.
    * Frames are independent (no delta compositing), so SAMPLING decodes
    * only every Nth frame — the chunk walk itself never inflates pixels.
    * mp4/webm still fall through to the labeled stub (no stock demuxer). */
  object AviMjpegCodec {
    /** RIFF....AVI  magic. */
    def isAvi(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length > 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

    private def le32(b: Array[Byte], p: Int): Int =
      (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
        ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)

    /** (offset, size) of every JPEG video chunk (SOI-checked `##dc`/`##db`,
      * `LIST rec ` groups included), in stream order; None when the
      * payload isn't an AVI or carries no JPEG frames (DIB/other codecs). */
    private def frameChunks(bytes: Array[Byte]): Option[Vector[(Int, Int)]] = {
      if (!isAvi(bytes)) return None
      try {
        val out = Vector.newBuilder[(Int, Int)]
        var found = 0
        def walk(start: Int, limit: Int): Unit = {
          var pos = start
          while (pos + 8 <= limit) {
            val size = le32(bytes, pos + 4)
            val body = pos + 8
            if (size < 0 || body + size > limit) return // truncated: stop
            if (bytes(pos) == 'L' && bytes(pos + 1) == 'I' &&
                bytes(pos + 2) == 'S' && bytes(pos + 3) == 'T') {
              if (size >= 4) walk(body + 4, body + size) // skip list type
            } else if (bytes(pos + 2) == 'd' &&
                (bytes(pos + 3) == 'c' || bytes(pos + 3) == 'b') &&
                size > 3 && (bytes(body) & 0xFF) == 0xFF &&
                (bytes(body + 1) & 0xFF) == 0xD8) { // JPEG SOI
              out += ((body, size)); found += 1
            }
            pos = body + size + (size & 1) // word-aligned
          }
        }
        walk(12, math.min(bytes.length.toLong, 8L + le32(bytes, 4)).toInt)
        if (found > 0) Some(out.result()) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** All frames decoded (spec/diagnostic surface; samplers should use
      * `sampleFramesPng`, which skips non-sampled JPEG decodes). */
    def frames(bytes: Array[Byte]): Option[Vector[java.awt.image.BufferedImage]] =
      frameChunks(bytes).map(_.flatMap { case (off, len) =>
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off, len)))
        catch { case scala.util.control.NonFatal(_) => None }
      })

    /** Every `everyN`-th frame re-encoded PNG, keyed by SOURCE frame index
      * — `GifCodec.sampleFramesPng`'s contract; only sampled chunks pay a
      * JPEG decode. */
    def sampleFramesPng(bytes: Array[Byte], everyN: Int): Option[Seq[(Int, Array[Byte])]] =
      frameChunks(bytes).map(_.zipWithIndex.collect {
        case ((off, len), i) if i % math.max(1, everyN) == 0 => (off, len, i)
      }.flatMap { case (off, len, i) =>
        (try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off, len)))
        catch { case scala.util.control.NonFatal(_) => None }).map { img =>
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          i -> bos.toByteArray
        }
      })

    /** Deterministic MJPEG-AVI synthesizer (gate fixture, see BmpCodec for
      * the pattern): `2 + id%5` solid-gray JPEG frames, frame k's gray
      * level `32·((id+k)%7) + 16`, dims `(16+8·(id%3)) × (8+8·(id%2))`.
      * Frame count, dims and the gray BUCKET `(id+k)%7` all have closed
      * forms an oracle recomputes arithmetically: a solid frame is a
      * DC-only JPEG, so decode error (±2 of the encoded gray) is far
      * inside the 32-wide bucket centered 16 off each boundary. */
    def synthesize(id: Long): Array[Byte] = {
      val n = 2 + (id % 5).toInt
      val w = 16 + 8 * (id % 3).toInt
      val h = 8 + 8 * (id % 2).toInt
      def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
        (v >> 16).toByte, (v >> 24).toByte)
      def chunk(cid: String, b: Array[Byte]): Array[Byte] =
        cid.getBytes("US-ASCII") ++ le32(b.length) ++ b ++
          (if ((b.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
      def jpegSolid(gray: Int): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(gray, gray, gray))
        g.fillRect(0, 0, w, h)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      val movi = "movi".getBytes("US-ASCII") ++
        (0 until n).flatMap(k => chunk("00dc",
          jpegSolid(32 * ((id + k) % 7).toInt + 16))).toArray
      val hdrl = "hdrl".getBytes("US-ASCII") ++ chunk("avih", new Array[Byte](56))
      val body = "AVI ".getBytes("US-ASCII") ++
        chunk("LIST", hdrl) ++ chunk("LIST", movi)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
  }

  /** Real ISO-BMFF (mp4/mov/m4a) METADATA probe — the stock JVM ships no
    * H.264/AAC decoder, so frames stay out of reach, but the container's
    * box tree is a pure-JVM parse: a crawl gets real duration/track
    * stats for mp4 payloads instead of stub numbers. Big-endian sizes,
    * 64-bit `largesize` (size==1) and to-end-of-file (size==0) boxes,
    * mvhd versions 0 (32-bit) and 1 (64-bit) all handled. */
  object Mp4Probe {
    /** mp4 family magic: box 1 is `ftyp`. */
    def isMp4(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length > 16 &&
        bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'

    final case class Meta(majorBrand: String, timescale: Long,
        duration: Long, tracks: Int) {
      def durationMs: Long = if (timescale > 0) duration * 1000L / timescale else 0L
    }

    private def be32(b: Array[Byte], p: Int): Long =
      ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
        ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)
    private def be64(b: Array[Byte], p: Int): Long =
      (be32(b, p) << 32) | be32(b, p + 4)

    /** Container metadata, or None for non-mp4 / malformed payloads. */
    def probe(bytes: Array[Byte]): Option[Meta] = {
      if (!isMp4(bytes)) return None
      try {
        var brand = ""
        var timescale = 0L
        var duration = 0L
        var tracks = 0
        var sawMvhd = false
        // (start, limit) box-walk with explicit work list: moov children
        // are pushed as a nested range — no recursion depth concerns
        var ranges = List((0L, bytes.length.toLong))
        while (ranges.nonEmpty) {
          val (start, limit) = ranges.head
          ranges = ranges.tail
          var pos = start
          while (pos + 8 <= limit) {
            val size0 = be32(bytes, pos.toInt)
            val typ = new String(bytes, pos.toInt + 4, 4,
              java.nio.charset.StandardCharsets.US_ASCII)
            val (size, hdr) =
              if (size0 == 1 && pos + 16 <= limit) (be64(bytes, pos.toInt + 8), 16L)
              else if (size0 == 0) (limit - pos, 8L)
              else (size0, 8L)
            if (size < hdr || pos + size > limit) { pos = limit } // truncated: stop
            else {
              val body = pos + hdr
              typ match {
                case "ftyp" if size >= hdr + 4 =>
                  brand = new String(bytes, body.toInt, 4,
                    java.nio.charset.StandardCharsets.US_ASCII).trim
                case "moov" => ranges = (body, pos + size) :: ranges
                case "mvhd" if size >= hdr + 4 =>
                  sawMvhd = true
                  val v = bytes(body.toInt) & 0xFF
                  if (v == 1 && size >= hdr + 28 + 4) {
                    timescale = be32(bytes, body.toInt + 20)
                    duration = be64(bytes, body.toInt + 24)
                  } else if (v == 0 && size >= hdr + 20) {
                    timescale = be32(bytes, body.toInt + 12)
                    duration = be32(bytes, body.toInt + 16)
                  }
                case "trak" => tracks += 1
                case _ => ()
              }
              pos += size
            }
          }
        }
        if (sawMvhd) Some(Meta(brand, timescale, duration, tracks)) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Deterministic fixture mp4 keyed by id (q98's contract): minimal
      * ftyp + moov(mvhd + empty traks) whose metadata is a CLOSED FORM of
      * the id — odd ids use mvhd VERSION 1 (64-bit fields), so the gate
      * exercises both header layouts. */
    def synthesize(id: Long): Array[Byte] = {
      val timescale = 600 + (id % 400)
      val duration = 1200 + (id % 4800)
      val tracks = (1 + id % 3).toInt
      val v1 = id % 2 == 1
      def box(typ: String, body: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + body.length)
        bb.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
        bb.array()
      }
      val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++
        Array[Byte](0, 0, 2, 0) ++ "isomiso2".getBytes("US-ASCII"))
      val mvhdBody =
        if (v1) {
          val bb = java.nio.ByteBuffer.allocate(4 + 16 + 4 + 8)
          bb.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1 + flags
            .putLong(0L).putLong(0L)                 // creation/modification
            .putInt(timescale.toInt).putLong(duration)
          bb.array()
        } else {
          val bb = java.nio.ByteBuffer.allocate(4 + 8 + 4 + 4)
          bb.put(0.toByte).put(Array[Byte](0, 0, 0))
            .putInt(0).putInt(0)
            .putInt(timescale.toInt).putInt(duration.toInt)
          bb.array()
        }
      val moov = box("moov", box("mvhd", mvhdBody) ++
        (0 until tracks).flatMap(_ => box("trak", Array.emptyByteArray)).toArray)
      ftyp ++ moov
    }
  }

  /** Real EBML/Matroska (webm/mkv) METADATA probe — same contract as
    * `Mp4Probe`: no stock-JVM VP8/VP9/Opus decoder exists, but the EBML
    * element tree is a pure-JVM parse (varint IDs/sizes, unknown-size
    * segments, float durations in TimecodeScale units), so webm payloads
    * yield real duration/track stats in a crawl. */
  object EbmlProbe {
    /** EBML header magic 0x1A45DFA3. */
    def isEbml(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length > 8 &&
        (bytes(0) & 0xFF) == 0x1A && (bytes(1) & 0xFF) == 0x45 &&
        (bytes(2) & 0xFF) == 0xDF && (bytes(3) & 0xFF) == 0xA3

    final case class Meta(timecodeScaleNs: Long, durationTicks: Double,
        tracks: Int) {
      def durationMs: Long =
        math.round(durationTicks * timecodeScaleNs / 1e6)
    }

    /** (value, byteLen); EBML varint — leading-zero count of the first
      * byte gives the length, `strip` drops the marker bit (sizes) or
      * keeps it (element IDs are conventionally marker-inclusive). */
    private def varint(b: Array[Byte], p: Int, strip: Boolean): (Long, Int) = {
      val first = b(p) & 0xFF
      require(first != 0, "EBML varint with >8-byte length")
      val len = Integer.numberOfLeadingZeros(first) - 23
      var v = (if (strip) first & (0xFF >>> len) else first).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(p + i) & 0xFF); i += 1 }
      (v, len)
    }

    private val UnknownSizeMarkers: Set[Long] =
      (1 to 8).map(l => (1L << (7 * l)) - 1).toSet

    /** Container metadata, or None for non-EBML / malformed / no-Info
      * payloads. */
    def probe(bytes: Array[Byte]): Option[Meta] = {
      if (!isEbml(bytes)) return None
      try {
        var scale = 1000000L // Matroska default: 1 ms per tick
        var duration = -1.0
        var tracks = 0
        def walk(start: Int, limit: Int, depth: Int): Unit = {
          var pos = start
          while (pos + 2 <= limit) {
            val (id, idLen) = varint(bytes, pos, strip = false)
            val (sz0, szLen) = varint(bytes, pos + idLen, strip = true)
            val body = pos + idLen + szLen
            val size =
              if (UnknownSizeMarkers.contains(sz0)) (limit - body).toLong
              else sz0
            if (size < 0 || body + size > limit) return // truncated: stop
            id match {
              case 0x18538067L | 0x1549A966L | 0x1654AE6BL => // Segment|Info|Tracks
                if (depth < 8) walk(body, (body + size).toInt, depth + 1)
              case 0x2AD7B1L if size >= 1 && size <= 8 => // TimecodeScale uint
                var v = 0L
                var i = 0
                while (i < size) { v = (v << 8) | (bytes(body + i) & 0xFF); i += 1 }
                scale = v
              case 0x4489L if size == 4 || size == 8 => // Duration float
                duration =
                  if (size == 4) java.lang.Float.intBitsToFloat(
                    java.nio.ByteBuffer.wrap(bytes, body, 4).getInt).toDouble
                  else java.nio.ByteBuffer.wrap(bytes, body, 8).getDouble
              case 0xAEL => tracks += 1 // TrackEntry
              case _ => ()
            }
            pos = (body + size).toInt
          }
        }
        walk(0, bytes.length, 0)
        if (duration >= 0) Some(Meta(scale, duration, tracks)) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Deterministic fixture webm keyed by id (q99's contract): EBML
      * header + Segment(Info(TimecodeScale, Duration) + Tracks) whose
      * duration_ms is a CLOSED FORM of the id — odd ids use a 0.5 ms
      * TimecodeScale with doubled tick counts (same ms), so the gate
      * exercises the scale arithmetic, and ids ≡ 0 (mod 3) write the
      * Duration as float32 instead of float64. */
    def synthesize(id: Long): Array[Byte] = {
      val ms = 5000 + id % 10000
      val (scaleNs, ticks) =
        if (id % 2 == 1) (500000L, (2 * ms).toDouble) else (1000000L, ms.toDouble)
      val tracks = (1 + id % 3).toInt
      def elem(idBytes: Array[Int], body: Array[Byte]): Array[Byte] = {
        // 8-byte size form (0x01 + 56-bit BE) keeps encoding simple/valid
        val bb = java.nio.ByteBuffer.allocate(idBytes.length + 8 + body.length)
        idBytes.foreach(b => bb.put(b.toByte))
        bb.put(0x01.toByte)
        var i = 48
        // Long shift — Int shift amounts are mod 32 on the JVM, which
        // would fold >>48 into >>16 and corrupt the size bytes
        while (i >= 0) { bb.put(((body.length.toLong >> i) & 0xFF).toByte); i -= 8 }
        bb.put(body)
        bb.array()
      }
      val scaleBody = {
        val bb = java.nio.ByteBuffer.allocate(8); bb.putLong(scaleNs); bb.array()
      }
      val durBody =
        if (id % 3 == 0) {
          val bb = java.nio.ByteBuffer.allocate(4)
          bb.putFloat(ticks.toFloat); bb.array()
        } else {
          val bb = java.nio.ByteBuffer.allocate(8); bb.putDouble(ticks); bb.array()
        }
      val info = elem(Array(0x15, 0x49, 0xA9, 0x66),
        elem(Array(0x2A, 0xD7, 0xB1), scaleBody) ++
          elem(Array(0x44, 0x89), durBody))
      val trks = elem(Array(0x16, 0x54, 0xAE, 0x6B),
        (0 until tracks).flatMap(_ => elem(Array(0xAE), Array.emptyByteArray)).toArray)
      val ebmlHeader = elem(Array(0x1A, 0x45, 0xDF, 0xA3), Array.emptyByteArray)
      ebmlHeader ++ elem(Array(0x18, 0x53, 0x80, 0x67), info ++ trks)
    }
  }

  /** Real FLAC STREAMINFO probe — the mandatory first metadata block
    * after the `fLaC` magic carries sample rate (20 bits), channels and
    * TOTAL SAMPLES (36 bits) at fixed bit offsets, so duration is EXACT
    * without any frame decode; pure-JVM bit slicing, ~30 lines. */
  object FlacProbe {
    def isFlac(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length > 8 &&
        bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'

    final case class Meta(sampleRate: Int, channels: Int, totalSamples: Long) {
      def durationMs: Long =
        if (sampleRate > 0) totalSamples * 1000L / sampleRate else 0L
    }

    /** STREAMINFO fields, or None for non-FLAC / malformed payloads. The
      * walk skips leading metadata blocks until type 0 (spec requires
      * STREAMINFO first; tolerating reordered blocks costs nothing). */
    def probe(bytes: Array[Byte]): Option[Meta] = {
      if (!isFlac(bytes)) return None
      try {
        var pos = 4
        var last = false
        while (!last && pos + 4 <= bytes.length) {
          val hdr = bytes(pos) & 0xFF
          last = (hdr & 0x80) != 0
          val typ = hdr & 0x7F
          val len = ((bytes(pos + 1) & 0xFF) << 16) |
            ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
          val body = pos + 4
          if (typ == 0 && len >= 18 && body + 18 <= bytes.length) {
            def b(i: Int) = bytes(body + i) & 0xFF
            val sr = (b(10) << 12) | (b(11) << 4) | (b(12) >> 4)
            val ch = ((b(12) >> 1) & 0x07) + 1
            val total = ((b(13) & 0x0FL) << 32) | (b(14).toLong << 24) |
              (b(15).toLong << 16) | (b(16).toLong << 8) | b(17).toLong
            return if (sr > 0) Some(Meta(sr, ch, total)) else None
          }
          pos = body + len
        }
        None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Deterministic fixture FLAC keyed by id (q102's contract): magic +
      * one STREAMINFO block whose rate/samples/channels are closed forms
      * of the id. No audio frames — the probe never reads past the block,
      * exactly like a real crawl's header-only stat pass. */
    def synthesize(id: Long): Array[Byte] = {
      val sr = 32000 + (id % 4).toInt * 4000
      val total = 100000L + id % 50000
      val ch = 1 + (id % 2).toInt
      val body = new Array[Byte](34)
      body(10) = (sr >> 12).toByte
      body(11) = ((sr >> 4) & 0xFF).toByte
      body(12) = (((sr & 0x0F) << 4) | ((ch - 1) << 1) | ((16 - 1) >> 4)).toByte
      body(13) = ((((16 - 1) & 0x0F) << 4) | ((total >> 32) & 0x0F)).toByte
      body(14) = ((total >> 24) & 0xFF).toByte
      body(15) = ((total >> 16) & 0xFF).toByte
      body(16) = ((total >> 8) & 0xFF).toByte
      body(17) = (total & 0xFF).toByte
      "fLaC".getBytes("US-ASCII") ++
        Array[Byte](0x80.toByte, 0, 0, 34) ++ body // last-block flag, type 0
    }
  }

  /** MP3 (MPEG-1 Layer III) frame-header sniff: sync word + the public
    * bitrate/sample-rate index tables give a CBR duration ESTIMATE
    * (payload_bytes × 8 / bitrate) — labeled an estimate, since VBR needs
    * a full frame walk; container detection itself is exact. */
  object Mp3Probe {
    private val bitrates =
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    private val rates = Array(44100, 48000, 32000)

    /** Find the sync at offset 0 (or after an ID3v2 tag). */
    private def syncAt(bytes: Array[Byte]): Int = {
      if (bytes == null || bytes.length < 4) return -1
      var p = 0
      if (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3' && bytes.length > 10)
        p = 10 + (((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
          ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F))
      if (p + 4 <= bytes.length && (bytes(p) & 0xFF) == 0xFF &&
        (bytes(p + 1) & 0xFE) == 0xFA) p // MPEG-1 Layer III, sync 0xFFFA/0xFFFB
      else -1
    }

    def isMp3(bytes: Array[Byte]): Boolean = syncAt(bytes) >= 0

    /** (bitrateKbps, sampleRate, estimatedDurationMs) or None. */
    def probe(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
      val p = syncAt(bytes)
      if (p < 0) return None
      val bIdx = (bytes(p + 2) & 0xFF) >> 4
      val rIdx = ((bytes(p + 2) & 0xFF) >> 2) & 3
      if (bIdx == 0 || bIdx >= 15 || rIdx >= 3) return None
      val kbps = bitrates(bIdx)
      Some((kbps, rates(rIdx),
        (bytes.length - p).toLong * 8L / kbps)) // bytes×8 / (kbps×1000) × 1000ms
    }
  }

  /** Image-dimension HEADER sniff — format + width/height read straight
    * from the container bytes, never a pixel decode: at crawl scale the
    * size filter runs on every payload, and `ImageIO.read` would cost a
    * full decompress per image just to learn its dims. PNG reads the
    * fixed-offset IHDR, GIF the logical-screen descriptor, BMP the
    * BITMAPINFOHEADER (top-down negative heights normalized), JPEG walks
    * the marker chain to the first SOF. Truncated/foreign payloads →
    * None, the honesty contract of every probe here. */
  object ImageProbe {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def be32(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

    /** (format, width, height) or None. */
    def probe(b: Array[Byte]): Option[(String, Int, Int)] = {
      if (b == null || b.length < 10) return None
      // PNG: 8-byte signature, IHDR is REQUIRED first chunk → w/h at 16/20
      if (b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && u8(b, 4) == 0x0D && u8(b, 5) == 0x0A &&
        u8(b, 6) == 0x1A && u8(b, 7) == 0x0A) {
        val w = be32(b, 16); val h = be32(b, 20)
        return if (w > 0 && h > 0) Some(("png", w, h)) else None
      }
      // GIF87a/89a: logical screen descriptor right after the signature
      if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        val w = le16(b, 6); val h = le16(b, 8)
        return if (w > 0 && h > 0) Some(("gif", w, h)) else None
      }
      // BMP: BITMAPINFOHEADER at 14 (negative height = top-down rows)
      if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
        val w = le32(b, 18); val h = math.abs(le32(b, 22))
        return if (w > 0 && h > 0) Some(("bmp", w, h)) else None
      }
      // JPEG: walk FF-marker segments to the first frame header (SOF0–15,
      // minus the non-frame C4/C8/CC); dims sit at +5 (h) / +7 (w)
      if (u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
        var p = 2
        while (p + 3 < b.length) {
          if (u8(b, p) != 0xFF) return None // marker misalignment: corrupt
          val m = u8(b, p + 1)
          if (m == 0xFF) { p += 1 } // fill bytes before a marker are legal
          else if (m == 0xD8 || (m >= 0xD0 && m <= 0xD9)) { p += 2 } // bare
          else {
            val len = be16(b, p + 2)
            if (len < 2 || p + 2 + len > b.length) return None
            if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
              if (len < 7) return None
              val h = be16(b, p + 5); val w = be16(b, p + 7)
              return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
            }
            if (m == 0xDA) return None // entropy data begins; no SOF seen
            p += 2 + len
          }
        }
        return None
      }
      None
    }
  }

  /**
   * Container-metadata probe pass — the cheap pre-decode stats a media
   * crawl runs on EVERY payload before deciding what to decode: container
   * sniffed from magic bytes (not the path extension), duration from the
   * real header parse where a pure-JVM one exists (WAV PCM, mp4 mvhd),
   * NULL where it doesn't — honest, like `decodeAudio`. Output:
   * (media_id, container, duration_ms, tracks).
   */
  def probeMedia(df: DataFrame,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("container", StringType, nullable = false),
      StructField("duration_ms", LongType, nullable = true),
      StructField("tracks", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        val id = r.getLong(idIdx)
        if (Mp4Probe.isMp4(bytes)) Mp4Probe.probe(bytes) match {
          case Some(m) => org.apache.spark.sql.Row(id, "mp4", m.durationMs, m.tracks)
          case None => org.apache.spark.sql.Row(id, "mp4", null, null)
        } else if (WavCodec.isWav(bytes)) WavCodec.decode(bytes).map(WavCodec.stats) match {
          case Some(st) =>
            org.apache.spark.sql.Row(id, "wav", st.durationMs, st.channels)
          case None => org.apache.spark.sql.Row(id, "wav", null, null)
        } else if (FlacProbe.isFlac(bytes)) FlacProbe.probe(bytes) match {
          case Some(m) =>
            org.apache.spark.sql.Row(id, "flac", m.durationMs, m.channels)
          case None => org.apache.spark.sql.Row(id, "flac", null, null)
        } else if (Mp3Probe.isMp3(bytes)) Mp3Probe.probe(bytes) match {
          // duration is the documented CBR ESTIMATE; tracks unknown → NULL
          case Some((_, _, estMs)) =>
            org.apache.spark.sql.Row(id, "mp3", estMs, null)
          case None => org.apache.spark.sql.Row(id, "mp3", null, null)
        } else if (EbmlProbe.isEbml(bytes)) EbmlProbe.probe(bytes) match {
          case Some(m) => org.apache.spark.sql.Row(id, "webm", m.durationMs, m.tracks)
          case None => org.apache.spark.sql.Row(id, "webm", null, null)
        } else if (GifCodec.isGif(bytes))
          org.apache.spark.sql.Row(id, "gif", null, null)
        else if (AviMjpegCodec.isAvi(bytes))
          org.apache.spark.sql.Row(id, "avi", null, null)
        else ImageProbe.probe(bytes) match {
          // stills: container identified from the same header sniff the
          // dimension probe uses; duration/tracks meaningless → NULL
          case Some((fmt, _, _)) => org.apache.spark.sql.Row(id, fmt, null, null)
          case None => org.apache.spark.sql.Row(id, "unknown", null, null)
        }
      }
    }(enc)
  }

  /** Standard multimodal record schema: content + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /**
   * STUB decode kernel — deterministic fake standing in for a real codec.
   * "Decodes" width/height/duration from the byte content so tests have
   * stable expectations. Replace with a real binding at deployment; the
   * call sites (mapPartitions batch loop) do not change.
   */
  object FakeCodec {
    def imageDims(bytes: Array[Byte]): (Int, Int) = {
      if (bytes == null || bytes.isEmpty) (0, 0)
      else ((math.abs(bytes.head.toInt) % 64) + 1, (math.abs(bytes.last.toInt) % 64) + 1)
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (bytes == null) Array.emptyByteArray
      else bytes.take(math.max(1, math.min(bytes.length, w * h)))
    def frameSample(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      if (bytes == null || bytes.isEmpty) Nil
      else bytes.grouped(math.max(1, everyN)).map(_.toArray).toSeq
    /** 8-dim feature vector from byte histogram — stands in for an
      * embedding model forward pass. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val h = new Array[Float](8)
      if (bytes != null) bytes.foreach(b => h((b & 0xFF) % 8) += 1f)
      val n = math.max(1f, if (bytes == null) 1f else bytes.length.toFloat)
      h.map(_ / n)
    }
  }

  /** Content size + sha1 — pure Column ops, no decode needed; the cheap
    * first-pass stats any 100 TB media crawl runs. */
  def contentStats(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("content_len", when(col(contentCol).isNull, 0L)
        .otherwise(length(col(contentCol)).cast("long")))
      .withColumn("content_sha1", sha1(coalesce(col(contentCol), lit(Array.emptyByteArray))))

  /**
   * Ingest a directory/glob of raw media files into the standard media
   * schema via Spark's `binaryFile` source — the missing first step of
   * the media pipeline (crawl dir → DataFrame). Distributed file reads
   * (each executor reads its own split of files), no driver
   * materialization; `media_id` = xxhash64(path) so re-ingesting is
   * idempotent and ids are stable across runs and partitionings. The
   * modality/mime guess comes from the extension (a content-sniffing
   * decode pass — `decodeImages` — refines it later); `path` rides along
   * for lineage. `pathGlobFilter` pushes the extension filter into file
   * LISTING, not a post-scan filter.
   */
  def readMedia(spark: org.apache.spark.sql.SparkSession, path: String,
      globFilter: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    val df = globFilter.fold(reader)(g => reader.option("pathGlobFilter", g)).load(path)
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val mime = when(ext.isin("png"), "image/png")
      .when(ext.isin("jpg", "jpeg"), "image/jpeg")
      .when(ext.isin("gif"), "image/gif")
      .when(ext.isin("bmp"), "image/bmp")
      .when(ext.isin("wav"), "audio/wav")
      .when(ext.isin("mp3"), "audio/mpeg")
      .when(ext.isin("flac"), "audio/flac")
      .when(ext.isin("mp4"), "video/mp4")
      .when(ext.isin("webm"), "video/webm")
      .otherwise("application/octet-stream")
    val modality = when(mime.startsWith("image/"),
        when(ext === "gif", "video").otherwise("image")) // animated GIF = frames
      .when(mime.startsWith("audio/"), "audio")
      .when(mime.startsWith("video/"), "video")
      .otherwise("binary")
    df.select(
      xxhash64(col("path")).as("media_id"),
      modality.as("modality"),
      col("content"),
      struct(mime.as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"),
      col("path"))
  }

  /**
   * Decode pass via mapPartitions: per-partition "codec init" happens once,
   * rows stream through in a batch loop. Output adds (width, height,
   * feature ARRAY<FLOAT>). Row-encoder based to stay schema-dynamic.
   */
  def decodeImages(df: DataFrame,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      // per-partition codec init would go here (amortized, like a Pandas
      // UDF's batch-level model load)
      it.map { r =>
        val bytes = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        // real decode first (PNG/JPEG/...) — ONCE per row, dims + features
        // from the same BufferedImage; non-image payloads fall back to the
        // deterministic stub so the pass stays total
        val (w, h, feat) = ImageIoCodec.decode(bytes) match {
          case Some(img) =>
            (img.getWidth, img.getHeight, ImageIoCodec.featuresOf(img))
          case None =>
            val (fw, fh) = FakeCodec.imageDims(bytes)
            (fw, fh, FakeCodec.features(bytes))
        }
        org.apache.spark.sql.Row(r.getLong(idIdx), w, h, feat.toSeq)
      }
    }(enc)
  }

  /**
   * Per-image mean channel intensities (r̄, ḡ, b̄) — the visual side of a
   * caption↔image alignment check (the CLIP-score filter shape: pair a
   * text-derived signal with an image-derived signal and threshold on
   * their agreement). One real decode per row, one pass over the pixels;
   * undecodable payloads → NULL means, the pass stays total. Same
   * mapPartitions discipline as [[decodeImages]] — at 100 TB this is an
   * embarrassingly parallel scan whose cost IS the decode.
   */
  def channelMeans(df: DataFrame,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        ImageIoCodec.decode(bytes) match {
          case Some(img) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            val w0 = img.getWidth
            val row = new Array[Int](w0)
            var y = 0
            while (y < img.getHeight) {
              img.getRGB(0, y, w0, 1, row, 0, w0) // bulk row: same ints
              var x = 0
              while (x < w0) {
                val p = row(x)
                sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                x += 1
              }
              y += 1
            }
            val n = (img.getWidth.toLong * img.getHeight).toDouble
            org.apache.spark.sql.Row(r.getLong(idIdx), sr / n, sg / n, sb / n)
          case None =>
            org.apache.spark.sql.Row(r.getLong(idIdx), null, null, null)
        }
      }
    }(enc)
  }

  /**
   * Image-dimension probe pass — `probeMedia`'s sibling for still images:
   * format + width/height from the HEADER BYTES alone (`ImageProbe`), no
   * pixel decode anywhere in the plan. This is the size/aspect filter a
   * crawl runs on every payload before spending a decode; at 100 TB the
   * difference is reading ~30 bytes vs decompressing every image.
   * Undecodable/foreign payloads → NULLs.
   */
  def probeImages(df: DataFrame,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        ImageProbe.probe(bytes) match {
          case Some((fmt, w, h)) =>
            org.apache.spark.sql.Row(r.getLong(idIdx), fmt, w, h)
          case None => org.apache.spark.sql.Row(r.getLong(idIdx), null, null, null)
        }
      }
    }(enc)
  }

  /**
   * Perceptual-hash pass — `decodeImages`' sibling for near-dup keys:
   * decode ONCE per row, dHash the pixels (`PHash`), emit the 64-bit hash
   * as unsigned 32-bit halves (ph_hi/ph_lo) + the row-major hex string.
   * Payloads no registered reader decodes yield NULLs (same honesty
   * contract as `decodeAudio`) — a crawl reports them unhashed rather
   * than clustering garbage. Feed the output to `Dedup.hammingPairs64`
   * for banded near-dup pairing at corpus scale.
   */
  def imagePHash(df: DataFrame,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ph_hi", LongType, nullable = true),
      StructField("ph_lo", LongType, nullable = true),
      StructField("phash", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        ImageIoCodec.decode(bytes) match {
          case Some(img) =>
            val (hi, lo, hex) = PHash.dHash(img)
            org.apache.spark.sql.Row(r.getLong(idIdx), hi, lo, hex)
          case None =>
            org.apache.spark.sql.Row(r.getLong(idIdx), null, null, null)
        }
      }
    }(enc)
  }

  /**
   * Audio decode pass — same mapPartitions batch shape as `decodeImages`.
   * WAV PCM payloads decode for REAL (`WavCodec`) into header facts
   * (sample_rate, channels, n_samples = frames, duration_ms) plus signal
   * features (rms, peak over all channels; zero_crossings on channel 0).
   * Payloads no stock JVM can decode (mp3/flac/garbage) yield NULL stats
   * — a crawl reports them undecoded rather than faking numbers.
   */
  def decodeAudio(df: DataFrame,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("rms", DoubleType, nullable = true),
      StructField("peak", DoubleType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        WavCodec.decode(bytes).map(WavCodec.stats) match {
          case Some(st) => org.apache.spark.sql.Row(r.getLong(idIdx),
            st.sampleRate, st.channels, st.frames, st.durationMs,
            st.rms, st.peak, st.zeroCrossings)
          case None => org.apache.spark.sql.Row(
            r.getLong(idIdx), null, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /**
   * Spectral-feature pass — `decodeAudio`'s sibling for frequency-domain
   * signals: DFT over a bounded analysis window of channel 0 →
   * (dominant_bin, dominant_hz, centroid_hz, band_fractions). WAV-decoded
   * payloads get real spectra; everything else NULLs (same honesty
   * contract). Window cost is O(n²/2) per row with n fixed (default 256),
   * so the pass scales linearly in rows regardless of audio length.
   */
  def audioSpectrum(df: DataFrame, idCol: String = "media_id",
      contentCol: String = "content", n: Int = 256, bands: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dominant_bin", IntegerType, nullable = true),
      StructField("dominant_hz", DoubleType, nullable = true),
      StructField("centroid_hz", DoubleType, nullable = true),
      StructField("band_fractions", ArrayType(DoubleType), nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        WavCodec.decode(bytes) match {
          case Some(pcm) =>
            val (dom, domHz, centroid, fracs) = WavCodec.spectrum(pcm, n, bands)
            org.apache.spark.sql.Row(r.getLong(idIdx), dom, domHz, centroid,
              fracs.toSeq)
          case None => org.apache.spark.sql.Row(
            r.getLong(idIdx), null, null, null, null)
        }
      }
    }(enc)
  }

  /** Resize pass — binary in, binary out, same mapPartitions shape. */
  def resizeImages(df: DataFrame, w: Int, h: Int,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("resized", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        val resized = ImageIoCodec.resizePng(bytes, w, h)
          .getOrElse(FakeCodec.resize(bytes, w, h))
        org.apache.spark.sql.Row(r.getLong(idIdx), resized)
      }
    }(enc)
  }

  /** Frame sampling for video: one row per sampled frame (flatMap shape —
    * the row-multiplying pattern a frame extractor needs). Animated GIF
    * payloads decode for REAL (`GifCodec`: every `everyN`-th composed
    * frame, re-encoded PNG, `frame_idx` = SOURCE frame index); payloads
    * no JDK demuxer understands fall back to the deterministic stub
    * (chunking, `frame_idx` = chunk ordinal) so the pass stays total. */
  def sampleFrames(df: DataFrame, everyN: Int,
      idCol: String = "media_id", contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
        val sampled = GifCodec.sampleFramesPng(bytes, everyN)
          .orElse(AviMjpegCodec.sampleFramesPng(bytes, everyN))
          .getOrElse(FakeCodec.frameSample(bytes, everyN).zipWithIndex.map(_.swap))
        sampled.map { case (i, f) =>
          org.apache.spark.sql.Row(r.getLong(idIdx), i, f)
        }
      }
    }(enc)
  }

  /** Decoded per-frame stats over a `sampleFrames`-shaped DF: dims and
    * mean luma (green channel over every pixel — equals the gray level on
    * grayscale frames). Undecodable frames keep their row with null
    * stats, so a lossy decode can't silently shrink the frame set.
    * mapPartitions (not a UDF) for the same reason as the codecs: one
    * BufferedImage loop per partition, no per-row closure alloc. */
  def frameStats(df: DataFrame, idCol: String = "media_id",
      idxCol: String = "frame_idx", frameCol: String = "frame"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_w", IntegerType, nullable = true),
      StructField("frame_h", IntegerType, nullable = true),
      StructField("mean_luma", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val ixIdx = df.schema.fieldIndex(idxCol)
    val fIdx = df.schema.fieldIndex(frameCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(fIdx)) null else r.getAs[Array[Byte]](fIdx)
        ImageIoCodec.decode(bytes) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L
            val row = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w) // bulk row: same ints
              var x = 0
              while (x < w) { sum += (row(x) >> 8) & 0xFF; x += 1 }
              y += 1
            }
            org.apache.spark.sql.Row(r.getLong(idIdx), r.getInt(ixIdx),
              w, h, sum.toDouble / (w.toLong * h))
          case None =>
            org.apache.spark.sql.Row(r.getLong(idIdx), r.getInt(ixIdx),
              null, null, null)
        }
      }
    }(enc)
  }

  /**
   * EXIF metadata codec: pure-JVM JPEG APP1/TIFF walk — the
   * privacy-relevant half of image ingest (orientation and capture time
   * are features; embedded GPS is a LEAK a training-data release must
   * scrub). `probe` parses the first Exif APP1 (both II and MM byte
   * orders, offsets bounds-checked — a truncated IFD yields None, never
   * a throw); `strip` rebuilds the JPEG without Exif APP1 segments,
   * copying everything from SOS on verbatim — pixels untouched, GPS
   * gone. `synthesizeJpegExif` plants a closed-form APP1 (orientation =
   * id%8+1, DateTime day = id%28+1, GPS IFD iff id%3==0) inside a real
   * ImageIO JPEG so gates can oracle every field arithmetically; the
   * segment is 98 bytes with GPS, 68 without (fixed layout).
   */
  object ExifCodec {
    private val ExifHeader = Array[Byte]('E', 'x', 'i', 'f', 0, 0)

    final case class Exif(orientation: Option[Int], dateTime: Option[String],
      hasGps: Boolean)

    private def u16(b: Array[Byte], p: Int, le: Boolean): Int =
      if (le) (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
      else ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)

    private def u32(b: Array[Byte], p: Int, le: Boolean): Long =
      if (le) (u16(b, p, le).toLong | (u16(b, p + 2, le).toLong << 16))
      else ((u16(b, p, le).toLong << 16) | u16(b, p + 2, le).toLong)

    /** (segStart, payloadStart, segLen) of every APP1-Exif segment. */
    private def exifSegments(b: Array[Byte]): Seq[(Int, Int, Int)] = {
      val out = Seq.newBuilder[(Int, Int, Int)]
      if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return Nil
      var p = 2
      var done = false
      while (!done && p + 4 <= b.length) {
        if ((b(p) & 0xFF) != 0xFF) { done = true }
        else {
          val marker = b(p + 1) & 0xFF
          if (marker == 0xDA || marker == 0xD9) done = true // SOS/EOI: entropy data follows
          else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) p += 2
          else {
            val len = u16(b, p + 2, le = false)
            val segEnd = p + 2 + len
            if (len < 2 || segEnd > b.length) done = true
            else {
              if (marker == 0xE1 && len >= 8 &&
                  (0 until 6).forall(i => b(p + 4 + i) == ExifHeader(i)))
                out += ((p, p + 10, 2 + len))
              p = segEnd
            }
          }
        }
      }
      out.result()
    }

    /** Parse the first Exif APP1: orientation (0x0112), DateTime
      * (0x0132), GPS-IFD presence (0x8825). */
    def probe(bytes: Array[Byte]): Option[Exif] =
      exifSegments(bytes).headOption.flatMap { case (_, tiff, segLen) =>
        val end = tiff + segLen - 10
        if (tiff + 8 > bytes.length || tiff + 8 > end) None
        else {
          val le = bytes(tiff) == 'I'
          val be = bytes(tiff) == 'M'
          if (!le && !be) None
          else if (u16(bytes, tiff + 2, le) != 42) None
          else {
            val ifd0 = tiff + u32(bytes, tiff + 4, le).toInt
            if (ifd0 + 2 > end) None
            else {
              var orientation: Option[Int] = None
              var dt: Option[String] = None
              var gps = false
              val n = u16(bytes, ifd0, le)
              var i = 0
              while (i < n) {
                val e = ifd0 + 2 + i * 12
                if (e + 12 <= end) {
                  val tag = u16(bytes, e, le)
                  val count = u32(bytes, e + 4, le).toInt
                  if (tag == 0x0112) orientation = Some(u16(bytes, e + 8, le))
                  else if (tag == 0x0132 && count >= 1 && count <= 32) {
                    val off = tiff + u32(bytes, e + 8, le).toInt
                    if (off + count <= end)
                      dt = Some(new String(bytes, off, count - 1, "US-ASCII"))
                  } else if (tag == 0x8825) gps = true
                }
                i += 1
              }
              Some(Exif(orientation, dt, gps))
            }
          }
        }
      }

    /** The JPEG without its Exif APP1 segments — pixels and every other
      * segment byte-identical. */
    def strip(bytes: Array[Byte]): Array[Byte] = {
      val segs = exifSegments(bytes)
      if (segs.isEmpty) bytes
      else {
        val out = new java.io.ByteArrayOutputStream(bytes.length)
        var p = 0
        segs.foreach { case (start, _, len) =>
          out.write(bytes, p, start - p); p = start + len
        }
        out.write(bytes, p, bytes.length - p)
        out.toByteArray
      }
    }

    /** APP1 payload with the closed-form fields (fixed II layout). */
    private def app1(orientation: Int, dateTime: String, gps: Boolean): Array[Byte] = {
      require(dateTime.length == 19, "EXIF DateTime is 19 chars")
      val entries = if (gps) 3 else 2
      val dtOff = 8 + 2 + entries * 12 + 4
      val gpsOff = dtOff + 20
      val tiffLen = if (gps) gpsOff + 18 else dtOff + 20
      val bb = java.nio.ByteBuffer.allocate(2 + 2 + 6 + tiffLen)
      bb.put(0xFF.toByte).put(0xE1.toByte)
      bb.putShort((2 + 6 + tiffLen).toShort) // big-endian segment length
      bb.put(ExifHeader)
      bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('I'.toByte).put('I'.toByte).putShort(42.toShort).putInt(8)
      bb.putShort(entries.toShort)
      bb.putShort(0x0112.toShort).putShort(3.toShort).putInt(1)
        .putShort(orientation.toShort).putShort(0.toShort)
      bb.putShort(0x0132.toShort).putShort(2.toShort).putInt(20).putInt(dtOff)
      if (gps) bb.putShort(0x8825.toShort).putShort(4.toShort).putInt(1).putInt(gpsOff)
      bb.putInt(0) // next IFD
      bb.put(dateTime.getBytes("US-ASCII")).put(0.toByte)
      if (gps) { // GPS IFD: one GPSLatitudeRef entry
        bb.putShort(1.toShort)
        bb.putShort(0x0001.toShort).putShort(2.toShort).putInt(2)
          .put('N'.toByte).put(0.toByte).putShort(0.toShort)
        bb.putInt(0)
      }
      bb.array()
    }

    /** Real ImageIO JPEG + the closed-form APP1 right after SOI. */
    def synthesizeJpegExif(id: Long): Array[Byte] = {
      val base = ImageIoCodec.encodeSolid("jpg", 8, 8, id)
      val seg = app1((id % 8 + 1).toInt,
        f"2026:01:${id % 28 + 1}%02d 12:00:00", id % 3 == 0)
      val out = new java.io.ByteArrayOutputStream(base.length + seg.length)
      out.write(base, 0, 2)
      out.write(seg)
      out.write(base, 2, base.length - 2)
      out.toByteArray
    }
  }

  /**
   * ID3 tag codec — the audio leg of the metadata-scrub triad
   * (EXIF/JPEG, tEXt/PNG, ID3/MP3): ID3v2 prefixes and ID3v1 trailers
   * carry artist/title/comment strings a release should scrub. `probe`
   * reads the v2 version, syncsafe tag size and frame ids (v2.3/v2.4
   * 10-byte frame headers), plus v1-trailer presence; `strip` drops the
   * v2 prefix and v1 trailer — the MPEG audio frames pass through
   * byte-identical, so [[Mp3Probe]] still reads the stream.
   */
  object Id3Codec {
    final case class Id3(version: Int, tagSize: Int, frameIds: Seq[String],
      hasV1: Boolean)

    private def v2Size(b: Array[Byte]): Int =
      ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)

    private def hasV2(b: Array[Byte]): Boolean =
      b.length > 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3'

    private def hasV1(b: Array[Byte]): Boolean =
      b.length >= 128 && b(b.length - 128) == 'T' &&
        b(b.length - 127) == 'A' && b(b.length - 126) == 'G'

    def probe(bytes: Array[Byte]): Option[Id3] = {
      if (bytes == null) return None
      val v1 = hasV1(bytes)
      if (!hasV2(bytes)) {
        return if (v1) Some(Id3(1, 0, Nil, hasV1 = true)) else None
      }
      val size = v2Size(bytes)
      val end = math.min(10 + size, bytes.length)
      val ids = Seq.newBuilder[String]
      var p = 10
      var ok = true
      while (ok && p + 10 <= end) {
        val fid = new String(bytes, p, 4, "US-ASCII")
        if (!fid.forall(c => c.isUpper || c.isDigit)) ok = false // padding
        else {
          // v2.4 frame sizes are syncsafe (7 bits/byte); v2.2/v2.3 are
          // plain 32-bit BE — reading v2.4 as plain desyncs the walk for
          // any frame >= 128 bytes
          val fsz =
            if ((bytes(3) & 0xFF) >= 4)
              ((bytes(p + 4) & 0x7F) << 21) | ((bytes(p + 5) & 0x7F) << 14) |
                ((bytes(p + 6) & 0x7F) << 7) | (bytes(p + 7) & 0x7F)
            else
              ((bytes(p + 4) & 0xFF) << 24) | ((bytes(p + 5) & 0xFF) << 16) |
                ((bytes(p + 6) & 0xFF) << 8) | (bytes(p + 7) & 0xFF)
          if (fsz < 0 || p + 10 + fsz > end) ok = false
          else { ids += fid; p += 10 + fsz }
        }
      }
      Some(Id3(bytes(3) & 0xFF, size, ids.result(), v1))
    }

    /** Audio frames only: v2 prefix and v1 trailer removed. */
    def strip(bytes: Array[Byte]): Array[Byte] = {
      if (bytes == null) return bytes
      val start = if (hasV2(bytes)) math.min(10 + v2Size(bytes), bytes.length) else 0
      val end = if (hasV1(bytes)) bytes.length - 128 else bytes.length
      if (start == 0 && end == bytes.length) bytes
      else java.util.Arrays.copyOfRange(bytes, start, math.max(start, end))
    }

    /** Closed-form fixture: ID3v2.3 with one TIT2 frame ("doc<id>"),
      * a v1 trailer iff id is even, and a 128 kbps / 44.1 kHz MPEG-1
      * Layer III header + 100 zero bytes that [[Mp3Probe]] accepts. */
    def synthesizeMp3Id3(id: Long): Array[Byte] = {
      val text = s"doc$id".getBytes("ISO-8859-1")
      val frameData = Array(0.toByte) ++ text
      val tagSize = 10 + frameData.length
      val bb = java.nio.ByteBuffer.allocate(10 + tagSize + 4 + 100)
      bb.put('I'.toByte).put('D'.toByte).put('3'.toByte)
        .put(3.toByte).put(0.toByte).put(0.toByte)
      bb.put(((tagSize >> 21) & 0x7F).toByte).put(((tagSize >> 14) & 0x7F).toByte)
        .put(((tagSize >> 7) & 0x7F).toByte).put((tagSize & 0x7F).toByte)
      bb.put("TIT2".getBytes("US-ASCII")).putInt(frameData.length)
        .putShort(0.toShort).put(frameData)
      bb.put(0xFF.toByte).put(0xFB.toByte).put(0x90.toByte).put(0.toByte)
      val body = bb.array()
      if (id % 2 == 0) {
        val v1 = new Array[Byte](128)
        v1(0) = 'T'; v1(1) = 'A'; v1(2) = 'G'
        body ++ v1
      } else body
    }
  }

  /**
   * PNG text-metadata codec — [[ExifCodec]]'s twin for the other major
   * format: tEXt/zTXt/iTXt chunks carry author/software/comment strings
   * (and, from phone exporters, location text) that a release should
   * scrub. Pure chunk walk: 8-byte signature then (len, type, data,
   * crc32) frames; `probe` returns the tEXt key→value pairs, `strip`
   * drops every textual chunk — all other bytes, CRCs included, pass
   * through verbatim, so the image decodes identically.
   */
  object PngTextCodec {
    private val Sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    private val Textual = Set("tEXt", "zTXt", "iTXt")

    private def isPng(b: Array[Byte]): Boolean =
      b.length >= 8 && (0 until 8).forall(i => b(i) == Sig(i))

    private def be32(b: Array[Byte], p: Int): Long =
      ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
        ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)

    /** (chunkStart, dataStart, dataLen, type) for every chunk. */
    private def chunks(b: Array[Byte]): Seq[(Int, Int, Int, String)] = {
      val out = Seq.newBuilder[(Int, Int, Int, String)]
      var p = 8
      var ok = isPng(b)
      while (ok && p + 12 <= b.length) {
        val len = be32(b, p)
        if (len > Int.MaxValue - 12 || p + 12 + len > b.length) ok = false
        else {
          val tpe = new String(b, p + 4, 4, "US-ASCII")
          out += ((p, p + 8, len.toInt, tpe))
          p += 12 + len.toInt
          if (tpe == "IEND") ok = false
        }
      }
      out.result()
    }

    /** tEXt key→value pairs (zTXt/iTXt reported by key with empty value
      * — their payloads are compressed/utf8-structured). */
    def probe(bytes: Array[Byte]): Option[Seq[(String, String)]] =
      if (!isPng(bytes)) None
      else Some(chunks(bytes).collect {
        case (_, d, len, "tEXt") =>
          val rel = (d until d + len).indexWhere(i => bytes(i) == 0)
          val nul = if (rel == -1) d + len else d + rel
          (new String(bytes, d, nul - d, "ISO-8859-1"),
            new String(bytes, math.min(nul + 1, d + len),
              (d + len) - math.min(nul + 1, d + len), "ISO-8859-1"))
        case (_, d, len, t) if Textual(t) =>
          val rel = (d until d + len).indexWhere(i => bytes(i) == 0)
          val nul = if (rel == -1) d + len else d + rel
          (new String(bytes, d, nul - d, "ISO-8859-1"), "")
      })

    /** The PNG without its textual chunks; non-PNG input passes through. */
    def strip(bytes: Array[Byte]): Array[Byte] = {
      if (!isPng(bytes)) return bytes
      val drop = chunks(bytes).filter(c => Textual(c._4))
      if (drop.isEmpty) bytes
      else {
        val out = new java.io.ByteArrayOutputStream(bytes.length)
        var p = 0
        drop.foreach { case (start, _, len, _) =>
          out.write(bytes, p, start - p); p = start + 12 + len
        }
        out.write(bytes, p, bytes.length - p)
        out.toByteArray
      }
    }

    /** Real ImageIO PNG + a closed-form tEXt chunk ("Comment" →
      * "doc<id>") inserted after IHDR, CRC computed properly. */
    def synthesizePngText(id: Long): Array[Byte] = {
      val base = ImageIoCodec.encodeSolid("png", 8, 8, id)
      val data = ("Comment" + "\u0000" + s"doc$id").getBytes("ISO-8859-1")
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length)
      bb.put("tEXt".getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt)
      val ihdrEnd = 8 + 12 + 13 // signature + IHDR frame (13-byte data)
      val out = new java.io.ByteArrayOutputStream(base.length + bb.capacity())
      out.write(base, 0, ihdrEnd)
      out.write(bb.array())
      out.write(base, ihdrEnd, base.length - ihdrEnd)
      out.toByteArray
    }
  }
}
