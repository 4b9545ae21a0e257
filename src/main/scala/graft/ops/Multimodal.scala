package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
// DuckDB-exact rounding shadow for every round() call site (Readout)
import graft.Readout.round
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side contract is real — schema, partitioning, batch iteration
  * shape — while the codec itself is STUBBED (this container has no image /
  * audio libraries): `FakeCodec.decode` derives deterministic pseudo-features
  * from the payload bytes. Swapping in a real decoder changes only that one
  * function; everything around it (mapPartitions batching, metadata struct,
  * repartition-by-size policy) is production shape.
  */
object Multimodal {

  /** Canonical multimodal record: one asset per row. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("byte_len", LongType),
      StructField("content_hash", StringType))))))

  /** Wrap any (id, stringPayload, source) frame into the asset schema —
    * the ingest adapter used over the `documents` test table (text bytes
    * standing in for media bytes).
    */
  def fromText(df: DataFrame, id: String, text: String, source: String,
               modality: String = "image"): DataFrame =
    df.select(
      col(id).cast("long").as("asset_id"),
      lit(modality).as("modality"),
      encode(col(text), "UTF-8").as("payload"),
      struct(
        col(source).as("source"),
        octet_length(encode(col(text), "UTF-8")).cast("long").as("byte_len"),
        md5(encode(col(text), "UTF-8")).as("content_hash")).as("meta"))

  /** Pluggable decode boundary: `newDecoder()` is called once per
    * partition (the per-partition-init hook — codec setup happens off the
    * per-row path) and returns the payload → (width, height, channels)
    * function. Implementations must treat null/undecodable payloads as
    * (0, 0, 0) rather than throwing: one corrupt asset must not kill a
    * 100 TB decode stage — downstream filters on `width > 0`.
    */
  trait MediaCodec extends Serializable {
    def newDecoder(): Array[Byte] => (Int, Int, Int)
  }

  /** Real image codec over the JDK's own `javax.imageio` (PNG/JPEG/GIF/
    * BMP — no external dependency): headers are parsed and the frame
    * decoded in-JVM per partition. Disk caching is off — payloads arrive
    * as in-memory byte arrays and the temp-file cache would turn a decode
    * stage into small-file I/O on every executor.
    *
    * The oracle gates (q33–q35) stay on [[FakeCodec]]: DuckDB cannot
    * decode images, so the differential gate needs the md5-derived
    * deterministic stub; this codec is the production swap-in, spec-gated
    * on real PNG/JPEG bytes (MultimodalRealCodecSpec).
    */
  object ImageIoCodec extends MediaCodec {
    def newDecoder(): Array[Byte] => (Int, Int, Int) = {
      javax.imageio.ImageIO.setUseCache(false)
      payload =>
        if (payload == null) (0, 0, 0)
        else {
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
          // ImageIO.read returns null (no registered reader) for corrupt
          // or non-image bytes; the bundled readers also throw UNCHECKED
          // exceptions (IndexOutOfBounds/NegativeArraySize/IllegalArgument)
          // on malformed-but-recognized payloads, so fold every non-fatal
          // throw into the same "undecodable" (0,0,0) result — the
          // MediaCodec contract says one corrupt asset must not kill the
          // stage
          if (img == null) (0, 0, 0)
          else (img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents)
        }
    }
  }

  /** Deterministic stand-in for the real media codec. */
  object FakeCodec extends MediaCodec {
    def newDecoder(): Array[Byte] => (Int, Int, Int) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      decodeWith(md, _)
    }
    /** "Decode" an image payload: width/height/channels derived from the
      * md5 of the bytes (first two 32-bit big-endian words of the digest),
      * so any engine with md5 reproduces the values — which is what lets
      * the decode stage be oracle-checked. A real implementation calls the
      * codec here instead.
      */
    def decode(payload: Array[Byte]): (Int, Int, Int) =
      decodeWith(java.security.MessageDigest.getInstance("MD5"), payload)

    /** Digest-reusing variant for per-partition loops: MessageDigest is
      * stateful but resets after `digest()`, so one instance per partition
      * avoids a JCA provider lookup + allocation per row.
      */
    def decodeWith(md: java.security.MessageDigest,
                   payload: Array[Byte]): (Int, Int, Int) = {
      if (payload == null) return (0, 0, 0)
      val d = md.digest(payload)
      def u32(off: Int): Long =
        ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
          ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
      val w = 64 + (u32(0) % 1856).toInt // 64..1919
      val h = 64 + (u32(4) % 1016).toInt // 64..1079
      (w, h, 3)
    }
  }

  private val decodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("modality", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("byte_len", LongType)))

  /** Decode stage: batch-iterates each partition through the codec
    * (mapPartitions — the Scala analogue of an arrow-batched UDF: one codec
    * init per partition via [[MediaCodec.newDecoder]], streaming
    * iteration, no per-row setup). Defaults to [[FakeCodec]] (the oracle
    * gates need the deterministic stub); pass [[ImageIoCodec]] for real
    * PNG/JPEG decoding — same plan, same schema, one argument.
    */
  def decode(assets: DataFrame, codec: MediaCodec = FakeCodec): DataFrame = {
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(decodedSchema))
    assets.select("asset_id", "modality", "payload").mapPartitions { it =>
      val dec = codec.newDecoder()
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, c) = dec(payload)
        Row(r.getLong(0), r.getString(1), w, h, c,
          if (payload == null) 0L else payload.length.toLong)
      }
    }(enc)
  }

  /** Feature-extract stage: resize policy + aspect stats, expression-only
    * (stays in codegen); demonstrates post-decode relational processing.
    */
  def imageStats(decoded: DataFrame): DataFrame = decoded
    .withColumn("aspect", round(col("width").cast("double") /
      nullif(col("height").cast("double"), lit(0.0d)), 4))
    .withColumn("needs_resize",
      col("width") > 1024 || col("height") > 1024)
    .withColumn("pixels", col("width").cast("long") * col("height"))

  /** Resize-policy stage: scale so the longer side fits `maxSide`,
    * aspect-preserving, integer-floor output dims. Expression-only (stays
    * in codegen); a real pipeline hands (out_width, out_height) to the
    * codec's resampler.
    */
  def resize(decoded: DataFrame, maxSide: Int = 1024): DataFrame = decoded
    .withColumn("scale",
      when(greatest(col("width"), col("height")) <= maxSide, lit(1.0d))
        .otherwise(lit(maxSide.toDouble) /
          greatest(col("width"), col("height")).cast("double")))
    .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
    .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
    .drop("scale")

  /** Frame-sample stage for video-modality rows: emit every `stride`-th
    * frame index up to `maxFrames` as (asset_id, frame_idx) — a Generator
    * (explode) over a deterministic sequence, the UDTF shape.
    */
  def sampleFrames(decoded: DataFrame, stride: Int = 10,
                   maxFrames: Int = 8): DataFrame = decoded
    .filter(col("modality") === "video")
    .withColumn("n_frames",
      least((col("byte_len") / 1024).cast("int") + 1, lit(stride * maxFrames)))
    .select(col("asset_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Audio codec boundary, mirroring [[MediaCodec]]: `newDecoder()` once
    * per partition, payload → frames of signed 16-bit PCM samples. Null /
    * undecodable payloads yield zero frames (one corrupt asset must not
    * kill the stage). A real implementation resamples/decodes here
    * (mp3/ogg/flac libs are absent in this container); the plumbing —
    * per-partition init, frame row explosion, integer feature math — is
    * production shape.
    */
  trait AudioCodec extends Serializable {
    def newDecoder(): Array[Byte] => Array[Array[Int]]
  }

  /** Deterministic stand-in audio decoder: frame `j` of a payload is 8
    * int16 samples read big-endian from md5(payload ‖ "|j"), and the
    * frame count is `min(byte_len div 256 + 1, 4)` — so any engine with
    * md5 reproduces every sample exactly, which is what lets the
    * decode → frame-energy pipeline be oracle-checked end-to-end
    * ([[FakeCodec]]'s device extended from scalar dims to PCM arrays).
    */
  object FakePcmCodec extends AudioCodec {
    val samplesPerFrame = 8
    val maxFrames = 4
    def newDecoder(): Array[Byte] => Array[Array[Int]] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      payload =>
        if (payload == null) Array.empty
        else {
          val nf = math.min(payload.length / 256 + 1, maxFrames)
          Array.tabulate(nf) { j =>
            md.update(payload)
            md.update(s"|$j".getBytes("UTF-8"))
            val d = md.digest()
            Array.tabulate(samplesPerFrame) { i =>
              val u = ((d(2 * i) & 0xff) << 8) | (d(2 * i + 1) & 0xff)
              if (u >= 32768) u - 65536 else u
            }
          }
        }
    }
  }

  /** REAL audio codec over the JDK's own `javax.sound.sampled` (WAV/AIFF
    * RIFF parsing — no external dependency, no audio device needed):
    * payloads decode to signed 16-bit little-endian PCM via a format-
    * converting stream (so 8-bit or big-endian sources normalize), and
    * samples frame into [[FakePcmCodec.samplesPerFrame]]-sample frames
    * (partial last frame kept) for the SAME downstream
    * [[frameEnergy]] arithmetic. Multi-channel payloads interleave as
    * delivered — the curation features are channel-agnostic energy/peak.
    * Null / undecodable payloads yield zero frames (the [[AudioCodec]]
    * contract: one corrupt asset must not kill a 100 TB stage).
    *
    * The q221 oracle gate stays on [[FakePcmCodec]] (DuckDB cannot parse
    * RIFF); THIS codec is gated by q238's encode→decode round-trip proof
    * — closed-form samples are WAV-encoded in the query and the oracle
    * recomputes the features from the sample RULE, so the hash passes
    * iff every sample survives the round trip exactly (q212's
    * real-image device, extended from scalar dims to PCM).
    */
  object WavPcmCodec extends AudioCodec {
    def newDecoder(): Array[Byte] => Array[Array[Int]] = { payload =>
      if (payload == null) Array.empty
      else {
        val buf =
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            val f = ais.getFormat
            val target = new javax.sound.sampled.AudioFormat(
              f.getSampleRate, 16, f.getChannels,
              /* signed = */ true, /* bigEndian = */ false)
            javax.sound.sampled.AudioSystem
              .getAudioInputStream(target, ais).readAllBytes()
          } catch { case scala.util.control.NonFatal(_) => null }
        if (buf == null) Array.empty
        else Array.tabulate(buf.length / 2) { i =>
            (buf(2 * i + 1).toInt << 8) | (buf(2 * i) & 0xff)
          }.grouped(FakePcmCodec.samplesPerFrame).map(_.toArray).toArray
      }
    }
  }

  private val audioFrameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("samples", ArrayType(IntegerType, containsNull = false))))

  /** Audio decode stage: one (asset, frame) row per decoded frame —
    * [[decode]]'s mapPartitions shape with a Generator-like fan-out
    * (each asset explodes into its frames inside the partition iterator,
    * so no shuffle and no interim array-of-arrays column).
    */
  def decodeAudio(assets: DataFrame,
                  codec: AudioCodec = FakePcmCodec): DataFrame = {
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(audioFrameSchema))
    assets.select("asset_id", "payload").mapPartitions { it =>
      val dec = codec.newDecoder()
      it.flatMap { r =>
        val frames = dec(r.getAs[Array[Byte]]("payload"))
        frames.iterator.zipWithIndex.map { case (s, j) =>
          Row(r.getLong(0), j, s.toSeq)
        }
      }
    }(enc)
  }

  /** Frame-energy features over decoded PCM frames, expression-only
    * (higher-order functions stay in codegen; the samples array never
    * explodes into rows): per frame, energy = Σ|s| and peak = max|s| —
    * pure integer arithmetic, so the readout is exact on any engine.
    * The silence/clipping screen an audio-corpus curation pass runs
    * first.
    */
  def frameEnergy(frames: DataFrame): DataFrame = frames
    .withColumn("energy", aggregate(col("samples"), lit(0L),
      (acc, s) => acc + abs(s).cast("long")))
    .withColumn("peak", array_max(transform(col("samples"), s => abs(s))))

  /** Luminance-grid codec boundary for PERCEPTUAL hashing, mirroring
    * [[MediaCodec]]: `newDecoder()` once per partition, payload → a
    * row-major [[gridH]]×[[gridW]] grid of 8-bit luminances (the
    * downsampled thumbnail every perceptual hash starts from). Null /
    * undecodable payloads yield an empty array (one corrupt asset must
    * not kill the stage — downstream filters on `size(grid) > 0`).
    */
  trait GridCodec extends Serializable {
    def newDecoder(): Array[Byte] => Array[Int]
  }

  /** dHash grid geometry: 9 columns × 8 rows — 8 horizontal adjacent
    * comparisons per row × 8 rows = the classic 64-bit difference hash.
    */
  val gridW = 9
  val gridH = 8

  /** Deterministic stand-in grid decoder: cell `i` of the 72-cell grid
    * is the first byte of md5(payload ‖ "|g" ‖ i) — so any engine with
    * md5 reproduces every luminance exactly, which is what lets the
    * grid → dHash → Hamming-near-dup pipeline be oracle-checked
    * end-to-end ([[FakeCodec]]'s device extended from scalar dims to a
    * pixel grid).
    */
  object FakeGridCodec extends GridCodec {
    def newDecoder(): Array[Byte] => Array[Int] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      payload =>
        if (payload == null) Array.empty
        else Array.tabulate(gridW * gridH) { i =>
          md.update(payload)
          md.update(s"|g$i".getBytes("UTF-8"))
          md.digest()(0) & 0xff
        }
    }
  }

  /** REAL grid decoder over `javax.imageio`: decode the frame, then
    * block-mean Rec.601 luminance into the 9×8 grid — integer
    * arithmetic only (per-pixel lum = (299R+587G+114B)/1000 floor;
    * cell = floor(Σlum / n_pixels)), so the grid is deterministic for
    * identical pixels on any JVM. The oracle gates stay on
    * [[FakeGridCodec]] (DuckDB cannot decode images); THIS codec is the
    * production swap-in, spec-gated on real PNG bytes
    * (MultimodalRealCodecSpec's q212 device): a small local edit moves
    * only the cells it touches, so near-identical images land within a
    * small Hamming radius while unrelated images sit near 32.
    */
  object ImageIoGridCodec extends GridCodec {
    def newDecoder(): Array[Byte] => Array[Int] = {
      javax.imageio.ImageIO.setUseCache(false)
      payload =>
        if (payload == null) Array.empty
        else {
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null || img.getWidth < gridW || img.getHeight < gridH)
            Array.empty
          else {
            val w = img.getWidth; val h = img.getHeight
            Array.tabulate(gridW * gridH) { i =>
              val r = i / gridW; val c = i % gridW
              // half-open pixel block [x0,x1)×[y0,y1) of cell (r,c)
              val x0 = c * w / gridW; val x1 = (c + 1) * w / gridW
              val y0 = r * h / gridH; val y1 = (r + 1) * h / gridH
              var sum = 0L; var n = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = img.getRGB(x, y)
                  val lum = (299 * ((rgb >> 16) & 0xff) +
                    587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                  sum += lum; n += 1; x += 1
                }
                y += 1
              }
              (sum / n).toInt
            }
          }
        }
    }
  }

  /** Video codec boundary, mirroring [[AudioCodec]]: `newDecoder()` once
    * per partition, payload → decoded frames of (width, height, row-major
    * TOP-DOWN 0xRRGGBB pixels). Null / undecodable payloads yield zero
    * frames (one corrupt asset must not kill a 100 TB stage).
    */
  trait VideoCodec extends Serializable {
    def newDecoder(): Array[Byte] => Array[(Int, Int, Array[Int])]
  }

  /** REAL video container codec: uncompressed RIFF/AVI with BI_RGB DIB
    * frames — a genuine, standard on-disk video format (`ffmpeg -c:v
    * rawvideo` emits it) that is fully parseable with zero external
    * dependencies, the same sandbox trade [[WavPcmCodec]] makes for
    * audio (both are RIFF containers; MJPEG/H.264 payload decoding
    * would need codec libs this container lacks). The parser is a real
    * container walk, not a byte-offset hack: RIFF header → `hdrl` LIST
    * (avih main header) → `strl` LIST (strh/strf; the
    * BITMAPINFOHEADER must declare 24-bit BI_RGB) → `movi` LIST, whose
    * `00db`/`00dc` chunks each decode as a DIB — bottom-up BGR rows
    * (top-down when biHeight < 0), 4-byte row stride padding, emitted
    * as top-down packed RGB. Any structural violation (bad magic,
    * truncated chunk, wrong bit depth, frame-size mismatch) degrades to
    * zero frames per the [[VideoCodec]] contract.
    *
    * The q284 gate runs [[encodeAviRgb]]-built assets through THIS
    * decoder and an oracle that recomputes features from the pixel
    * RULE — q238's encode→decode round-trip proof, extended from PCM
    * samples to container-parsed video frames.
    */
  object AviDibCodec extends VideoCodec {
    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    def newDecoder(): Array[Byte] => Array[(Int, Int, Array[Int])] = { p =>
      try {
        if (p == null || p.length < 12 || fourcc(p, 0) != "RIFF" ||
          fourcc(p, 8) != "AVI ") Array.empty
        else {
          var bitCount = -1
          var compression = -1
          var biW = 0
          var biH = 0
          val frames =
            scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Array[Int])]
          def walk(from: Int, to: Int): Unit = {
            var off = from
            while (off + 8 <= to) {
              val id = fourcc(p, off)
              val size = le32(p, off + 4)
              val body = off + 8
              if (size < 0 || body + size > to) return // truncated: stop
              if (id == "LIST" && size >= 4) {
                val lt = fourcc(p, body)
                // descend into the structural lists only
                if (lt == "hdrl" || lt == "strl" || lt == "movi")
                  walk(body + 4, body + size)
              } else if (id == "strf" && size >= 20) {
                biW = le32(p, body + 4)
                biH = le32(p, body + 8)
                bitCount = le16(p, body + 14)
                compression = le32(p, body + 16)
              } else if ((id == "00db" || id == "00dc") &&
                bitCount == 24 && compression == 0 && biW > 0 && biH != 0) {
                val h = math.abs(biH)
                val stride = ((biW * 3 + 3) / 4) * 4
                if (size == stride * h) {
                  val pix = new Array[Int](biW * h)
                  var y = 0
                  while (y < h) {
                    // positive biHeight = bottom-up rows; negative = top-down
                    val srcRow = if (biH > 0) h - 1 - y else y
                    val ro = body + srcRow * stride
                    var x = 0
                    while (x < biW) {
                      val b = p(ro + 3 * x) & 0xff
                      val g = p(ro + 3 * x + 1) & 0xff
                      val r = p(ro + 3 * x + 2) & 0xff
                      pix(y * biW + x) = (r << 16) | (g << 8) | b
                      x += 1
                    }
                    y += 1
                  }
                  frames += ((biW, h, pix))
                }
              }
              off = body + size + (size & 1) // RIFF chunks pad to even
            }
          }
          walk(12, p.length)
          frames.toArray
        }
      } catch { case scala.util.control.NonFatal(_) => Array.empty }
    }
  }

  /** Build a standards-conformant uncompressed AVI from top-down packed
    * RGB frames — the fixture encoder for the q284 round-trip gate and
    * the real-codec specs (the inverse of [[AviDibCodec]]). All frames
    * must share (width, height).
    */
  def encodeAviRgb(frames: Seq[Array[Int]], width: Int, height: Int,
                   fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty && width > 0 && height > 0)
    require(frames.forall(_.length == width * height),
      "all frames must be width*height pixels")
    val stride = ((width * 3 + 3) / 4) * 4
    val frameBytes = stride * height
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val moviSize = 4 + frames.length * (8 + frameBytes)
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    cc("RIFF"); w32(4 + (8 + hdrlSize) + (8 + moviSize)); cc("AVI ")
    cc("LIST"); w32(hdrlSize); cc("hdrl")
    cc("avih"); w32(56)
    w32(1000000 / fps); w32(frameBytes * fps); w32(0)
    w32(0x10) // AVIF_HASINDEX off; AVIF_WASCAPTUREFILE-style flags minimal
    w32(frames.length); w32(0); w32(1); w32(frameBytes)
    w32(width); w32(height); w32(0); w32(0); w32(0); w32(0)
    cc("LIST"); w32(strlSize); cc("strl")
    cc("strh"); w32(56)
    cc("vids"); cc("DIB "); w32(0); w16(0); w16(0); w32(0)
    w32(1); w32(fps) // scale/rate
    w32(0); w32(frames.length); w32(frameBytes); w32(-1); w32(0)
    w16(0); w16(0); w16(width); w16(height) // rcFrame
    cc("strf"); w32(40)
    w32(40); w32(width); w32(height); w16(1); w16(24)
    w32(0) // BI_RGB
    w32(frameBytes); w32(0); w32(0); w32(0); w32(0)
    cc("LIST"); w32(moviSize); cc("movi")
    frames.foreach { f =>
      cc("00db"); w32(frameBytes)
      var y = height - 1 // DIB rows bottom-up
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val p = f(y * width + x)
          bos.write(p & 0xff); bos.write((p >> 8) & 0xff)
          bos.write((p >> 16) & 0xff)
          x += 1
        }
        var pad = width * 3
        while (pad < stride) { bos.write(0); pad += 1 }
        y -= 1
      }
    }
    bos.toByteArray
  }

  private val videoFrameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pix", ArrayType(IntegerType, containsNull = false))))

  /** Video decode stage: one (asset, frame) row per container frame —
    * [[decodeAudio]]'s mapPartitions shape (one codec init per
    * partition, frames fan out inside the partition iterator; no
    * shuffle, no interim array-of-frames column).
    */
  def decodeVideo(assets: DataFrame,
                  codec: VideoCodec = AviDibCodec): DataFrame = {
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(videoFrameSchema))
    assets.select("asset_id", "payload").mapPartitions { it =>
      val dec = codec.newDecoder()
      it.flatMap { r =>
        dec(r.getAs[Array[Byte]]("payload")).iterator.zipWithIndex.map {
          case ((w, h, pix), j) => Row(r.getLong(0), j, w, h, pix.toSeq)
        }
      }
    }(enc)
  }

  /** Per-frame channel statistics over decoded video frames,
    * expression-only (the pixel array never explodes into rows): exact
    * integer channel sums — the brightness/color screen a video-corpus
    * curation pass runs first, and the integer readout the q284
    * round-trip gate hashes.
    */
  def frameRgbStats(frames: DataFrame): DataFrame = frames
    .withColumn("sum_r", aggregate(col("pix"), lit(0L),
      (acc, p) => acc + shiftright(p, 16).bitwiseAND(lit(255)).cast("long")))
    .withColumn("sum_g", aggregate(col("pix"), lit(0L),
      (acc, p) => acc + shiftright(p, 8).bitwiseAND(lit(255)).cast("long")))
    .withColumn("sum_b", aggregate(col("pix"), lit(0L),
      (acc, p) => acc + p.bitwiseAND(lit(255)).cast("long")))
    .drop("pix")

  private val gridSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("grid", ArrayType(IntegerType, containsNull = false))))

  /** Grid decode stage: (asset_id, grid) per asset — [[decode]]'s
    * mapPartitions shape (one codec init per partition, streaming
    * iteration).
    */
  def decodeGrid(assets: DataFrame,
                 codec: GridCodec = FakeGridCodec): DataFrame = {
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(gridSchema))
    assets.select("asset_id", "payload").mapPartitions { it =>
      val dec = codec.newDecoder()
      it.map(r => Row(r.getLong(0), dec(r.getAs[Array[Byte]]("payload")).toSeq))
    }(enc)
  }

  /** dHash over a decoded grid, expression-only (stays in codegen):
    * bit (r,c) is set iff grid(r,c) > grid(r,c+1) — the classic
    * gradient-sign hash, invariant to global brightness/contrast shifts
    * because only ORDER between neighbors matters. Emitted as
    * `bands` = 8 per-row bytes (band r = Σ_c bit(r,c)·2^c — the
    * Hamming-join blocking unit) and `dhash` = the 16-hex-char string
    * of the bands in row order (a full 64-bit value overflows a SIGNED
    * BIGINT — 255·2⁵⁶ > 2⁶³ — so the canonical readout is hex: the
    * same integers, formatted identically by any engine, and ANSI-mode
    * safe). Empty grids (undecodable payloads) yield null bands/dhash.
    */
  def withDhash(gridDf: DataFrame): DataFrame = {
    def cell(i: Int) = element_at(col("grid"), i + 1) // 1-based
    val bands = array((0 until gridH).map { r =>
      (0 until gridW - 1).map { c =>
        when(cell(r * gridW + c) > cell(r * gridW + c + 1),
          lit(1 << c)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)
    gridDf
      .withColumn("bands",
        when(size(col("grid")) === gridW * gridH, bands))
      .withColumn("dhash",
        when(col("bands").isNotNull,
          concat((0 until gridH).map(r =>
            lpad(lower(hex(element_at(col("bands"), r + 1))), 2, "0")): _*)))
  }

  /** Hamming near-duplicate pairs over banded bit-vectors — the
    * multimodal dedup leg: rows whose total Hamming distance
    * (Σ bit_count(band_a XOR band_b)) is ≤ `maxDist`, found by the
    * PIGEONHOLE band join (two vectors within Hamming d of each other
    * must agree EXACTLY on at least one of b > d bands), never an
    * all-pairs scan. Pass bands wide enough for the corpus: candidate
    * volume is Σ_bands n²/2^bits-per-band, so 4×16-bit bands (join
    * [[withDhash]]'s 8-bit row bands pairwise) keep a 10⁸-asset corpus'
    * candidate set linear-ish while licensing maxDist ≤ 3. Dedup
    * semantics (id_a < id_b, distinct pairs) match the MinHash-LSH
    * family's contract; the band join is an equi-join on
    * (band_idx, band_val) — bucketed, broadcast-free, skew-bounded by
    * band-value balance of the hash itself.
    *
    * Band arrays of DIFFERENT lengths never pair: the zip_with distance
    * null-pads the shorter side, the popcount goes null, and the
    * maxDist filter drops the pair — dedup compares like with like
    * (q275 leans on this as its duration-class contract).
    */
  def hammingNearDupPairs(df: DataFrame, id: Column, bands: Column,
                          maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val base = df.select(id.cast("long").as("__id"), bands.as("__b"))
      .filter(col("__b").isNotNull)
    val posed = base.select(col("__id"), col("__b"),
      posexplode(col("__b")).as(Seq("__r", "__v")))
    val cand = posed.as("a")
      .join(posed.as("b"),
        col("a.__r") === col("b.__r") && col("a.__v") === col("b.__v") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__b").as("__ba"), col("b.__b").as("__bb"))
      .distinct()
    cand
      .withColumn("hamming",
        aggregate(zip_with(col("__ba"), col("__bb"),
            (x, y) => bit_count(x.bitwiseXOR(y)).cast("int")),
          lit(0), (acc, d) => acc + d))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Audio FINGERPRINT bands over decoded PCM frames — [[withDhash]]'s
    * gradient-sign idea in the time domain: per frame, 22 bits of
    * sample sign comparisons at lags 1–4 (sample i+lag > sample i),
    * folded to a per-asset band array in frame order. Sign-of-difference is
    * the Haitsma-Kalker-style robustness trick: a small amplitude
    * perturbation flips at most the comparisons it touches, while
    * gain/offset shifts flip nothing — so near-identical audio lands
    * within a small Hamming radius and the SAME
    * [[hammingNearDupPairs]] pigeonhole machinery dedups it. Assets
    * with different frame counts never pair (band arrays of different
    * length fail the distance verify by construction) — dedup within a
    * duration class, the standard contract. Expression-only after the
    * codec boundary; partial frames (a [[WavPcmCodec]] tail with fewer
    * than [[FakePcmCodec.samplesPerFrame]] samples) are DROPPED before
    * the bit expressions — otherwise ANSI element_at throws mid-corpus
    * ([[FakePcmCodec]] frames are always full, so its gates are
    * unaffected).
    */
  def audioSignBands(frames: DataFrame): DataFrame = {
    val n = FakePcmCodec.samplesPerFrame
    // comparisons at lags 1..4 — 7+6+5+4 = 22 bits per frame; one more
    // lag would halve again but the planted-perturbation flip count
    // grows with lags too (a sample sits in up to 2 comparisons per lag)
    val lags = Seq(1, 2, 3, 4)
    val offsets = lags.scanLeft(0)((acc, l) => acc + (n - l))
    val band = lags.zip(offsets).flatMap { case (l, off) =>
      (0 until n - l).map(i =>
        when(element_at(col("samples"), i + l + 1) >
          element_at(col("samples"), i + 1), lit(1 << (off + i)))
          .otherwise(lit(0)))
    }.reduce(_ + _)
    frames.filter(size(col("samples")) === n)
      .withColumn("__band", band)
      .groupBy(col("asset_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("frame_idx"), col("__band")))),
        x => x.getField("__band")).as("bands"))
  }

  /** [[hammingNearDupPairs]] ACROSS two frames — the incremental-dedup
    * leg: pairs between a NEW batch and the existing corpus index, so a
    * streamed maintainer only ever joins batch×corpus on the band key
    * (the q74/q144 incremental economics applied to perceptual hashes:
    * the corpus never re-self-joins). Ids must be disjoint between the
    * frames; pairs come out (least, greatest) so the union of
    * within-batch and across pairs over a batch sequence equals the
    * whole-corpus [[hammingNearDupPairs]] EXACTLY — each pair lands
    * once, in the batch of its later-arriving member.
    */
  def hammingNearDupPairsAcross(a: DataFrame, aId: Column, aBands: Column,
                                b: DataFrame, bId: Column, bBands: Column,
                                maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    def posed(df: DataFrame, id: Column, bands: Column) = df
      .select(id.cast("long").as("__id"), bands.as("__b"))
      .filter(col("__b").isNotNull)
      .select(col("__id"), col("__b"),
        posexplode(col("__b")).as(Seq("__r", "__v")))
    val cand = posed(a, aId, aBands).as("a")
      .join(posed(b, bId, bBands).as("b"),
        col("a.__r") === col("b.__r") && col("a.__v") === col("b.__v") &&
          col("a.__id") =!= col("b.__id"))
      .select(least(col("a.__id"), col("b.__id")).as("id_a"),
        greatest(col("a.__id"), col("b.__id")).as("id_b"),
        when(col("a.__id") < col("b.__id"), col("a.__b"))
          .otherwise(col("b.__b")).as("__ba"),
        when(col("a.__id") < col("b.__id"), col("b.__b"))
          .otherwise(col("a.__b")).as("__bb"))
      .distinct()
    cand
      .withColumn("hamming",
        aggregate(zip_with(col("__ba"), col("__bb"),
            (x, y) => bit_count(x.bitwiseXOR(y)).cast("int")),
          lit(0), (acc, d) => acc + d))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Size-aware repartitioning before a heavy decode: pack partitions to a
    * target byte budget so one huge video can't skew an executor. At 100 TB
    * this is the difference between a balanced decode stage and a straggler.
    */
  def repartitionByBytes(assets: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val totalBytes = assets.agg(sum(col("meta.byte_len"))).head().getLong(0)
    val parts = math.max(1, (totalBytes / math.max(1L, targetBytesPerPartition)).toInt)
    assets.repartition(parts, col("asset_id"))
  }
}
