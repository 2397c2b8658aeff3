package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed per-partition in batches.
  *
  * The IMAGE decode step is REAL: [[imageIoDecode]] parses the formats the
  * JDK ships codecs for (PNG/JPEG/GIF/BMP via `javax.imageio` — no external
  * dependency) and [[decodeMedia]]/[[resizeMedia]] use it whenever the
  * bytes are a parseable image. Bytes no JDK codec recognizes (audio,
  * video, exotic image formats — this container has no external codecs)
  * fall back to [[fakeDecode]]'s deterministic pseudo-metadata, so the
  * batch plumbing is exercised end-to-end either way; swapping the
  * fallback for a JNI/codec call is the only change needed for real
  * audio/video.
  */
object Multimodal {

  /** Output schema of the decode stage: one typed metadata struct per blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)))

  /** Real image decode via `javax.imageio` (PNG/JPEG/GIF/BMP — the codecs
    * the JDK ships; no external dependency, works headless). Returns the
    * container format name, pixel dimensions, and the mean over all pixels
    * of (r+g+b)/3 in sRGB; None when no installed reader recognizes the
    * bytes (then callers fall back to [[fakeDecode]]).
    */
  def imageIoDecode(bytes: Array[Byte]): Option[(String, Int, Int, Double)] = {
    import javax.imageio.ImageIO
    imageIoNoDiskCache
    val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    // createImageInputStream returns null when no ImageInputStreamSpi is
    // registered (stripped IIORegistry / isolated classloader); that must
    // take the fallback path, not NPE in the finally below
    if (iis == null) return None
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val img = reader.read(0)
          val (w, h) = (img.getWidth, img.getHeight)
          // one bulk sRGB fetch per image: per-pixel getRGB pays a
          // color-model dispatch per call, ~3x the decode cost on the
          // small images this stage batches
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sum = 0.0
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            i += 1
          }
          Some((reader.getFormatName.toLowerCase, w, h, sum / (w.toLong * h)))
        } finally reader.dispose()
      }
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** ImageIO's stream factory defaults to a DISK-backed cache
    * (`FileCacheImageInputStream`) — one temp file created and deleted
    * PER BLOB, which dominates the per-row cost when the reader probe
    * rejects the bytes immediately (the q50 fake-blob path: ~0.5 ms/row
    * of filesystem churn for a header sniff). In-memory blobs are
    * already fully buffered, so the disk cache buys nothing — switch it
    * off once per JVM (the JDK-sanctioned knob, thread-safe to set).
    */
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** [[imageIoDecode]] with the deterministic fallback: the decode every
    * batch stage runs per blob.
    */
  def decode(bytes: Array[Byte]): (String, Int, Int, Double) =
    imageIoDecode(bytes).getOrElse(fakeDecode(bytes))

  /** FALLBACK decode for bytes no JDK codec parses: deterministic
    * pseudo-metadata from the raw bytes. Replace with a real codec (e.g.
    * TwelveMonkeys/javacv) for production audio/video; signature and batch
    * shape stay identical.
    */
  def fakeDecode(bytes: Array[Byte]): (String, Int, Int, Double) = {
    val n = bytes.length
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    val width = 64 + (n % 128)
    val height = 64 + ((n / 2) % 128)
    // mean over bytes, fixed traversal order → deterministic
    var sum = 0L
    var i = 0
    while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    (fmt, width, height, mean)
  }

  /** Synthesize a binary "media" column from text (the testdata carries no
    * real blobs): UTF-8 bytes stand in for an encoded image. These bytes
    * are NOT a parseable image, so downstream decode exercises the
    * [[fakeDecode]] fallback path.
    */
  def withFakeBlob(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("blob", encode(col(textCol), "UTF-8"))

  /** Schema of the synthesized-PNG relation. */
  val blobSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = false)))

  /** Synthesize a REAL PNG per row with the JDK encoder, so downstream
    * decode exercises the real `javax.imageio` path. The image is a
    * uniform gray fill whose every property is a deterministic function of
    * the text (and therefore replayable by a SQL oracle):
    * width = 1 + (|utf8| mod 48), height = 1 + (⌊|utf8|/2⌋ mod 48),
    * fill value v = (Σ utf8 bytes) mod 256 on all three channels — PNG is
    * lossless, so the decoded mean intensity is exactly v. Batch shape
    * matches [[decodeMedia]]: mapPartitions, encoder state amortizable
    * per partition.
    */
  def pngBlobs(spark: SparkSession, df: DataFrame, textCol: String,
               idCol: String = "doc_id"): DataFrame = {
    val rdd = df.where(col(textCol).isNotNull)
      .select(col(idCol), col(textCol)).rdd.mapPartitions { it =>
        import java.awt.image.BufferedImage
        import javax.imageio.ImageIO
        imageIoNoDiskCache // encode side pays the same per-blob temp file
        val bos = new java.io.ByteArrayOutputStream() // reused per partition
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getString(1).getBytes("UTF-8")
          val n = bytes.length
          var sum = 0L
          var i = 0
          while (i < n) { sum += bytes(i) & 0xff; i += 1 }
          val v = (sum % 256).toInt
          val (w, h) = (1 + n % 48, 1 + (n / 2) % 48)
          // TYPE_INT_RGB specifically: a TYPE_BYTE_GRAY image would run
          // gray→sRGB color conversion on read and break mean == v. The
          // uniform fill goes straight into the backing int buffer —
          // per-pixel setRGB costs a color-model round trip per call
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          java.util.Arrays.fill(
            img.getRaster.getDataBuffer
              .asInstanceOf[java.awt.image.DataBufferInt].getData,
            (v << 16) | (v << 8) | v)
          bos.reset()
          ImageIO.write(img, "png", bos)
          Row(id, bos.toByteArray)
        }
      }
    spark.createDataFrame(rdd, blobSchema)
  }

  /** Partition-batched decode: mapPartitions so any per-batch setup (codec
    * contexts, model sessions) is amortized across the partition — the
    * direct Scala analog of a Pandas-UDF `mapInPandas` stage. Input must
    * have (doc_id LONG, blob BINARY). Parseable images decode for real
    * ([[imageIoDecode]]); anything else takes the [[fakeDecode]] fallback.
    */
  def decodeMedia(spark: SparkSession, blobs: DataFrame): DataFrame = {
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      // per-partition setup would go here (decoder init, buffer reuse)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (fmt, w, h, mean) = decode(bytes)
        Row(id, bytes.length, fmt, w, h, mean)
      }
    }
    spark.createDataFrame(rdd, mediaMetaSchema)
  }

  /** Embedding schema for encoded media. */
  val mediaEmbeddingSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** STUB media encoder: a deterministic chunk-hash bag-of-features vector
    * per blob (slot = chunk hash mod dim), standing in for a vision/audio
    * encoder. Same mapPartitions batch shape as [[decodeMedia]] — the
    * per-partition block is where a real model session would be loaded
    * once and run over batched inputs. Near-identical blobs map to
    * near-identical vectors, so the output plugs straight into the ANN
    * operators (Similarity.topKLsh / cosineDupPairsLsh).
    */
  def embedMedia(spark: SparkSession, blobs: DataFrame,
                 dim: Int = 64, chunkBytes: Int = 16): DataFrame = {
    // an encoder pass is the canonical work ≫ bytes stage (a real model
    // forward per blob); spread a compact scan before it so one small
    // parquet never serializes the whole corpus through one task
    // (Tables.spreadAmplified scaladoc)
    // an encoder pass is the canonical work ≫ bytes stage (a real model
    // forward per blob); spread a compact scan before it so one small
    // parquet never serializes the whole corpus through one task
    // (Tables.spreadAmplified scaladoc)
    val rdd = graft.ops.Tables.spreadAmplified(
        blobs.select(col("doc_id"), col("blob")), col("doc_id"))
      .rdd.mapPartitions { it =>
      // model/session init would happen here, once per partition
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val counts = new Array[Float](dim)
        var off = 0
        while (off < bytes.length) {
          val end = math.min(off + chunkBytes, bytes.length)
          var h = 1125899906842597L // FNV-ish deterministic rolling hash
          var i = off
          while (i < end) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
          counts(java.lang.Math.floorMod(h, dim.toLong).toInt) += 1f
          off = end
        }
        Row(id, counts.toSeq)
      }
    }
    // MATERIALIZE the encoder output (lazily, on first action): consumers
    // like cosineDupPairsLsh scan their input from several subtrees
    // (mean-offset aggregate, banding, both verification join-backs), and
    // lineage recompute of an ENCODER — a model forward per blob, by
    // contract the most expensive stage in the pipeline — is the one case
    // where Spark's recompute-per-consumer default is the wrong trade.
    // The embedding frame is tiny relative to its cost (rows × dim
    // floats), so block storage is cheap; blocks are released by the
    // ContextCleaner when the frame becomes unreachable. Same
    // lineage-truncation trade DedupWinnow takes for fingerprints.
    spark.createDataFrame(rdd, mediaEmbeddingSchema).localCheckpoint(false)
  }

  /** Synthesize a PATTERNED real PNG per row — the perceptual-hash
    * fixture ([[pngBlobs]]'s uniform fill hashes to all-zero dHash bits;
    * a gradient carries structure). Every pixel is a deterministic
    * function of the text, so a SQL oracle replays the downstream hash
    * from the raw text while the engine computes it from REAL decoded
    * pixels: with n = |utf8|, s = Σ utf8 bytes,
    *   width  = 16 + (n mod 17), height = 16 + (⌊n/2⌋ mod 17),
    *   a = 17 + (n mod 29), c = 13 + (s mod 23),
    *   gray(x, y) = (s + x·a + y·c) mod 256 on all three channels.
    * The multipliers are LARGE on purpose: they wrap mod 256 several
    * times per hash cell, so unrelated documents' dHashes decorrelate
    * (measured on the real corpus: small multipliers left 36% of all
    * pairs within Hamming 6 — a degenerate hash; these leave 0.2%).
    * PNG is lossless and the fill is channel-uniform, so the decoded
    * gray equals gray(x, y) exactly. NEAR-DUPLICATE texts (same length,
    * slightly different byte sum) shift every pixel by the same small
    * delta — most dHash comparisons survive, the perceptual property
    * the planted-fixture spec pins.
    */
  def patternPngBlobs(spark: SparkSession, df: DataFrame, textCol: String,
                      idCol: String = "doc_id"): DataFrame = {
    val rdd = df.where(col(textCol).isNotNull)
      .select(col(idCol), col(textCol)).rdd.mapPartitions { it =>
        import java.awt.image.BufferedImage
        import javax.imageio.ImageIO
        imageIoNoDiskCache
        val bos = new java.io.ByteArrayOutputStream()
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getString(1).getBytes("UTF-8")
          val n = bytes.length
          var s = 0L
          var i = 0
          while (i < n) { s += bytes(i) & 0xff; i += 1 }
          val (w, h) = (16 + n % 17, 16 + (n / 2) % 17)
          val (a, c) = (17 + n % 29, 13 + (s % 23).toInt)
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val buf = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferInt].getData
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ((s + x.toLong * a + y.toLong * c) % 256).toInt
              buf(y * w + x) = (v << 16) | (v << 8) | v
              x += 1
            }
            y += 1
          }
          bos.reset()
          ImageIO.write(img, "png", bos)
          Row(id, bos.toByteArray)
        }
      }
    spark.createDataFrame(rdd, blobSchema)
  }

  /** Output schema of the perceptual-hash stage. */
  val dhashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** 56-bit DIFFERENCE HASH (dHash) per image — the classic perceptual
    * near-dup fingerprint: box-downsample the decoded grayscale image to
    * an 8×8 grid, then one bit per horizontally-adjacent cell pair
    * (7 comparisons × 8 rows). 56 bits keeps the hash strictly
    * non-negative, so band extraction and XOR/popcount replay portably
    * in engines whose BIGINT ops reject sign-bit games (the 64-bit
    * variant would put bit 63 in play).
    *
    * All arithmetic is INTEGER so an external oracle replays it exactly:
    * gray(x,y) = (r+g+b) div 3; grid cell (i,j) covers
    * x ∈ [i·W div 8, (i+1)·W div 8) × y ∈ [j·H div 8, (j+1)·H div 8)
    * (cells clamp to ≥ 1 pixel, so images smaller than the grid hash
    * too — the stage is total) and its value is sum(gray) div count;
    * bit (j·7 + i) is set iff cell(i+1, j) > cell(i, j). Uniform
    * brightness shifts preserve every strict comparison that does not
    * wrap — the dHash invariance argument (Krawetz's "kind of like a
    * hash, but not").
    *
    * Batch shape: mapPartitions like [[decodeMedia]] (ImageIO is the
    * per-partition native-codec justification); output is one
    * (doc_id, long) row per blob — hash-sized, never pixel-sized.
    * Bytes no JDK codec parses hash from [[fakeDecode]]-style synthetic
    * dims with gray(x,y) = byte arithmetic, keeping the stage total.
    */
  def dhashMedia(spark: SparkSession, blobs: DataFrame): DataFrame =
    perceptualHash(spark, blobs, dhashSchema) { cell =>
      var hash = 0L
      var j = 0
      while (j < 8) {
        var i = 0
        while (i < 7) {
          if (cell(j)(i + 1) > cell(j)(i)) hash |= 1L << (j * 7 + i)
          i += 1
        }
        j += 1
      }
      hash
    }

  /** Output schema of the average-hash stage. */
  val ahashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("ahash", LongType, nullable = false)))

  /** 63-bit AVERAGE HASH (aHash) per image — [[dhashMedia]]'s sibling:
    * one bit per grid cell, set iff the cell's gray EXCEEDS the integer
    * mean of all 64 cells (threshold = Σ cells div 64). The last cell
    * (7,7) is dropped so the hash stays strictly non-negative in 63
    * bits — same portability argument as dHash's 56. aHash reacts to
    * absolute brightness structure where dHash reacts to gradients, so
    * the two catch different near-dup classes (the standard pairing).
    * Same decode path, grid arithmetic, fallback, and batch shape as
    * [[dhashMedia]]; [[graft.ext.Dedup.perceptualNearDupPairs]] bands it
    * with chunks = 7 × 9 bits.
    */
  def ahashMedia(spark: SparkSession, blobs: DataFrame): DataFrame =
    perceptualHash(spark, blobs, ahashSchema) { cell =>
      var tot = 0L
      var j = 0
      while (j < 8) {
        var i = 0
        while (i < 8) { tot += cell(j)(i); i += 1 }
        j += 1
      }
      val thr = tot / 64
      var hash = 0L
      j = 0
      while (j < 8) {
        var i = 0
        while (i < 8) {
          val k = j * 8 + i
          if (k < 63 && cell(j)(i) > thr) hash |= 1L << k
          i += 1
        }
        j += 1
      }
      hash
    }

  /** Shared perceptual-hash stage: real decode (or the deterministic
    * byte-arithmetic fallback) → integer 8×8 box-mean grid → the
    * caller's bit rule. One long per blob; all arithmetic integer so
    * any external oracle replays it. */
  private def perceptualHash(spark: SparkSession, blobs: DataFrame,
                             schema: StructType)
                            (bitsOf: Array[Array[Int]] => Long): DataFrame = {
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      import javax.imageio.ImageIO
      imageIoNoDiskCache
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val grays: (Int, Int, (Int, Int) => Int) = {
          val iis = ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val decoded =
            if (iis == null) None
            else try {
              val readers = ImageIO.getImageReaders(iis)
              if (!readers.hasNext) None
              else {
                val reader = readers.next()
                try {
                  reader.setInput(iis)
                  val img = reader.read(0)
                  val (w, h) = (img.getWidth, img.getHeight)
                  val px = img.getRGB(0, 0, w, h, null, 0, w)
                  Some((w, h, (x: Int, y: Int) => {
                    val rgb = px(y * w + x)
                    (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                      (rgb & 0xff)) / 3
                  }))
                } finally reader.dispose()
              }
            } catch { case _: Exception => None }
            finally iis.close()
          decoded.getOrElse {
            // non-image bytes: synthetic dims + byte-arithmetic grays,
            // same deterministic fallback discipline as fakeDecode
            val n = math.max(bytes.length, 1)
            val (w, h) = (8 + n % 25, 8 + (n / 2) % 25)
            (w, h, (x: Int, y: Int) =>
              if (bytes.isEmpty) 0
              else bytes((x.toLong * 31 + y.toLong * 17).toInt % n) & 0xff)
          }
        }
        val (w, h, gray) = grays
        // box cells: integer ranges, integer means — oracle-exact. A
        // REAL decoded image can be smaller than the 8×8 grid (a 4×4
        // favicon): clamp every cell to at least one pixel (cells then
        // re-read pixels — deterministic) instead of dividing by the
        // empty range. The synthesized fixtures are all ≥ 8px, so the
        // oracle never sees the clamp.
        val cell = Array.ofDim[Int](8, 8)
        var j = 0
        while (j < 8) {
          val y0 = math.min(j * h / 8, h - 1)
          val y1 = math.max(y0 + 1, (j + 1) * h / 8)
          var i = 0
          while (i < 8) {
            val x0 = math.min(i * w / 8, w - 1)
            val x1 = math.max(x0 + 1, (i + 1) * w / 8)
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { sum += gray(x, y); x += 1 }
              y += 1
            }
            cell(j)(i) = (sum / ((x1 - x0).toLong * (y1 - y0))).toInt
            i += 1
          }
          j += 1
        }
        Row(id, bitsOf(cell))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Output schema of the resize stage. */
  val resizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("out_width", IntegerType, nullable = false),
    StructField("out_height", IntegerType, nullable = false)))

  /** Fit-in-box resize: scale = min(maxW/w, maxH/h, 1) (never upscale),
    * output dims floor(dim·scale). Input dims come from the real decode
    * (with the [[fakeDecode]] fallback for non-image bytes); the DIMENSION
    * arithmetic — what a pipeline filters and bins on — is deterministic
    * double math, and the stage keeps the same mapPartitions batch shape
    * as [[decodeMedia]] (a real resampler amortizes its buffers per
    * partition).
    */
  def resizeMedia(spark: SparkSession, blobs: DataFrame,
                  maxW: Int = 128, maxH: Int = 128): DataFrame = {
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (_, w, h, _) = decode(bytes)
        val scale = math.min(math.min(maxW.toDouble / w, maxH.toDouble / h), 1.0)
        Row(id, w, h, math.floor(w * scale).toInt, math.floor(h * scale).toInt)
      }
    }
    spark.createDataFrame(rdd, resizeSchema)
  }

  /** Frame-sample stub: emits `everyN`-th chunk offsets of a blob, the
    * shape of video frame sampling (one row per sampled frame).
    */
  def sampleFrames(blobs: DataFrame, chunkBytes: Int, everyN: Int): DataFrame =
    blobs.select(col("doc_id"),
        posexplode(split(col("blob").cast("string"),
          s"(?<=\\G.{$chunkBytes})")).as(Seq("frame_idx", "frame")))
      .where(pmod(col("frame_idx"), lit(everyN)) === 0)
      .select(col("doc_id"), col("frame_idx"), length(col("frame")).as("frame_len"))

  /** [[sampleFrames]] keeping a CONTENT hash per sampled frame instead of
    * its length — the input to frame-set video analytics. Same chunking
    * contract as sampleFrames (split keeps the trailing empty frame at
    * exact multiples; a NULL blob emits nothing). */
  def frameHashes(blobs: DataFrame, chunkBytes: Int, everyN: Int): DataFrame =
    blobs.select(col("doc_id"),
        posexplode(split(col("blob").cast("string"),
          s"(?<=\\G.{$chunkBytes})")).as(Seq("frame_idx", "frame")))
      .where(pmod(col("frame_idx"), lit(everyN)) === 0)
      .select(col("doc_id"), col("frame_idx"), xxhash64(col("frame")).as("fh"))

  /** Near-duplicate VIDEOS by sampled-frame-set overlap: hash every
    * `everyN`-th `chunkBytes` frame ([[frameHashes]]), collapse each video
    * to its DISTINCT frame-hash set, and emit pairs whose sets have
    * Jaccard ≥ `threshold` through the lossless prefix-filtered
    * set-similarity join ([[Dedup.setSimJoinOnSets]]) — never an
    * all-pairs plan, recall exactly 1 at the threshold (modulo 2⁻⁶⁴ hash
    * collisions). This is the standard near-dup-video shape (per-frame
    * fingerprints + set overlap): re-encodes and re-uploads share most
    * frames; trims and overlays share a large fraction. Frame ORDER is
    * deliberately ignored (a set, not a sequence) — robust to
    * re-ordering edits, blind to them as differences.
    *
    * Output: (doc_a, doc_b, jaccard). The decode step is the repo's
    * stub-decode contract (frames are byte chunks of the blob); the
    * plumbing — sampling cadence, set collapse, join shape — is the real
    * 100 TB path and is what this operator pins.
    */
  def videoNearDupPairs(blobs: DataFrame, chunkBytes: Int = 32,
                        everyN: Int = 2,
                        threshold: Double = 0.5): DataFrame =
    graft.ext.Dedup.setSimJoinOnSets(
      frameHashes(blobs, chunkBytes, everyN)
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_set(col("fh"))).as("grams"))
        .select(col("doc_id").as("doc"), col("grams")),
      threshold)
}
