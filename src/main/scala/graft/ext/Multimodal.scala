package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed per-partition in batches.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * `fakeDecode` derives deterministic pseudo-metadata from the bytes. The
  * Spark-side plumbing — schema, binary column handling, partition-batched
  * processing via mapPartitions (the Scala analog of mapInPandas), and the
  * output metadata struct — is real and tested; swapping `fakeDecode` for
  * a JNI/codec call is the only change needed for real media.
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

  /** STUB decode: deterministic pseudo-metadata from the raw bytes.
    * Replace with a real codec (e.g. TwelveMonkeys/javacv) for production;
    * signature and batch shape stay identical.
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
    * real blobs): UTF-8 bytes stand in for an encoded image.
    */
  def withFakeBlob(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("blob", encode(col(textCol), "UTF-8"))

  /** Partition-batched decode: mapPartitions so any per-batch setup (codec
    * contexts, model sessions) is amortized across the partition — the
    * direct Scala analog of a Pandas-UDF `mapInPandas` stage. Input must
    * have (doc_id LONG, blob BINARY).
    */
  def decodeMedia(spark: SparkSession, blobs: DataFrame): DataFrame = {
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      // per-partition setup would go here (decoder init, buffer reuse)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (fmt, w, h, mean) = fakeDecode(bytes)
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
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
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
    spark.createDataFrame(rdd, mediaEmbeddingSchema)
  }

  /** Output schema of the resize stage. */
  val resizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("out_width", IntegerType, nullable = false),
    StructField("out_height", IntegerType, nullable = false)))

  /** Fit-in-box resize: scale = min(maxW/w, maxH/h, 1) (never upscale),
    * output dims floor(dim·scale). The pixel resampling itself is part of
    * the decode stub; the DIMENSION arithmetic — what a pipeline filters
    * and bins on — is real, deterministic double math, and the stage keeps
    * the same mapPartitions batch shape as [[decodeMedia]] (a real
    * resampler amortizes its buffers per partition).
    */
  def resizeMedia(spark: SparkSession, blobs: DataFrame,
                  maxW: Int = 128, maxH: Int = 128): DataFrame = {
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (_, w, h, _) = fakeDecode(bytes)
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
}
