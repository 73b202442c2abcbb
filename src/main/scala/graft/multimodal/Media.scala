package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded media asset (what a real codec would return). */
case class DecodedMedia(width: Int, height: Int, nFrames: Int, pixels: Array[Byte])

/** Codec SPI for opaque media blobs. The execution container has no image/audio
  * libraries, so the REAL codec is a clearly-marked stub; [[FakeCodec]] is the
  * deterministic stand-in that keeps the Spark-side plumbing (schema, partitioning,
  * batch shape) real and testable.
  */
trait MediaCodec extends Serializable {
  def decode(blob: Array[Byte]): DecodedMedia
}

/** STUB — a real deployment would bind an actual decoder (JavaCV/TwelveMonkeys/
  * ffmpeg bindings) here. Intentionally unimplemented in this container. */
object RealCodec extends MediaCodec {
  def decode(blob: Array[Byte]): DecodedMedia = ???
}

/** Deterministic fake decode: dimensions derived from the blob digest, "pixels" are
  * the blob bytes themselves. Matches the arithmetic the m1 oracle reproduces. */
object FakeCodec extends MediaCodec {
  def decode(blob: Array[Byte]): DecodedMedia = {
    val hex = java.security.MessageDigest.getInstance("MD5").digest(blob)
      .map("%02x".format(_)).mkString
    def nibble(i: Int): Int = Integer.parseInt(hex.substring(i, i + 1), 16)
    DecodedMedia(16 * (1 + nibble(0)), 16 * (1 + nibble(1)), 1 + nibble(2), blob)
  }
}

case class MediaFeature(doc_id: Long, n_frames: Int, n_pixels: Int, features: Array[Float])

/** Multimodal-column operators: image/audio/video as opaque BINARY plus typed
  * metadata. Pattern notes for 100 TB:
  *  - metadata extraction ([[mediaMeta]]) is pure column arithmetic — stays in
  *    whole-stage codegen, blobs never leave the scan projection that needs them;
  *  - feature extraction ([[mediaFeatures]]) is the imperative kernel: a
  *    `mapPartitions` that drains each partition in fixed-size batches (the JVM
  *    analog of `mapInPandas`' Arrow batches) so a vectorized decoder can amortize
  *    per-batch setup; batch boundaries must never change results (spec-enforced).
  */
object Media {

  /** Dress the documents table as a media-asset table: the text bytes play the
    * opaque blob. mime fans out by doc_id so all three modalities exercise. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))

  /** m1 — "decode" the typed metadata from the blob: byte size plus
    * digest-derived fake dimensions (FakeCodec's arithmetic, kept SQL-expressible:
    * conv(hex-nibble) here == strpos('0123456789abcdef', nibble)-1 in the oracle).
    * Frame sampling keeps min(n_frames, 4) frames. */
  def mediaMeta(docs: DataFrame): DataFrame = {
    val a = assets(docs).withColumn("hx", md5(col("blob")))
    def nib(i: Int) = conv(substring(col("hx"), i, 1), 16, 10).cast("int")
    a.select(col("doc_id"), col("mime"),
      octet_length(col("blob")).as("n_bytes"),
      (lit(16) * (nib(1) + 1)).as("width"),
      (lit(16) * (nib(2) + 1)).as("height"),
      (nib(3) + 1).as("n_frames"),
      least(nib(3) + 1, lit(4)).as("sampled_frames"))
  }

  /** m3 — deterministic frame sampling: up to `maxFrames` evenly-spaced frames
    * per asset, each addressing its byte range inside the opaque blob (the
    * Spark-side plumbing of a video frame sampler: a real pipeline hands
    * `(blob, frame_offset, frame_len)` to the decode kernel). All arithmetic is
    * integer `div`, so the oracle reproduces it exactly; one `explode` of at
    * most `maxFrames` indices per row, no shuffle, no UDF. */
  def frameSample(docs: DataFrame, maxFrames: Int = 4): DataFrame =
    mediaMeta(docs)
      .select(col("doc_id"), col("mime"), col("n_frames"), col("n_bytes"),
        col("sampled_frames"),
        explode(sequence(lit(0), col("sampled_frames") - 1)).as("sample_idx"))
      .withColumn("frame_no",
        expr("(sample_idx * n_frames) div sampled_frames"))
      .withColumn("frame_offset", expr("(frame_no * n_bytes) div n_frames"))
      .withColumn("frame_len",
        expr("((frame_no + 1) * n_bytes) div n_frames") - col("frame_offset"))
      .select(col("doc_id"), col("mime"), col("sample_idx"), col("frame_no"),
        col("frame_offset"), col("frame_len"))

  /** m4 — aspect-preserving resize planning: target dimensions for fitting each
    * asset inside `maxW`×`maxH` without upscaling. Pure integer
    * cross-multiplication (`div`), so the oracle reproduces every rounding
    * decision exactly; the actual pixel resample would run in the codec kernel
    * (m2's mapPartitions shape) — THIS op is the metadata plan a pipeline
    * computes first to budget the decode work. Narrow, codegen'd, no shuffle. */
  def resizePlan(docs: DataFrame, maxW: Int = 128, maxH: Int = 96): DataFrame =
    mediaMeta(docs)
      .withColumn("fits", col("width") <= maxW && col("height") <= maxH)
      // width-bound scaling keeps aspect iff the scaled height still fits
      .withColumn("by_w_h", expr(s"(height * $maxW) div width"))
      .withColumn("out_width",
        when(col("fits"), col("width"))
          .when(col("by_w_h") <= maxH, lit(maxW))
          .otherwise(expr(s"(width * $maxH) div height")))
      .withColumn("out_height",
        when(col("fits"), col("height"))
          .when(col("by_w_h") <= maxH, col("by_w_h"))
          .otherwise(lit(maxH)))
      .select(col("doc_id"), col("mime"), col("width"), col("height"),
        col("out_width"), col("out_height"),
        (col("out_width") * col("out_height")).as("out_pixels"))

  /** m2 — batched feature extraction through the codec SPI. Features: 8 floats,
    * each the mean of one stride-8 slice of the decoded bytes — deterministic,
    * cheap, and shaped like a real embedding head. */
  def mediaFeatures(spark: SparkSession, docs: DataFrame,
      codec: MediaCodec = FakeCodec, batchSize: Int = 64): Dataset[MediaFeature] = {
    import spark.implicits._
    // a NULL blob (NULL source text) is an undecodable asset: no features
    // row, rather than an NPE inside the codec kernel — the m2 oracle
    // mirrors with WHERE text IS NOT NULL. Filtered on the INPUT (blob is
    // NULL iff text is — encode is null-intolerant): a blob-side filter
    // would push the encode expression scan-side and re-evaluate it (the
    // winnowFingerprint lesson)
    assets(docs.filter(col("text").isNotNull))
      .select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one "vectorized" decode call-site per batch (mapInPandas analog)
          batch.map { case (id, blob) =>
            val d = codec.decode(blob)
            val px = d.pixels
            // one unboxed pass, Long accumulators: the 8-way boxed
            // `indices.collect` walked the array 8 times, and an Int sum
            // wraps negative past ~67 MB of high-valued bytes — a silently
            // corrupt "mean" from the kernel positioned as the batched
            // vectorized decode path
            val sums = new Array[Long](8)
            val ns = new Array[Long](8)
            var i = 0
            while (i < px.length) {
              val f = i % 8
              sums(f) += px(i) & 0xff
              ns(f) += 1
              i += 1
            }
            // same float-division sequence as before (sum.toFloat / n), so
            // in-range values stay bit-identical to the oracle's FLOAT math
            val feats = Array.tabulate(8) { f =>
              if (ns(f) == 0) 0f else sums(f).toFloat / ns(f)
            }
            MediaFeature(id, d.nFrames, px.length, feats)
          }
        }
      }
  }
}
