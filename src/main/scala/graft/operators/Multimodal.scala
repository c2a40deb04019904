package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BinaryType`
  * payloads with typed metadata, processed by per-chunk ("frame") operators.
  *
  * The container has no image/audio codecs, so the DECODE step is a clearly
  * marked deterministic fake (md5-derived pseudo-features) — the Spark-side
  * plumbing (schema, chunking/partitioning, batch shape) is real and tested,
  * and a codec-backed decoder drops in by replacing [[fakeDecodeFeatures]]'s
  * expression with a `mapPartitions` over the binary payloads.
  *
  * Scale notes: payload columns stay in Parquet as binary; chunking is a
  * generate (explode) — no shuffle; feature extraction is per-row
  * expression work that scales embarrassingly.
  */
object Multimodal {

  /** The canonical asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("byte_len", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)
  ))

  /** Wrap a text column as a binary asset (stand-in for reading real media
    * bytes; with real data this is `spark.read.format("binaryFile")`). */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast(BinaryType).as("payload"),
      octet_length(col(payloadCol)).cast("long").as("byte_len"),
      md5(col(payloadCol)).as("checksum"))

  /** Frame/chunk sampling: split the payload into fixed-size chunks and emit
    * one row per chunk with its hash — the plumbing for frame-level
    * dedup/fingerprinting of video/audio. Pure generate, no shuffle. */
  def chunkHashes(df: DataFrame, idCol: String, payloadStrCol: String, chunkSize: Int): DataFrame = {
    val chunks = expr(
      s"""transform(sequence(0, cast(ceil(length($payloadStrCol) / cast($chunkSize as double)) as int) - 1),
         |  i -> substring($payloadStrCol, i * $chunkSize + 1, $chunkSize))""".stripMargin)
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
  }

  /** STUB RESIZE — deterministic stand-in for image/audio downsampling:
    * keeps every `factor`-th unit of the payload (subsampling is what a
    * nearest-neighbor resize does to pixels), recording old/new sizes as the
    * typed metadata a real resize would produce. The Spark-side shape —
    * per-row payload transform with metadata — is exactly a codec-backed
    * resize's; swap the expression for a decoder call to make it real. */
  def fakeResize(df: DataFrame, idCol: String, payloadStrCol: String, factor: Int): DataFrame = {
    require(factor > 0, "resize factor must be positive")
    val resized = expr(
      s"""array_join(transform(
         |  sequence(1, length($payloadStrCol), $factor),
         |  i -> substring($payloadStrCol, i, 1)), '')""".stripMargin)
    df.select(col(idCol),
      length(col(payloadStrCol)).cast("long").as("orig_len"),
      resized.as("resized_payload"))
      .withColumn("resized_len", length(col("resized_payload")).cast("long"))
      .withColumn("resized_md5", md5(col("resized_payload")))
  }

  /** STUB DECODE — deterministic fake featurizer: 8 pseudo-features derived
    * from md5 nibbles of the payload. Replace with a real codec via
    * mapPartitions when libs are available; schema and batch shape are what
    * a real decoder would produce. */
  def fakeDecodeFeatures(df: DataFrame, idCol: String, payloadStrCol: String): DataFrame = {
    val h = md5(col(payloadStrCol))
    val feats = (0 until 8).map { i =>
      expr(s"cast(conv(substring(md5($payloadStrCol), ${i * 4 + 1}, 4), 16, 10) as bigint)")
        .as(s"f$i")
    }
    df.select(col(idCol) +: h.as("payload_md5") +: feats: _*)
  }
}
