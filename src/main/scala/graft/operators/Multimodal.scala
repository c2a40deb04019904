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

  // ---- REAL decode: binary PPM (P6) ----------------------------------

  /** Decoded image features: dimensions plus exact per-channel pixel sums —
    * integer outputs so the cross-engine oracle compare is exact. */
  final case class ImageFeatures(
      width: Int, height: Int, nPixels: Long, rSum: Long, gSum: Long, bSum: Long)

  /** REAL binary decoder for P6 (binary) PPM images: parses the magic,
    * whitespace/comment-separated width/height/maxval header, then sums the
    * raw RGB bytes per channel. Returns None for anything malformed (bad
    * magic, truncated pixel data, absurd dims) — decode failures become
    * null feature rows, never task failures. Pure JVM byte parsing, no
    * codec library needed: this is the honest end-to-end proof that opaque
    * BinaryType payloads flow through decode on executors. */
  def decodePpm(bytes: Array[Byte]): Option[ImageFeatures] = {
    if (bytes == null || bytes.length < 9) return None
    var pos = 0
    def isWs(b: Byte): Boolean = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else go = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      new String(bytes, start, pos - start, "US-ASCII")
    }
    if (token() != "P6") return None
    val (w, h, maxval) =
      try (token().toInt, token().toInt, token().toInt)
      catch { case _: NumberFormatException => return None }
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255 || w.toLong * h > Int.MaxValue / 3) return None
    pos += 1 // exactly one whitespace byte separates maxval from pixel data (PPM spec)
    val n = w * h * 3
    if (bytes.length - pos < n) return None
    var r = 0L; var g = 0L; var b = 0L
    var i = pos
    val end = pos + n
    while (i < end) {
      r += bytes(i) & 0xff
      g += bytes(i + 1) & 0xff
      b += bytes(i + 2) & 0xff
      i += 3
    }
    Some(ImageFeatures(w, h, w.toLong * h, r, g, b))
  }

  /** Test/oracle harness: synthesize a P6 payload whose pixel bytes cycle
    * through the text's code points mod 256 — both engines can derive the
    * expected stats from the text, making the REAL decoder oracle-checkable
    * without codec libraries or binary fixtures in the testdata. */
  def encodePpmFromText(text: String, width: Int, height: Int): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val cps = if (text == null) Array.empty[Int] else text.codePoints().toArray
    val n = width * height * 3
    val px = new Array[Byte](n)
    var j = 0
    while (j < n) {
      px(j) = (if (cps.isEmpty) 0 else cps(j % cps.length) & 0xff).toByte
      j += 1
    }
    header ++ px
  }

  /** Attach a synthesized P6 payload column (see [[encodePpmFromText]]). */
  def withPpmPayload(df: DataFrame, idCol: String, textCol: String,
      width: Int, height: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, encodePpmFromText(text, width, height)) }
      .toDF(idCol, "payload")
  }

  /** Decode P6 payloads into per-image features — `mapPartitions` over the
    * binary column (genuine per-row imperative byte parsing, the one place
    * the Dataset API beats expressions). Embarrassingly parallel: no
    * shuffle, payload bytes never leave the executor that scanned them. */
  def ppmFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodePpm(bytes) match {
          case Some(f) =>
            (id, Option(f.width), Option(f.height), Option(f.nPixels),
              Option(f.rSum), Option(f.gSum), Option(f.bSum))
          case None => (id, None: Option[Int], None: Option[Int], None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Long])
        }
      })
      .toDF(idCol, "width", "height", "n_pixels", "r_sum", "g_sum", "b_sum")
  }
}
