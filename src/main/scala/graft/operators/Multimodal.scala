package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BinaryType`
  * payloads with typed metadata, processed by per-chunk ("frame") operators.
  *
  * The container has no image/audio codec libraries, so the format exercised
  * end-to-end is binary PPM (P6) — a real binary image format parsed byte-
  * by-byte on executors ([[decodePpm]]), with REAL nearest-neighbor resize
  * ([[resizePpm]]) and feature extraction ([[decodePpmStats]]) over the
  * decoded pixels. A JPEG/PNG/audio codec drops in by swapping the decode
  * call inside the same `mapPartitions` plumbing.
  *
  * Scale notes: payload columns stay in Parquet as binary; chunking is a
  * generate (explode) — no shuffle; decode/resize/feature extraction is
  * per-row work that scales embarrassingly, and payload bytes never leave
  * the executor that scanned them.
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
  /** Parse the P6 header; returns (width, height, offset-of-pixel-data) only
    * when the full pixel payload is present. None for anything malformed. */
  private def ppmHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
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
    if (bytes.length - pos < w * h * 3) return None
    Some((w, h, pos))
  }

  def decodePpm(bytes: Array[Byte]): Option[ImageFeatures] =
    ppmHeader(bytes).map { case (w, h, pos) =>
      var r = 0L; var g = 0L; var b = 0L
      var i = pos
      val end = pos + w * h * 3
      while (i < end) {
        r += bytes(i) & 0xff
        g += bytes(i + 1) & 0xff
        b += bytes(i + 2) & 0xff
        i += 3
      }
      ImageFeatures(w, h, w.toLong * h, r, g, b)
    }

  /** REAL nearest-neighbor resize over decoded P6 pixels: target pixel
    * (x, y) samples source pixel (⌊x·W/newW⌋, ⌊y·H/newH⌋) — the standard
    * NN mapping, exact integer arithmetic so both engines can replicate it.
    * Returns the resized image's dimensions and per-channel sums; None on
    * any decode failure (malformed header, truncated pixels). */
  def resizePpm(bytes: Array[Byte], newW: Int, newH: Int): Option[ImageFeatures] = {
    if (newW <= 0 || newH <= 0) return None
    ppmHeader(bytes).map { case (w, h, pos) =>
      var r = 0L; var g = 0L; var b = 0L
      var y = 0
      while (y < newH) {
        val sy = (y.toLong * h / newH).toInt
        var x = 0
        while (x < newW) {
          val sx = (x.toLong * w / newW).toInt
          val j = pos + 3 * (sy * w + sx)
          r += bytes(j) & 0xff
          g += bytes(j + 1) & 0xff
          b += bytes(j + 2) & 0xff
          x += 1
        }
        y += 1
      }
      ImageFeatures(newW, newH, newW.toLong * newH, r, g, b)
    }
  }

  /** Perceptual average-hash (aHash) over REAL decoded P6 pixels: NN-sample
    * a `grid`×`grid` thumbnail (same ⌊x·W/grid⌋ mapping as [[resizePpm]]),
    * take each cell's integer brightness r+g+b (0..765), floor-mean over
    * the cells, and set bit `y·grid+x` when the cell is strictly brighter
    * than the mean. All integer arithmetic — the hash is bit-identical
    * across engines, unlike float-mean formulations. A near-duplicate
    * image (re-encode, slight crop, brightness-preserving noise) flips few
    * bits, so Hamming distance on the 64-bit hash is the standard image
    * near-dup key. None on any decode failure. */
  def aHashPpm(bytes: Array[Byte], grid: Int = 8): Option[Long] = {
    require(grid > 0 && grid <= 8, "grid must be 1..8 (bits must fit a Long)")
    ppmHeader(bytes).map { case (w, h, pos) =>
      val cells = grid * grid
      val gray = new Array[Int](cells)
      var sum = 0L
      var y = 0
      while (y < grid) {
        val sy = (y.toLong * h / grid).toInt
        var x = 0
        while (x < grid) {
          val sx = (x.toLong * w / grid).toInt
          val j = pos + 3 * (sy * w + sx)
          val g = (bytes(j) & 0xff) + (bytes(j + 1) & 0xff) + (bytes(j + 2) & 0xff)
          gray(y * grid + x) = g
          sum += g
          x += 1
        }
        y += 1
      }
      val mean = sum / cells // floor — integer-exact on both engines
      var hash = 0L
      var i = 0
      while (i < cells) {
        if (gray(i) > mean) hash |= 1L << i
        i += 1
      }
      hash
    }
  }

  /** [[aHashPpm]] as a DataFrame pass — shuffle-free `mapPartitions` like
    * every decoder here. The 64-bit hash is surfaced as two unsigned
    * 32-bit halves (`ahash_hi`/`ahash_lo`): cross-engine oracles can
    * rebuild bit 63 without BIGINT overflow, and either half doubles as a
    * coarse bucket key. Null payload / failed decode → null halves. */
  def ppmAHash(df: DataFrame, idCol: String, payloadCol: String, grid: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val h = aHashPpm(payload, grid)
        (id, h.map(v => v >>> 32), h.map(v => v & 0xffffffffL))
      })
      .toDF(idCol, "ahash_hi", "ahash_lo")
  }

  /** Fixed-point (Q14) 8-point DCT-II basis, row-major C(u*8+x) =
    * round(16384·cos((2x+1)uπ/16)). Integer so the perceptual hash is
    * bit-exact across engines — the same reason real codecs ship
    * fixed-point DCTs. */
  private val PHashDctQ14: Array[Long] = Array(
    16384L, 16384L, 16384L, 16384L, 16384L, 16384L, 16384L, 16384L,
    16069L, 13623L, 9102L, 3196L, -3196L, -9102L, -13623L, -16069L,
    15137L, 6270L, -6270L, -15137L, -15137L, -6270L, 6270L, 15137L,
    13623L, -3196L, -16069L, -9102L, 9102L, 16069L, 3196L, -13623L,
    11585L, -11585L, -11585L, 11585L, 11585L, -11585L, -11585L, 11585L,
    9102L, -16069L, 3196L, 13623L, -13623L, -3196L, 16069L, -9102L,
    6270L, -15137L, 15137L, -6270L, -6270L, 15137L, -15137L, 6270L,
    3196L, -9102L, 13623L, -16069L, 16069L, -13623L, 9102L, -3196L)

  /** DCT perceptual hash (pHash): NN-sample an 8×8 gray grid (same grid
    * convention as [[aHashPpm]]), run an integer 2-D DCT-II, and set bit
    * j−1 iff AC coefficient j exceeds the median of the 63 ACs (strict,
    * median = 32nd-smallest — integer-exact on every engine). Unlike
    * aHash's brightness-mean bits, pHash keys on the spectrum's SHAPE: a
    * constant brightness shift moves only the DC term, so re-encodes and
    * exposure tweaks that flip aHash leave pHash fixed — the standard
    * second signal an image near-dup pipeline runs beside aHash. Returns
    * (hi, lo): bits 32..62 and 0..31 of the 63-bit hash. */
  def pHashPpm(bytes: Array[Byte]): Option[(Long, Long)] = {
    ppmHeader(bytes).map { case (w, h, pos) =>
      val gray = new Array[Long](64)
      var y = 0
      while (y < 8) {
        val sy = (y.toLong * h / 8).toInt
        var x = 0
        while (x < 8) {
          val sx = (x.toLong * w / 8).toInt
          val j = pos + 3 * (sy * w + sx)
          gray(y * 8 + x) =
            (bytes(j) & 0xff) + (bytes(j + 1) & 0xff) + (bytes(j + 2) & 0xff)
          x += 1
        }
        y += 1
      }
      // F(u,v) = Σ_y Σ_x C(u,y)·C(v,x)·g(y,x); |F| ≤ 765·2^28·64 < 2^63
      val f = new Array[Long](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var acc = 0L
          var yy = 0
          while (yy < 8) {
            val cu = PHashDctQ14(u * 8 + yy)
            var xx = 0
            while (xx < 8) {
              acc += cu * PHashDctQ14(v * 8 + xx) * gray(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          f(u * 8 + v) = acc
          v += 1
        }
        u += 1
      }
      val ac = java.util.Arrays.copyOfRange(f, 1, 64)
      java.util.Arrays.sort(ac)
      val med = ac(31)
      var hi = 0L; var lo = 0L
      var j = 1
      while (j < 64) {
        if (f(j) > med) {
          if (j <= 32) lo |= 1L << (j - 1) else hi |= 1L << (j - 33)
        }
        j += 1
      }
      (hi, lo)
    }
  }

  /** [[pHashPpm]] as a DataFrame pass — shuffle-free `mapPartitions`;
    * malformed payloads become null halves, never task failures. */
  def ppmPHash(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val h = pHashPpm(payload)
        (id, h.map(_._1), h.map(_._2))
      })
      .toDF(idCol, "phash_hi", "phash_lo")
  }

  /** Image near-dup candidate pairs by BANDED Hamming distance on aHash:
    * split the 64-bit hash into four 16-bit bands; any pair within Hamming
    * distance 3 of each other must agree on at least one whole band
    * (pigeonhole: 3 flipped bits can dirty at most 3 of 4 bands), so a
    * group-by per band generates a complete candidate set, and an exact
    * `bit_count(xor)` verifies. The same band→bucket→verify plan as
    * MinHash-LSH: linear shuffle on (band, value) keys, `maxBucket` caps
    * any degenerate bucket (e.g. the all-zero hash of blank images), no
    * all-pairs join anywhere. */
  def ahashNearDupPairs(
      hashes: DataFrame,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 64
  ): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3, "banded scheme covers Hamming 0..3")
    require(maxBucket >= 2, "maxBucket must be at least 2")
    val withHash = hashes
      .filter(col("ahash_hi").isNotNull && col("ahash_lo").isNotNull)
      // bitwise rebuild — a multiply-add would ANSI-overflow for hashes
      // with bit 63 set (hi >= 2^31)
      .withColumn("__ah", expr("shiftleft(ahash_hi, 32) | ahash_lo"))
    val bands = withHash.select(col(idCol).as("__id"), col("__ah"),
      explode(expr(
        "transform(sequence(0, 3), b -> named_struct('band', b, 'v', (__ah >> (b * 16)) & 65535))"))
        .as("g"))
      .select(col("__id"), col("__ah"), col("g.band"), col("g.v"))
    val capped = bands
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("v")).orderBy(col("__id"))))
      .filter(col("__rn") <= maxBucket)
    val a = capped.select(col("band"), col("v"), col("__id").as("id_a"), col("__ah").as("__ha"))
    val b = capped.select(col("band"), col("v"), col("__id").as("id_b"), col("__ah").as("__hb"))
    a.join(b, Seq("band", "v"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", expr("cast(bit_count(__ha ^ __hb) as int)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .distinct()
  }

  /** Extended per-image stats from a REAL decode pass: dimensions plus
    * per-channel min/max and total brightness — the feature-extraction
    * shape a training-data pipeline computes per image, all integers for
    * exact cross-engine oracle checks. */
  final case class ImageStats(
      width: Int, height: Int, nPixels: Long,
      rMin: Int, rMax: Int, gMin: Int, gMax: Int, bMin: Int, bMax: Int,
      brightSum: Long)

  def decodePpmStats(bytes: Array[Byte]): Option[ImageStats] =
    ppmHeader(bytes).map { case (w, h, pos) =>
      var rMin = 255; var rMax = 0; var gMin = 255; var gMax = 0
      var bMin = 255; var bMax = 0; var bright = 0L
      var i = pos
      val end = pos + w * h * 3
      while (i < end) {
        val r = bytes(i) & 0xff; val g = bytes(i + 1) & 0xff; val b = bytes(i + 2) & 0xff
        if (r < rMin) rMin = r; if (r > rMax) rMax = r
        if (g < gMin) gMin = g; if (g > gMax) gMax = g
        if (b < bMin) bMin = b; if (b > bMax) bMax = b
        bright += r + g + b
        i += 3
      }
      ImageStats(w, h, w.toLong * h, rMin, rMax, gMin, gMax, bMin, bMax, bright)
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

  /** Nearest-neighbor resize of P6 payloads to `newW`×`newH`, emitting the
    * resized image's typed metadata (dims + exact channel sums). Same
    * shuffle-free `mapPartitions` shape as [[ppmFeatures]]; malformed
    * payloads become null feature rows. */
  def ppmResize(df: DataFrame, idCol: String, payloadCol: String,
      newW: Int, newH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        resizePpm(bytes, newW, newH) match {
          case Some(f) =>
            (id, Option(f.width), Option(f.height), Option(f.nPixels),
              Option(f.rSum), Option(f.gSum), Option(f.bSum))
          case None => (id, None: Option[Int], None: Option[Int], None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Long])
        }
      })
      .toDF(idCol, "new_w", "new_h", "n_pixels", "r_sum", "g_sum", "b_sum")
  }

  /** Per-image feature extraction over REAL decoded pixels: channel
    * min/max + total brightness (see [[decodePpmStats]]). */
  def ppmStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodePpmStats(bytes) match {
          case Some(s) =>
            (id, Option(s.width), Option(s.height), Option(s.nPixels),
              Option(s.rMin), Option(s.rMax), Option(s.gMin), Option(s.gMax),
              Option(s.bMin), Option(s.bMax), Option(s.brightSum))
          case None =>
            (id, None: Option[Int], None: Option[Int], None: Option[Long],
              None: Option[Int], None: Option[Int], None: Option[Int], None: Option[Int],
              None: Option[Int], None: Option[Int], None: Option[Long])
        }
      })
      .toDF(idCol, "width", "height", "n_pixels",
        "r_min", "r_max", "g_min", "g_max", "b_min", "b_max", "bright_sum")
  }

  /** ViT-style patch grid over REAL decoded P6 pixels: the image divides
    * into `patch`×`patch` tiles and each emits its integer luma sum
    * (Σ r+g+b) — the reduction a patch-embedding front-end computes before
    * any projection sees the tile. Images whose dimensions don't divide by
    * `patch` (and malformed payloads) emit no rows — the same drop-don't-
    * crash contract as the other decoders, row-granular here because the
    * output is per-tile. Shuffle-free flatMap; state is one Long per tile. */
  def ppmPatchGrid(df: DataFrame, idCol: String, payloadCol: String,
      patch: Int): DataFrame = {
    require(patch > 0, "patch must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ppmHeader(bytes) match {
          case Some((w, h, pos))
              if w % patch == 0 && h % patch == 0 &&
                pos + 3L * w * h <= bytes.length =>
            for {
              pr <- 0 until h / patch
              pc <- 0 until w / patch
            } yield {
              var sum = 0L
              var dy = 0
              while (dy < patch) {
                var dx = 0
                while (dx < patch) {
                  val i = pos + 3 * ((pr * patch + dy) * w + pc * patch + dx)
                  sum += (bytes(i) & 0xff) + (bytes(i + 1) & 0xff) + (bytes(i + 2) & 0xff)
                  dx += 1
                }
                dy += 1
              }
              (id, pr, pc, sum)
            }
          case _ => Seq.empty
        }
      })
      .toDF(idCol, "patch_row", "patch_col", "luma_sum")
  }

  /** Integer area-average downscale of a P6 payload by `factor`: target
    * pixel = truncating mean of its factor×factor source block, per
    * channel — and the output is a REAL P6 payload again, so the resized
    * image round-trips through every decoder/feature operator here (the
    * mandate's resize step, not just patch-sum features: [[ppmPatchGrid]]
    * measures, [[resizePpm]] nearest-neighbor-samples straight to
    * features, this PRODUCES the resized image). Dimensions not
    * divisible by the factor, or a truncated payload, yield None — no
    * partial-edge invention, the caller sees the drop. */
  def ppmResize(bytes: Array[Byte], factor: Int): Option[Array[Byte]] = {
    if (factor <= 0) return None
    ppmHeader(bytes) match {
      case Some((w, h, pos))
          if w > 0 && h > 0 && w % factor == 0 && h % factor == 0 &&
            pos + 3L * w * h <= bytes.length =>
        val tw = w / factor; val th = h / factor
        val head = s"P6\n$tw $th\n255\n".getBytes("US-ASCII")
        val out = new Array[Byte](head.length + 3 * tw * th)
        System.arraycopy(head, 0, out, 0, head.length)
        val area = factor * factor
        var ty = 0
        while (ty < th) {
          var tx = 0
          while (tx < tw) {
            var c = 0
            while (c < 3) {
              var sum = 0
              var dy = 0
              while (dy < factor) {
                var dx = 0
                while (dx < factor) {
                  sum += bytes(pos + 3 * ((ty * factor + dy) * w + tx * factor + dx) + c) & 0xff
                  dx += 1
                }
                dy += 1
              }
              out(head.length + 3 * (ty * tw + tx) + c) = (sum / area).toByte
              c += 1
            }
            tx += 1
          }
          ty += 1
        }
        Some(out)
      case _ => None
    }
  }

  /** Map a payload column through [[ppmResize]]; unresizable payloads
    * become null payloads (downstream feature operators null them out —
    * the same lineage-visible drop every decoder uses). */
  def withResizedPpm(df: DataFrame, idCol: String, payloadCol: String,
      factor: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) => (id, ppmResize(bytes, factor).orNull) }
      .toDF(idCol, "payload")
  }

  // ---- audio: RIFF/WAVE PCM16 ------------------------------------------

  final case class AudioFeatures(
      sampleRate: Int, nSamples: Long, sMin: Int, sMax: Int, absSum: Long)

  /** Parse a RIFF/WAVE container and extract PCM16-mono sample features —
    * a REAL chunk-walking parser (magic check, fmt/data chunk scan with
    * RIFF's odd-size padding rule), the audio twin of [[decodePpm]].
    * Returns None for anything malformed: wrong magic, truncated chunks,
    * compressed or multi-channel or non-16-bit formats, data overrun. */
  def decodeWav(bytes: Array[Byte]): Option[AudioFeatures] = {
    def ascii4(p: Int): String =
      if (p + 4 > bytes.length) "" else new String(bytes, p, 4, "US-ASCII")
    def leU32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    def leU16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    // null payloads are "malformed" too — same null-row contract as decodePpm
    if (bytes == null || bytes.length < 12 || ascii4(0) != "RIFF" || ascii4(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (audioFormat, channels, rate, bits)
    var data: Option[(Int, Int)] = None          // (offset, size)
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = ascii4(pos)
      val size = leU32(pos + 4)
      if (size > Int.MaxValue || pos + 8 + size > bytes.length) return None
      val body = pos + 8
      id match {
        case "fmt " =>
          if (size < 16) return None
          fmt = Some((leU16(body), leU16(body + 2), leU32(body + 4).toInt, leU16(body + 14)))
        case "data" => data = Some((body, size.toInt))
        case _ => () // skip unknown chunks (LIST, cue, ...) — real files have them
      }
      pos = body + size.toInt + (size.toInt & 1) // RIFF pads chunks to even size
    }
    for {
      (audioFormat, channels, rate, bits) <- fmt
      (off, sz) <- data
      if audioFormat == 1 && channels == 1 && bits == 16 && sz % 2 == 0
    } yield {
      var i = off; val end = off + sz
      var mn = Int.MaxValue; var mx = Int.MinValue; var abs = 0L
      while (i < end) {
        val s = ((bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)).toShort.toInt
        if (s < mn) mn = s
        if (s > mx) mx = s
        abs += math.abs(s.toLong)
        i += 2
      }
      val n = sz / 2
      if (n == 0) AudioFeatures(rate, 0L, 0, 0, 0L)
      else AudioFeatures(rate, n.toLong, mn, mx, abs)
    }
  }

  /** Synthesize a deterministic PCM16-mono WAV payload from text: sample j
    * is `((cp_j·131 + 7j) mod 2^16) − 2^15` over cycled code points — full
    * 16-bit range, reproducible in any engine from the text alone (the
    * audio twin of [[encodePpmFromText]]). */
  def encodeWavFromText(text: String, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val cps = if (text == null) Array.empty[Int] else text.codePoints().toArray
    val dataSize = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var j = 0
    while (j < nSamples) {
      val cp = if (cps.isEmpty) 0 else cps(j % cps.length) % 256
      out.putShort((((cp * 131 + 7 * j) % 65536) - 32768).toShort)
      j += 1
    }
    out.array()
  }

  /** Attach a synthesized WAV payload column (see [[encodeWavFromText]]). */
  def withWavPayload(df: DataFrame, idCol: String, textCol: String,
      nSamples: Int, sampleRate: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, encodeWavFromText(text, nSamples, sampleRate)) }
      .toDF(idCol, "payload")
  }

  /** Decode WAV payloads into per-clip features — same shuffle-free
    * `mapPartitions` shape as [[ppmFeatures]]; malformed payloads become
    * null feature rows. */
  def wavFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWav(bytes) match {
          case Some(f) =>
            (id, Option(f.sampleRate), Option(f.nSamples),
              Option(f.sMin), Option(f.sMax), Option(f.absSum))
          case None => (id, None: Option[Int], None: Option[Long],
            None: Option[Int], None: Option[Int], None: Option[Long])
        }
      })
      .toDF(idCol, "sample_rate", "n_samples", "s_min", "s_max", "abs_sum")
  }

  /** Signal-level audio features over the same REAL RIFF/WAVE parse:
    * zero-crossing count (pairwise `prev·s < 0` between CONSECUTIVE
    * samples, so an exact-zero sample crosses nothing itself but does
    * become the new `prev` — [5, 0, -5] counts zero crossings) and total
    * energy Σs² — the two
    * integer-exact features a speech/music/noise triage computes before
    * any model sees the audio. 16-bit samples keep Σs² under 2^31·n, so a
    * Long holds clips of any realistic length. Same malformed→null
    * contract and shuffle-free `mapPartitions` shape as [[wavFeatures]]. */
  def wavSignalFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWav(bytes) match {
          case Some(f) =>
            // re-walk the verified payload for the signal pass (decodeWav
            // established well-formedness; offsets are re-derived cheaply)
            val sig = wavSignal(bytes)
            (id, Option(f.sampleRate), Option(f.nSamples),
              Option(sig._1), Option(sig._2))
          case None =>
            (id, None: Option[Int], None: Option[Long],
              None: Option[Long], None: Option[Long])
        }
      })
      .toDF(idCol, "sample_rate", "n_samples", "zero_crossings", "energy_sum")
  }

  /** (zeroCrossings, energySum) over a payload [[decodeWav]] accepted. */
  private def wavSignal(bytes: Array[Byte]): (Long, Long) = {
    def ascii4(p: Int): String = new String(bytes, p, 4, "US-ASCII")
    def leU32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    var pos = 12
    var off = -1; var sz = 0
    while (off < 0 && pos + 8 <= bytes.length) {
      val size = leU32(pos + 4).toInt
      if (ascii4(pos) == "data") { off = pos + 8; sz = size }
      pos = pos + 8 + size + (size & 1)
    }
    var i = off; val end = off + sz
    var prev = 0; var zc = 0L; var energy = 0L; var first = true
    while (i < end) {
      val s = ((bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)).toShort.toInt
      if (!first && prev * s < 0) zc += 1
      energy += s.toLong * s
      prev = s; first = false
      i += 2
    }
    (zc, energy)
  }

  /** int16 sample array of a payload [[decodeWav]] accepted — the same
    * data-chunk walk as [[wavSignal]], materialized for multi-pass DSP. */
  private def wavSamples(bytes: Array[Byte]): Array[Int] = {
    def ascii4(p: Int): String = new String(bytes, p, 4, "US-ASCII")
    def leU32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    var pos = 12
    var off = -1; var sz = 0
    while (off < 0 && pos + 8 <= bytes.length) {
      val size = leU32(pos + 4).toInt
      if (ascii4(pos) == "data") { off = pos + 8; sz = size }
      pos = pos + 8 + size + (size & 1)
    }
    val out = new Array[Int](sz / 2)
    var i = 0
    while (i < out.length) {
      val p = off + 2 * i
      out(i) = ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)).toShort.toInt
      i += 1
    }
    out
  }

  /** Autocorrelation pitch probe over the REAL RIFF/WAVE parse — the
    * classic time-domain pitch detector: R(k) = Σ sᵢ·sᵢ₊ₖ over int16
    * samples is an EXACT 64-bit integer, so the best lag and the
    * R(best)/R(0) periodicity ratio (×10^6, truncating div — identical in
    * both engines) gate bit-identically cross-engine. No FFT, no floats,
    * no windowing functions. Lags scan [minLag, maxLag] (the caller maps
    * their pitch band to a lag band via the sample rate); ties break
    * toward the SMALLEST lag (the fundamental, not its multiples, wins a
    * draw). Malformed payloads drop — the decoder family's None contract.
    *
    * Scale shape: shuffle-free mapPartitions over the payload column,
    * O((maxLag−minLag)·n) integer MACs per asset — embarrassingly
    * parallel like every decoder here. */
  def wavAutocorr(df: DataFrame, idCol: String, payloadCol: String,
      minLag: Int = 20, maxLag: Int = 100): DataFrame = {
    require(0 < minLag && minLag <= maxLag, "need 0 < minLag <= maxLag")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWav(bytes).map { _ =>
          val s = wavSamples(bytes)
          var r0 = 0L
          s.foreach(x => r0 += x.toLong * x)
          var bestK = minLag; var bestR = Long.MinValue
          var k = minLag
          while (k <= maxLag) {
            var i = 0; var r = 0L
            while (i + k < s.length) { r += s(i).toLong * s(i + k); i += 1 }
            if (r > bestR) { bestR = r; bestK = k } // strict >: earliest lag wins ties
            k += 1
          }
          (id, s.length.toLong, r0, bestK.toLong, bestR,
            if (r0 > 0) bestR * 1000000L / r0 else 0L)
        }
      })
      .toDF(idCol, "n_samples", "r0", "best_lag", "r_best", "periodicity_x1m")
  }

  /** Silence-run segmentation over the REAL RIFF/WAVE parse: longest
    * consecutive run of samples with |s| < `threshold`, the count of
    * maximal quiet runs, and total quiet samples — the features a
    * voice-activity / silence-trim gate computes to decide whether a clip
    * is worth transcribing (or should be split at its pauses). Same
    * malformed→null contract and shuffle-free `mapPartitions` shape as
    * [[wavFeatures]]; state is three counters per clip, never a
    * materialized sample list in the plan. */
  def wavSilenceRuns(df: DataFrame, idCol: String, payloadCol: String,
      threshold: Int): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWav(bytes) match {
          case Some(_) =>
            val s = wavSamples(bytes)
            var longest = 0L; var runs = 0L; var quiet = 0L; var cur = 0L
            var i = 0
            while (i < s.length) {
              if (math.abs(s(i)) < threshold) {
                if (cur == 0L) runs += 1
                cur += 1; quiet += 1
                if (cur > longest) longest = cur
              } else cur = 0L
              i += 1
            }
            (id, Option(longest), Option(runs), Option(quiet))
          case None =>
            (id, None: Option[Long], None: Option[Long], None: Option[Long])
        }
      })
      .toDF(idCol, "longest_quiet_run", "n_quiet_runs", "quiet_samples")
  }

  /** Laplacian focus score over REAL decoded P6 pixels — the blur gate an
    * image-curation pipeline runs before spending feature-extraction
    * compute on an asset: per interior pixel, the 4-neighbor Laplacian of
    * integer luma (r+g+b, 0..765) accumulated as |4L − left − right − up
    * − down|. Sharp edges score high, defocus/smooth gradients low — the
    * classic variance-of-Laplacian heuristic reduced to integer absolute
    * sums so both engines agree bit-for-bit. Output: lap_sum and the
    * per-interior-pixel mean ×100. None (row dropped) on decode failure;
    * images with no interior (w or h < 3) score 0. */
  def ppmSharpness(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        ppmHeader(bytes).flatMap { case (w, h, pos) =>
          if (w <= 0 || h <= 0 || bytes.length < pos + 3L * w * h) None
          else {
            val lum = new Array[Int](w * h)
            var i = 0
            while (i < w * h) {
              val p = pos + 3 * i
              lum(i) = (bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)
              i += 1
            }
            var lap = 0L
            var y = 1
            while (y < h - 1) {
              var x = 1
              while (x < w - 1) {
                val c = y * w + x
                lap += math.abs(
                  4L * lum(c) - lum(c - 1) - lum(c + 1) - lum(c - w) - lum(c + w))
                x += 1
              }
              y += 1
            }
            val interior = math.max(w - 2, 0).toLong * math.max(h - 2, 0)
            Some((id, w, h, lap, if (interior > 0) lap * 100 / interior else 0L))
          }
        }
      })
      .toDF(idCol, "width", "height", "lap_sum", "lap_mean_x100")
  }

  /** Magic-byte MIME sniffing over opaque binary payloads — the dispatch
    * step in front of the per-format decoders: a mixed-media corpus routes
    * each asset to [[decodePng]]/[[decodeBmp]]/[[decodeWav]]/[[decodePpm]]
    * by CONTENT, never by (lying) file extensions. Pure codegen'd
    * expression on hex prefixes: no UDF, no decode, fused into the scan.
    * Unrecognized/short/null payloads → 'application/octet-stream'. */
  def sniffMime(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h8 = hex(substring(payload, 1, 8))
    when(payload.isNull, lit("application/octet-stream"))
      .when(h8 === "89504E470D0A1A0A", lit("image/png"))
      .when(hex(substring(payload, 1, 3)) === "FFD8FF", lit("image/jpeg"))
      .when(hex(substring(payload, 1, 6)).isin("474946383761", "474946383961"),
        lit("image/gif")) // GIF87a / GIF89a
      .when(hex(substring(payload, 1, 2)) === "424D", lit("image/bmp"))
      .when(hex(substring(payload, 1, 4)) === "52494646" &&
        hex(substring(payload, 9, 4)) === "57415645", lit("audio/wav"))
      // P6 + whitespace: the PPM rasters this library decodes
      .when(hex(substring(payload, 1, 3)).isin("50360A", "50360D", "503609", "503620"),
        lit("image/x-portable-pixmap"))
      .otherwise(lit("application/octet-stream"))
  }

  // ---- images: BMP (real-world format) ---------------------------------

  /** Decoded BMP features: channel sums plus the TOP row's brightness —
    * the orientation probe: BMP stores rows bottom-up, so a decoder that
    * forgets to flip reports the wrong top row. */
  final case class BmpStats(
      width: Int, height: Int, nPixels: Long,
      rSum: Long, gSum: Long, bSum: Long, topRowBright: Long)

  /** REAL decoder for the classic uncompressed 24-bit BMP: 'BM' file
    * header, BITMAPINFOHEADER (40+ bytes honored via its own size field),
    * bottom-up row order, BGR channel order, rows padded to 4-byte
    * boundaries — every quirk a real .bmp from a Windows tool carries.
    * Returns None for anything else (top-down/negative height, palettes,
    * 16/32-bit, RLE compression, truncated pixel data): malformed →
    * null feature rows, never task failures. */
  def decodeBmp(bytes: Array[Byte]): Option[BmpStats] = {
    if (bytes == null || bytes.length < 54) return None
    def leU16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def leU32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    def leI32(p: Int): Int = leU32(p).toInt
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = leU32(10)
    val headerSize = leU32(14)
    val w = leI32(18); val h = leI32(22)
    val planes = leU16(26); val bitCount = leU16(28); val compression = leU32(30)
    if (headerSize < 40 || planes != 1 || bitCount != 24 || compression != 0) return None
    if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue / 3) return None
    // all size arithmetic in Long BEFORE narrowing: w=715827882 passes the
    // area guard with h=1 but overflows (w*3+3) in Int
    val rowSizeL = ((w.toLong * 3 + 3) / 4) * 4 // rows pad to 4-byte boundaries
    if (dataOffset < 54 || dataOffset + rowSizeL * h > bytes.length) return None
    val rowSize = rowSizeL.toInt
    val base = dataOffset.toInt
    var rSum = 0L; var gSum = 0L; var bSum = 0L; var top = 0L
    var row = 0
    while (row < h) {
      // stored row `row` is image row (h-1-row): bottom-up
      val p0 = base + row * rowSize
      val isTop = row == h - 1
      var x = 0
      while (x < w) {
        val p = p0 + 3 * x
        val b = bytes(p) & 0xff; val g = bytes(p + 1) & 0xff; val r = bytes(p + 2) & 0xff
        bSum += b; gSum += g; rSum += r
        if (isTop) top += r + g + b
        x += 1
      }
      row += 1
    }
    Some(BmpStats(w, h, w.toLong * h, rSum, gSum, bSum, top))
  }

  /** Synthesize a deterministic 24-bit BMP from text: the 3·w·h pixel
    * bytes (STORED order — bottom-up rows, BGR) cycle through the text's
    * code points mod 256, padding bytes zero — the BMP twin of
    * [[encodePpmFromText]], so both engines derive expected features from
    * the text alone. */
  def encodeBmpFromText(text: String, width: Int, height: Int): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
      .putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val cps = if (text == null) Array.empty[Int] else text.codePoints().toArray
    var k = 0 // index over PIXEL bytes only — padding stays zero
    var row = 0
    while (row < height) {
      var x = 0
      while (x < width * 3) {
        out.put(54 + row * rowSize + x,
          (if (cps.isEmpty) 0 else cps(k % cps.length) & 0xff).toByte)
        k += 1
        x += 1
      }
      row += 1
    }
    out.array()
  }

  /** Attach a synthesized BMP payload column (see [[encodeBmpFromText]]). */
  def withBmpPayload(df: DataFrame, idCol: String, textCol: String,
      width: Int, height: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, encodeBmpFromText(text, width, height)) }
      .toDF(idCol, "payload")
  }

  /** Decode BMP payloads into per-image features — shuffle-free
    * `mapPartitions` like every decoder here; malformed → null rows. */
  def bmpStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeBmp(bytes) match {
          case Some(s) =>
            (id, Option(s.width), Option(s.height), Option(s.nPixels),
              Option(s.rSum), Option(s.gSum), Option(s.bSum), Option(s.topRowBright))
          case None =>
            (id, None: Option[Int], None: Option[Int], None: Option[Long],
              None: Option[Long], None: Option[Long], None: Option[Long], None: Option[Long])
        }
      })
      .toDF(idCol, "width", "height", "n_pixels", "r_sum", "g_sum", "b_sum", "top_row_bright")
  }

  // ---- images: PNG (real-world format) ---------------------------------

  final case class PngStats(
      width: Int, height: Int, nPixels: Long, channels: Int,
      rMin: Int, rMax: Int, gMin: Int, gMax: Int, bMin: Int, bMax: Int,
      brightSum: Long, aSum: Long)

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** REAL PNG decode from pure public knowledge (the PNG spec): signature,
    * CRC-verified chunk walk (IHDR / IDAT / IEND, ancillary chunks
    * skipped), zlib inflate of the concatenated IDAT stream
    * (`java.util.zip.Inflater`), and per-scanline defiltering of all five
    * filter types (None / Sub / Up / Average / Paeth). Accepts 8-bit
    * truecolor (color type 2, RGB) and truecolor+alpha (6, RGBA),
    * non-interlaced — the shapes real training corpora overwhelmingly
    * carry. Everything else (palette, 16-bit, Adam7, bad CRC, truncated or
    * oversized IDAT, missing IHDR/IEND) returns None: the same
    * malformed→null-row contract as [[decodePpm]]/[[decodeWav]]. */
  def decodePng(bytes: Array[Byte]): Option[PngStats] = {
    if (bytes == null || bytes.length < 8) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSignature(i)) return None; i += 1 }
    def beU32(p: Int): Long =
      ((bytes(p) & 0xff).toLong << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
    var pos = 8
    var w = 0; var h = 0; var channels = 0
    var sawHdr = false; var sawEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawEnd) {
      if (pos + 8 > bytes.length) return None
      val len = beU32(pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length) return None
      val n = len.toInt
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + n)
      if (crc.getValue != beU32(pos + 8 + n)) return None
      ctype match {
        case "IHDR" =>
          if (n != 13 || sawHdr) return None
          w = beU32(pos + 8).toInt; h = beU32(pos + 12).toInt
          val bitDepth = bytes(pos + 16) & 0xff
          val colorType = bytes(pos + 17) & 0xff
          val compression = bytes(pos + 18) & 0xff
          val filterMethod = bytes(pos + 19) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          if (w <= 0 || h <= 0 || bitDepth != 8 || compression != 0 ||
            filterMethod != 0 || interlace != 0) return None
          channels = colorType match {
            case 2 => 3
            case 6 => 4
            case _ => return None
          }
          // executor-memory guard: a forged header must not allocate
          // beyond what the payload could plausibly inflate to
          if (w.toLong * h * channels > 64L * 1024 * 1024) return None
          sawHdr = true
        case "IDAT" =>
          if (!sawHdr) return None
          idat.write(bytes, pos + 8, n)
        case "IEND" =>
          if (n != 0) return None
          sawEnd = true
        case _ => () // ancillary chunk (tEXt, pHYs, gAMA, ...) — skip
      }
      pos += 12 + n
    }
    if (!sawHdr) return None
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val k = try inf.inflate(raw, off, raw.length - off)
        catch { case _: java.util.zip.DataFormatException => return None }
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += k
      }
      if (off != raw.length) return None
      // a stream that inflates to MORE than the expected scanlines is
      // malformed too (defends against trailing garbage)
      val over = try { !inf.finished() && inf.inflate(new Array[Byte](1)) > 0 }
      catch { case _: java.util.zip.DataFormatException => true }
      if (over) return None
    } finally inf.end()
    // defilter in place, row by row; prior row is already reconstructed
    var y = 0
    while (y < h) {
      val rowStart = y * (stride + 1)
      val filter = raw(rowStart) & 0xff
      if (filter > 4) return None
      var x = 0
      while (x < stride) {
        val p = rowStart + 1 + x
        val a = if (x >= channels) raw(p - channels) & 0xff else 0
        val b = if (y > 0) raw(p - stride - 1) & 0xff else 0
        val c = if (y > 0 && x >= channels) raw(p - stride - 1 - channels) & 0xff else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => // Paeth (filter == 4; > 4 already rejected)
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(p) = ((raw(p) & 0xff) + pred).toByte
        x += 1
      }
      y += 1
    }
    // feature pass over reconstructed pixels
    var rMin = 255; var rMax = 0; var gMin = 255; var gMax = 0
    var bMin = 255; var bMax = 0; var bright = 0L; var aSum = 0L
    y = 0
    while (y < h) {
      var p = y * (stride + 1) + 1
      val end = p + stride
      while (p < end) {
        val r = raw(p) & 0xff; val g = raw(p + 1) & 0xff; val b = raw(p + 2) & 0xff
        if (r < rMin) rMin = r; if (r > rMax) rMax = r
        if (g < gMin) gMin = g; if (g > gMax) gMax = g
        if (b < bMin) bMin = b; if (b > bMax) bMax = b
        bright += r + g + b
        if (channels == 4) aSum += raw(p + 3) & 0xff
        p += channels
      }
      y += 1
    }
    Some(PngStats(w, h, w.toLong * h, channels,
      rMin, rMax, gMin, gMax, bMin, bMax, bright, aSum))
  }

  /** Synthesize a REAL (spec-valid) PNG payload whose raw pixel bytes cycle
    * the text's code points mod 256 — the [[encodePpmFromText]] scheme, so
    * both engines derive expected stats from the text alone — while the
    * container exercises the full decode path: scanline `y` is filtered
    * with type `y % 5` (all five PNG filters), the stream is zlib-deflated,
    * and chunks carry real CRCs. */
  def encodePngFromText(text: String, width: Int, height: Int, channels: Int): Array[Byte] = {
    require(channels == 3 || channels == 4, "PNG truecolor is 3 or 4 channels")
    val cps = if (text == null) Array.empty[Int] else text.codePoints().toArray
    val stride = width * channels
    def px(j: Int): Int = if (cps.isEmpty) 0 else cps(j % cps.length) & 0xff
    // raw scanlines with the per-row filter applied (encoder side of the
    // exact defilter algebra: filt = raw - pred mod 256)
    val filtered = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val rowStart = y * (stride + 1)
      val filter = y % 5
      filtered(rowStart) = filter.toByte
      var x = 0
      while (x < stride) {
        val raw = px(y * stride + x)
        val a = if (x >= channels) px(y * stride + x - channels) else 0
        val b = if (y > 0) px((y - 1) * stride + x) else 0
        val c = if (y > 0 && x >= channels) px((y - 1) * stride + x - channels) else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => // Paeth (y % 5 == 4)
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        filtered(rowStart + 1 + x) = (raw - pred).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSignature, 0, 8)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte), 0, 4)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, len)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val v = crc.getValue
      out.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put((if (channels == 3) 2 else 6).toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Attach a synthesized PNG payload column (see [[encodePngFromText]]). */
  def withPngPayload(df: DataFrame, idCol: String, textCol: String,
      width: Int, height: Int, channels: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, encodePngFromText(text, width, height, channels)) }
      .toDF(idCol, "payload")
  }

  /** Decode PNG payloads into per-image stats — same shuffle-free
    * `mapPartitions` shape as [[ppmStats]]; malformed payloads become null
    * feature rows. */
  def pngStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodePng(bytes) match {
          case Some(s) =>
            (id, Option(s.width), Option(s.height), Option(s.nPixels), Option(s.channels),
              Option(s.rMin), Option(s.rMax), Option(s.gMin), Option(s.gMax),
              Option(s.bMin), Option(s.bMax), Option(s.brightSum), Option(s.aSum))
          case None =>
            (id, None: Option[Int], None: Option[Int], None: Option[Long], None: Option[Int],
              None: Option[Int], None: Option[Int], None: Option[Int], None: Option[Int],
              None: Option[Int], None: Option[Int], None: Option[Long], None: Option[Long])
        }
      })
      .toDF(idCol, "width", "height", "n_pixels", "channels",
        "r_min", "r_max", "g_min", "g_max", "b_min", "b_max", "bright_sum", "a_sum")
  }

  // ---- images: GIF (real-world format) ---------------------------------

  /** Decoded-GIF features: dimensions, palette size, and the PPM-family
    * channel stats over palette-resolved RGB. */
  final case class GifStats(
      width: Int, height: Int, nPixels: Long, paletteSize: Int,
      rMin: Int, rMax: Int, gMin: Int, gMax: Int, bMin: Int, bMax: Int,
      brightSum: Long)

  /** REAL GIF decoder from the public GIF87a/89a spec: header + logical
    * screen descriptor, global color table, extension-block skip (sub-block
    * chains walked, never trusted), first image descriptor, and a full LZW
    * decode — variable code width from `minCodeSize+1` up to 12 bits,
    * CLEAR/END codes, dictionary rebuild, the KwKwK self-reference case,
    * and data reassembled from length-prefixed sub-blocks. Local color
    * tables override global; missing color tables, code overruns, and
    * truncated streams return None — the PPM/WAV/PNG/BMP/JPEG
    * malformed→null contract. Interlaced images decode too: interlacing
    * only permutes ROW ORDER, and every feature this decoder reports
    * (dims, palette, channel min/max, brightness) is row-order-invariant,
    * so the sequential decode is exact for both variants. Only the FIRST
    * frame of an animation is decoded (the corpus-stats contract). */
  def decodeGif(bytes: Array[Byte]): Option[GifStats] = {
    if (bytes == null || bytes.length < 13) return None
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    def leU16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    var pos = 6
    val screenPacked = bytes(pos + 4) & 0xff
    pos += 7 // logical screen descriptor
    var palette: Array[Int] = null // packed 0xRRGGBB
    if ((screenPacked & 0x80) != 0) {
      val n = 1 << ((screenPacked & 7) + 1)
      if (pos + 3 * n > bytes.length) return None
      palette = Array.tabulate(n)(i =>
        ((bytes(pos + 3 * i) & 0xff) << 16) | ((bytes(pos + 3 * i + 1) & 0xff) << 8) |
          (bytes(pos + 3 * i + 2) & 0xff))
      pos += 3 * n
    }
    // block walk to the first image descriptor
    while (true) {
      if (pos >= bytes.length) return None
      val b = bytes(pos) & 0xff; pos += 1
      if (b == 0x3b) return None // trailer before any image
      else if (b == 0x21) { // extension: label + sub-block chain
        if (pos >= bytes.length) return None
        pos += 1 // label
        var len = -1
        while (len != 0) {
          if (pos >= bytes.length) return None
          len = bytes(pos) & 0xff; pos += 1 + len
          if (pos > bytes.length) return None
        }
      } else if (b == 0x2c) { // image descriptor
        if (pos + 9 > bytes.length) return None
        val w = leU16(pos + 4); val h = leU16(pos + 6)
        val packed = bytes(pos + 8) & 0xff
        pos += 9
        if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
        // interlace flag (0x40) deliberately ignored: row permutation only
        var pal = palette
        if ((packed & 0x80) != 0) { // local color table overrides
          val n = 1 << ((packed & 7) + 1)
          if (pos + 3 * n > bytes.length) return None
          pal = Array.tabulate(n)(i =>
            ((bytes(pos + 3 * i) & 0xff) << 16) | ((bytes(pos + 3 * i + 1) & 0xff) << 8) |
              (bytes(pos + 3 * i + 2) & 0xff))
          pos += 3 * n
        }
        if (pal == null) return None
        if (pos >= bytes.length) return None
        val minCode = bytes(pos) & 0xff; pos += 1
        if (minCode < 1 || minCode > 11) return None
        // reassemble the LZW stream from sub-blocks
        val data = new java.io.ByteArrayOutputStream()
        var len = -1
        while (len != 0) {
          if (pos >= bytes.length) return None
          len = bytes(pos) & 0xff; pos += 1
          if (pos + len > bytes.length) return None
          data.write(bytes, pos, len); pos += len
        }
        return decodeGifLzw(data.toByteArray, minCode, w, h, pal)
      } else return None // unknown block type: malformed
    }
    None // unreachable
  }

  /** GIF-variant LZW over the reassembled stream: LSB-first bit packing,
    * dictionary entries stored as (prefix code, appended byte) so no
    * per-entry byte arrays are allocated — output is emitted by walking
    * the prefix chain backwards into the index buffer. */
  private def decodeGifLzw(data: Array[Byte], minCode: Int, w: Int, h: Int,
      pal: Array[Int]): Option[GifStats] = {
    val nPix = w * h
    val out = new Array[Byte](nPix)
    var outLen = 0
    val clear = 1 << minCode
    val end = clear + 1
    val maxDict = 4096
    val prefix = new Array[Int](maxDict)
    val append = new Array[Byte](maxDict)
    var dictSize = end + 1
    var width = minCode + 1
    var prev = -1
    var bitPos = 0
    val nBits = data.length * 8
    // emit the string for `code` (root chain) into out; returns first byte
    def emit(code: Int): Int = {
      var c = code; var n = 0
      while (c >= clear) { n += 1; c = prefix(c) } // chain length above root
      val first = c
      if (outLen + n + 1 > nPix) return -1
      var p = outLen + n; c = code
      while (c >= clear) { out(p) = append(c); p -= 1; c = prefix(c) }
      out(p) = c.toByte
      outLen += n + 1
      first
    }
    var done = false
    while (!done) {
      if (bitPos + width > nBits) return None // truncated stream
      var code = 0; var i = 0
      while (i < width) {
        val bp = bitPos + i
        code |= ((data(bp >> 3) >> (bp & 7)) & 1) << i
        i += 1
      }
      bitPos += width
      if (code == clear) {
        dictSize = end + 1; width = minCode + 1; prev = -1
      } else if (code == end) done = true
      else if (code < dictSize && !(code < clear && code >= pal.length)) {
        if (prev >= 0 && dictSize < maxDict) {
          prefix(dictSize) = prev
          append(dictSize) = (if (code < clear) code else {
            // first byte of code's expansion
            var c = code; while (c >= clear) c = prefix(c); c
          }).toByte
          dictSize += 1
        }
        if (emit(code) < 0) return None
        prev = code
        if (dictSize >= (1 << width) && width < 12) width += 1
      } else if (code == dictSize && prev >= 0 && dictSize < maxDict) {
        // KwKwK: the just-about-to-be-defined code
        var c = prev; while (c >= clear) c = prefix(c)
        prefix(dictSize) = prev; append(dictSize) = c.toByte
        dictSize += 1
        if (emit(dictSize - 1) < 0) return None
        prev = dictSize - 1
        if (dictSize >= (1 << width) && width < 12) width += 1
      } else return None // code beyond dictionary: corrupt
      if (outLen == nPix && !done) {
        // image full: accept immediate END (possibly after a CLEAR); else corrupt
        if (bitPos + width <= nBits) {
          var c2 = 0; var j = 0
          while (j < width) {
            val bp = bitPos + j; c2 |= ((data(bp >> 3) >> (bp & 7)) & 1) << j; j += 1
          }
          if (c2 == end || c2 == clear) done = true else return None
        } else return None
      }
    }
    if (outLen != nPix) return None
    var rMin = 255; var rMax = 0; var gMin = 255; var gMax = 0
    var bMin = 255; var bMax = 0; var bright = 0L
    var i = 0
    while (i < nPix) {
      val idx = out(i) & 0xff
      if (idx >= pal.length) return None
      val c = pal(idx)
      val r = (c >> 16) & 0xff; val g = (c >> 8) & 0xff; val b = c & 0xff
      if (r < rMin) rMin = r; if (r > rMax) rMax = r
      if (g < gMin) gMin = g; if (g > gMax) gMax = g
      if (b < bMin) bMin = b; if (b > bMax) bMax = b
      bright += r + g + b
      i += 1
    }
    Some(GifStats(w, h, w.toLong * h, pal.length,
      rMin, rMax, gMin, gMax, bMin, bMax, bright))
  }

  /** Oracle/test harness encoder: a REAL spec-valid GIF89a whose pixels
    * are the text's code points mod 256 over a 256-entry gray palette
    * (entry i = (i,i,i)), so both engines derive the stats from the text
    * alone while the Spark side runs the full LZW decode. The encoder
    * emits literal codes with a CLEAR before each dictionary-width
    * overflow (the classic "uncompressed GIF" technique) — decode still
    * exercises variable width, CLEAR handling, and sub-block reassembly. */
  def encodeGifFromText(text: String, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    val cps = if (text == null) Array.empty[Int] else text.codePoints().toArray
    def px(j: Int): Int = if (cps.isEmpty) 0 else cps(j % cps.length) & 0xff
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(width); u16(height)
    out.write(0x80 | 7) // GCT present, 2^(7+1)=256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 } // gray GCT
    // a 89a comment extension: the decoder must skip sub-block chains
    out.write(0x21); out.write(0xfe); out.write(5)
    out.write("graft".getBytes("US-ASCII")); out.write(0)
    out.write(0x2c); u16(0); u16(0); u16(width); u16(height); out.write(0) // descriptor
    val minCode = 8
    out.write(minCode)
    val clear = 1 << minCode; val end = clear + 1
    // LZW bit stream: literal codes at width 9, CLEAR whenever the
    // decoder's dictionary would force width 10
    val lzw = new java.io.ByteArrayOutputStream()
    var bitBuf = 0; var bitCnt = 0
    def putCode(c: Int): Unit = {
      bitBuf |= c << bitCnt; bitCnt += 9
      while (bitCnt >= 8) { lzw.write(bitBuf & 0xff); bitBuf >>= 8; bitCnt -= 8 }
    }
    putCode(clear)
    var dictSize = end + 1
    var j = 0
    val n = width * height
    while (j < n) {
      if (dictSize >= 511) { putCode(clear); dictSize = end + 1 } // stay at width 9
      putCode(px(j))
      if (j < n - 1) dictSize += 1 // decoder defines an entry per code after the first
      j += 1
    }
    putCode(end)
    if (bitCnt > 0) lzw.write(bitBuf & 0xff)
    val stream = lzw.toByteArray
    var off = 0
    while (off < stream.length) { // length-prefixed sub-blocks, max 255
      val len = math.min(255, stream.length - off)
      out.write(len); out.write(stream, off, len); off += len
    }
    out.write(0) // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Attach a synthesized GIF payload column (see [[encodeGifFromText]]). */
  def withGifPayload(df: DataFrame, idCol: String, textCol: String,
      width: Int, height: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, encodeGifFromText(text, width, height)) }
      .toDF(idCol, "payload")
  }

  /** Decode GIF payloads into per-image stats — same shuffle-free
    * `mapPartitions` shape as [[pngStats]]/[[jpegStats]]. */
  def gifStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeGif(bytes) match {
          case Some(s) =>
            (id, Option(s.width), Option(s.height), Option(s.nPixels), Option(s.paletteSize),
              Option(s.rMin), Option(s.rMax), Option(s.gMin), Option(s.gMax),
              Option(s.bMin), Option(s.bMax), Option(s.brightSum))
          case None =>
            (id, None: Option[Int], None: Option[Int], None: Option[Long], None: Option[Int],
              None: Option[Int], None: Option[Int], None: Option[Int], None: Option[Int],
              None: Option[Int], None: Option[Int], None: Option[Long])
        }
      })
      .toDF(idCol, "width", "height", "n_pixels", "palette_size",
        "r_min", "r_max", "g_min", "g_max", "b_min", "b_max", "bright_sum")
  }

  // ---- images: JPEG (real-world format) --------------------------------

  /** Decoded-JPEG features: dimensions + per-channel min/max + brightness
    * — the [[ImageStats]] frame shape. Grayscale reports its single plane
    * on all three channels (r=g=b=Y), so downstream feature consumers see
    * one schema for the whole mixed corpus. */
  final case class JpegStats(
      width: Int, height: Int, nPixels: Long, nComponents: Int,
      rMin: Int, rMax: Int, gMin: Int, gMax: Int, bMin: Int, bMax: Int,
      brightSum: Long)

  /** One canonical JPEG Huffman table (ITU-T T.81 §C.2/F.2.2.3): codes are
    * assigned in symbol order within ascending code length, so the
    * (counts-per-length, symbols) pair from a DHT segment fully determines
    * them. Decode walks bit-by-bit against per-length max codes — at most
    * 16 steps, no lookup-table memory per task. */
  private final class JpegHuff(counts: Array[Int], symbols: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k; minCode(l) = code
        code += counts(l - 1); k += counts(l - 1)
        maxCode(l) = code - 1 // -1 when counts(l-1)==0: code < minCode fails the test
        if (counts(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    /** Next symbol from the bit stream, or -1 on exhausted/invalid data. */
    def decode(in: JpegBits): Int = {
      var code = 0; var l = 1
      while (l <= 16) {
        val b = in.readBit(); if (b < 0) return -1
        code = (code << 1) | b
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
          return symbols(valPtr(l) + code - minCode(l))
        l += 1
      }
      -1
    }
  }

  /** Entropy-segment bit reader (T.81 §F.2.2.5): MSB-first, `FF 00` byte
    * stuffing unstuffed, any real marker (`FF xx`, xx≠0) ends the segment
    * — readBit returns -1 and leaves `pos` ON the FF so the MCU loop can
    * inspect restart markers. */
  private final class JpegBits(bytes: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def readBit(): Int = {
      if (cnt == 0) {
        if (pos >= bytes.length) return -1
        val b = bytes(pos) & 0xff
        if (b == 0xff) {
          if (pos + 1 >= bytes.length) return -1
          if ((bytes(pos + 1) & 0xff) != 0x00) return -1 // marker: stay on FF
          pos += 2 // stuffed FF data byte
        } else pos += 1
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >>> cnt) & 1
    }
    /** `s`-bit unsigned receive; Int.MinValue on exhausted data. */
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) {
        val b = readBit(); if (b < 0) return Int.MinValue
        v = (v << 1) | b; i += 1
      }
      v
    }
    def byteAlign(): Unit = cnt = 0
  }

  /** T.81 F.2.1.1 sign extension: an s-bit magnitude below 2^(s-1) codes a
    * negative value. */
  private def jpegExtend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Zigzag scan position → natural (row-major) coefficient index. */
  private val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** ct(x)(u) = C(u)/2 · cos((2x+1)uπ/16): the separable half of the 8×8
    * inverse DCT, so f(x,y) = Σ_u Σ_v ct(x)(u)·ct(y)(v)·F(v·8+u). */
  private val JpegIdctCos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** REAL JPEG decoder from pure public knowledge (ITU-T T.81 + JFIF):
    * marker walk (SOI / APPn / COM / DQT / DHT / SOF0 / SOF2 / DRI / SOS),
    * canonical Huffman entropy decode with byte unstuffing and restart
    * markers, dequantization, separable 8×8 inverse DCT, per-component
    * sample-replication upsampling for subsampled chroma (4:2:0 / 4:2:2 /
    * arbitrary h,v ≤ 4), and JFIF YCbCr→RGB. Accepts baseline sequential
    * (SOF0) AND progressive (SOF2) grayscale and 3-component streams — the
    * two shapes web corpora overwhelmingly carry. Baseline decodes its
    * single scan block-by-block; progressive accumulates DCT coefficients
    * across scans (T.81 Annex G: spectral selection Ss..Se, successive
    * approximation Ah/Al with DC bit-refinement and the AC
    * correction-bit algorithm, EOB runs shared across blocks) and runs
    * dequant+IDCT once at EOI. Arithmetic coding, hierarchical, 12-bit
    * precision, and truncated/malformed streams return None: the same
    * malformed→null contract as the PPM/WAV/PNG/BMP family. Returns
    * (width, height, nComponents, RGB interleaved). */
  def decodeJpegPixels(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    val quant = Array.ofDim[Int](4, 64) // zigzag order, as transmitted
    val quantSeen = new Array[Boolean](4)
    val huffDc = new Array[JpegHuff](4)
    val huffAc = new Array[JpegHuff](4)
    var w = 0; var h = 0; var nComp = 0
    // per component: id, h, v, quant-table id (from SOF0)
    var compId: Array[Int] = null; var compH: Array[Int] = null
    var compV: Array[Int] = null; var compQ: Array[Int] = null
    var restartInterval = 0
    // progressive (SOF2) state: per-component coefficient planes filled
    // across scans, reconstructed at EOI
    var progressive = false
    var anyScan = false
    var coefs: Array[Array[Int]] = null
    var blocksW: Array[Int] = null; var blocksH: Array[Int] = null
    var compBW: Array[Int] = null; var compBH: Array[Int] = null
    var mcusX = 0; var mcusY = 0
    var pos = 2
    while (true) {
      // marker: FF (fill FFs allowed) + code
      if (pos + 1 >= bytes.length) return None
      if ((bytes(pos) & 0xff) != 0xff) return None
      while (pos < bytes.length && (bytes(pos) & 0xff) == 0xff) pos += 1
      if (pos >= bytes.length) return None
      val marker = bytes(pos) & 0xff; pos += 1
      marker match {
        case 0xd9 => // EOI: progressive reconstructs here; baseline never arrives
          if (!progressive || !anyScan) return None
          var c = 0
          while (c < nComp) { if (!quantSeen(compQ(c))) return None; c += 1 }
          return reconstructProgressiveJpeg(w, h, nComp, compH, compV, compQ,
            quant, coefs, blocksW, blocksH)
        case m if m >= 0xe0 && m <= 0xef || m == 0xfe => // APPn / COM
          if (pos + 2 > bytes.length) return None
          val len = u16(pos); if (len < 2 || pos + len > bytes.length) return None
          pos += len
        case 0xdb => // DQT: one or more tables in the segment
          if (pos + 2 > bytes.length) return None
          val len = u16(pos); if (len < 2 || pos + len > bytes.length) return None
          val end = pos + len; var p = pos + 2
          while (p < end) {
            val pq = (bytes(p) & 0xff) >> 4; val tq = bytes(p) & 0x0f
            if (tq > 3 || pq > 1) return None
            p += 1
            val step = if (pq == 0) 1 else 2
            if (p + 64 * step > end) return None
            var k = 0
            while (k < 64) {
              quant(tq)(k) = if (pq == 0) bytes(p + k) & 0xff else u16(p + 2 * k)
              k += 1
            }
            quantSeen(tq) = true
            p += 64 * step
          }
          pos = end
        case 0xc4 => // DHT: one or more tables
          if (pos + 2 > bytes.length) return None
          val len = u16(pos); if (len < 2 || pos + len > bytes.length) return None
          val end = pos + len; var p = pos + 2
          while (p < end) {
            val tc = (bytes(p) & 0xff) >> 4; val th = bytes(p) & 0x0f
            if (tc > 1 || th > 3) return None
            p += 1
            if (p + 16 > end) return None
            val counts = Array.tabulate(16)(i => bytes(p + i) & 0xff)
            val total = counts.sum
            if (total > 256 || p + 16 + total > end) return None
            val symbols = Array.tabulate(total)(i => bytes(p + 16 + i) & 0xff)
            val tab = new JpegHuff(counts, symbols)
            if (tc == 0) huffDc(th) = tab else huffAc(th) = tab
            p += 16 + total
          }
          pos = end
        case m if m == 0xc0 || m == 0xc2 => // SOF0 baseline / SOF2 progressive
          if (compId != null) return None // one frame header only
          progressive = m == 0xc2
          if (pos + 2 > bytes.length) return None
          val len = u16(pos); if (len < 8 || pos + len > bytes.length) return None
          if ((bytes(pos + 2) & 0xff) != 8) return None // precision
          h = u16(pos + 3); w = u16(pos + 5)
          nComp = bytes(pos + 7) & 0xff
          if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3)) return None
          if (w.toLong * h * nComp > 64L * 1024 * 1024) return None // forged dims
          if (len != 8 + 3 * nComp) return None
          compId = new Array[Int](nComp); compH = new Array[Int](nComp)
          compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = bytes(pos + 8 + 3 * c) & 0xff
            compH(c) = (bytes(pos + 9 + 3 * c) & 0xff) >> 4
            compV(c) = bytes(pos + 9 + 3 * c) & 0x0f
            compQ(c) = bytes(pos + 10 + 3 * c) & 0xff
            if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4 ||
              compQ(c) > 3) return None
            c += 1
          }
          pos += len
        case m if m == 0xc1 || m == 0xc3 || (m >= 0xc5 && m <= 0xc7) ||
          (m >= 0xc9 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf) =>
          return None // extended/arithmetic/hierarchical: outside the contract
        case 0xdd => // DRI
          if (pos + 4 > bytes.length || u16(pos) != 4) return None
          restartInterval = u16(pos + 2)
          pos += 4
        case 0xda => // SOS: baseline decodes and returns; progressive accumulates
          if (compId == null) return None
          if (pos + 2 > bytes.length) return None
          val len = u16(pos); if (pos + len > bytes.length) return None
          val ns = bytes(pos + 2) & 0xff
          if (ns < 1 || ns > nComp || len != 6 + 2 * ns) return None
          val scanComp = new Array[Int](ns)
          val scanTd = new Array[Int](ns); val scanTa = new Array[Int](ns)
          var c = 0
          while (c < ns) {
            val cs = bytes(pos + 3 + 2 * c) & 0xff
            val ci = compId.indexOf(cs); if (ci < 0) return None
            scanComp(c) = ci
            scanTd(c) = (bytes(pos + 4 + 2 * c) & 0xff) >> 4
            scanTa(c) = bytes(pos + 4 + 2 * c) & 0x0f
            if (scanTd(c) > 3 || scanTa(c) > 3) return None
            c += 1
          }
          val ss = bytes(pos + 3 + 2 * ns) & 0xff
          val se = bytes(pos + 4 + 2 * ns) & 0xff
          val ahal = bytes(pos + 5 + 2 * ns) & 0xff
          val ah = ahal >> 4; val al = ahal & 15
          if (!progressive) {
            // baseline: one interleaved full-band scan (T.81 B.2.3)
            if (ns != nComp || ss != 0 || se != 63 || ah != 0 || al != 0)
              return None
            val scanDc = new Array[JpegHuff](nComp)
            val scanAc = new Array[JpegHuff](nComp)
            c = 0
            while (c < ns) {
              val ci = scanComp(c)
              scanDc(ci) = huffDc(scanTd(c)); scanAc(ci) = huffAc(scanTa(c))
              if (scanDc(ci) == null || scanAc(ci) == null || !quantSeen(compQ(ci)))
                return None
              c += 1
            }
            return decodeJpegScan(bytes, pos + len, w, h, nComp,
              compH, compV, compQ, quant, scanDc, scanAc, restartInterval)
          }
          // progressive scan-header validity (T.81 G.1.1.1): a DC band scan
          // (Ss=0) carries Se=0 and may interleave; an AC band scan is a
          // single component with 1 <= Ss <= Se <= 63
          if (ss == 0) { if (se != 0) return None }
          else if (se < ss || se > 63 || ns != 1) return None
          if (ah > 13 || al > 13) return None
          if (coefs == null) {
            // allocate coefficient planes on the first scan, padded to
            // whole MCUs; same forged-dimension guards as the sample path
            val maxH = compH.max; val maxV = compV.max
            mcusX = (w + 8 * maxH - 1) / (8 * maxH)
            mcusY = (h + 8 * maxV - 1) / (8 * maxV)
            if (compH.indices.map(i => compH(i) * compV(i)).sum > 10) return None
            blocksW = Array.tabulate(nComp)(i => mcusX * compH(i))
            blocksH = Array.tabulate(nComp)(i => mcusY * compV(i))
            // non-interleaved scans cover the component's OWN block grid
            // (ceil of its true sample size), not the MCU-padded one
            compBW = Array.tabulate(nComp)(i =>
              (w * compH(i) + 8 * maxH - 1) / (8 * maxH))
            compBH = Array.tabulate(nComp)(i =>
              (h * compV(i) + 8 * maxV - 1) / (8 * maxV))
            val totalCoefs = (0 until nComp)
              .map(i => blocksW(i).toLong * blocksH(i) * 64).sum
            if (totalCoefs > 64L * 1024 * 1024) return None
            coefs = Array.tabulate(nComp)(i =>
              new Array[Int](blocksW(i) * blocksH(i) * 64))
          }
          val dcT = Array.tabulate(ns)(i => huffDc(scanTd(i)))
          val acT = Array.tabulate(ns)(i => huffAc(scanTa(i)))
          if (ss == 0 && ah == 0 && dcT.exists(_ == null)) return None
          if (ss > 0 && acT(0) == null) return None
          decodeProgressiveJpegScan(bytes, pos + len, scanComp, dcT, acT,
            ss, se, ah, al, restartInterval, coefs, blocksW, compBW, compBH,
            compH, compV, nComp, mcusX, mcusY) match {
            case Some(np) => pos = np; anyScan = true
            case None     => return None
          }
        case _ => return None // TEM/DNL/JPG/unknown: outside the baseline contract
      }
    }
    None // unreachable
  }

  /** The entropy-coded scan: MCU loop → per-component blocks → Huffman +
    * dequant + IDCT into component planes → upsample + color-convert. */
  private def decodeJpegScan(bytes: Array[Byte], start: Int, w: Int, h: Int,
      nComp: Int, compH: Array[Int], compV: Array[Int], compQ: Array[Int],
      quant: Array[Array[Int]], scanDc: Array[JpegHuff], scanAc: Array[JpegHuff],
      restartInterval: Int): Option[(Int, Int, Int, Array[Byte])] = {
    val maxH = compH.max; val maxV = compV.max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    if (compH.indices.map(c => compH(c) * compV(c)).sum > 10) return None // T.81 B.2.3
    // component planes at their own resolution, padded to whole MCUs
    val planeW = Array.tabulate(nComp)(c => mcusX * compH(c) * 8)
    val planeH = Array.tabulate(nComp)(c => mcusY * compV(c) * 8)
    if (planeW.indices.exists(c => planeW(c).toLong * planeH(c) > 96L * 1024 * 1024))
      return None
    val planes = Array.tabulate(nComp)(c => new Array[Byte](planeW(c) * planeH(c)))
    val in = new JpegBits(bytes, start)
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var nextRst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        val mcuIdx = my * mcusX + mx
        // restart boundary: byte-align, consume FFD0+m (cyclic), reset DC
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          in.byteAlign()
          val p = in.pos
          if (p + 1 >= bytes.length || (bytes(p) & 0xff) != 0xff ||
            (bytes(p + 1) & 0xff) != 0xd0 + nextRst) return None
          in.pos = p + 2
          nextRst = (nextRst + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < nComp) {
          val q = quant(compQ(c))
          var by = 0
          while (by < compV(c)) {
            var bx = 0
            while (bx < compH(c)) {
              // -- one 8×8 block: DC + AC Huffman, dequant into natural order
              java.util.Arrays.fill(coef, 0)
              val t = scanDc(c).decode(in); if (t < 0 || t > 11) return None
              val dv = in.receive(t); if (dv == Int.MinValue) return None
              pred(c) += jpegExtend(dv, t)
              coef(0) = pred(c) * q(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = scanAc(c).decode(in); if (rs < 0) return None
                val r = rs >> 4; val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 else eob = true // ZRL vs EOB
                } else {
                  k += r
                  if (k > 63) return None
                  val av = in.receive(s); if (av == Int.MinValue) return None
                  coef(JpegZigzag(k)) = jpegExtend(av, s) * q(k)
                  k += 1
                }
              }
              jpegIdctBlock(coef, tmp, planes(c), planeW(c),
                (mx * compH(c) + bx) * 8, (my * compV(c) + by) * 8)
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    // the scan must terminate with EOI (fill FFs allowed): a stream cut
    // anywhere — even between the last MCU and the marker — is truncated,
    // the same strictness as the PNG family's required IEND
    in.byteAlign()
    var ep = in.pos
    while (ep + 2 < bytes.length && (bytes(ep) & 0xff) == 0xff &&
      (bytes(ep + 1) & 0xff) == 0xff) ep += 1
    if (ep + 2 > bytes.length || (bytes(ep) & 0xff) != 0xff ||
      (bytes(ep + 1) & 0xff) != 0xd9) return None
    Some((w, h, nComp, jpegPlanesToRgb(w, h, nComp, planes, planeW, compH, compV,
      maxH, maxV)))
  }

  /** One progressive (SOF2) scan decoded into the per-component coefficient
    * planes (T.81 Annex G). Four band/pass shapes share this loop:
    *   - DC first (Ss=0, Ah=0): Huffman diff decode, value << Al;
    *   - DC refinement (Ss=0, Ah>0): one raw bit per block, OR'd at Al;
    *   - AC first (Ss>0, Ah=0): run/size pairs inside [Ss,Se] with EOB runs
    *     (EOBn codes r<4:r<15) shared across blocks;
    *   - AC refinement (Ss>0, Ah>0): the correction-bit algorithm — every
    *     already-nonzero coefficient visited consumes one bit, zero-history
    *     runs place new ±(1<<Al) coefficients, EOB runs refine the band tail.
    * DC scans may interleave components over MCUs; AC scans are single-
    * component over that component's own block raster. Restart markers
    * byte-align, reset predictors AND the EOB run. Returns the position of
    * the next marker's FF, or None on any malformed shape — never throws. */
  private def decodeProgressiveJpegScan(bytes: Array[Byte], start: Int,
      scanComp: Array[Int], dcT: Array[JpegHuff], acT: Array[JpegHuff],
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int,
      coefs: Array[Array[Int]], blocksW: Array[Int],
      compBW: Array[Int], compBH: Array[Int],
      compH: Array[Int], compV: Array[Int], nComp: Int,
      mcusX: Int, mcusY: Int): Option[Int] = {
    val in = new JpegBits(bytes, start)
    val pred = new Array[Int](scanComp.length)
    var eobrun = 0
    var nextRst = 0

    def restart(unitIdx: Int): Boolean = {
      if (restartInterval > 0 && unitIdx > 0 && unitIdx % restartInterval == 0) {
        in.byteAlign()
        val p = in.pos
        if (p + 1 >= bytes.length || (bytes(p) & 0xff) != 0xff ||
          (bytes(p + 1) & 0xff) != 0xd0 + nextRst) return false
        in.pos = p + 2
        nextRst = (nextRst + 1) % 8
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }
      true
    }

    def dcBlock(si: Int, arr: Array[Int], off: Int): Boolean = {
      if (ah == 0) {
        val t = dcT(si).decode(in); if (t < 0 || t > 11) return false
        val dv = in.receive(t); if (dv == Int.MinValue) return false
        pred(si) += jpegExtend(dv, t)
        arr(off) = pred(si) << al
      } else {
        val b = in.readBit(); if (b < 0) return false
        if (b == 1) arr(off) |= 1 << al
      }
      true
    }

    def acFirst(arr: Array[Int], off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      var done = false
      while (k <= se && !done) {
        val rs = acT(0).decode(in); if (rs < 0) return false
        val r = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else { // EOBn: this block ends; (1<<r)-1+bits more follow empty
            eobrun = (1 << r) - 1
            if (r > 0) {
              val e = in.receive(r); if (e == Int.MinValue) return false
              eobrun += e
            }
            done = true
          }
        } else {
          k += r
          if (k > se) return false // coefficient outside the spectral band
          val v = in.receive(s); if (v == Int.MinValue) return false
          arr(off + JpegZigzag(k)) = jpegExtend(v, s) << al
          k += 1
        }
      }
      true
    }

    def acRefine(arr: Array[Int], off: Int): Boolean = {
      val p1 = 1 << al
      // one correction bit on an already-nonzero coefficient: a 1-bit grows
      // the magnitude by 1<<Al iff that bit isn't already set
      def correct(idx: Int): Boolean = {
        val b = in.readBit(); if (b < 0) return false
        if (b == 1 && (arr(idx) & p1) == 0)
          arr(idx) += (if (arr(idx) >= 0) p1 else -p1)
        true
      }
      var k = ss
      if (eobrun > 0) {
        while (k <= se) {
          val idx = off + JpegZigzag(k)
          if (arr(idx) != 0 && !correct(idx)) return false
          k += 1
        }
        eobrun -= 1
        return true
      }
      while (k <= se) {
        val rs = acT(0).decode(in); if (rs < 0) return false
        var r = rs >> 4; val s = rs & 15
        var newval = 0
        if (s == 0) {
          if (r < 15) { // EOBn: refine the rest of the band, then done
            eobrun = (1 << r) - 1
            if (r > 0) {
              val e = in.receive(r); if (e == Int.MinValue) return false
              eobrun += e
            }
            while (k <= se) {
              val idx = off + JpegZigzag(k)
              if (arr(idx) != 0 && !correct(idx)) return false
              k += 1
            }
            return true
          }
          // r == 15: skip 16 zero-history positions, refining along the way
        } else {
          if (s != 1) return false // refinement codes only ±1 magnitudes
          val b = in.readBit(); if (b < 0) return false
          newval = if (b == 1) p1 else -p1
        }
        // advance r zero-history positions (nonzero ones just take a
        // correction bit and don't count), then place the new coefficient
        var placed = false
        while (k <= se && !placed) {
          val idx = off + JpegZigzag(k)
          if (arr(idx) != 0) {
            if (!correct(idx)) return false
          } else if (r == 0) {
            if (newval != 0) arr(idx) = newval
            placed = true
          } else r -= 1
          k += 1
        }
        if (!placed && newval != 0) return false // no slot for a coded coef
      }
      true
    }

    if (scanComp.length > 1) {
      // interleaved DC scan: MCU raster, compH×compV blocks per component
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (!restart(my * mcusX + mx)) return None
          var si = 0
          while (si < scanComp.length) {
            val c = scanComp(si)
            var v = 0
            while (v < compV(c)) {
              var u = 0
              while (u < compH(c)) {
                val off = ((my * compV(c) + v) * blocksW(c) +
                  mx * compH(c) + u) * 64
                if (!dcBlock(si, coefs(c), off)) return None
                u += 1
              }
              v += 1
            }
            si += 1
          }
          mx += 1
        }
        my += 1
      }
    } else {
      // non-interleaved: raster over the component's own block grid
      val c = scanComp(0)
      val arr = coefs(c)
      val bw = compBW(c); val bh = compBH(c)
      var by = 0; var bi = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          if (!restart(bi)) return None
          val off = (by * blocksW(c) + bx) * 64
          val ok =
            if (ss == 0) dcBlock(0, arr, off)
            else if (ah == 0) acFirst(arr, off)
            else acRefine(arr, off)
          if (!ok) return None
          bx += 1; bi += 1
        }
        by += 1
      }
    }
    in.byteAlign()
    Some(in.pos)
  }

  /** Progressive reconstruction at EOI: dequantize every accumulated block
    * (quant tables are stored in transmitted zigzag order, coefficients in
    * natural order) and IDCT into component planes, then the same
    * upsample + YCbCr→RGB tail as the baseline path. */
  private def reconstructProgressiveJpeg(w: Int, h: Int, nComp: Int,
      compH: Array[Int], compV: Array[Int], compQ: Array[Int],
      quant: Array[Array[Int]], coefs: Array[Array[Int]],
      blocksW: Array[Int], blocksH: Array[Int]): Option[(Int, Int, Int, Array[Byte])] = {
    val maxH = compH.max; val maxV = compV.max
    val planeW = Array.tabulate(nComp)(c => blocksW(c) * 8)
    val planeH = Array.tabulate(nComp)(c => blocksH(c) * 8)
    if (planeW.indices.exists(c => planeW(c).toLong * planeH(c) > 96L * 1024 * 1024))
      return None
    val planes = Array.tabulate(nComp)(c => new Array[Byte](planeW(c) * planeH(c)))
    val deq = new Array[Int](64)
    val tmp = new Array[Double](64)
    var c = 0
    while (c < nComp) {
      val q = quant(compQ(c))
      val arr = coefs(c)
      var by = 0
      while (by < blocksH(c)) {
        var bx = 0
        while (bx < blocksW(c)) {
          val off = (by * blocksW(c) + bx) * 64
          var k = 0
          while (k < 64) {
            val nat = JpegZigzag(k)
            deq(nat) = arr(off + nat) * q(k)
            k += 1
          }
          jpegIdctBlock(deq, tmp, planes(c), planeW(c), bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    Some((w, h, nComp, jpegPlanesToRgb(w, h, nComp, planes, planeW, compH,
      compV, maxH, maxV)))
  }

  /** One dequantized 8×8 block through the separable inverse DCT (rows over
    * u, then columns over v), level-shifted and clamped into a component
    * plane at (px0, py0). `tmp` is caller-owned 64-slot scratch. */
  private def jpegIdctBlock(coef: Array[Int], tmp: Array[Double],
      plane: Array[Byte], planeW: Int, px0: Int, py0: Int): Unit = {
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0; var u = 0
        while (u < 8) { acc += JpegIdctCos(x)(u) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0; var vv = 0
        while (vv < 8) { acc += JpegIdctCos(y)(vv) * tmp(vv * 8 + x); vv += 1 }
        val s = math.round(acc).toInt + 128 // level shift
        val cl = if (s < 0) 0 else if (s > 255) 255 else s
        plane((py0 + y) * planeW + px0 + x) = cl.toByte
        x += 1
      }
      y += 1
    }
  }

  /** Upsample (sample replication) + JFIF YCbCr→RGB into the output frame;
    * grayscale replicates the single plane across all three channels. */
  private def jpegPlanesToRgb(w: Int, h: Int, nComp: Int,
      planes: Array[Array[Byte]], planeW: Array[Int],
      compH: Array[Int], compV: Array[Int], maxH: Int, maxV: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (nComp == 1) {
          val g = planes(0)(y * planeW(0) + x)
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
        } else {
          def sample(c: Int): Int =
            planes(c)((y * compV(c) / maxV) * planeW(c) + (x * compH(c) / maxH)) & 0xff
          val yy = sample(0); val cb = sample(1) - 128; val cr = sample(2) - 128
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          rgb(o) = clamp(yy + 1.402 * cr)
          rgb(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          rgb(o + 2) = clamp(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** ITU-T T.81 Annex K.1 luminance quantization table (zigzag order) —
    * the reference most encoders scale by the IJG quality factor; public
    * constants. */
  private val JpegAnnexKLuma: Array[Int] = Array(
    16, 11, 12, 14, 12, 10, 16, 14,
    13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37,
    29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68,
    87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113,
    121, 112, 100, 120, 92, 101, 103, 99)

  /** IJG quality→scale mapping (libjpeg `jpeg_quality_scaling`, public):
    * q<50 → 5000/q, else 200−2q; table entry = clamp((K·s+50)/100, 1, 255). */
  private def jpegQualityToScale(q: Int): Int =
    if (q < 50) 5000 / math.max(1, q) else 200 - 2 * math.min(100, q)

  /** Estimate the IJG quality factor a JPEG was encoded at from its
    * LUMINANCE quantization table — the standard corpus-datasheet signal
    * for dropping heavily re-encoded images. Walks markers to the first
    * DQT with table id 0 (both baseline and progressive streams; stops at
    * SOS — tables after the first scan can't describe the encode), then
    * inverts the IJG scaling in pure integers: scale% = round of
    * 100·ΣT/ΣK (sum-ratio — robust to per-entry clamping at 1), quality =
    * scale ≤ 100 ? (200−scale)/2 : round(5000/scale). Returns
    * (estimated quality 1..100, ΣT) or None when no luma DQT exists
    * before SOS / the stream is malformed. Never throws. */
  def jpegQualityEstimate(bytes: Array[Byte]): Option[(Int, Long)] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    var pos = 2
    while (pos + 1 < bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None
      while (pos < bytes.length && (bytes(pos) & 0xff) == 0xff) pos += 1
      if (pos >= bytes.length) return None
      val marker = bytes(pos) & 0xff; pos += 1
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS: no luma DQT seen
      if (marker >= 0xd0 && marker <= 0xd7) () // RSTn: no length segment
      else {
        if (pos + 2 > bytes.length) return None
        val len = u16(pos); if (len < 2 || pos + len > bytes.length) return None
        if (marker == 0xdb) {
          val end = pos + len; var p = pos + 2
          while (p < end) {
            val pq = (bytes(p) & 0xff) >> 4; val tq = bytes(p) & 0x0f
            if (tq > 3 || pq > 1) return None
            p += 1
            val step = if (pq == 0) 1 else 2
            if (p + 64 * step > end) return None
            if (tq == 0) {
              var sumT = 0L
              var k = 0
              while (k < 64) {
                sumT += (if (pq == 0) bytes(p + k) & 0xff else u16(p + 2 * k))
                k += 1
              }
              val sumK = JpegAnnexKLuma.sum.toLong // 3688
              val scale = ((100L * sumT + sumK / 2) / sumK).toInt
              val q =
                if (scale <= 0) 100
                else if (scale <= 100) (200 - scale) / 2
                else ((5000 + scale / 2) / scale).toInt
              return Some((math.max(1, math.min(100, q)), sumT))
            }
            p += 64 * step
          }
        }
        pos += len
      }
    }
    None
  }

  /** [[jpegQualityEstimate]] as a DataFrame pass — shuffle-free
    * `mapPartitions`; malformed / luma-table-less payloads become null
    * rows. */
  def jpegQuality(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val e = try jpegQualityEstimate(payload) catch { case _: Throwable => None }
        (id, e.map(_._1), e.map(_._2))
      })
      .toDF(idCol, "est_quality", "quant_sum")
  }

  /** Feature frame over a [[decodeJpegPixels]] pass — the mixed-corpus
    * [[ImageStats]] shape, all integers for exact cross-engine checks. */
  def decodeJpeg(bytes: Array[Byte]): Option[JpegStats] =
    try decodeJpegPixels(bytes).map { case (w, h, nc, rgb) =>
      var rMin = 255; var rMax = 0; var gMin = 255; var gMax = 0
      var bMin = 255; var bMax = 0; var bright = 0L
      var i = 0
      while (i < rgb.length) {
        val r = rgb(i) & 0xff; val g = rgb(i + 1) & 0xff; val b = rgb(i + 2) & 0xff
        if (r < rMin) rMin = r; if (r > rMax) rMax = r
        if (g < gMin) gMin = g; if (g > gMax) gMax = g
        if (b < bMin) bMin = b; if (b > bMax) bMax = b
        bright += r + g + b
        i += 3
      }
      JpegStats(w, h, w.toLong * h, nc, rMin, rMax, gMin, gMax, bMin, bMax, bright)
    } catch {
      // belt and braces on the malformed→None contract: index/arith faults
      // from a stream shape the guards missed must not kill a task
      case _: ArrayIndexOutOfBoundsException | _: ArithmeticException |
        _: NegativeArraySizeException => None
    }

  /** Oracle/test harness encoder: a REAL baseline JPEG (grayscale SOF0,
    * canonical DHT, restart markers when `restartInterval` > 0) whose
    * decoded pixels are EXACTLY derivable from the text — each 8×8 tile is
    * the constant v_k = codepoint k of the cycled text mod 256. A constant
    * block has only a DC coefficient (8·(v−128)); with an all-ones quant
    * table the round-trip is exact, so the DuckDB oracle replays v_k
    * directly while the Spark side runs the FULL Huffman+IDCT decode (the
    * [[encodePpmFromText]] scheme lifted to a lossy container's lossless
    * subset). DC Huffman is T.81 Annex K.3.1; AC is a minimal 1-entry
    * table (only EOB is ever coded). */
  def encodeJpegFromText(text: String, widthBlocks: Int, heightBlocks: Int,
      restartInterval: Int = 0, quality: Int = 0): Array[Byte] = {
    require(widthBlocks > 0 && heightBlocks > 0, "block grid must be positive")
    require(quality <= 100, "quality is 1..100, or <=0 for the all-ones table")
    val w = widthBlocks * 8; val h = heightBlocks * 8
    val cps = if (text == null) Array.empty[Int] else text.codePoints().toArray
    def vk(k: Int): Int = if (cps.isEmpty) 0 else cps(k % cps.length) & 0xff
    // quality <= 0 keeps the legacy all-ones table (lossless constant
    // tiles); quality 1..100 writes the IJG-scaled Annex K luma table —
    // the realistic shape [[jpegQualityEstimate]] inverts. DC is then
    // properly quantized (round-half-away) so the stream stays a sane
    // image, not just a valid container.
    val quantTab: Array[Int] =
      if (quality <= 0) Array.fill(64)(1)
      else {
        val s = jpegQualityToScale(quality)
        Array.tabulate(64)(i =>
          math.max(1, math.min(255, (JpegAnnexKLuma(i) * s + 50) / 100)))
      }
    // Annex K.3.1 luminance DC: counts per length 1..16, symbols 0..11
    val dcCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val dcSymbols = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
    // minimal AC table: the single symbol EOB (0x00) as the 1-bit code '0'
    val acCounts = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acSymbols = Array(0)
    // canonical code assignment (same derivation the decoder runs)
    def codes(counts: Array[Int], n: Int): (Array[Int], Array[Int]) = {
      val code = new Array[Int](n); val size = new Array[Int](n)
      var c = 0; var k = 0; var l = 1
      while (l <= 16) {
        var i = 0
        while (i < counts(l - 1)) { code(k) = c; size(k) = l; c += 1; k += 1; i += 1 }
        c <<= 1; l += 1
      }
      (code, size)
    }
    val (dcCode, dcSize) = codes(dcCounts, 12)
    val (acCode, acSize) = codes(acCounts, 1)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); out.write(0x00) // DQT: pq=0 tq=0
    var i = 0
    while (i < 64) { out.write(quantTab(i)); i += 1 }
    marker(0xc0); u16(8 + 3) // SOF0: 8-bit, 1 component, no subsampling
    out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    marker(0xc4); u16(2 + (1 + 16 + 12) + (1 + 16 + 1)) // DHT: DC0 + AC0
    out.write(0x00); dcCounts.foreach(out.write); dcSymbols.foreach(out.write)
    out.write(0x10); acCounts.foreach(out.write); acSymbols.foreach(out.write)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) } // DRI
    marker(0xda); u16(6 + 2) // SOS
    out.write(1); out.write(1); out.write(0x00); out.write(0); out.write(63); out.write(0)
    // entropy data: per block DC diff (category+bits) then EOB; FF stuffed
    var bitBuf = 0; var bitCnt = 0
    def putBits(code: Int, size: Int): Unit = {
      var s = size - 1
      while (s >= 0) {
        bitBuf = (bitBuf << 1) | ((code >>> s) & 1); bitCnt += 1
        if (bitCnt == 8) {
          out.write(bitBuf & 0xff)
          if ((bitBuf & 0xff) == 0xff) out.write(0x00)
          bitBuf = 0; bitCnt = 0
        }
        s -= 1
      }
    }
    def flushBits(): Unit = if (bitCnt > 0) { putBits((1 << (8 - bitCnt)) - 1, 8 - bitCnt) }
    var pred = 0
    var nextRst = 0
    var k = 0
    val nBlocks = widthBlocks * heightBlocks
    while (k < nBlocks) {
      if (restartInterval > 0 && k > 0 && k % restartInterval == 0) {
        flushBits()
        marker(0xd0 + nextRst); nextRst = (nextRst + 1) % 8
        pred = 0
      }
      val dcRaw = 8 * (vk(k) - 128) // DCT DC of a constant (level-shifted) block
      val t0 = quantTab(0)
      val dc = // quantized coefficient, round half away from zero
        if (dcRaw >= 0) (dcRaw + t0 / 2) / t0 else -((-dcRaw + t0 / 2) / t0)
      val diff = dc - pred; pred = dc
      var s = 0; var m = math.abs(diff)
      while (m > 0) { s += 1; m >>= 1 } // category = magnitude bit-length
      putBits(dcCode(s), dcSize(s))
      if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      putBits(acCode(0), acSize(0)) // EOB: all 63 AC are zero
      k += 1
    }
    flushBits()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Progressive (SOF2) twin of [[encodeJpegFromText]]: the same constant-
    * tile grayscale scheme (tile k = codepoint k of the cycled text, all-ones
    * quant → DC-only content is LOSSLESS) emitted as a genuine four-scan
    * progressive stream exercising every Annex G pass shape the decoder
    * implements:
    *   1. DC first scan at Al=1 (successive-approximation coarse pass),
    *   2. AC first scan (Ss=1..63, Al=1) coded entirely as EOB runs,
    *   3. DC refinement (Ah=1→Al=0): one appended bit per block,
    *   4. AC refinement (Ah=1→Al=0): EOB runs over zero-history bands.
    * With restartInterval > 0 every scan carries RSTn markers (predictors
    * and EOB runs reset), matching T.81's per-scan restart numbering. The
    * oracle can re-derive each decoded pixel from the text alone. */
  def encodeProgressiveJpegFromText(text: String, widthBlocks: Int,
      heightBlocks: Int, restartInterval: Int = 0): Array[Byte] = {
    require(widthBlocks > 0 && heightBlocks > 0, "block grid must be positive")
    val w = widthBlocks * 8; val h = heightBlocks * 8
    val cps = if (text == null) Array.empty[Int] else text.codePoints().toArray
    def vk(k: Int): Int = if (cps.isEmpty) 0 else cps(k % cps.length) & 0xff
    // Annex K.3.1 luminance DC table; AC table = EOBn symbols r=0..6 (EOB
    // runs up to 127 blocks), 7 codes at length 3, all-ones code unused
    val dcCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val dcSymbols = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
    val acCounts = Array(0, 0, 7, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acSymbols = Array(0x00, 0x10, 0x20, 0x30, 0x40, 0x50, 0x60)
    def codes(counts: Array[Int], n: Int): (Array[Int], Array[Int]) = {
      val code = new Array[Int](n); val size = new Array[Int](n)
      var c = 0; var k = 0; var l = 1
      while (l <= 16) {
        var i = 0
        while (i < counts(l - 1)) { code(k) = c; size(k) = l; c += 1; k += 1; i += 1 }
        c <<= 1; l += 1
      }
      (code, size)
    }
    val (dcCode, dcSize) = codes(dcCounts, 12)
    val (acCode, acSize) = codes(acCounts, 7)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); out.write(0x00)
    var i = 0
    while (i < 64) { out.write(1); i += 1 } // all-ones: lossless DC round-trip
    marker(0xc2); u16(8 + 3) // SOF2: 8-bit, 1 component, no subsampling
    out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    marker(0xc4); u16(2 + (1 + 16 + 12) + (1 + 16 + 7)) // DHT: DC0 + AC0
    out.write(0x00); dcCounts.foreach(out.write); dcSymbols.foreach(out.write)
    out.write(0x10); acCounts.foreach(out.write); acSymbols.foreach(out.write)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    val nBlocks = widthBlocks * heightBlocks
    var bitBuf = 0; var bitCnt = 0
    def putBits(code: Int, size: Int): Unit = {
      var s = size - 1
      while (s >= 0) {
        bitBuf = (bitBuf << 1) | ((code >>> s) & 1); bitCnt += 1
        if (bitCnt == 8) {
          out.write(bitBuf & 0xff)
          if ((bitBuf & 0xff) == 0xff) out.write(0x00)
          bitBuf = 0; bitCnt = 0
        }
        s -= 1
      }
    }
    def flushBits(): Unit =
      if (bitCnt > 0) putBits((1 << (8 - bitCnt)) - 1, 8 - bitCnt)
    def sosHeader(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); u16(6 + 2)
      out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    // restart boundary shared by all four scans: numbering restarts at 0
    // in each scan, predictors/EOB runs reset on the decode side
    var nextRst = 0
    def rstBoundary(k: Int)(onReset: => Unit): Unit =
      if (restartInterval > 0 && k > 0 && k % restartInterval == 0) {
        flushBits()
        marker(0xd0 + nextRst); nextRst = (nextRst + 1) % 8
        onReset
      }
    def dc(k: Int): Int = 8 * (vk(k) - 128) // DCT DC of a constant block
    // scan 1: DC first pass in the Al=1 shifted domain (dc is a multiple
    // of 8, so no precision is lost across the approximation split)
    sosHeader(0, 0, 0, 1)
    nextRst = 0
    var pred = 0
    var k = 0
    while (k < nBlocks) {
      rstBoundary(k) { pred = 0 }
      val v = dc(k) >> 1
      val diff = v - pred; pred = v
      var s = 0; var m = math.abs(diff)
      while (m > 0) { s += 1; m >>= 1 }
      putBits(dcCode(s), dcSize(s))
      if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      k += 1
    }
    flushBits()
    // AC scans: all 63 AC coefficients are zero, so each restart segment is
    // one (or a few, >127 blocks) EOBn codes — the run covers the current
    // block plus (run-1) following blocks
    def acScan(ah: Int, al: Int): Unit = {
      sosHeader(1, 63, ah, al)
      nextRst = 0
      var k = 0
      while (k < nBlocks) {
        rstBoundary(k) {}
        val seg =
          if (restartInterval > 0)
            math.min(nBlocks - k, restartInterval - (k % restartInterval))
          else nBlocks - k
        var n = seg
        while (n > 0) {
          val run = math.min(n, 127)
          var r = 0
          while ((1 << (r + 1)) <= run) r += 1 // r = floor(log2 run)
          putBits(acCode(r), acSize(r))
          if (r > 0) putBits(run - (1 << r), r)
          n -= run
        }
        k += seg
      }
      flushBits()
    }
    acScan(0, 1)
    // scan 3: DC refinement appends bit 0 of each DC (always 0 here)
    sosHeader(0, 0, 1, 0)
    nextRst = 0
    k = 0
    while (k < nBlocks) {
      rstBoundary(k) {}
      putBits(dc(k) & 1, 1)
      k += 1
    }
    flushBits()
    // scan 4: AC refinement — zero-history bands, EOB runs consume no
    // correction bits
    acScan(1, 0)
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Attach a synthesized progressive-JPEG payload column
    * (see [[encodeProgressiveJpegFromText]]). */
  def withProgressiveJpegPayload(df: DataFrame, idCol: String, textCol: String,
      widthBlocks: Int, heightBlocks: Int, restartInterval: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, encodeProgressiveJpegFromText(text, widthBlocks, heightBlocks,
          restartInterval))
      }
      .toDF(idCol, "payload")
  }

  /** Attach a synthesized JPEG payload column (see [[encodeJpegFromText]]). */
  def withJpegPayload(df: DataFrame, idCol: String, textCol: String,
      widthBlocks: Int, heightBlocks: Int, restartInterval: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, encodeJpegFromText(text, widthBlocks, heightBlocks, restartInterval))
      }
      .toDF(idCol, "payload")
  }

  /** [[withJpegPayload]] with a per-row IJG quality factor derived from
    * the id — a corpus whose encode quality varies row to row, the shape
    * [[jpegQuality]] audits. */
  def withJpegPayloadAtQuality(df: DataFrame, idCol: String, textCol: String,
      widthBlocks: Int, heightBlocks: Int)(qualityOf: Long => Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, encodeJpegFromText(text, widthBlocks, heightBlocks,
          restartInterval = 0, quality = qualityOf(id)))
      }
      .toDF(idCol, "payload")
  }

  /** Decode JPEG payloads into per-image stats — same shuffle-free
    * `mapPartitions` shape as [[pngStats]]; malformed payloads become null
    * feature rows. */
  def jpegStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeJpeg(bytes) match {
          case Some(s) =>
            (id, Option(s.width), Option(s.height), Option(s.nPixels), Option(s.nComponents),
              Option(s.rMin), Option(s.rMax), Option(s.gMin), Option(s.gMax),
              Option(s.bMin), Option(s.bMax), Option(s.brightSum))
          case None =>
            (id, None: Option[Int], None: Option[Int], None: Option[Long], None: Option[Int],
              None: Option[Int], None: Option[Int], None: Option[Int], None: Option[Int],
              None: Option[Int], None: Option[Int], None: Option[Long])
        }
      })
      .toDF(idCol, "width", "height", "n_pixels", "n_components",
        "r_min", "r_max", "g_min", "g_max", "b_min", "b_max", "bright_sum")
  }

  // ---- EXIF (APP1 / TIFF IFD) metadata --------------------------------

  /** Synthesized APP1 Exif segment (marker + length + payload): a TIFF
    * header in BOTH byte orders (id parity picks II little-endian vs MM
    * big-endian — the field real parsers get wrong), IFD0 with
    * Orientation (SHORT, inline), XResolution (RATIONAL, offset-valued),
    * DateTime (ASCII, offset-valued) and an Exif sub-IFD holding
    * PixelXDimension (LONG) — one of each TIFF value-placement shape.
    * `corruptMagic` flips the TIFF magic 42 → 43 (the malformed branch a
    * parser must reject without throwing). Layout per TIFF 6.0 §2 / Exif
    * 2.32 §4.6. */
  def buildExifApp1(id: Long, pixelX: Int, corruptMagic: Boolean): Array[Byte] = {
    val le = id % 2 == 0
    val tiff = new Array[Byte](108)
    def put16(p: Int, v: Int): Unit =
      if (le) { tiff(p) = (v & 0xff).toByte; tiff(p + 1) = ((v >> 8) & 0xff).toByte }
      else { tiff(p) = ((v >> 8) & 0xff).toByte; tiff(p + 1) = (v & 0xff).toByte }
    def put32(p: Int, v: Long): Unit =
      if (le) { var i = 0; while (i < 4) { tiff(p + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 } }
      else { var i = 0; while (i < 4) { tiff(p + 3 - i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 } }
    tiff(0) = (if (le) 'I' else 'M').toByte; tiff(1) = tiff(0)
    put16(2, if (corruptMagic) 43 else 42)
    put32(4, 8L) // IFD0 directly after the header
    // IFD0: 4 entries (tags ascending), next-IFD = 0; data area at 62
    put16(8, 4)
    def entry(p: Int, tag: Int, typ: Int, cnt: Long)(value: Int => Unit): Unit = {
      put16(p, tag); put16(p + 2, typ); put32(p + 4, cnt); value(p + 8)
    }
    entry(10, 0x0112, 3, 1L)(v => put16(v, (1 + (id % 8)).toInt)) // Orientation, inline SHORT
    entry(22, 0x011a, 5, 1L)(v => put32(v, 62L)) // XResolution -> RATIONAL at 62
    entry(34, 0x0132, 2, 20L)(v => put32(v, 70L)) // DateTime -> ASCII at 70
    entry(46, 0x8769, 4, 1L)(v => put32(v, 90L)) // Exif sub-IFD at 90
    put32(58, 0L) // no IFD1
    put32(62, 72L); put32(66, 1L) // 72/1 dpi
    val dt = f"2026:01:01 00:00:${id % 60}%02d"
    System.arraycopy(dt.getBytes("US-ASCII"), 0, tiff, 70, 19) // +NUL already zeroed
    put16(90, 1) // sub-IFD: 1 entry
    entry(92, 0xa002, 4, 1L)(v => put32(v, pixelX.toLong)) // PixelXDimension, inline LONG
    put32(104, 0L)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xe1)
    val payloadLen = 6 + tiff.length // "Exif\0\0" + TIFF
    out.write(((payloadLen + 2) >> 8) & 0xff); out.write((payloadLen + 2) & 0xff)
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    out.write(tiff)
    out.toByteArray
  }

  /** [[withJpegPayload]] plus an APP1 Exif segment spliced after SOI —
    * id parity varies the TIFF byte order, id % 17 == 0 plants a corrupt
    * TIFF magic (the stream stays a decodable JPEG; only the metadata is
    * rotten — exactly how real corpora break). */
  def withExifJpegPayload(df: DataFrame, idCol: String, textCol: String,
      widthBlocks: Int, heightBlocks: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val jpeg = encodeJpegFromText(text, widthBlocks, heightBlocks)
        val app1 = buildExifApp1(id, widthBlocks * 8, corruptMagic = id % 17 == 0)
        val out = new Array[Byte](jpeg.length + app1.length)
        out(0) = jpeg(0); out(1) = jpeg(1) // SOI
        System.arraycopy(app1, 0, out, 2, app1.length)
        System.arraycopy(jpeg, 2, out, 2 + app1.length, jpeg.length - 2)
        (id, out)
      }
      .toDF(idCol, "payload")
  }

  /** Parsed Exif fields: TIFF byte order plus the four synthesized tags.
    * Every field is optional — absent tags stay None. */
  final case class ExifMeta(byteOrder: String, orientation: Option[Int],
      xresNum: Option[Long], xresDen: Option[Long], dateTime: Option[String],
      pixelX: Option[Long])

  /** Parse the first APP1 Exif segment of a JPEG stream: marker walk to
    * APP1 ("Exif\0\0" identifier), then a bounds-checked TIFF read —
    * byte-order handshake (II/MM), magic 42, IFD0 entry walk with all
    * four value placements (inline SHORT/LONG, offset RATIONAL/ASCII),
    * and one level of Exif sub-IFD. Any malformation (bad magic, offset
    * past the segment, truncated entry) → None; never throws — the same
    * contract every decoder here honors. Sub-IFD recursion is exactly one
    * level deep, so a cyclic pointer chain cannot loop. */
  def parseExif(bytes: Array[Byte]): Option[ExifMeta] = {
    try {
      if (bytes == null || bytes.length < 4) return None
      if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
      def ju16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
      // locate APP1/Exif among the pre-SOS segments
      var p = 2
      var tiffStart = -1; var tiffLimit = -1
      while (tiffStart < 0 && p + 4 <= bytes.length && (bytes(p) & 0xff) == 0xff) {
        val m = bytes(p + 1) & 0xff
        if (m == 0xd9 || m == 0xda) p = bytes.length // EOI / SOS: no Exif ahead
        else {
          val len = ju16(p + 2)
          if (len < 2 || p + 2 + len > bytes.length) return None
          if (m == 0xe1 && len >= 8 &&
            bytes(p + 4) == 'E' && bytes(p + 5) == 'x' && bytes(p + 6) == 'i' &&
            bytes(p + 7) == 'f' && bytes(p + 8) == 0 && bytes(p + 9) == 0) {
            tiffStart = p + 10; tiffLimit = p + 2 + len
          }
          p += 2 + len
        }
      }
      if (tiffStart < 0 || tiffLimit - tiffStart < 8) return None
      val b0 = bytes(tiffStart) & 0xff; val b1 = bytes(tiffStart + 1) & 0xff
      val le =
        if (b0 == 'I' && b1 == 'I') true
        else if (b0 == 'M' && b1 == 'M') false
        else return None
      def u16(p: Int): Int = {
        if (p < tiffStart || p + 2 > tiffLimit) throw new IndexOutOfBoundsException
        if (le) (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        else ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
      }
      def u32(p: Int): Long = {
        if (p < tiffStart || p + 4 > tiffLimit) throw new IndexOutOfBoundsException
        if (le) (0 until 4).map(i => (bytes(p + i) & 0xffL) << (8 * i)).sum
        else (0 until 4).map(i => (bytes(p + 3 - i) & 0xffL) << (8 * i)).sum
      }
      if (u16(tiffStart + 2) != 42) return None
      var orientation: Option[Int] = None
      var xresNum: Option[Long] = None; var xresDen: Option[Long] = None
      var dateTime: Option[String] = None; var pixelX: Option[Long] = None
      def walkIfd(off: Long, depth: Int): Unit = {
        if (depth > 1) return
        val base = tiffStart + off.toInt
        val n = u16(base)
        var i = 0
        while (i < n) {
          val e = base + 2 + 12 * i
          val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
          tag match {
            case 0x0112 if typ == 3 && cnt == 1 => orientation = Some(u16(e + 8))
            case 0x011a if typ == 5 && cnt == 1 =>
              val v = tiffStart + u32(e + 8).toInt
              xresNum = Some(u32(v)); xresDen = Some(u32(v + 4))
            case 0x0132 if typ == 2 && cnt >= 1 && cnt <= 64 =>
              val v = tiffStart + u32(e + 8).toInt
              if (v < tiffStart || v + cnt.toInt > tiffLimit) throw new IndexOutOfBoundsException
              val raw = new String(bytes, v, cnt.toInt - 1, "US-ASCII")
              dateTime = Some(raw.takeWhile(_ != '\u0000'))
            case 0xa002 if (typ == 3 || typ == 4) && cnt == 1 =>
              pixelX = Some(if (typ == 3) u16(e + 8).toLong else u32(e + 8))
            case 0x8769 if typ == 4 && cnt == 1 => walkIfd(u32(e + 8), depth + 1)
            case _ => ()
          }
          i += 1
        }
      }
      walkIfd(u32(tiffStart + 4), 0)
      Some(ExifMeta(if (le) "II" else "MM", orientation, xresNum, xresDen,
        dateTime, pixelX))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-image Exif metadata frame — shuffle-free mapPartitions like
    * [[jpegStats]]; images without parseable Exif become all-null rows.
    * This is the header-only scale path: cataloging orientation/timestamp
    * across 100 TB of images reads a few hundred bytes per file and never
    * touches entropy-coded data. */
  def jpegExif(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseExif(bytes) match {
          case Some(e) =>
            (id, Option(e.byteOrder), e.orientation, e.xresNum, e.xresDen,
              e.dateTime, e.pixelX)
          case None =>
            (id, None: Option[String], None: Option[Int], None: Option[Long],
              None: Option[Long], None: Option[String], None: Option[Long])
        }
      })
      .toDF(idCol, "byte_order", "orientation", "xres_num", "xres_den",
        "exif_datetime", "pixel_x")
  }

  // ---- video: MP4 (ISO BMFF) container metadata ------------------------

  /** Synthesized minimal MP4 (ISO/IEC 14496-12 box structure): `ftyp`
    * (brand cycles four common majors), `moov` containing a version-0
    * `mvhd` (timescale/duration derived from the id) and `1 + id%3` empty
    * `trak` children, then an 8-byte `mdat`. `corrupt` writes an
    * oversized moov box length (runs past EOF — the truncated-download
    * shape) that a parser must reject cleanly. */
  def buildMp4(id: Long, corrupt: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = { var i = 3; while (i >= 0) { out.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 } }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val brand = Mp4Brands((id % 4).toInt)
    u32(20L); cc("ftyp"); cc(brand); u32(512L); cc("mp41")
    val nTracks = (1 + id % 3).toInt
    val timescale = 1000L + id % 9000L
    val duration = timescale * (5L + id % 120L) + id % timescale
    val moovSize = 8L + 108L + 8L * nTracks
    u32(if (corrupt) moovSize + 1000000L else moovSize); cc("moov")
    u32(108L); cc("mvhd")
    u32(0L) // version 0 + flags
    u32(0L); u32(0L) // creation / modification
    u32(timescale); u32(duration)
    u32(0x00010000L); u32(0x01000000L) // rate 1.0, volume 1.0 + reserved u16
    u32(0L); u32(0L) // reserved 8 bytes
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L).foreach(u32) // identity matrix
    (0 until 6).foreach(_ => u32(0L)) // pre_defined
    u32(nTracks + 1L) // next_track_ID
    (0 until nTracks).foreach { _ => u32(8L); cc("trak") }
    u32(8L + 4L); cc("mdat"); u32(0L)
    out.toByteArray
  }

  private val Mp4Brands = Array("isom", "mp41", "mp42", "avc1")

  /** Parse top-level MP4 box structure: `ftyp` major brand, `mvhd`
    * timescale/duration (version 0; version-1 64-bit streams and
    * `size==1` largesize boxes are rejected cleanly, not mis-read), and
    * the `moov`'s `trak` child count. Every box length is bounds-checked
    * against its parent — an oversized or truncated box yields None, never
    * a throw. Header-only at any scale: the walk stops at `mdat` without
    * reading it, so cataloging 100 TB of video costs bytes-per-file, not
    * the corpus. */
  def parseMp4Meta(bytes: Array[Byte]): Option[(String, Long, Long, Int)] = {
    try {
      if (bytes == null || bytes.length < 16) return None
      def u32(p: Int): Long = {
        if (p < 0 || p + 4 > bytes.length) throw new IndexOutOfBoundsException
        (0 until 4).map(i => (bytes(p + 3 - i) & 0xffL) << (8 * i)).sum
      }
      def cc(p: Int): String = {
        if (p < 0 || p + 4 > bytes.length) throw new IndexOutOfBoundsException
        new String(bytes, p, 4, "US-ASCII")
      }
      var brand: Option[String] = None
      var timescale = -1L; var duration = -1L; var nTracks = 0
      var sawMoov = false
      var p = 0
      while (p + 8 <= bytes.length) {
        val size = u32(p); val typ = cc(p + 4)
        if (size < 8 || p + size > bytes.length) return None // largesize (1) / runaway
        typ match {
          case "ftyp" => brand = Some(cc(p + 8))
          case "moov" =>
            sawMoov = true
            var q = p + 8
            val lim = p + size.toInt
            while (q + 8 <= lim) {
              val cs = u32(q); val ct = cc(q + 4)
              if (cs < 8 || q + cs > lim) return None
              ct match {
                case "mvhd" =>
                  if ((bytes(q + 8) & 0xff) != 0) return None // version 1: 64-bit fields
                  timescale = u32(q + 20); duration = u32(q + 24)
                case "trak" => nTracks += 1
                case _ => ()
              }
              q += cs.toInt
            }
          case _ => () // mdat and friends: skipped, never read
        }
        p += size.toInt
      }
      if (brand.isEmpty || !sawMoov || timescale <= 0 || duration < 0) None
      else Some((brand.get, timescale, duration, nTracks))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Attach a synthesized MP4 payload (id-derived; `id % 19 == 0` plants
    * the oversized-moov corrupt branch). */
  def withMp4Payload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .map(id => (id, buildMp4(id, corrupt = id % 19 == 0)))
      .toDF(idCol, "payload")
  }

  /** Per-video container metadata frame — duration_ms is the integer
    * `duration·1000 div timescale`; corrupt/truncated containers null out. */
  def mp4Meta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseMp4Meta(bytes) match {
          case Some((brand, ts, dur, n)) =>
            (id, Option(brand), Option(ts), Option(dur), Option(dur * 1000L / ts), Option(n))
          case None =>
            (id, None: Option[String], None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Int])
        }
      })
      .toDF(idCol, "brand", "timescale", "duration_units", "duration_ms", "n_tracks")
  }

  /** Deterministic frame-sampling work queue: one row per frame to
    * extract — every `everyMs` milliseconds from 0 through the video's
    * duration, capped at `maxFrames` per video (`slice` of the generated
    * sequence: the cap is enforced INSIDE the row expression, before the
    * explode, so a 10-hour outlier can't blast rows). This is the
    * fan-out a frame-extraction fleet consumes; the decode step itself is
    * out of scope by mandate (no codec libs in this container) — the
    * Spark-side plumbing (schema, per-video bound, explode shape) is the
    * real, tested surface. Null-duration (corrupt) videos emit no work. */
  def frameSamplePlan(df: DataFrame, idCol: String, durationMsCol: String,
      everyMs: Long, maxFrames: Int): DataFrame = {
    require(everyMs > 0 && maxFrames > 0, "everyMs and maxFrames must be positive")
    df.filter(col(durationMsCol).isNotNull)
      .select(col(idCol),
        explode(expr(
          s"slice(sequence(0L, CAST(`$durationMsCol` AS BIGINT), ${everyMs}L), 1, $maxFrames)"))
          .as("ts_ms"))
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast("long"))
      .select(col(idCol), col("frame_idx"), col("ts_ms"))
  }

  // ---- audio containers: FLAC STREAMINFO, MP3 (ID3v2 + MPEG frame) -----

  /** Synthesized FLAC file head: `fLaC` magic, a STREAMINFO metadata
    * block (34 bytes, mandatory-first per the spec), for `id % 5 == 0` a
    * trailing PADDING block (so the block walk is exercised), then a few
    * fake frame bytes. Field packing follows the real bit layout:
    * 16+16 block sizes, 24+24 frame sizes, then 20 bits sample rate,
    * 3 bits channels−1, 5 bits bps−1, 36 bits total samples (one 8-byte
    * big-endian group), 16 MD5 bytes. `corrupt` flips the magic. */
  def buildFlac(id: Long, corrupt: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u(v: Long, bytes: Int): Unit = {
      var i = bytes - 1
      while (i >= 0) { out.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    out.write((if (corrupt) "fLaX" else "fLaC").getBytes("US-ASCII"))
    val sampleRate = 8000L * (1 + id % 6)
    val channels = 1 + (id % 2).toInt
    val bps = 16
    val totalSamples = sampleRate * (3 + id % 30) + id % 997
    val hasPadding = id % 5 == 0
    out.write(if (hasPadding) 0x00 else 0x80) // last-block flag | type 0
    u(34L, 3)
    u(4096L, 2); u(4096L, 2) // min/max block size
    u(0L, 3); u(0L, 3) // min/max frame size (unknown)
    // 20-bit rate | 3-bit channels-1 | 5-bit bps-1 | 36-bit total samples
    u((sampleRate << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | totalSamples, 8)
    (0 until 16).foreach(_ => out.write(0)) // md5 of raw audio (unset)
    if (hasPadding) { out.write(0x81); u(4L, 3); u(0L, 4) } // last PADDING
    out.write(Array[Byte](-1, -8, 0x69, 0x18)) // fake first frame bytes
    out.toByteArray
  }

  /** Parse a FLAC STREAMINFO header: magic, first-metadata-block check
    * (STREAMINFO is mandatory-first per the spec, so later blocks are
    * irrelevant to this catalog read and never touched), bit-unpack of
    * the rate/channels/bps/total-samples group. Returns (sample_rate,
    * channels, bits_per_sample, total_samples); malformed → None, never a
    * throw. Header-only: cataloging 100 TB of FLAC reads <100 bytes per
    * file. */
  def parseFlacMeta(bytes: Array[Byte]): Option[(Long, Int, Int, Long)] = {
    try {
      if (bytes == null || bytes.length < 42) return None
      if (new String(bytes, 0, 4, "US-ASCII") != "fLaC") return None
      // first metadata block must be STREAMINFO (type 0, length 34)
      val h = bytes(4) & 0xff
      if ((h & 0x7f) != 0) return None
      val len = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
      if (len != 34 || 8 + len > bytes.length) return None
      def u(p: Int, n: Int): Long =
        (0 until n).map(i => (bytes(p + i) & 0xffL) << (8 * (n - 1 - i))).sum
      val group = u(8 + 10, 8) // the packed 8-byte group after sizes
      val sampleRate = group >>> 44
      val channels = ((group >>> 41) & 0x7).toInt + 1
      val bps = ((group >>> 36) & 0x1f).toInt + 1
      val totalSamples = group & 0xfffffffffL
      if (sampleRate <= 0) return None
      Some((sampleRate, channels, bps, totalSamples))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Attach a synthesized FLAC payload (`id % 17 == 0` plants the
    * corrupt-magic branch). */
  def withFlacPayload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .map(id => (id, buildFlac(id, corrupt = id % 17 == 0)))
      .toDF(idCol, "payload")
  }

  /** Per-file FLAC catalog frame: sample rate, channels, bit depth, total
    * samples and integer duration_ms; malformed files null out. */
  def flacMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseFlacMeta(bytes) match {
          case Some((sr, ch, bits, ts)) =>
            (id, Option(sr), Option(ch), Option(bits), Option(ts),
              Option(ts * 1000L / sr))
          case None =>
            (id, None: Option[Long], None: Option[Int], None: Option[Int],
              None: Option[Long], None: Option[Long])
        }
      })
      .toDF(idCol, "sample_rate", "channels", "bits_per_sample",
        "total_samples", "duration_ms")
  }

  /** MPEG1 Layer III bitrate table (kbps), index 1-14 (0 = free, 15 =
    * bad) — ISO/IEC 11172-3 Table B.2. */
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3SampleRates = Array(44100, 48000, 32000)
  private val Mp3Modes = Array("stereo", "joint_stereo", "dual_channel", "mono")

  /** Synthesized MP3: ID3v2.3 tag header (10 bytes; 4-byte SYNCSAFE size
    * — 7 data bits per byte, the classic off-by-128 trap), `tagBytes` of
    * tag body, then an MPEG1 Layer III frame header (0xFFFB sync+flags,
    * bitrate/samplerate indices, channel mode) and `bodyBytes` of audio.
    * `corrupt` breaks the frame sync after a valid ID3 tag. */
  def buildMp3(id: Long, corrupt: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val tagBytes = (100 + id % 300).toInt
    w("ID3"); out.write(3); out.write(0); out.write(0) // v2.3, no flags
    out.write((tagBytes >> 21) & 0x7f); out.write((tagBytes >> 14) & 0x7f)
    out.write((tagBytes >> 7) & 0x7f); out.write(tagBytes & 0x7f)
    (0 until tagBytes).foreach(i => out.write((id + i).toInt & 0x7f))
    val brIdx = 1 + (id % 14).toInt
    val srIdx = (id % 3).toInt
    val mode = (id % 4).toInt
    out.write(0xff); out.write(if (corrupt) 0x12 else 0xfb) // sync + MPEG1 L3
    out.write((brIdx << 4) | (srIdx << 2))
    out.write(mode << 6)
    val bodyBytes = (417 + id % 1000).toInt
    (0 until bodyBytes).foreach(i => out.write((id * 7 + i).toInt & 0xff))
    out.toByteArray
  }

  /** Parse MP3 stream metadata: skip an optional ID3v2 tag (syncsafe
    * size), then decode the first MPEG1 Layer III frame header — bitrate
    * and sample rate via the standard tables, channel mode, and the
    * byte-count duration estimate `audio_bytes·8·1000 div bitrate_bps`
    * (exact for CBR streams; VBR needs a Xing header, out of scope and
    * documented). Returns (tag_bytes, bitrate_kbps, sample_rate, mode,
    * est_duration_ms); malformed → None. */
  def parseMp3Meta(bytes: Array[Byte]): Option[(Long, Int, Int, String, Long)] = {
    try {
      if (bytes == null || bytes.length < 4) return None
      var p = 0
      var tagBytes = 0L
      if (bytes.length >= 10 && new String(bytes, 0, 3, "US-ASCII") == "ID3") {
        if ((bytes(6) | bytes(7) | bytes(8) | bytes(9)) < 0) return None // syncsafe high bit set
        tagBytes = ((bytes(6) & 0x7fL) << 21) | ((bytes(7) & 0x7fL) << 14) |
          ((bytes(8) & 0x7fL) << 7) | (bytes(9) & 0x7fL)
        p = 10 + tagBytes.toInt
      }
      if (p + 4 > bytes.length) return None
      if ((bytes(p) & 0xff) != 0xff || (bytes(p + 1) & 0xfe) != 0xfa) return None // MPEG1 L3, CRC-less or protected
      val brIdx = (bytes(p + 2) & 0xf0) >> 4
      val srIdx = (bytes(p + 2) & 0x0c) >> 2
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      val mode = Mp3Modes((bytes(p + 3) & 0xc0) >> 6)
      val bitrate = Mp3Bitrates(brIdx)
      val audioBytes = bytes.length.toLong - p
      Some((tagBytes, bitrate, Mp3SampleRates(srIdx), mode,
        audioBytes * 8L * 1000L / (bitrate * 1000L)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Attach a synthesized MP3 payload (`id % 23 == 0` plants the
    * broken-sync corrupt branch). */
  def withMp3Payload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .map(id => (id, buildMp3(id, corrupt = id % 23 == 0)))
      .toDF(idCol, "payload")
  }

  /** Per-file MP3 catalog frame; malformed files null out. */
  def mp3Meta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseMp3Meta(bytes) match {
          case Some((tag, br, sr, mode, dur)) =>
            (id, Option(tag), Option(br), Option(sr), Option(mode), Option(dur))
          case None =>
            (id, None: Option[Long], None: Option[Int], None: Option[Int],
              None: Option[String], None: Option[Long])
        }
      })
      .toDF(idCol, "tag_bytes", "bitrate_kbps", "sample_rate", "channel_mode",
        "est_duration_ms")
  }
}
