package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (driver north star): image/audio/video as opaque
  * `BINARY` columns with typed metadata, plus the decode / feature-extract
  * plumbing a training-data pipeline needs.
  *
  * The actual media decode is STUBBED (no codec libraries in this build —
  * `FakeDecoder` derives deterministic pseudo-features from the bytes via
  * xxHash-style mixing); everything Spark-side is real and tested: the
  * schema, the per-partition batch iteration (decoder init amortized once
  * per partition, the mapInPandas-batch analogue for a JVM pipeline), the
  * row shape, and the partitioning strategy.
  *
  * Scale notes: assets are large blobs — never groupBy/shuffle the binary
  * column; extract features first (narrow map), then drop the bytes before
  * any wide transform. Feature extraction is CPU-bound and embarrassingly
  * parallel: `repartition(n)` upstream controls decode parallelism without
  * touching the shuffle of later relational stages.
  */
object Multimodal {

  /** Typed asset row: media kind + opaque payload + sidecar metadata. */
  case class Asset(asset_id: Long, kind: String, bytes: Array[Byte],
      meta_width: Int, meta_height: Int)

  /** Extracted features: fixed-dim embedding + summary stats. */
  case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Int,
      digest: Long, embedding: Array[Float])

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("kind", StringType),
    StructField("bytes", BinaryType),
    StructField("meta_width", IntegerType),
    StructField("meta_height", IntegerType)))

  /** STUB decoder — stands in for an image/audio codec. Deterministic:
    * features are a hash-mix of the payload, so tests are reproducible.
    * A real deployment swaps `decode` for the codec call; the pipeline
    * around it is unchanged. */
  object FakeDecoder {
    val dim = 16
    def decode(bytes: Array[Byte]): Array[Float] = {
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < bytes.length) { h = (h ^ bytes(i)) * 0xC2B2AE3D27D4EB4FL; i += 1 }
      val out = new Array[Float](dim)
      var j = 0
      var s = h
      while (j < dim) {
        s = s * 6364136223846793005L + 1442695040888963407L
        out(j) = ((s >>> 40).toInt / 16777216.0f) - 0.5f
        j += 1
      }
      out
    }
    def digest(bytes: Array[Byte]): Long = {
      var h = 0xCBF29CE484222325L
      var i = 0
      while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001B3L; i += 1 }
      h
    }
  }

  /** Per-partition batch feature extraction: the decoder is initialized
    * once per partition (the expensive step for real codecs), then applied
    * row-by-row — the JVM analogue of a mapInPandas batch UDF. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real pipeline: val codec = Codec.open() — once per partition
      it.map { a =>
        AssetFeatures(a.asset_id, a.kind, a.bytes.length,
          FakeDecoder.digest(a.bytes), FakeDecoder.decode(a.bytes))
      }
    }
  }

  /** Resized asset row: payload + TRUE decoded source dimensions (−1 when
    * the payload wasn't a decodable image and the stub path ran). */
  case class ResizedAsset(asset_id: Long, kind: String, bytes: Array[Byte],
      decoded: Boolean, orig_width: Int, orig_height: Int,
      meta_width: Int, meta_height: Int)

  /** Deterministic PNG fixture generator: a real, decodable `width`×`height`
    * RGB PNG whose pixels come from an LCG over `seed` — so the REAL
    * decode path below can be exercised reproducibly without media
    * libraries or binary fixtures in the repo. */
  def renderPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    // ImageIO defaults to a DISK-backed stream cache — a temp file per
    // encode/decode call, which dominates small-image cost (measured ~4×
    // on the resize query); byte-array streams need no cache at all
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed * 6364136223846793005L + 1442695040888963407L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        s = s * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((s >>> 40) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Swap image-kind payloads for real rendered PNGs (dimensions derived
    * from the asset id, kept small so decode cost stays bounded) — the
    * fixture step that lets [[resizeImages]] run a true decode over the
    * driver's documents table. Per-partition batch pass like the rest. */
  def withRenderedImages(assets: Dataset[Asset]): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.kind != "image") a
        else {
          val w = (a.asset_id % 64 + 8).toInt
          val h = (a.asset_id % 48 + 8).toInt
          a.copy(bytes = renderPng(w, h, a.asset_id), meta_width = w, meta_height = h)
        }
      }
    }
  }

  /** REAL image decode + resize via `javax.imageio` (pure JVM — replaces
    * the round-3 stub scaler for decodable payloads): decode the bytes,
    * report the TRUE source dimensions, scale into (width, height) with
    * bilinear interpolation, re-encode as PNG. Non-decodable payloads
    * (audio/video kinds, junk bytes) fall back to the deterministic stub
    * so the operator stays total over mixed corpora. Same per-partition
    * batch shape as [[extractFeatures]] — the codec/graphics pipeline
    * initializes once per partition, rows stream through it; decode
    * parallelism is the upstream partition count, untouched by any later
    * shuffle. */
  def resizeImages(assets: Dataset[Asset], width: Int, height: Int): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init (the real-codec slot): disable the
      // disk-backed ImageIO stream cache once — byte-array streams only
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.bytes))
          catch { case _: Exception => null }
        if (img == null) {
          val stub = stubResizeBytes(a, width, height)
          ResizedAsset(a.asset_id, a.kind, stub, decoded = false, -1, -1, width, height)
        } else {
          val out = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, width, height, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          ResizedAsset(a.asset_id, a.kind, bos.toByteArray, decoded = true,
            img.getWidth, img.getHeight, width, height)
        }
      }
    }
  }

  private def stubResizeBytes(a: Asset, width: Int, height: Int): Array[Byte] = {
    val h = FakeDecoder.digest(a.bytes) ^ (width.toLong << 32 | height.toLong)
    val out = new Array[Byte](math.max(1, math.min(a.bytes.length, width * height / 64)))
    var s = h
    var i = 0
    while (i < out.length) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 56).toByte
      i += 1
    }
    out
  }

  /** STUB resize (real pipeline: codec scale) — kept as the cross-check /
    * non-media path; [[resizeImages]] is the real-decode form. The
    * deterministic fake derives the resized payload from (bytes, w, h) so
    * tests are reproducible; metadata is updated for real. Runs in the
    * same per-partition batch pass as feature extraction. */
  def resize(assets: Dataset[Asset], width: Int, height: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real pipeline: val scaler = Codec.openScaler(width, height)
      it.map(a => a.copy(bytes = stubResizeBytes(a, width, height),
        meta_width = width, meta_height = height))
    }
  }

  /** Frame sampling for video-kind assets: every `stride`-th frame index
    * up to `maxFrames` — pure relational expansion (no decode), the
    * planning step before a distributed frame-decode pass. */
  def sampleFrameIndices(assets: DataFrame, nFramesCol: String, stride: Int,
      maxFrames: Int): DataFrame =
    assets.withColumn("frame_idx",
        explode(slice(sequence(lit(0), col(nFramesCol) - 1, lit(stride)), 1, maxFrames)))

  /** 64-bit average-hash (aHash) perceptual fingerprint over a DECODED
    * image: real `javax.imageio` decode, bilinear scale to 8×8,
    * ITU-R 601 luma per cell, one bit per cell thresholded against the
    * mean (integer luma sums — no float anywhere). None for
    * non-decodable payloads. The simplest member of the
    * pHash/dHash/aHash family; identical bytes always hash equal, and
    * near-identical renders (resize, mild recompress) agree on most
    * bits — the standard image-dedup prefilter. */
  def aHash(bytes: Array[Byte]): Option[Long] = {
    javax.imageio.ImageIO.setUseCache(false)
    val decoded =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    decoded.map { im =>
      val small = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(im, 0, 0, 8, 8, null)
      g.dispose()
      val lum = new Array[Long](64)
      var i = 0
      while (i < 64) {
        val rgb = small.getRGB(i % 8, i / 8)
        lum(i) = ((rgb >> 16) & 0xFF) * 299L + ((rgb >> 8) & 0xFF) * 587L +
          (rgb & 0xFF) * 114L
        i += 1
      }
      val mean = lum.sum / 64
      lum.zipWithIndex.foldLeft(0L) { case (acc, (v, j)) =>
        if (v > mean) acc | (1L << j) else acc
      }
    }
  }

  /** DCT perceptual hash (pHash): decode → 32×32 bilinear luma →
    * separable 2-D DCT-II → the 8×8 low-frequency block minus the DC
    * term → median threshold → 64-bit hash. Where [[aHash]] thresholds
    * raw pixels against their mean (sensitive to local noise), pHash
    * keys on the image's coarse SPECTRUM — the standard
    * recompression-robust fingerprint (the pHash/dHash/aHash family's
    * strongest member). Pure java.lang.Math double arithmetic on the
    * decoded pixels — deterministic for identical bytes, which is all
    * the planted-class gate needs. */
  def pHash(bytes: Array[Byte]): Option[Long] = {
    javax.imageio.ImageIO.setUseCache(false)
    val decoded =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    decoded.map { im =>
      val n = 32
      val small = new java.awt.image.BufferedImage(n, n,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(im, 0, 0, n, n, null)
      g.dispose()
      val lum = Array.ofDim[Double](n, n)
      var y = 0
      while (y < n) {
        var x = 0
        while (x < n) {
          val rgb = small.getRGB(x, y)
          lum(y)(x) = ((rgb >> 16) & 0xFF) * 0.299 +
            ((rgb >> 8) & 0xFF) * 0.587 + (rgb & 0xFF) * 0.114
          x += 1
        }
        y += 1
      }
      // separable DCT-II: rows then columns, only the first 8 outputs
      // of the second pass are needed
      val rows = Array.ofDim[Double](n, 8)
      var r = 0
      while (r < n) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var x = 0
          while (x < n) {
            s += lum(r)(x) * math.cos((2 * x + 1) * u * math.Pi / (2.0 * n))
            x += 1
          }
          rows(r)(u) = s
          u += 1
        }
        r += 1
      }
      val coef = new Array[Double](64)
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var yy = 0
          while (yy < n) {
            s += rows(yy)(u) * math.cos((2 * yy + 1) * v * math.Pi / (2.0 * n))
            yy += 1
          }
          coef(v * 8 + u) = s
          u += 1
        }
        v += 1
      }
      val ac = coef.drop(1) // DC term carries brightness, not structure
      val med = ac.sorted.apply(31)
      ac.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
        if (c > med) acc | (1L << i) else acc
      }
    }
  }

  /** Perceptual image dedup: decode → [[aHash]] → hash-group, keeping the
    * smallest asset id per group — duplicate-GROUP report (groups of
    * ≥ 2). The decode+hash is one narrow per-partition pass over image
    * assets (bytes never shuffle — only the 8-byte hash and the id cross
    * the exchange); the group election is a single map-side-combined
    * aggregate. */
  def perceptualDedup(assets: Dataset[Asset]): DataFrame =
    perceptualDedupBy(assets, aHash)

  /** [[perceptualDedup]] parameterized by the hash family — shared by
    * the aHash default and the [[pHash]] variant; same narrow
    * decode+hash pass and map-side-combined group election. */
  def perceptualDedupBy(assets: Dataset[Asset],
      hasher: Array[Byte] => Option[Long]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image")
      .mapPartitions { it =>
        it.flatMap(a => hasher(a.bytes).map(h => (a.asset_id, h)))
      }.toDF("asset_id", "hash") // family-neutral: the hasher may be aHash OR pHash
      .groupBy("hash")
      .agg(min("asset_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") >= 2)
      .select("keep_id", "n_dups")
  }

  /** Build an asset table from the documents fixture (text bytes stand in
    * for media payloads — same plumbing, deterministic content). */
  def assetsFromDocuments(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("bytes"),
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("meta_width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("meta_height"))
      .as[Asset]
  }
}
