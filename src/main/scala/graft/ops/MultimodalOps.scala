package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Opaque asset payload: binary blob + typed metadata. */
case class Asset(asset_id: Long, fmt: String, payload: Array[Byte])

/** Extracted per-asset features (decode output schema). */
case class AssetFeatures(asset_id: Long, fmt: String, n_bytes: Long,
                         width: Int, height: Int, checksum: Long)

/** One sampled frame of a (video-like) asset. */
case class Frame(asset_id: Long, frame_idx: Int, payload: Array[Byte])

/** Multimodal-column operators (north-star tier): treat image/audio/video
  * as opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as batched per-partition functions over a typed
  * Dataset — the Scala analogue of `mapInPandas` batch UDFs.
  *
  * Two decode tiers:
  *  - REAL image decode/resize for PNG via the JDK's `javax.imageio`
  *    (`decodeImage` / `resizeImage` and the Dataset pipelines below):
  *    actual pixel decoding, oracle-checked end-to-end in
  *    `q_multimodal_decode` against closed-form dimensions and a planted
  *    pixel value.
  *  - A STUB path (`decodeStub`/`resizeStub`) for codecs the JDK does not
  *    ship (jpg/wav/video): deterministic fakes that keep the
  *    Dataset[Asset] → Dataset[AssetFeatures] partition-batched plumbing
  *    testable; a production codec (e.g. ffmpeg bindings) replaces only
  *    the function body.
  *
  * At 100 TB decode/resize is pure map-side work (no shuffle); only the
  * final aggregates exchange data.
  */
object MultimodalOps {

  // Raster-only AWT use works without a display; pinned for safety.
  System.setProperty("java.awt.headless", "true")

  /** Derive a deterministic asset table from `documents`: the text bytes
    * stand in for an encoded media payload; the format tag cycles by id.
    */
  def assets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("asset_id"),
      element_at(array(lit("png"), lit("jpg"), lit("wav")),
        (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      col("text").cast("binary").as("payload"))

  /** STUB decoder — deterministic fake in lieu of a real codec.
    * A production build replaces only the body (e.g. javax.imageio /
    * ffmpeg bindings); signature and batch shape stay identical.
    */
  def decodeStub(a: Asset): AssetFeatures = {
    val n = a.payload.length.toLong
    // Fake dimensions derived from leading payload bytes; checksum is a
    // cheap rolling byte hash — all reproducible from the blob alone.
    val b0 = if (n > 0) a.payload(0) & 0xff else 0
    val b1 = if (n > 1) a.payload(1) & 0xff else 0
    val sum = a.payload.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
    AssetFeatures(a.asset_id, a.fmt, n, 16 + b0 % 64, 16 + b1 % 64, sum)
  }

  /** Batched decode over partitions: one decoder instance per partition
    * (where a real codec would allocate its native context once), then a
    * per-record map — the mapInPandas batch pattern, typed.
    */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition setup hook for a real codec would go here
      it.map(decodeStub)
    }
  }

  /** STUB resize — deterministic byte downsample standing in for an image
    * rescale: keep every stride-th payload byte until `targetBytes`. A
    * production build swaps the body for a real rescaler; the typed
    * map-partition shape (pure map-side, no shuffle) is unchanged.
    */
  def resizeStub(a: Asset, targetBytes: Int): Asset = {
    val n = a.payload.length
    if (n <= targetBytes) a
    else {
      val stride = math.max(1, n / targetBytes)
      val out = a.payload.indices.collect {
        case i if i % stride == 0 => a.payload(i)
      }.take(targetBytes).toArray
      Asset(a.asset_id, a.fmt, out)
    }
  }

  def resize(assets: Dataset[Asset], targetBytes: Int = 256): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(it => it.map(resizeStub(_, targetBytes)))
  }

  /** STUB frame sampler — fixed-size payload chunks stand in for video
    * frames; every `everyNth` chunk is emitted. The 1→N typed flatMap is
    * the real distributed shape (map-side fan-out, no shuffle); a real
    * demuxer slots into the chunking. Deterministic from the blob alone,
    * so the aggregate over its output is oracle-checkable in closed form.
    */
  def frameSampleStub(a: Asset, chunkBytes: Int, everyNth: Int): Iterator[Frame] =
    a.payload.grouped(chunkBytes).zipWithIndex
      .filter(_._2 % everyNth == 0)
      .map { case (bytes, i) => Frame(a.asset_id, i, bytes) }

  def frameSample(assets: Dataset[Asset], chunkBytes: Int = 256,
                  everyNth: Int = 2): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.flatMap(frameSampleStub(_, chunkBytes, everyNth))
  }

  /** Per-asset aggregate over the sampled frames: the q_frame_sample
    * query surface — the typed flatMap pipeline feeding a relational
    * aggregation, verified against a closed-form SQL oracle.
    */
  def frameSampleStats(docs: DataFrame, chunkBytes: Int = 256,
                       everyNth: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    frameSample(assets(docs).as[Asset], chunkBytes, everyNth)
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(octet_length(col("payload"))).cast("long").as("sampled_bytes"))
  }

  // ---- real PNG decode tier (javax.imageio, JDK-native) ----

  /** Deterministic synthetic PNG payload for a doc id: a REAL PNG
    * encoding of a w×h 8-bit grayscale image with w = 1 + id mod 16,
    * h = 1 + (id div 16) mod 16, pixel (0,0) = id mod 256 and a
    * deterministic gradient elsewhere. Gray-8 PNG round-trips pixels
    * losslessly, so decoded dimensions AND the planted pixel are
    * closed-form functions of the id — which is what makes the decode
    * tier oracle-checkable without shipping image fixtures.
    */
  def syntheticPng(docId: Long): Array[Byte] = {
    val w = 1 + (docId % 16).toInt
    val h = 1 + ((docId / 16) % 16).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      raster.setSample(x, y, 0, ((docId + x * 31L + y * 7L) % 256).toInt)
    raster.setSample(0, 0, 0, (docId % 256).toInt)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Asset table with real PNG payloads, one per document id. */
  def pngAssets(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select("doc_id").as[Long]
      .mapPartitions(_.map(id => Asset(id, "png", syntheticPng(id))))
  }

  /** Parse a payload with javax.imageio, failing loudly on an
    * undecodable blob (a silent null would turn a corrupt-blob bug into
    * wrong aggregates downstream).
    */
  private def readImg(a: Asset): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(a.payload))
    require(img != null, s"asset ${a.asset_id}: undecodable ${a.fmt} payload")
    img
  }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Downscale to (max(1, w div factor), max(1, h div factor)) via an
    * AWT raster draw — output dimensions exact by construction.
    */
  private def resizeRaster(img: java.awt.image.BufferedImage,
                           factor: Int): java.awt.image.BufferedImage = {
    val tw = math.max(1, img.getWidth / factor)
    val th = math.max(1, img.getHeight / factor)
    val out = new java.awt.image.BufferedImage(
      tw, th, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = out.createGraphics()
    g.drawImage(img, 0, 0, tw, th, null)
    g.dispose()
    out
  }

  private def features(a: Asset,
                       img: java.awt.image.BufferedImage): AssetFeatures =
    AssetFeatures(a.asset_id, a.fmt, a.payload.length.toLong,
      img.getWidth, img.getHeight, img.getRaster.getSample(0, 0, 0).toLong)

  /** REAL image decode: actual width/height and the (0,0) pixel sample
    * as the checksum.
    */
  def decodeImage(a: Asset): AssetFeatures = features(a, readImg(a))

  /** Batched real decode — same partition-batched shape as
    * decodeFeatures, with an actual codec in the body.
    */
  def decodeImages(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decodeImage))
  }

  /** REAL image resize: decode, downscale, re-encode as PNG. The output
    * dimensions are exact by construction (the target raster is
    * allocated at the computed size), so a decode-after-resize is
    * closed-form checkable.
    */
  def resizeImage(a: Asset, factor: Int = 2): Asset =
    Asset(a.asset_id, a.fmt, encodePng(resizeRaster(readImg(a), factor)))

  def resizeImages(assets: Dataset[Asset], factor: Int = 2): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(resizeImage(_, factor)))
  }

  /** The q_multimodal_decode query surface: synthesize real PNGs, run the
    * real decode AND the real resize→decode pipeline in one map-side
    * pass, aggregate dimensions + the planted (0,0) pixel. Every output
    * is a closed-form function of doc_id, so the DuckDB oracle verifies
    * that actual image decoding — not header arithmetic — produced the
    * numbers. One aggregation exchange; decode work never shuffles.
    */
  def decodeResizeStats(docs: DataFrame, factor: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    pngAssets(docs).mapPartitions { it =>
      it.map { a =>
        // decode once, resize from the already-decoded raster, and
        // re-decode only the resized PNG (the re-encode evidence)
        val img = readImg(a)
        val f = features(a, img)
        val r = decodeImage(
          Asset(a.asset_id, a.fmt, encodePng(resizeRaster(img, factor))))
        (a.asset_id, f.width.toLong, f.height.toLong, f.checksum,
          r.width.toLong, r.height.toLong)
      }
    }.toDF("asset_id", "width", "height", "px00", "rwidth", "rheight")
      .agg(count(lit(1)).as("n_assets"),
        sum("width").as("sum_width"), sum("height").as("sum_height"),
        sum("px00").as("sum_px00"),
        sum("rwidth").as("sum_rwidth"), sum("rheight").as("sum_rheight"))
  }

  /** Oracle-checkable aggregate over the binary surface: per-format asset
    * counts and payload byte totals (octet_length semantics in both
    * engines). Exercises binary casting + metadata without the stub.
    */
  def assetStats(docs: DataFrame): DataFrame =
    assets(docs)
      .select(col("fmt"), octet_length(col("payload")).cast("long").as("nb"))
      .groupBy("fmt")
      .agg(count(lit(1)).as("n_assets"), sum("nb").as("total_bytes"),
        (sum("nb").cast("double") / count(lit(1))).as("avg_bytes"))
}
