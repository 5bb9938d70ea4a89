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
  * The decode step is a STUB: no image/audio codecs exist in this
  * environment, so `decodeStub` computes deterministic fake dimensions
  * from the payload bytes. Everything around it — the binary schema, the
  * Dataset[Asset] → Dataset[AssetFeatures] partition-batched pipeline, the
  * aggregation — is real Spark plumbing that a production codec would slot
  * into without changing any plan shape. At 100 TB the decode is pure
  * map-side work (no shuffle); only the final per-format aggregate
  * exchanges data.
  */
object MultimodalOps {

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
