package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.GQuery
import graft.GQuery.{oracled, rowsOnly}
import graft.sources.Tables

/** Multimodal-column plumbing (north-star set): media as opaque BINARY
  * payloads with typed metadata, processed partition-wise.
  *
  * The container ships no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (see [[DecodeStub]]) — but the
  * Spark-side plumbing is real: schema, binary payload handling,
  * partition-wise batch iteration (`mapPartitions` over a typed Dataset,
  * the Scala analogue of `mapInPandas` batches), and the feature-table
  * output shape a real decoder would produce. Swapping the stub for a
  * JNI/codec call changes one function, not the pipeline.
  */
object Multimodal {

  /** Typed media row: payload is an opaque blob; kind discriminates the
    * decoder; meta carries source-side hints (content type, declared
    * dims). At 100 TB payloads live in parquet binary columns exactly
    * like this.
    */
  final case class MediaBlob(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      declared_len: Long)

  /** Decoded feature row a real image/audio decoder would emit. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** ??? real decoder goes here ??? — the container has no image/audio
    * libraries, so this computes deterministic pseudo-features from the
    * payload bytes: checksum = polynomial byte fold, width/height/frames
    * derived from it. Signature and batch shape match a real decoder
    * (bytes in, fixed-schema features out, called per partition batch).
    */
  object DecodeStub {
    def decode(b: MediaBlob): MediaFeatures = {
      import graft.functions.RollingHash.{DefaultBase, DefaultMod}
      var h = 0L
      var i = 0
      while (i < b.payload.length) {
        h = (h * DefaultBase + (b.payload(i) & 0xff)) % DefaultMod
        i += 1
      }
      MediaFeatures(
        media_id = b.media_id,
        kind = b.kind,
        n_bytes = b.payload.length.toLong,
        checksum = h,
        width = (h % 1920).toInt + 1,
        height = (h % 1080).toInt + 1,
        n_frames = if (b.kind == "video") (h % 240).toInt + 1 else 1)
    }
  }

  /** Synthesize a media table from documents: payload = UTF-8 bytes of
    * the text (deterministic stand-in for real image/audio bytes), kind
    * assigned round-robin.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      col("n_chars").as("declared_len"))

  /** The partition-wise decode pipeline: typed Dataset → mapPartitions
    * (one stub-decoder instance per partition, amortized like a model
    * handle in a Pandas UDF) → feature DataFrame.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaBlob] = media.as[MediaBlob]
    ds.mapPartitions { it =>
      // per-partition setup happens here (codec init in a real decoder)
      it.map(DecodeStub.decode)
    }.toDF()
  }

  /** q52 — binary-column metadata extraction, pure column expressions
    * (octet length + md5 digest of the payload): the part of multimodal
    * processing that never needs a decoder, oracle-checked.
    */
  val q52 = oracled(
    "q52_multimodal_binary_meta",
    "opaque-binary payload metadata: byte length + md5 digest",
    """SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       ascii(substr(text, 1, 1)) AS first_byte
       FROM documents
       ORDER BY doc_id""") { (s, dir) =>
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("digest"),
        ascii(substring(col("text"), 1, 1)).as("first_byte"))
      .orderBy(col("doc_id"))
  }

  /** q53 — the full stub decode pipeline (rows-only: mapPartitions over
    * a typed Dataset is not SQL-expressible; MultimodalSpec asserts the
    * deterministic feature values instead).
    */
  val q53 = rowsOnly(
    "q53_multimodal_decode_stub",
    "partition-wise media decode (stub) -> per-kind feature aggregates") { (s, dir) =>
    decodeFeatures(mediaTable(s, dir))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("checksum")).as("n_distinct_payloads"),
        max(col("n_frames")).as("max_frames"))
      .orderBy(col("kind"))
  }

  /** q94 — video frame sampling: every video expands to one row per
    * sampled frame (stride 10 over its frame count), the row-explosion
    * shape real frame extraction produces — a generated per-key range,
    * NOT a join against a frames dimension, so it stays a single
    * narrow Generate at any corpus size. The stub's frame count is a
    * pure function of the payload's rolling-hash checksum
    * ([[DecodeStub]]: checksum % 240 + 1), which DuckDB replicates
    * exactly (same fold as q43), making the whole sampling pipeline
    * oracle-checked end to end — metadata → frame count → sampled
    * frame indices → timestamps at 25 fps.
    */
  val q94 = {
    import graft.functions.RollingHash
    oracled(
      "q94_frame_sample",
      "deterministic video frame sampling (stride 10) over stub frame counts",
      s"""WITH v AS (
           SELECT doc_id AS media_id, ${RollingHash.duckSql("text")} AS checksum
           FROM documents WHERE doc_id % 3 = 2),
         f AS (SELECT media_id, checksum % 240 + 1 AS n_frames FROM v)
         SELECT media_id, CAST(u.i AS BIGINT) AS frame_idx,
           CAST(u.i * 40 AS BIGINT) AS ts_ms
         FROM f, unnest(range(0, CAST(n_frames AS BIGINT), 10)) u(i)
         ORDER BY media_id, frame_idx""") { (s, dir) =>
      val nFrames = (RollingHash.rollingHash(col("text")) % 240L + 1L).as("n_frames")
      Tables.documents(s, dir)
        .filter(col("doc_id") % 3 === 2) // the kind = "video" slice of mediaTable
        .select(col("doc_id").as("media_id"), nFrames)
        .select(col("media_id"),
          explode(sequence(lit(0L), col("n_frames") - 1L, lit(10L))).as("frame_idx"))
        .select(col("media_id"), col("frame_idx"),
          (col("frame_idx") * 40L).as("ts_ms")) // 25 fps → 40 ms per frame
        .orderBy(col("media_id"), col("frame_idx"))
    }
  }

  /** q95 — thumbnail resize planning: for every image, the target
    * dimensions that fit a 256-px box preserving aspect ratio, plus the
    * upscale flag a real pipeline uses to skip degrading enlargements.
    * Pure integer metadata arithmetic (floor division) over the stub's
    * checksum-derived dimensions — the planning half of a resize
    * operator, which at 100 TB runs scan-side over the metadata columns
    * and feeds only the selected (media, target-dims) pairs to the
    * decode+scale executors. Bit-exact in DuckDB (integer `//` ==
    * Spark `DIV`), so oracle-checked end to end.
    */
  val q95 = {
    import graft.functions.RollingHash
    oracled(
      "q95_resize_plan",
      "aspect-preserving 256-box thumbnail planning over stub image dims",
      s"""WITH m AS (
           SELECT doc_id AS media_id, ${RollingHash.duckSql("text")} AS checksum
           FROM documents WHERE doc_id % 3 = 0),
         dims AS (
           SELECT media_id,
             checksum % 1920 + 1 AS width,
             checksum % 1080 + 1 AS height
           FROM m)
         SELECT media_id, width, height,
           CAST((width * 256) // GREATEST(width, height) AS BIGINT) AS out_w,
           CAST((height * 256) // GREATEST(width, height) AS BIGINT) AS out_h,
           GREATEST(width, height) < 256 AS upscale
         FROM dims
         ORDER BY media_id""") { (s, dir) =>
      val checksum = RollingHash.rollingHash(col("text"))
      Tables.documents(s, dir)
        .filter(col("doc_id") % 3 === 0) // the kind = "image" slice of mediaTable
        .select(col("doc_id").as("media_id"),
          (checksum % 1920L + 1L).as("width"),
          (checksum % 1080L + 1L).as("height"))
        .select(col("media_id"), col("width"), col("height"),
          expr("(width * 256) DIV greatest(width, height)").as("out_w"),
          expr("(height * 256) DIV greatest(width, height)").as("out_h"),
          (greatest(col("width"), col("height")) < 256L).as("upscale"))
        .orderBy(col("media_id"))
    }
  }

  val all: Seq[GQuery] = Seq(q52, q53, q94, q95)
}
