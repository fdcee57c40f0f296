package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY §2 C14–C15): image/audio/video
  * payloads are opaque `binary` columns with typed metadata alongside.
  * The container has no media codecs, so the DECODE step is a
  * clearly-marked deterministic stub — but the Spark-side plumbing
  * (schema, binary encoding, typed Dataset, mapPartitions batch shape,
  * partition-parallel feature extraction) is real and tested.
  */
object Multimodal {

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
      doc_id: Long, n_bytes: Int,
      features: Array[Double], frame_sample: Array[Int])

  /** STUB decode: a real pipeline would call an image/audio codec here
    * (libs absent in this container). This deterministic fake folds the
    * payload bytes into an 8-bin histogram-ish feature vector and
    * "samples frames" as the first 4 byte values, preserving the exact
    * batch shape (bytes in → fixed-dim float features out) a decoder
    * would have. Bins accumulate as exact INTEGER byte sums (order-free
    * by construction); each feature is then one fixed IEEE sequence
    * (sum/255.0/n) the SQL oracle restates operation-for-operation —
    * summing pre-divided doubles instead was the merge-order ulp drift
    * the round-3 oracle caught.
    */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val sums = new Array[Long](8)
    var i = 0
    while (i < r.payload.length) {
      sums(i % 8) += (r.payload(i) & 0xff)
      i += 1
    }
    val n = math.max(r.payload.length, 1)
    MediaFeatures(
      r.doc_id, r.payload.length,
      sums.map(s => s.toDouble / 255.0 / n),
      r.payload.take(4).map(b => (b & 0xff): Int))
  }

  /** C15: partition-parallel feature extraction over binary payloads —
    * the `mapPartitions` shape a real decoder (batched, per-executor
    * codec init) would use. Narrow, no shuffle; scales with executors.
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
      .mapPartitions(it => it.map(decodeStub))(Encoders.product[MediaFeatures])
      .toDF()
    // get() is 0-based and null-on-missing (a <4-byte payload yields a
    // short frame_sample) — element_at would throw under ANSI mode.
    // Feature cells round to 6 dp and fix as decimal (the ln-pattern
    // from q_unigram_logprob) so the byte-sum arithmetic compares
    // exactly against the SQL oracle restating it.
    // 6dp-fix, then emit as DOUBLE (exact cast): decimal finals hash
    // differently in the driver's canonicalization — every driver-green
    // face ends in double/int finals.
    val featCols = (0 until 8).map(i =>
      round(get(col("features"), lit(i)), 6).cast("decimal(18,6)")
        .cast("double").as(s"f$i"))
    val frameCols = (0 until 4).map(i =>
      get(col("frame_sample"), lit(i)).as(s"frame$i"))
    feats.select(col("doc_id") +: col("n_bytes") +: (featCols ++ frameCols): _*)
  }

  /** Oracle restating [[decodeStub]]'s byte arithmetic in SQL: payload
    * = UTF-8 text bytes (ASCII in the test corpus, so byte i ==
    * character i), 8 stride-binned exact integer byte sums, then the
    * identical /255.0/n double sequence, first-4-byte frame sample.
    */
  val multimodalFeaturesSql: String = {
    val fCols = (0 until 8).map(j =>
      s"    CAST(CAST(round(CAST(COALESCE(SUM(CASE WHEN j = $j THEN b END), 0) AS DOUBLE) / 255.0 / n_bytes, 6) AS DECIMAL(18,6)) AS DOUBLE) AS f$j")
      .mkString(",\n")
    val frames = (0 until 4).map(j =>
      s"  CASE WHEN length(d.text) >= ${j + 1} THEN ascii(substr(d.text, ${j + 1}, 1)) END AS frame$j")
      .mkString(",\n")
    s"""WITH t AS (
       |  SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       |    (i - 1) % 8 AS j,
       |    ascii(substr(text, CAST(i AS INTEGER), 1)) AS b
       |  FROM documents, unnest(range(1, length(text) + 1)) AS u(i)),
       |f AS (
       |  SELECT doc_id, n_bytes,
       |$fCols
       |  FROM t GROUP BY doc_id, n_bytes)
       |SELECT f.doc_id, f.n_bytes, f0, f1, f2, f3, f4, f5, f6, f7,
       |$frames
       |FROM f JOIN documents d USING (doc_id)""".stripMargin
  }

  /** STUB resize: stride-sample the payload down to ≤16 bytes — a real
    * pipeline would decode and bilinear-resize; what's preserved is the
    * binary→binary per-partition batch shape and determinism.
    */
  private[operators] def resizeStub(payload: Array[Byte], target: Int = 16): Array[Byte] =
    if (payload.length <= target) payload
    else {
      val out = new Array[Byte](target)
      val stride = payload.length.toDouble / target
      var i = 0
      while (i < target) { out(i) = payload((i * stride).toInt); i += 1 }
      out
    }

  final case class Thumb(doc_id: Long, n_bytes_in: Int, thumb: Array[Byte])

  /** C15b (library+test): resize/thumbnail plumbing — binary in, fixed
    * small binary out, partition-parallel, no shuffle. Emitted as
    * (id, input size, thumb bytes); downstream can fingerprint or
    * re-encode.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as(Encoders.product[MediaRow])
      .mapPartitions(it => it.map(r =>
        Thumb(r.doc_id, r.payload.length, resizeStub(r.payload))))(
        Encoders.product[Thumb])
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
