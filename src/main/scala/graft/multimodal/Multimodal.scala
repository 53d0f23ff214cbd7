package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables.table

/** Multimodal column handling: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract plumbing a
  * training-data pipeline needs.
  *
  * The container has no image/audio codecs, so [[StubCodecs]] provides a
  * clearly-marked deterministic fake decoder; everything Spark-side — the
  * media schema, partition-friendly batched `mapPartitions` decode, metadata
  * extraction expressions — is real and tested. Swap `StubCodecs.decodeImage`
  * for a JNI/javacv call and nothing else changes.
  */
object Multimodal {

  /** Canonical media-asset schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("checksum", StringType),
      StructField("format", StringType))), nullable = true)))

  /** Deterministic fake codecs — stand-ins for real decoders (absent in this
    * container). Deterministic in payload bytes so tests and oracles hold. */
  object StubCodecs {
    /** STUB: a real implementation would parse the image header; this derives
      * plausible dimensions deterministically from the byte length. */
    def decodeImage(payload: Array[Byte]): (Int, Int, String) = {
      val n = if (payload == null) 0 else payload.length
      (n % 640 + 1, (n * 7) % 480 + 1, Seq("jpeg", "png", "webp")(n % 3))
    }

    /** STUB: frame-sample count for a fake video payload. */
    def sampleFrames(payload: Array[Byte], everyN: Int): Int = {
      val n = if (payload == null) 0 else payload.length
      n / math.max(everyN, 1)
    }

    /** STUB: a real implementation would decode + bilinear-resample; this
      * "resize" emits the target dims and a deterministically-bounded
      * payload size (min(orig, 3 bytes/px budget / 64)). */
    def resizeImage(payload: Array[Byte], w: Int, h: Int): (Int, Int, Long) = {
      val n = if (payload == null) 0L else payload.length.toLong
      (w, h, math.min(n, (w.toLong * h * 3) / 64))
    }

    /** STUB feature extractor: a real one would run a vision/audio encoder;
      * this derives an 8-dim descriptor from byte statistics (length, mean,
      * min, max, and 4 quarter-sums) — deterministic in the payload, so the
      * spec can recompute it exactly. */
    def extractFeatures(payload: Array[Byte]): Array[Double] = {
      if (payload == null || payload.isEmpty) return Array.fill(8)(0.0)
      val n = payload.length
      var sum = 0L
      var mn = 255
      var mx = 0
      val quarters = new Array[Long](4)
      var i = 0
      while (i < n) {
        val b = payload(i) & 0xff
        sum += b
        if (b < mn) mn = b
        if (b > mx) mx = b
        quarters(i * 4 / n) += b
        i += 1
      }
      Array(n.toDouble, sum.toDouble / n, mn.toDouble, mx.toDouble,
        quarters(0).toDouble, quarters(1).toDouble, quarters(2).toDouble, quarters(3).toDouble)
    }
  }

  /** Synthesize a media table from documents (payload = utf-8 bytes of text).
    * In production this is `spark.read.format("binaryFile")` or a parquet
    * table with a binary column. */
  def mediaFromDocuments(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      col("doc_id").as("asset_id"),
      expr("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("media_type"),
      col("text").cast(BinaryType).as("payload"))

  /** Columnar metadata extraction — no decode needed, stays in codegen. */
  def withMeta(df: DataFrame): DataFrame =
    df.withColumn("meta", struct(
      length(col("payload")).cast(LongType).as("n_bytes"),
      md5(col("payload")).as("checksum"),
      expr("CASE CAST(length(payload) % 3 AS INT) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END")
        .as("format")))

  /** Batched decode via mapPartitions over the binary column: the row shape
    * a Pandas-UDF/`mapInPandas` equivalent would see. Partition-local, no
    * shuffle; decoder failures yield null dims instead of failing the task. */
  def decodeImages(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (w, h, fmt) = try StubCodecs.decodeImage(payload)
          catch { case _: Exception => (-1, -1, "error") }
          (id, w, h, fmt)
        }
      }
      .toDF("asset_id", "width", "height", "format_decoded")
    df.join(out, Seq("asset_id"))
  }

  /** Frame sampling for video assets through the same partition-local
    * batched plumbing as [[decodeImages]] — the `mapInPandas` row shape. */
  def sampleVideoFrames(df: DataFrame, everyN: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("media_type") === "video")
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val n = try StubCodecs.sampleFrames(payload, everyN)
          catch { case _: Exception => -1 }
          (id, n)
        }
      }
      .toDF("asset_id", "n_frames")
  }

  /** Stub resize through the batched partition-local plumbing. */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col("media_type") === "image")
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (rw, rh, nb) = try StubCodecs.resizeImage(payload, w, h)
          catch { case _: Exception => (-1, -1, -1L) }
          (id, rw, rh, nb)
        }
      }
      .toDF("asset_id", "width", "height", "resized_bytes")
  }

  /** Stub feature extraction (the media→embedding bridge): each asset gets
    * a fixed-width double vector, the shape the similarity operators
    * (ss01–ss08) consume — media in, ANN-ready vectors out. */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val f = try StubCodecs.extractFeatures(payload)
          catch { case _: Exception => Array.fill(8)(-1.0) }
          (id, f)
        }
      }
      .toDF("asset_id", "features")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Stub resize through the real batched plumbing. The stub's size
    // arithmetic is SQL-expressible, so the whole path is oracle-checked.
    "mm04_resize" -> ((s, dir) => {
      resizeImages(mediaFromDocuments(s, dir), 224, 224).orderBy("asset_id")
    }),

    // Media → fixed-width feature descriptor (the embedding bridge into the
    // ss* ANN operators). Rows-only (byte loop isn't SQL); MultimodalSpec
    // recomputes the descriptor exactly. The gate surface emits the 8
    // components as scalar columns f0..f7 — a raw array<double> column is
    // unsortable/unhashable by the driver's rows-only checker (r3's one red
    // row); the array-returning extractFeatures stays for the ss* bridge.
    "mm05_features" -> ((s, dir) => {
      val feats = extractFeatures(mediaFromDocuments(s, dir))
      val scalars = (0 until 8).map(i => col("features")(i).as(s"f$i"))
      feats.select((col("asset_id") +: scalars): _*).orderBy("asset_id")
    }),
    // The media→ANN composition a real multimodal pipeline runs end to
    // end: payload → feature descriptor (extractFeatures' mapPartitions
    // decode bridge) → hyperplane-LSH bucket → exact-cosine top-k over
    // bucket-mates only (ss02's machinery, on mm05's vectors instead of
    // the embeddings table). Candidates come from an equi-join on the
    // bucket — cost scales with Σ bucket², never |Q|·N — and the planes
    // are deterministic (xxhash64-seeded), so the result is rows-only
    // deterministic; MultimodalSpec asserts recall vs brute-force cosine
    // over the same feature vectors (ss08's playbook).
    "mm06_feature_ann" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.SketchExprs
      val planes = 4 // 8-dim descriptors; 2^4 buckets keeps gate-scale occupancy sane
      // cache: BOTH sides of the bucket join derive from this frame, and
      // the decode (mapPartitions) sits BELOW each side's first exchange,
      // so ReusedExchange cannot share it (the dd05 boundary of the dd06
      // rule) — uncached, the payload scan + feature decode runs twice
      // per action, and in a real media pipeline the decode dominates.
      val e = graft.Caches.track(extractFeatures(mediaFromDocuments(s, dir))
        .withColumn("nrm", SketchExprs.l2Norm(col("features")))
        .filter(col("nrm") > 0) // zero vector has no direction: excluded as query AND corpus
        .withColumn("bucket", SketchExprs.hyperplaneLsh(col("features"), planes)))
      val q = e.filter(col("asset_id") < 5)
        .select(col("asset_id").as("query_id"), col("features").as("qv"),
          col("nrm").as("qnrm"), col("bucket"))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("asset_id"))
      q.join(e, Seq("bucket"))
        .filter(col("asset_id") =!= col("query_id"))
        .withColumn("cos",
          SketchExprs.dotProduct(col("qv"), col("features")) / (col("qnrm") * col("nrm")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("query_id"), col("asset_id").as("neighbor_id"), col("rk"), col("cos"))
        .orderBy("query_id", "rk")
    }),

    // Binary payload + columnar metadata (bytes, checksum, format tag).
    "mm01_media_meta" -> ((s, dir) => {
      withMeta(mediaFromDocuments(s, dir))
        .select(col("asset_id"), col("media_type"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.checksum").as("checksum"),
          col("meta.format").as("format"))
        .orderBy("asset_id")
    }),

    // Exact media dedup (mm07, r14) — the first curation step a
    // multimodal training corpus runs (LAION-style content-hash dedup):
    // assets with byte-identical payloads collapse to the lowest
    // asset_id REGARDLESS of claimed media_type (a re-uploaded payload
    // is the same asset however a feed labeled it), and the survivor
    // carries its corpus copy count. The checksum comes from mm01's
    // columnar metadata pass — no decode — so at 100 TB the dedup
    // exchanges 16-byte hashes, never payloads; one hash exchange, the
    // dd01 shape on the binary column.
    "mm07_media_dedup" -> ((s, dir) => {
      withMeta(mediaFromDocuments(s, dir))
        .select(col("asset_id"), col("media_type"),
          col("meta.checksum").as("checksum"))
        .groupBy("checksum")
        .agg(min(struct(col("asset_id"), col("media_type"))).as("srv"),
          count(lit(1)).as("n_copies"))
        .select(col("srv.asset_id").as("asset_id"),
          col("srv.media_type").as("media_type"),
          col("checksum"), col("n_copies"))
        .orderBy("asset_id")
    }),

    // Stubbed decode through the real mapPartitions plumbing. The stub's
    // dimension arithmetic is SQL-expressible, so the whole JVM decode path
    // is oracle-checked end to end (like mm03/mm04).
    "mm02_decode_stub" -> ((s, dir) => {
      decodeImages(mediaFromDocuments(s, dir))
        .select("asset_id", "media_type", "width", "height", "format_decoded")
        .orderBy("asset_id")
    }),

    // Frame sampling (every 8th "frame" of the fake payload). The stub's
    // arithmetic (bytes / 8) is SQL-expressible, so this one IS
    // oracle-checked end-to-end through the mapPartitions path.
    "mm03_frame_sample" -> ((s, dir) => {
      sampleVideoFrames(mediaFromDocuments(s, dir), 8)
        .orderBy("asset_id")
    }))

  val oracle: Map[String, String] = Map(
    // coalesce('') mirrors the stub's null-payload path (n = 0 → 1×1 jpeg);
    // octet_length(encode(NULL)) would yield NULL and diverge on any
    // null-text document.
    "mm02_decode_stub" ->
      """SELECT doc_id AS asset_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(octet_length(encode(coalesce(text, ''))) % 640 + 1 AS INT) AS width,
        |  CAST((octet_length(encode(coalesce(text, ''))) * 7) % 480 + 1 AS INT) AS height,
        |  CASE octet_length(encode(coalesce(text, ''))) % 3
        |    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format_decoded
        |FROM documents ORDER BY asset_id""".stripMargin,
    // coalesce('') mirrors the stub's null-payload path here too: DuckDB's
    // least() ignores a NULL argument, so a null-text doc would yield the
    // full byte budget vs Spark's 0.
    "mm04_resize" ->
      """SELECT doc_id AS asset_id, 224 AS width, 224 AS height,
        |  least(octet_length(encode(coalesce(text, ''))), (224 * 224 * 3) // 64) AS resized_bytes
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY asset_id""".stripMargin,
    "mm01_media_meta" ->
      """SELECT doc_id AS asset_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS checksum,
        |  CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
        |FROM documents ORDER BY asset_id""".stripMargin,
    "mm03_frame_sample" ->
      """SELECT doc_id AS asset_id,
        |  CAST(octet_length(encode(text)) // 8 AS INT) AS n_frames
        |FROM documents
        |WHERE doc_id % 3 = 2 ORDER BY asset_id""".stripMargin,
    // Mirrors mm07: keep-first by payload md5 with the copy count; the
    // survivor's media_type rides the min asset_id (min over the
    // (asset_id, media_type) struct there ≡ the rn = 1 row here).
    "mm07_media_dedup" ->
      """SELECT asset_id, media_type, checksum, n_copies FROM (
        |  SELECT doc_id AS asset_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    md5(text) AS checksum,
        |    COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies,
        |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1
        |ORDER BY asset_id""".stripMargin)
}
