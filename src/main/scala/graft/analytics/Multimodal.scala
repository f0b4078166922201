package graft.analytics

import graft.{QueryDef, Tables}
import graft.GraftSession.MaterializeOps
import graft.sqlx.PersistOnceOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque BINARY payloads with
  * typed metadata, processed by deterministic, partition-parallel transforms.
  *
  * Two decode-once tables back the oracle rows:
  *
  *  - [[mediaFeatures]] (m02/m04/m07/m08/m12): one media payload per
  *    document (PNG via [[ImageCodec]], WAV via [[AudioCodec]], MJPEG-AVI
  *    via [[VideoCodec]] — seeded by doc_id alone), decoded ONCE with the
  *    real codecs inside a batched mapPartitions (the mapInPandas batch
  *    shape), per-unit FEATURE rows dumped to a parquet the DuckDB oracle
  *    reads by path — the oracle never decodes, it verifies the QUERY
  *    LOGIC (sampling, histogram banding, VAD islands, scene-cut lag,
  *    energy autocorrelation) over the same feature table, the way
  *    `documents` backs the text queries.
  *  - [[mediaFingerprints]] (m05/m06/m09/m10/m11): fixture media derived
  *    from each document's TEXT (region r of the payload ← md5 of the
  *    text's r-th 4-char frame), so textual near-duplicates become
  *    near-duplicate MEDIA — then decoded and fingerprinted by the REAL
  *    codecs: DCT pHash bands of the decoded PNG
  *    ([[ImageCodec.phash64]]), md5 of each MJPEG frame demuxed by
  *    [[VideoCodec.parseAvi]], and the energy-landmark constellation of
  *    the PCM-decoded WAV ([[AudioCodec.landmarks]]). The pair queries'
  *    oracle rows thus derive from real decoded fingerprints end to end;
  *    the oracle replays only the pair LOGIC (banding, hamming, shingle
  *    joins, offset voting) over the dumped fingerprint parquet.
  *
  * Only m01/m03 keep the clearly-marked deterministic md5 byte stub (they
  * test byte-plumbing — metadata structs and decimation indexing — where
  * DuckDB can replay the byte ops on the string form directly).
  */
object Multimodal {
  import Tables.t

  /** Oracle dump paths are KEYED BY sf dir (hash suffix), so interleaved
    * runs over different dirs can never clobber each other's dump: each
    * dir owns its path, and the dumped content is a pure deterministic
    * function of the dir. Two JVMs verifying the SAME dir concurrently
    * (the local[*] and local-cluster legs) are handled by the dump
    * protocol, not by keying: each JVM writes to a per-process temp path
    * and atomically renames it into place ([[swapDump]]) — the
    * destination is only ever absent for the instant between a delete
    * and a rename, never torn mid-parquet-job the way a shared
    * mode(overwrite) target would be, and a lost rename race simply
    * discards the loser's (bit-identical) dump. The oracle SQL embeds
    * the path of the LAST dir queried in this JVM (`Verify` runs every
    * query before it dumps `oracle_sql.json`, so the recorded SQL always
    * points at the dump matching the verified dir). Note the dump
    * targets driver-local /tmp: correct for local[*] and same-host
    * local-cluster (the offline harness); a multi-host deployment would
    * point these at a shared FS. */
  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  private[analytics] def featuresPathFor(dir: String): String =
    s"/tmp/graft_media_features_${md5hex(dir.getBytes).take(8)}"
  private[analytics] def fingerprintsPathFor(dir: String): String =
    s"/tmp/graft_media_fp_${md5hex(dir.getBytes).take(8)}"

  /** Atomic oracle-dump publish (driver-local /tmp by construction, so
    * java.nio rename IS rename(2)): write the parquet to a per-process
    * temp dir, then swap it in. `Files.move(ATOMIC_MOVE)` onto an
    * existing non-empty dir throws — that is the lost-race signal (a
    * concurrent JVM swapped its bit-identical dump in between our delete
    * and rename), and the loser just discards its temp copy. */
  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
    f.delete(); ()
  }
  private[analytics] def swapDump(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
    val tmp = s"$dest.tmp-${ProcessHandle.current().pid()}"
    df.write.mode("overwrite").parquet(tmp)
    try {
      rmTree(new java.io.File(dest))
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(dest),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case _: java.nio.file.FileSystemException => // lost the swap race
        rmTree(new java.io.File(tmp))
    }
  }

  /** Once-per-JVM dump gate that UNMARKS on failure: marking before the
    * write is what makes concurrent same-dir calls collapse to one dump,
    * but a throwing write must not leave the dir marked — every later
    * query would then skip re-dumping and the DuckDB oracle would read a
    * torn/absent dump with no Spark-side failure. */
  private[analytics] def dumpOnce(dumped: java.util.Set[String], dir: String)(
      write: => Unit): Unit =
    if (dumped.add(dir))
      try write
      catch { case e: Throwable => dumped.remove(dir); throw e }

  /** The sf dir whose dump paths the oracle SQL should reference — set by
    * every feature/fingerprint build, read by [[defs]] (a def: the SQL is
    * built when the driver collects `oracleSql`, after the queries ran). */
  @volatile private var oracleDir: String = "/root/testdata/sf0.01"

  // ------------------------------------------------------ features (by id)

  /** One document's REAL decoded feature rows
    * (doc_id, modality, idx, v1, v2, h) — synthesis seeded by doc_id only:
    *  - image (doc_id%3==0): 24×24 PNG → real [[ImageCodec.grayFeatures]];
    *    one row per 16-bin histogram bucket, v1=count, v2=mean luma.
    *  - audio (doc_id%3==1): tone bursts with silence gaps, WAV-encoded →
    *    real [[AudioCodec.decodePcm16]] + RMS [[AudioCodec.frameEnergies]];
    *    one row per 125-sample frame, v1=RMS energy, v2=sample count.
    *  - video (doc_id%3==2): MJPEG AVI (scene cut every 3 frames, slight
    *    per-frame drift) container-ROUND-TRIPPED through
    *    [[VideoCodec.parseAvi]], each real JPEG frame decoded via
    *    [[ImageCodec.grayFeatures]]; one row per frame, v1=mean luma,
    *    v2=JPEG byte length, h=md5 of the frame bytes. */
  private[analytics] def featureRows(docId: Long)
      : Seq[(Long, String, Long, Long, Long, String)] = (docId % 3) match {
    case 0 =>
      val png = ImageCodec.encodePng(24, 24,
        (x, y) => ((x * 3 + y * 5 + docId * 7) % 251).toInt)
      val (hist, mean) = ImageCodec.grayFeatures(png)
      hist.toSeq.zipWithIndex.map { case (c, b) =>
        (docId, "image", b.toLong, c, mean, null: String) }
    case 1 =>
      val n = 2000 + (docId % 7).toInt * 250
      val period = 20 + (docId % 30).toInt
      val wav = AudioCodec.encodeWav(n, 8000f, i =>
        if ((i / 250) % 3 == 2) 0 // silence gap every third 250-sample block
        else (StrictMath.sin(2 * StrictMath.PI * i / period) * 8000).toInt)
      AudioCodec.frameEnergies(AudioCodec.decodePcm16(wav), 125)
        .toSeq.zipWithIndex.map { case (e, i) =>
          (docId, "audio", i.toLong, e, n.toLong, null: String) }
    case _ =>
      val nf = 6 + (docId % 10).toInt
      val jpegs = (0 until nf).map { k =>
        val scene = k / 3 // scene cut every 3 frames; +k%3 = tiny drift
        VideoCodec.encodeJpeg(8, 8, (x, y) =>
          (((x + y * 8) * (scene * 31 + 7) + docId * 13 + (k % 3)) % 253).toInt)
      }
      VideoCodec.parseAvi(VideoCodec.encodeAviMjpeg(8, 8, 25, jpegs))
        .frames.zipWithIndex.map { case (jpeg, i) =>
          val (_, mean) = ImageCodec.grayFeatures(jpeg)
          (docId, "video", i.toLong, mean, jpeg.length.toLong, md5hex(jpeg))
        }
  }

  /** The decoded media-features table (doc_id, modality, idx, v1, v2, h):
    * built once per (session, dir), REAL codecs end to end, batched in
    * 64-row groups inside mapPartitions (the mapInPandas batch shape a
    * model-inference UDF uses). Persisted for every Spark consumer and
    * dumped to [[featuresPathFor]] for the DuckDB oracle. At 100 TB this
    * is the decode-once feature-extraction job every media pipeline runs
    * before analytics: embarrassingly parallel over documents, output
    * a fraction of the payload bytes. */
  private val featCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), org.apache.spark.sql.DataFrame]
  /** Dirs whose feature dump this JVM already wrote (the dump content is
    * deterministic per dir, so once per JVM is enough). */
  private val featDumped = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[analytics] def mediaFeatures(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val df = featCache.getOrElseUpdate((s, dir), {
      Dedup.evictStopped(featCache)
      import s.implicits._
      t(s, dir, "documents").select($"doc_id").as[Long]
        .mapPartitions(_.grouped(64).flatMap(_.flatMap(featureRows)))
        .toDF("doc_id", "modality", "idx", "v1", "v2", "h")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
    dumpOnce(featDumped, dir)(swapDump(df, featuresPathFor(dir)))
    oracleDir = dir
    df
  }

  // -------------------------------------------------- fingerprints (by text)

  /** Per-frame-value JPEG memo: a video frame's pixels are a pure function
    * of its 16-bit region value, so at most 65536 distinct tiny JPEGs
    * exist — encode each once per JVM instead of once per (doc, frame). */
  private val jpegMemo =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Byte]]
  private def jpegFor(v: Int): Array[Byte] =
    jpegMemo.getOrElseUpdate(v, VideoCodec.encodeJpeg(8, 8, (x, y) =>
      ((x * 3 + y * 5) * 7 + (v % 251) * 13 + (v >> 8)) % 251))

  /** One document's REAL decoded fingerprint rows (doc_id, kind, idx, v, h).
    * The fixture payloads derive from the TEXT — region r ← md5 of the
    * text's r-th 4-char frame — so aligned textual near-duplicates become
    * near-duplicate media; the fingerprints then come from real decodes:
    *
    *  - kind='band' (idx 0..3): the four 16-bit bands of the REAL DCT
    *    pHash ([[ImageCodec.phash64]]) of the decoded 24×24 PNG whose 3×3
    *    blocks carry the region bytes — m05's banded-LSH input.
    *  - kind='frame' (idx = frame no): md5 of each real MJPEG frame after
    *    an encode→[[VideoCodec.parseAvi]] demux round trip; frame pixels
    *    carry the region's 16-bit value — m09's shingle input.
    *  - kind='landmark' (idx = frame no): the 16-bit landmark-constellation
    *    hashes ([[AudioCodec.landmarks]]) over the RMS energies of the
    *    PCM-decoded WAV whose 125-sample blocks take one of 8 amplitude
    *    levels per region byte — m11's offset-voting input. */
  private[analytics] def fingerprintRows(docId: Long, text: String)
      : Seq[(Long, String, Long, Long, String)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dg = Array.tabulate(64) { r =>
      md.reset()
      md.digest(text.slice(r * 4, r * 4 + 4).getBytes("UTF-8"))
    }
    def b0(r: Int): Int = dg(r)(0) & 0xFF
    def v16(r: Int): Int = ((dg(r)(0) & 0xFF) << 8) | (dg(r)(1) & 0xFF)
    val nUnits = math.min(math.max((text.length + 3) / 4, 8), 64)
    // image: region bytes → 3×3 blocks of a 24×24 PNG → real DCT pHash
    val png = ImageCodec.encodePng(24, 24, (x, y) => b0((y / 3) * 8 + (x / 3)))
    val ph = ImageCodec.phash64(png)
    val bands = (0 until 4).map(k =>
      (docId, "band", k.toLong, (ph >>> (k * 16)) & 0xFFFFL, null: String))
    // video: one 8×8 JPEG per region (16-bit value → pixels), AVI round trip
    val jpegs = (0 until nUnits).map(k => jpegFor(v16(k)))
    val frames = VideoCodec.parseAvi(VideoCodec.encodeAviMjpeg(8, 8, 25, jpegs)).frames
    val fhs = frames.zipWithIndex.map { case (j, i) =>
      (docId, "frame", i.toLong, j.length.toLong, md5hex(j)) }
    // audio: region byte → one of 8 amplitude levels per 125-sample block
    // (uniform over the landmark bucketing's log2 levels), real PCM decode
    val wav = AudioCodec.encodeWav(nUnits * 125, 8000f, i =>
      (StrictMath.sin(2 * StrictMath.PI * i / 20) *
        (1 << (b0(i / 125) % 8 + 4))).toInt)
    val energies = AudioCodec.frameEnergies(AudioCodec.decodePcm16(wav), 125)
    val lms = AudioCodec.landmarks(energies).toSeq.map { case (pos, h) =>
      (docId, "landmark", pos.toLong, h.toLong, null: String) }
    bands ++ fhs ++ lms
  }

  /** The decoded media-fingerprints table (doc_id, kind, idx, v, h): built
    * once per (session, dir) like [[mediaFeatures]], persisted, and dumped
    * to [[fingerprintsPathFor]] for the DuckDB oracle. Corpus-linear
    * (≤ 64+64+57 rows per doc), embarrassingly parallel across documents. */
  private val fpCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), org.apache.spark.sql.DataFrame]
  private val fpDumped = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[analytics] def mediaFingerprints(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val df = fpCache.getOrElseUpdate((s, dir), {
      Dedup.evictStopped(fpCache)
      import s.implicits._
      t(s, dir, "documents").select($"doc_id", $"text").as[(Long, String)]
        .mapPartitions(_.grouped(64).flatMap(_.flatMap { case (id, tx) =>
          fingerprintRows(id, tx) }))
        .toDF("doc_id", "kind", "idx", "v", "h")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
    dumpOnce(fpDumped, dir)(swapDump(df, fingerprintsPathFor(dir)))
    oracleDir = dir
    df
  }

  /** m05 band k: the k-th 16-bit band of the real pHash. */
  private def bandCol(k: Int) =
    max(when(col("idx") === k, col("v"))).as(s"b$k")

  /** (doc_id, b0..b3) REAL pHash bands, persisted: m05's four band joins
    * reference the subtree on both sides — without reuse the pivot would
    * run 8x (same pattern as Dedup's shared simhash/shingle caches). */
  private val phCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), org.apache.spark.sql.DataFrame]
  private def phashOf(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    phCache.getOrElseUpdate((s, dir), {
      Dedup.evictStopped(phCache)
      import s.implicits._
      mediaFingerprints(s, dir).filter($"kind" === "band")
        .groupBy($"doc_id")
        .agg(bandCol(0), (1 until 4).map(bandCol): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** m05's verified phash near-dup pairs `(i, j)` — the image-side edge
    * set, shared with the cross-modal consensus (m06) and the union
    * contraction (m10). Persisted per (session, dir) exactly like its
    * text twin `Dedup.simhashPairs`: without the cache every consumer
    * re-ran the four band joins per invocation (m10 paid them on every
    * call — the r8 bench's second most expensive query was mostly this
    * rebuild). */
  /** m11's DF-capped landmark index, hash-partitioned + sorted by `h` and
    * materialized — see the m11 comment. */
  private val m11IdxCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), org.apache.spark.sql.DataFrame]

  private val phPairsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), org.apache.spark.sql.DataFrame]
  private def phashPairs(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    phPairsCache.getOrElseUpdate((s, dir), {
      Dedup.evictStopped(phPairsCache)
      import s.implicits._
      val ph = phashOf(s, dir)
      val hamming = (0 until 4).map(k =>
        bit_count(col(s"a.b$k").bitwiseXOR(col(s"b.b$k")))).reduce(_ + _).cast("long")
      def band(k: Int) = ph.as("a")
        .join(ph.as("b"), col(s"a.b$k") === col(s"b.b$k") && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("i"), $"b.doc_id".as("j"), hamming.as("hamming"))
        .filter($"hamming" <= 3)
      (0 until 4).map(band).reduce(_ unionAll _).distinct()
        .select($"i", $"j", $"hamming")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** The queries — a def, not a val: the oracle FROM clauses embed the
    * dir-keyed dump paths of the LAST dir queried (see [[oracleDir]]). */
  def defs: Seq[QueryDef] = {
    /** Shared FROM clause of the feature-table oracles. */
    val FEAT = s"read_parquet('${featuresPathFor(oracleDir)}/*.parquet')"
    /** Shared FROM clause of the fingerprint-table oracles. */
    val FP = s"read_parquet('${fingerprintsPathFor(oracleDir)}/*.parquet')"

    /** Oracle CTEs for the REAL-pHash pair set, ending in `ipairs(i, j)`. */
    val PHASH_CTES = s"""
        ph AS (
          SELECT doc_id,
            CAST(MAX(CASE WHEN idx = 0 THEN v END) AS BIGINT) AS b0,
            CAST(MAX(CASE WHEN idx = 1 THEN v END) AS BIGINT) AS b1,
            CAST(MAX(CASE WHEN idx = 2 THEN v END) AS BIGINT) AS b2,
            CAST(MAX(CASE WHEN idx = 3 THEN v END) AS BIGINT) AS b3
          FROM $FP WHERE kind = 'band' GROUP BY doc_id),
        icands AS (
          SELECT a.doc_id AS i, b.doc_id AS j,
                 bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
                 bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS hamming
          FROM ph a JOIN ph b
            ON a.doc_id < b.doc_id
           AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)),
        ipairs AS (SELECT DISTINCT i, j FROM icands WHERE hamming <= 3)"""

    Seq(
    // ---- m01: binary ingest + typed metadata + fake decode ----
    QueryDef(
      "m01_blob_metadata",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .withColumn("payload", $"text".cast("binary"))
          // typed metadata struct over the opaque payload
          .withColumn("meta", struct(
            lit("fake/v1").as("format"),
            length($"payload").as("n_bytes"),
            md5($"payload").as("checksum")))
          // fakeDecodeDims: deterministic stand-in for a codec UDF — derives
          // "width/height" from the first two checksum hex digits
          .withColumn("width", lit(640) + (instr(lit("0123456789abcdef"), substring($"meta.checksum", 1, 1)) - 1))
          .withColumn("height", lit(480) + (instr(lit("0123456789abcdef"), substring($"meta.checksum", 2, 1)) - 1))
          .select($"doc_id", $"meta.format".as("format"), $"meta.n_bytes".as("n_bytes"),
            $"meta.checksum".as("checksum"), $"width", $"height")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id, 'fake/v1' AS format,
               CAST(octet_length(text::BLOB) AS INT) AS n_bytes,
               md5(text) AS checksum,
               640 + instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS width,
               480 + instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1 AS height
        FROM documents ORDER BY doc_id"""),
    ),

    // ---- m02: frame sampling — every 2nd REAL video frame kept ----
    // Input = the decoded feature table (real MJPEG frames demuxed by
    // parseAvi, hashed/measured from the actual JPEG bytes); the query is
    // the stride-sampling policy. The oracle replays the policy over the
    // same parquet — it never decodes.
    QueryDef(
      "m02_frame_sample",
      (s, dir) => {
        import s.implicits._
        mediaFeatures(s, dir)
          .filter($"modality" === "video" && $"idx" % 2 === 0)
          .select($"doc_id", $"idx".as("frame_idx"),
            $"v2".as("frame_len"), $"h".as("frame_hash"))
          .orderBy($"doc_id", $"frame_idx")
      },
      Some(s"""
        SELECT doc_id, idx AS frame_idx, v2 AS frame_len, h AS frame_hash
        FROM $FEAT
        WHERE modality = 'video' AND idx % 2 = 0
        ORDER BY doc_id, frame_idx"""),
    ),

    // ---- m03: resize stub — byte decimation (every 4th byte kept) ----
    QueryDef(
      "m03_resize_decimate",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .withColumn("n", length($"text"))
          // "thumbnail" = every 4th byte of the payload; the decimation
          // indexing is the real resize plumbing, the codec is the stub.
          // Empty payloads yield NULL like the oracle's string_agg over an
          // empty list — without the guard Spark's sequence(0, -1) steps
          // DOWN to [0,-1] and emits '' (md5 of empty) vs DuckDB's NULL
          .withColumn("thumb", when($"n" === 0, lit(null).cast("string"))
            .otherwise(concat_ws("",
              transform(sequence(lit(0), (($"n" + 3) / 4).cast("int") - 1),
                i => $"text".substr(i * 4 + 1, lit(1))))))
          .select($"doc_id", $"n".as("orig_len"),
            length($"thumb").as("thumb_len"), md5($"thumb").as("thumb_hash"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id, CAST(length(text) AS INT) AS orig_len,
               CAST(length(thumb) AS INT) AS thumb_len,
               md5(thumb) AS thumb_hash
        FROM (
          SELECT doc_id, text,
                 list_aggregate(list_transform(range((length(text)+3)//4),
                   i -> substr(text, CAST(i*4+1 AS INT), 1)), 'string_agg', '') AS thumb
          FROM documents) x
        ORDER BY doc_id"""),
    ),

    // ---- m04: batched feature extraction over REAL image decodes ----
    // The batched mapPartitions extraction (64-row groups, the mapInPandas
    // shape) lives in the mediaFeatures builder, running the REAL
    // ImageCodec histogram/mean on real PNG bytes; this query is the
    // downstream consumer — luminance banding of the per-bucket histogram
    // rows into dark/mid/bright counts per image. The oracle replays the
    // banding over the same decoded rows.
    QueryDef(
      "m04_batch_features",
      (s, dir) => {
        import s.implicits._
        mediaFeatures(s, dir)
          .filter($"modality" === "image")
          .groupBy($"doc_id")
          .agg(
            sum($"v1").as("n_pixels"),
            sum(when($"idx" < 4, $"v1").otherwise(0L)).as("n_dark"),
            sum(when($"idx" >= 4 && $"idx" < 12, $"v1").otherwise(0L)).as("n_mid"),
            sum(when($"idx" >= 12, $"v1").otherwise(0L)).as("n_bright"),
            max($"v2").as("mean_luma"))
          .orderBy($"doc_id")
      },
      Some(s"""
        SELECT doc_id,
               CAST(SUM(v1) AS BIGINT) AS n_pixels,
               CAST(SUM(CASE WHEN idx < 4 THEN v1 ELSE 0 END) AS BIGINT) AS n_dark,
               CAST(SUM(CASE WHEN idx >= 4 AND idx < 12 THEN v1 ELSE 0 END) AS BIGINT) AS n_mid,
               CAST(SUM(CASE WHEN idx >= 12 THEN v1 ELSE 0 END) AS BIGINT) AS n_bright,
               CAST(MAX(v2) AS BIGINT) AS mean_luma
        FROM $FEAT
        WHERE modality = 'image'
        GROUP BY doc_id ORDER BY doc_id"""),
    ),

    // ---- m05: perceptual-hash near-duplicate media (banded pairs) ----
    // REAL pHash: the 64-bit DCT hash of each doc's decoded fixture PNG,
    // computed by ImageCodec.phash64 inside the decode-once fingerprint
    // build, then the d05 machinery over its four 16-bit bands: per-band
    // equi-joins (never an OR nested-loop), hamming verified per-row
    // BEFORE the union+distinct, ≤3 over 4 bands is pigeonhole-exact
    // recall. Bucket sizes are O(n/2^16) — survives 100×.
    QueryDef(
      "m05_phash_neardup",
      (s, dir) => {
        import s.implicits._
        phashPairs(s, dir).orderBy($"i", $"j")
      },
      Some(s"""
        WITH $PHASH_CTES
        SELECT DISTINCT i, j, CAST(hamming AS BIGINT) AS hamming
        FROM icands WHERE hamming <= 3
        ORDER BY i, j"""),
    ),

    // ---- m06: cross-modal dedup consensus (text SimHash × image pHash) --
    // A real curation pipeline doesn't trust one near-dup signal: pairs
    // flagged by BOTH the text fingerprint (d05) and the perceptual image
    // fingerprint (m05) are safe auto-drops; single-signal pairs go to
    // review. Each side is its own banded-LSH pair set (both already
    // bounded at 100×); the consensus is one full-outer join ON THE PAIR
    // SETS — orders of magnitude smaller than the corpus — so the
    // composition adds no corpus-scale work at any SF.
    QueryDef(
      "m06_crossmodal_consensus",
      (s, dir) => {
        import s.implicits._
        val text = Dedup.simhashPairs(s, dir).select($"i", $"j", lit(1).as("t"))
        val image = phashPairs(s, dir).select($"i", $"j", lit(1).as("m"))
        text.join(image, Seq("i", "j"), "full_outer")
          .withColumn("signal",
            when($"t".isNotNull && $"m".isNotNull, "both")
              .when($"t".isNotNull, "text_only")
              .otherwise("image_only"))
          .groupBy($"signal").agg(count(lit(1)).as("pairs"))
          .orderBy($"signal")
      },
      Some(s"""
        WITH sims AS (${Dedup.simhashSql}),
        tpairs AS (${Dedup.SIMHASH_PAIRS_SQL}),
        $PHASH_CTES
        SELECT signal, COUNT(*) AS pairs FROM (
          SELECT CASE WHEN t.i IS NOT NULL AND p.i IS NOT NULL THEN 'both'
                      WHEN t.i IS NOT NULL THEN 'text_only'
                      ELSE 'image_only' END AS signal
          FROM tpairs t FULL JOIN ipairs p ON t.i = p.i AND t.j = p.j) u
        GROUP BY signal ORDER BY signal"""),
    ),

    // ---- m07: VAD-style audio segmentation (gaps and islands) ----
    // The speech-pipeline front door: classify fixed-size frames as
    // voiced/silent by energy, then group CONSECUTIVE voiced frames into
    // segments; the segmentation is the classic gaps-and-islands window
    // (frame_idx − row_number over voiced frames is constant within a
    // run). Both windows partition by doc_id, so the whole operator is
    // one frame fan-out + per-doc local windows — embarrassingly
    // parallel across documents at 100 TB, no cross-doc shuffle at all.
    QueryDef(
      "m07_audio_segments",
      (s, dir) => {
        // REAL energies: v1 is the RMS of each 125-sample frame of the
        // PCM-decoded WAV (AudioCodec) — the VAD threshold separates the
        // synthesized tone bursts (RMS ≈ 5650) from the silence gaps (0)
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val frames = mediaFeatures(s, dir)
          .filter($"modality" === "audio")
          .select($"doc_id", $"idx".as("frame_idx"), $"v1".as("energy"))
        val w = Window.partitionBy($"doc_id").orderBy($"frame_idx")
        frames
          .filter($"energy" >= 1000L) // voiced
          .withColumn("grp", $"frame_idx" - row_number().over(w))
          .groupBy($"doc_id", $"grp")
          .agg(
            min($"frame_idx").as("seg_start"),
            max($"frame_idx").as("seg_end"),
            count(lit(1)).as("seg_frames"),
            sum($"energy").as("energy_sum"))
          .filter($"seg_frames" >= 2L)
          .select($"doc_id", $"seg_start", $"seg_end", $"seg_frames", $"energy_sum")
          .orderBy($"doc_id", $"seg_start")
      },
      Some(s"""
        WITH frames AS (
          SELECT doc_id, idx AS frame_idx, v1 AS energy
          FROM $FEAT WHERE modality = 'audio'),
        voiced AS (
          SELECT doc_id, frame_idx, energy,
                 frame_idx - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS grp
          FROM frames WHERE energy >= 1000),
        segs AS (
          SELECT doc_id, grp, MIN(frame_idx) AS seg_start, MAX(frame_idx) AS seg_end,
                 COUNT(*) AS seg_frames, CAST(SUM(energy) AS BIGINT) AS energy_sum
          FROM voiced GROUP BY doc_id, grp)
        SELECT doc_id, seg_start, seg_end, seg_frames, energy_sum
        FROM segs WHERE seg_frames >= 2 ORDER BY doc_id, seg_start"""),
    ),

    // ---- m08: keyframe detection (scene-change by feature delta) ----
    // The video-summarization front door: a frame is a KEYFRAME when its
    // feature distance to the previous frame exceeds a threshold (scene
    // cut), plus frame 0 unconditionally. The temporal comparison is one
    // lag() window per doc. Like m07: per-doc local windows only,
    // embarrassingly parallel across documents, no cross-doc shuffle.
    // Keyframe density (the output per doc) is what a frame-sampling
    // policy (m02) consumes.
    QueryDef(
      "m08_keyframes",
      (s, dir) => {
        // REAL scene cuts: v1 is the decoded mean luminance of each real
        // MJPEG frame; within a synthesized scene consecutive frames drift
        // by ~1 luma step, across a cut the mean jumps — the lag-delta
        // threshold separates the two on actual decoded values
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"doc_id").orderBy($"frame_idx")
        mediaFeatures(s, dir)
          .filter($"modality" === "video")
          .select($"doc_id", $"idx".as("frame_idx"), $"v1".as("luma"))
          .withColumn("n_frames", count(lit(1)).over(Window.partitionBy($"doc_id")))
          .withColumn("delta", abs($"luma" - lag($"luma", 1).over(w)))
          .filter($"frame_idx" === 0L || $"delta" >= 8L)
          .groupBy($"doc_id")
          .agg(
            count(lit(1)).as("n_keyframes"),
            max($"n_frames").cast("long").as("n_frames"),
            sum(coalesce($"delta", lit(0L))).as("delta_sum"))
          .withColumn("keyframe_rate",
            $"n_keyframes".cast("double") / $"n_frames")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH frames AS (
          SELECT doc_id, idx AS frame_idx, v1 AS luma,
                 COUNT(*) OVER (PARTITION BY doc_id) AS n_frames
          FROM $FEAT WHERE modality = 'video'),
        deltas AS (
          SELECT doc_id, n_frames, frame_idx, luma,
                 abs(luma - LAG(luma, 1) OVER (PARTITION BY doc_id ORDER BY frame_idx)) AS delta
          FROM frames),
        keys AS (
          SELECT * FROM deltas WHERE frame_idx = 0 OR delta >= 8)
        SELECT doc_id, COUNT(*) AS n_keyframes,
               CAST(MAX(n_frames) AS BIGINT) AS n_frames,
               CAST(SUM(COALESCE(delta, 0)) AS BIGINT) AS delta_sum,
               CAST(COUNT(*) AS DOUBLE)/MAX(n_frames) AS keyframe_rate
        FROM keys GROUP BY doc_id ORDER BY doc_id"""),
    ),

    // ---- m09: video-sequence near-dup — frame-hash shingles ----
    // Clip-level dedup, the sequence analogue of m05's per-image phash:
    // a video is fingerprinted as the SEQUENCE of its REAL frame hashes
    // (md5 of each MJPEG frame demuxed by parseAvi, from the decode-once
    // fingerprint table), shingled in consecutive runs of 5 — two clips
    // match when they share a run of 5 identical frames, which survives
    // re-muxing/concatenation (aligned frames keep their hash) where a
    // whole-file checksum dies. Pipeline: per-doc frame hash → 5-frame
    // shingle (per-doc window, bounded by the 100 TB frame count of ONE
    // clip; 5 consecutive identical frames ≈ a fifth of a second of
    // video — 3-frame shingles let common aligned phrase-frames flag
    // 14% of all doc pairs at sf0.001, 74× the 5-frame set) → DF-capped
    // shingle equi-join (df ≤ 32: a hot intro/outro shingle — the
    // boilerplate frame run every clip shares — cannot quadratically
    // explode the join, the d02 cap argument) → per-pair shared-run
    // count and quantized containment. No cartesian, no uncapped
    // self-join; everything else is linear hash-aggs.
    QueryDef(
      "m09_sequence_neardup",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"doc_id").orderBy($"f")
        val sh = mediaFingerprints(s, dir).filter($"kind" === "frame")
          .select($"doc_id", $"idx".as("f"), $"h".as("fh"))
          .withColumn("f1", lead($"fh", 1).over(w))
          .withColumn("f2", lead($"fh", 2).over(w))
          .withColumn("f3", lead($"fh", 3).over(w))
          .withColumn("f4", lead($"fh", 4).over(w))
          .filter($"f4".isNotNull)
          .select($"doc_id",
            md5(concat($"fh", $"f1", $"f2", $"f3", $"f4")).as("sh"))
          .distinct()
          .persistOnce()
        val dfc = sh.groupBy($"sh").agg(countDistinct($"doc_id").as("df"))
        // both sides of the pair self-join read idx: persist it or the
        // shingle build + DF-cap join runs twice (measured ~2x at sf0.1)
        val idx = sh.join(dfc.filter($"df" <= 32), "sh").persistOnce()
        val per = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
        idx.as("a").join(idx.as("b"),
            $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
          .groupBy($"a.doc_id".as("i"), $"b.doc_id".as("j"))
          .agg(count(lit(1)).as("n_shared"))
          .join(per.select($"doc_id".as("i"), $"n_sh".as("ni")), "i")
          .join(per.select($"doc_id".as("j"), $"n_sh".as("nj")), "j")
          .select($"i", $"j", $"n_shared",
            expr("n_shared * 10000 div least(ni, nj)").as("containment_q"))
          .orderBy($"i", $"j")
      },
      Some(s"""
        WITH fr AS (
          SELECT doc_id, idx AS f, h AS fh
          FROM $FP WHERE kind = 'frame'),
        sh0 AS (
          SELECT doc_id, fh,
                 LEAD(fh, 1) OVER (PARTITION BY doc_id ORDER BY f) AS f1,
                 LEAD(fh, 2) OVER (PARTITION BY doc_id ORDER BY f) AS f2,
                 LEAD(fh, 3) OVER (PARTITION BY doc_id ORDER BY f) AS f3,
                 LEAD(fh, 4) OVER (PARTITION BY doc_id ORDER BY f) AS f4
          FROM fr),
        sh AS (
          SELECT DISTINCT doc_id, md5(fh || f1 || f2 || f3 || f4) AS sh
          FROM sh0 WHERE f4 IS NOT NULL),
        dfc AS (SELECT sh, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY sh),
        idx AS (SELECT s.doc_id, s.sh FROM sh s JOIN dfc USING (sh) WHERE df <= 32),
        per AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        pr AS (
          SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS n_shared
          FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT pr.i, pr.j, pr.n_shared,
               pr.n_shared * 10000 // least(pa.n_sh, pb.n_sh) AS containment_q
        FROM pr
        JOIN per pa ON pa.doc_id = pr.i
        JOIN per pb ON pb.doc_id = pr.j
        ORDER BY pr.i, pr.j"""),
    ),

    // ---- m10: cross-modal dup clusters — components over the UNION ----
    // ---- of the text and image edge sets ----
    // m06 classified individual PAIRS by which signal flagged them; the
    // dedup action needs COMPONENTS, and a pair chain can cross
    // modalities (A≈B by text, B≈C by image ⇒ {A,B,C} is one dup group —
    // the image-text-pair reality where captions get copied with
    // re-encoded images and vice versa). Edges = d05 SimHash pairs ∪ m05
    // pHash pairs, components by the SAME iterated union-find
    // contraction the text-only labels use (Curation.contractComponents,
    // factored for exactly this reuse); the per-cluster report carries
    // the edge-type mix (a pair in both sets counts in both columns).
    // Scale: both edge sets are banded-LSH-bounded, the union is
    // pair-sized, and the contraction/report joins never touch the
    // corpus — identical envelope to p03.
    QueryDef(
      "m10_crossmodal_clusters",
      (s, dir) => {
        import s.implicits._
        val text = Dedup.simhashPairs(s, dir).select($"i", $"j")
        val image = phashPairs(s, dir).select($"i", $"j")
        // Components of text∪image = components of the QUOTIENT graph:
        // map every image edge through the cached text labels (absent
        // nodes map to themselves), drop the self-loops (image edges
        // inside one text component change nothing), and contract only
        // that reduced edge set — instead of re-contracting the full
        // union from scratch per call. Labels stay component MINIMA:
        // reduced-node ids are text-component minima or raw ids, and the
        // quotient contraction takes the min of those, i.e. the min over
        // the whole union component. Final label = quotient label of the
        // node's base label (its text label, else itself).
        val tl = Curation.dupClusterLabels(s, dir)
        val mapped = image
          .join(tl.select($"node".as("i"), $"lab".as("li")), Seq("i"), "left")
          .join(tl.select($"node".as("j"), $"lab".as("lj")), Seq("j"), "left")
          .select(coalesce($"li", $"i").as("i"), coalesce($"lj", $"j").as("j"))
          .filter($"i" =!= $"j")
        val quotient = Curation.contractComponents(s, mapped)
        val imageNodes = image.select($"i".as("node"))
          .unionAll(image.select($"j".as("node"))).distinct()
        val baseLabels = tl
          .unionByName(imageNodes.join(tl.select($"node"), Seq("node"), "left_anti")
            .withColumn("lab", $"node"))
        // materialized (LogicalRDD): three consumers walk `labels` (the
        // size report and both per-modality edge counts), and baseLabels
        // embeds the lazily-persisted pHash pair lineage — un-cut, the
        // r17 quotient rewrite re-planned that subtree at every consumer
        // (plan 3.3k -> 13.3k lines, Exchanges 305 -> 1371, +28% wall).
        // Same §7.3 plan-bloat fix as p15's shared adjacency.
        val labels = baseLabels
          .join(quotient.select($"node".as("lab"), $"lab".as("lab2")), Seq("lab"), "left")
          .select($"node", coalesce($"lab2", $"lab").as("lab"))
          .materialized
        val report = labels.groupBy($"lab".as("cluster_rep"))
          .agg(count(lit(1)).as("size"), max($"node").as("max_doc"))
        def edgeCnt(p: org.apache.spark.sql.DataFrame, name: String) =
          p.join(labels, p("i") === labels("node"))
            .groupBy($"lab".as("cluster_rep")).agg(count(lit(1)).as(name))
        report
          .join(edgeCnt(text, "n_text_edges"), Seq("cluster_rep"), "left")
          .join(edgeCnt(image, "n_image_edges"), Seq("cluster_rep"), "left")
          .na.fill(0L, Seq("n_text_edges", "n_image_edges"))
          .orderBy($"cluster_rep")
      },
      Some(s"""
        WITH RECURSIVE sims AS (${Dedup.simhashSql}),
        tpairs AS (${Dedup.SIMHASH_PAIRS_SQL}),
        $PHASH_CTES,
        pairs AS (SELECT i, j FROM tpairs UNION SELECT i, j FROM ipairs),
        ${graft.analytics.Curation.CLUSTER_LABELS_SQL},
        report AS (
          SELECT rep AS cluster_rep, COUNT(*) AS size, MAX(node) AS max_doc
          FROM labels GROUP BY rep),
        te AS (
          SELECT l.rep AS cluster_rep, COUNT(*) AS n_text_edges
          FROM tpairs t JOIN labels l ON l.node = t.i GROUP BY l.rep),
        ie AS (
          SELECT l.rep AS cluster_rep, COUNT(*) AS n_image_edges
          FROM ipairs p JOIN labels l ON l.node = p.i GROUP BY l.rep)
        SELECT r.cluster_rep, r.size, r.max_doc,
               COALESCE(te.n_text_edges, 0) AS n_text_edges,
               COALESCE(ie.n_image_edges, 0) AS n_image_edges
        FROM report r
        LEFT JOIN te USING (cluster_rep) LEFT JOIN ie USING (cluster_rep)
        ORDER BY r.cluster_rep"""),
    ),

    // ---- m11: audio alignment — landmark-hash offset voting ----
    // The Shazam-family question m09's shingles can't answer: not just
    // "do these two clips overlap" but "at WHAT time offset" — the
    // primitive behind clip-in-broadcast detection and trimmed-copy
    // dedup. Each doc's (frame_idx, 16-bit landmark hash) constellation
    // comes from the REAL AudioCodec.landmarks pass over the RMS
    // energies of its PCM-decoded fixture WAV (decode-once fingerprint
    // table); matching hashes across two docs VOTE for their frame-index
    // DIFFERENCE, and a true overlap concentrates votes on one offset
    // while chance collisions scatter. Per pair: argmax-vote offset,
    // kept at >= 3 votes (landmarks are overlapping 8-frame windows, so
    // 3 same-offset votes ≈ a 10-frame aligned energy run — see the
    // AudioCodec.landmarks scaladoc's noise arithmetic). Scale shape:
    // the join is a DF-capped equi-join on the hash (df <= 16 — the
    // d02/m09 hot-key cap argument: a silence/boilerplate landmark every
    // clip shares cannot go quadratic), votes is one hash-agg on
    // (i, j, offset), and the per-pair argmax is the sort-free
    // max(struct) — no window, no per-partition sort, no cartesian.
    QueryDef(
      "m11_audio_alignment",
      (s, dir) => {
        import s.implicits._
        // Cached per (session, dir) for the same two-sided-join reason as
        // m09's idx — but materialized hash-partitioned AND sorted on the
        // join key (r18): a lazily-persisted idx re-exchanged and
        // re-sorted both sides of the self-join on every pass, while the
        // LogicalRDD leaf's preserved partitioning+ordering lets the
        // sort-merge self-join run exchange-free and sort-free.
        val idx = m11IdxCache.getOrElseUpdate((s, dir), {
          Dedup.evictStopped(m11IdxCache)
          val fp = mediaFingerprints(s, dir).filter($"kind" === "landmark")
            .select($"doc_id", $"idx".as("frame_idx"), $"v".as("h"))
          val dfc = fp.groupBy($"h").agg(countDistinct($"doc_id").as("df"))
          fp.join(dfc.filter($"df" <= 16), "h")
            .repartition($"h").sortWithinPartitions($"h")
            .materialized
        })
        idx.as("a").join(idx.as("b"),
            $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
          .groupBy($"a.doc_id".as("i"), $"b.doc_id".as("j"),
            ($"a.frame_idx" - $"b.frame_idx").as("off"))
          .agg(count(lit(1)).as("v"))
          .groupBy($"i", $"j")
          // argmax votes, tie -> smallest offset: max(struct(v, -off))
          .agg(max(struct($"v", (-$"off").as("noff"))).as("m"))
          .select($"i", $"j", (-$"m.noff").as("best_offset"), $"m.v".as("votes"))
          .filter($"votes" >= 3)
          .orderBy($"i", $"j")
      },
      Some(s"""
        WITH fp AS (
          SELECT doc_id, idx AS frame_idx, v AS h
          FROM $FP WHERE kind = 'landmark'),
        dfc AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM fp GROUP BY h),
        idx AS (SELECT fp.* FROM fp JOIN dfc USING (h) WHERE df <= 16),
        votes AS (
          SELECT a.doc_id AS i, b.doc_id AS j, a.frame_idx - b.frame_idx AS off,
                 COUNT(*) AS v
          FROM idx a JOIN idx b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3),
        best AS (
          SELECT i, j, off AS best_offset, v AS votes,
                 ROW_NUMBER() OVER (PARTITION BY i, j ORDER BY v DESC, off) AS rn
          FROM votes)
        SELECT i, j, best_offset, votes
        FROM best WHERE rn = 1 AND votes >= 3 ORDER BY i, j"""),
    ),

    // ---- m12: audio periodicity — tempo by energy autocorrelation ----
    // The rhythm question m07's segmentation and m11's alignment don't
    // ask: does a clip's energy envelope REPEAT, and at what period?
    // (Beat tracking's first stage: the autocorrelation of the frame
    // energy, whose argmax lag is the tempo hypothesis.) Per doc:
    // ac(lag) = Σ eᵢ·eᵢ₊lag over the REAL RMS energies of the decoded
    // WAV (the m07 feature table — tone/tone/silence blocks give the
    // envelope a 6-frame period the autocorrelation must find) for lag
    // 2..16, length-normalized by integral division (×10⁴ mean product,
    // so short-lag sums with more terms don't win by length alone), best
    // lag by the sort-free max(struct) with ties to the SMALLEST lag
    // (the fundamental, not its multiple). Shape: the frame rows ×15
    // lags self-join ONLY within a doc on the (doc, frame) key — per-doc
    // bounded (≤30×15 terms), embarrassingly parallel across docs, no
    // window, no cross-doc contact anywhere; docs shorter than 18 frames
    // (no lag-16 evidence) are excluded rather than reported on noise.
    QueryDef(
      "m12_audio_periodicity",
      (s, dir) => {
        import s.implicits._
        val fr = mediaFeatures(s, dir)
          .filter($"modality" === "audio")
          .select($"doc_id", $"idx".as("i"), $"v1".as("e"))
        val n = fr.groupBy($"doc_id").agg(count(lit(1)).as("n_frames"))
        val lags = s.range(2, 17).select($"id".as("lg"))
        val ac = fr.as("f1").crossJoin(broadcast(lags))
          .join(fr.as("f2"),
            col("f2.doc_id") === col("f1.doc_id") &&
              col("f2.i") === col("f1.i") + $"lg")
          .groupBy(col("f1.doc_id").as("doc_id"), $"lg")
          .agg(sum(col("f1.e") * col("f2.e")).as("ac"),
            count(lit(1)).as("n_terms"))
          .withColumn("ac_q", expr("ac * 10000 div n_terms"))
        ac.groupBy($"doc_id")
          .agg(max(struct($"ac_q", (-$"lg").as("nl"))).as("m"))
          .join(n, "doc_id")
          .filter($"n_frames" >= 18L)
          .select($"doc_id", $"n_frames", (-$"m.nl").as("best_lag"),
            $"m.ac_q".as("ac_q"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH fr AS (
          SELECT doc_id, idx AS i, v1 AS e
          FROM $FEAT WHERE modality = 'audio'),
        n AS (SELECT doc_id, COUNT(*) AS n_frames FROM fr GROUP BY doc_id),
        lags AS (SELECT unnest(range(2, 17)) AS lg),
        ac AS (
          SELECT f1.doc_id, l.lg, CAST(SUM(f1.e * f2.e) AS BIGINT) AS ac,
                 COUNT(*) AS n_terms
          FROM fr f1
          CROSS JOIN lags l
          JOIN fr f2 ON f2.doc_id = f1.doc_id AND f2.i = f1.i + l.lg
          GROUP BY f1.doc_id, l.lg),
        norm AS (
          SELECT doc_id, lg, ac * 10000 // n_terms AS ac_q FROM ac),
        best AS (
          SELECT doc_id, lg AS best_lag, ac_q,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY ac_q DESC, lg) AS rn
          FROM norm)
        SELECT b.doc_id, n.n_frames, b.best_lag, b.ac_q
        FROM best b JOIN n USING (doc_id)
        WHERE rn = 1 AND n.n_frames >= 18
        ORDER BY b.doc_id"""),
    ),
    )
  }
}
