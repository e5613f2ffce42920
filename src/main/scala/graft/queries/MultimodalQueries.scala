package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 X23 + multimodal ⊕ — opaque binary payload columns with
  * typed metadata, the shape a multimodal training pipeline uses for
  * image/audio/video blobs. The reference base64-encodes GeoTIFF bytes at
  * the JSON boundary (/root/reference/containers/landfire/
  * landfire_container.py:308-320); here the binary column is first-class
  * (`BinaryType`) and base64 is only the serialization boundary.
  *
  * The decode/feature-extract kernels are REAL for image and audio as of
  * round 12 — [[graft.ops.PngCodec]] (zlib IDAT + all five scanline
  * filters) and [[graft.ops.WavCodec]] (RIFF/PCM), JDK-only like
  * [[graft.ops.TiffCodec]] — oracled end-to-end by m7/m8 below. Only the
  * video frame kernel remains a documented deterministic fake in
  * [[graft.ops.MultimodalStub]] (no video codec is expressible JDK-only);
  * its Spark-side plumbing (schema, batch partitioning, per-partition
  * iteration) is real and unit-tested.
  */
object MultimodalQueries {

  /** X23 — binary round-trip: text → bytes → base64 → bytes → text, with
    * octet lengths. Proves BinaryType columns + the serialization
    * boundary relationally. */
  val m1 = Q(
    "m1_binary_roundtrip",
    "BinaryType column surface: encode → octet_length → base64 → unbase64 → decode round-trip flag per document.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .filter(col("doc_id") < 50)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("n_bytes", octet_length(col("payload")))
        // Spark's base64 may emit RFC-2045 MIME line breaks every 76 chars
        // (legacy chunking); normalize to the unchunked RFC-4648 form
        .withColumn("b64", regexp_replace(base64(col("payload")), "\r\n", ""))
        .withColumn("b64_len", length(col("b64")))
        .withColumn("roundtrip_ok", decode(unbase64(col("b64")), "UTF-8") === col("text"))
        .select("doc_id", "n_bytes", "b64_len", "roundtrip_ok")
    },
    Some("""SELECT doc_id,
            octet_length(encode(text)) AS n_bytes,
            length(base64(encode(text))) AS b64_len,
            (decode(from_base64(base64(encode(text)))) = text) AS roundtrip_ok
            FROM documents WHERE doc_id < 50""")
  )

  /** Multimodal metadata table: binary media blobs (synthesized
    * deterministically from doc text) + typed metadata, with the batch
    * bucketing/partition-assignment columns a mapInPandas/mapPartitions
    * feature-extraction pass would consume. */
  val m2 = Q(
    "m2_media_metadata",
    "Opaque media blobs + typed metadata: dims/byte-size derivation, megapixel math, aspect bucket, deterministic batch assignment for partition-wise decode.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .filter(col("doc_id") < 100)
        .withColumn("media_type",
          element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
            (col("doc_id") % 3 + 1).cast("int")))
        .withColumn("width", (col("doc_id") % 8 * 160 + 320).cast("int"))
        .withColumn("height", (col("doc_id") % 5 * 90 + 240).cast("int"))
        .withColumn("blob", encode(col("text"), "UTF-8")) // stand-in payload
        .withColumn("n_bytes", octet_length(col("blob")))
        .withColumn("megapixels", round(col("width") * col("height") / 1e6, 4))
        .withColumn("aspect",
          when(col("width") * 3 === col("height") * 4, "4:3")
            .when(col("width") * 9 === col("height") * 16, "16:9")
            .otherwise("other"))
        .withColumn("decode_batch", (col("doc_id") % 8).cast("int"))
        .select("doc_id", "media_type", "width", "height", "n_bytes",
          "megapixels", "aspect", "decode_batch")
    },
    Some("""SELECT doc_id,
            (['image/png', 'audio/wav', 'video/mp4'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
            CAST(doc_id % 8 * 160 + 320 AS INT) AS width,
            CAST(doc_id % 5 * 90 + 240 AS INT) AS height,
            octet_length(encode(text)) AS n_bytes,
            round(CAST(doc_id % 8 * 160 + 320 AS INT) * CAST(doc_id % 5 * 90 + 240 AS INT) / 1e6, 4) AS megapixels,
            CASE WHEN (doc_id % 8 * 160 + 320) * 3 = (doc_id % 5 * 90 + 240) * 4 THEN '4:3'
                 WHEN (doc_id % 8 * 160 + 320) * 9 = (doc_id % 5 * 90 + 240) * 16 THEN '16:9'
                 ELSE 'other' END AS aspect,
            CAST(doc_id % 8 AS INT) AS decode_batch
            FROM documents WHERE doc_id < 100""")
  )

  /** Multimodal feature-extract as relational array math: each embedding
    * is viewed as a row-major 8×8 single-channel "image"; resize to 4×4 by
    * nearest-neighbor (stride-2 sampling) and by 2×2 max-pooling — the two
    * downsample kernels a vision pre-processing pass runs per image. All
    * higher-order built-ins (codegen'd); per-row local work, no shuffle
    * until the final roll-up — exactly the 1000-executor decode shape.
    * Elements are cast to double pre-fold in both engines (bit parity). */
  val m3 = Q(
    "m3_resize_pool",
    "Image resize plumbing: 8x8 grid from embedding, nearest-neighbor 4x4 resize + 2x2 max-pool, per-label mean of both downsample sums.",
    (s, dir) => {
      val t = Tables(s, dir)
      // 1-based flat index of pixel (r, c) in the 8x8 row-major grid
      def px(r: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
        element_at(col("embedding"), (r * 8 + c + 1).cast("int")).cast("double")
      val out = t.embeddings
        .withColumn("nn_sum",
          aggregate(
            transform(sequence(lit(0), lit(15)),
              i => px((i / 4).cast("int") * 2, (i % 4) * 2)),
            lit(0.0), (acc, x) => acc + x))
        .withColumn("pool_sum",
          aggregate(
            transform(sequence(lit(0), lit(15)), i => {
              val r = (i / 4).cast("int") * 2
              val c = (i % 4) * 2
              greatest(px(r, c), px(r, c + 1), px(r + 1, c), px(r + 1, c + 1))
            }),
            lit(0.0), (acc, x) => acc + x))
      out.groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("nn_sum")), 6).as("avg_nn_sum"),
          round(avg(col("pool_sum")), 6).as("avg_pool_sum"))
    },
    Some("""WITH g AS (
              SELECT label,
                list_reduce(list_transform(generate_series(0, 15),
                  i -> CAST(embedding[(i // 4) * 2 * 8 + (i % 4) * 2 + 1] AS DOUBLE)),
                  (x, y) -> x + y) AS nn_sum,
                list_reduce(list_transform(generate_series(0, 15),
                  i -> greatest(
                    CAST(embedding[(i // 4) * 2 * 8 + (i % 4) * 2 + 1] AS DOUBLE),
                    CAST(embedding[(i // 4) * 2 * 8 + (i % 4) * 2 + 2] AS DOUBLE),
                    CAST(embedding[((i // 4) * 2 + 1) * 8 + (i % 4) * 2 + 1] AS DOUBLE),
                    CAST(embedding[((i // 4) * 2 + 1) * 8 + (i % 4) * 2 + 2] AS DOUBLE))),
                  (x, y) -> x + y) AS pool_sum
              FROM embeddings)
            SELECT label, count(*) AS n,
                   round(avg(nn_sum), 6) AS avg_nn_sum,
                   round(avg(pool_sum), 6) AS avg_pool_sum
            FROM g GROUP BY label""")
  )

  /** Fixed-window payload chunking — the audio/waveform framing shape:
    * a payload splits into fixed-size windows, each window becomes a row
    * with its own fingerprint (the unit a feature-extraction UDF or a
    * chunk-level dedup consumes). Row-local explode, no shuffle; at
    * 100 TB chunk rows inherit the scan's partitioning. */
  val m4 = Q(
    "m4_chunk_windows",
    "Fixed 64-byte window chunking: per-doc chunk rows with index, byte length, and md5 fingerprint - the audio-frame / feature-window unit.",
    (s, dir) => {
      val t = Tables(s, dir)
      // empty text yields zero chunks: Spark's sequence(0, -1) would infer
      // step -1 and emit [0, -1] where DuckDB's generate_series(0, -1) is
      // empty, so filter empties out explicitly (both engines agree)
      t.documents
        .filter(col("doc_id") < 40 && length(col("text")) > 0)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0),
            ceil(length(col("text")) / 64.0).cast("int") - 1)).as("chunk_idx"))
        .withColumn("chunk", col("text").substr(col("chunk_idx") * 64 + 1, lit(64)))
        .select(col("doc_id"), col("chunk_idx"),
          octet_length(encode(col("chunk"), "UTF-8")).as("n_bytes"),
          md5(col("chunk")).as("chunk_md5"))
    },
    Some("""WITH c AS (
              SELECT doc_id, i AS chunk_idx, substring(text, i*64 + 1, 64) AS chunk
              FROM documents,
                   unnest(generate_series(0, CAST(ceil(length(text)/64.0) AS INT) - 1)) AS t(i)
              WHERE doc_id < 40 AND length(text) > 0
            )
            SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
                   octet_length(encode(chunk)) AS n_bytes, md5(chunk) AS chunk_md5
            FROM c""")
  )

  /** Overlapping hop-window framing — the audio/waveform analysis shape
    * m4's disjoint chunks don't cover: frames of 16 samples advancing by
    * a hop of 8 (50% overlap, the STFT default), each frame reduced to
    * energy + peak — the unit a spectral-feature UDF consumes. Row-local
    * explode × fold, no shuffle; per-frame doubles are identical across
    * engines because both fold left-to-right from 0.0 over the same
    * casted elements (no rounding needed). */
  val m5 = Q(
    "m5_audio_frames",
    "Hop-window audio framing: 16-sample frames at hop 8 over the embedding waveform, per-frame energy and peak amplitude.",
    (s, dir) => {
      val t = Tables(s, dir)
      def el(i: org.apache.spark.sql.Column) =
        element_at(col("embedding"), (i + 1).cast("int")).cast("double")
      t.embeddings
        .filter(col("vec_id") < 50)
        .select(col("vec_id"), col("embedding"),
          explode(sequence(lit(0), lit(6))).as("frame_idx"))
        .withColumn("energy",
          aggregate(
            transform(sequence(lit(0), lit(15)), j => {
              val x = el(col("frame_idx") * 8 + j)
              x * x
            }),
            lit(0.0), (acc, x) => acc + x))
        .withColumn("peak",
          aggregate(
            transform(sequence(lit(0), lit(15)), j => abs(el(col("frame_idx") * 8 + j))),
            lit(0.0), (acc, x) => greatest(acc, x)))
        .select(col("vec_id"), col("frame_idx"), col("energy"), col("peak"))
    },
    Some("""SELECT vec_id, CAST(f AS INT) AS frame_idx,
              list_reduce(list_transform(generate_series(0, 15),
                j -> CAST(embedding[f*8 + j + 1] AS DOUBLE) * CAST(embedding[f*8 + j + 1] AS DOUBLE)),
                (x, y) -> x + y) AS energy,
              list_reduce(list_transform(generate_series(0, 15),
                j -> abs(CAST(embedding[f*8 + j + 1] AS DOUBLE))),
                (x, y) -> greatest(x, y)) AS peak
            FROM embeddings, unnest(generate_series(0, 6)) AS t(f)
            WHERE vec_id < 50""")
  )

  /** Content-defined chunking (CDC — the rsync/LBFS boundary rule): a
    * chunk boundary falls wherever the hash of the trailing 8-char
    * window lands in a 1-in-32 bucket, so the EXPECTED chunk is ~32
    * chars but every boundary is decided by LOCAL content only. That
    * locality is the point: insert a byte early in a document and all
    * fixed-window chunks (m4) after it shift — every downstream
    * fingerprint changes — while CDC boundaries re-synchronize at the
    * next content match, so near-identical documents share almost all
    * chunk fingerprints. That makes CDC the chunking tier that FEEDS
    * chunk-level dedup (a10_dedup_exact over chunk_fp) and delta
    * storage. Production CDC adds min/max chunk gates (a sequential
    * per-doc pass — still row-local, omitted here to keep the
    * relational form position-independent).
    *
    * Scale shape: boundary detection is a per-row explode of positions
    * with row-local hashing (embarrassingly parallel; the real engine
    * runs it as a rolling hash in one pass per doc — same cost class);
    * chunk assembly is one per-doc window over the boundary rows, keyed
    * by doc_id. Nothing crosses documents; 100 TB chunk rows inherit
    * the scan's partitioning, exactly like m4. */
  val m6 = Q(
    "m6_cdc_chunks",
    "Content-defined chunking: boundary where md5(trailing 8 chars) hits a 1-in-32 bucket; per-doc chunk rows with start, length, fingerprint.",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
        .filter(col("doc_id") < 40 && length(col("text")) > 0)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      // candidate boundaries: window END positions p in [8, len);
      // Spark's sequence(8, len) steps BACKWARD when len < 8, so the
      // explode side is pre-filtered (DuckDB's generate_series is
      // simply empty there)
      val bounds = docs.filter(col("len") >= 8)
        .select(col("doc_id"), col("text"), col("len"),
          explode(sequence(lit(8), col("len"))).as("p"))
        .filter(col("p") < col("len") &&
          expr("cast(conv(substring(md5(substring(text, p - 7, 8)), 1, 4), 16, 10) as int) % 32 = 0"))
      // every doc closes with a sentinel boundary at len — a doc with
      // no content boundary is one whole-doc chunk
      val ends = bounds.select(col("doc_id"), col("text"), col("p"))
        .unionByName(docs.select(col("doc_id"), col("text"), col("len").as("p")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("p"))
      ends
        .withColumn("chunk_start", coalesce(lag(col("p"), 1).over(w), lit(0)))
        .select(col("doc_id"),
          (row_number().over(w) - 1).as("chunk_idx"),
          col("chunk_start"),
          (col("p") - col("chunk_start")).as("chunk_len"),
          md5(col("text").substr(col("chunk_start") + 1, col("p") - col("chunk_start"))).as("chunk_fp"))
    },
    Some("""WITH d AS (
              SELECT doc_id, text, length(text) AS len FROM documents
              WHERE doc_id < 40 AND length(text) > 0
            ), b AS (
              SELECT doc_id, text, p FROM d,
                unnest(generate_series(8, len)) AS t(p)
              WHERE p < len AND
                ((strpos('0123456789abcdef', md5(substring(text, p - 7, 8))[1]) - 1) * 4096
                 + (strpos('0123456789abcdef', md5(substring(text, p - 7, 8))[2]) - 1) * 256
                 + (strpos('0123456789abcdef', md5(substring(text, p - 7, 8))[3]) - 1) * 16
                 + (strpos('0123456789abcdef', md5(substring(text, p - 7, 8))[4]) - 1)) % 32 = 0
            ), e AS (
              SELECT doc_id, text, CAST(p AS BIGINT) AS p FROM b
              UNION ALL
              SELECT doc_id, text, CAST(len AS BIGINT) AS p FROM d
            ), c AS (
              SELECT doc_id, text, p,
                coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) AS chunk_start,
                row_number() OVER (PARTITION BY doc_id ORDER BY p) - 1 AS chunk_idx
              FROM e
            )
            SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
              CAST(chunk_start AS INT) AS chunk_start,
              CAST(p - chunk_start AS INT) AS chunk_len,
              md5(substring(text, CAST(chunk_start AS INT) + 1, CAST(p - chunk_start AS INT))) AS chunk_fp
            FROM c""")
  )

  /** m6's boundary detection re-expressed through the NATIVE rolling-hash
    * expression [[graft.functions.CdcBoundaries]] (D5): one O(n) pass per
    * document — constant work per position — where m6's relational form
    * re-hashes the full 8-char window at every position (O(n·w), an md5
    * each). Same chunk-assembly tail (sentinel end, lag window,
    * fingerprints); the boundary rule differs only in hash family
    * (polynomial/2^20/37 here vs md5-bucket/32 there), both ~32-char
    * expected chunks. The oracle replicates the polynomial hash
    * positionally — independently validating the rolling recurrence
    * against the closed-form window sum. */
  val m6Native = Q(
    "m6_cdc_native",
    "CDC via the native O(n) rolling-hash expression cdc_boundaries(text); same chunk rows (start, length, fingerprint) as the relational form.",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
        .filter(col("doc_id") < 40 && length(col("text")) > 0)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      val ends = docs.select(col("doc_id"), col("text"),
        explode(concat(expr("cdc_boundaries(text)"), array(col("len")))).as("p"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("p"))
      ends
        .withColumn("chunk_start", coalesce(lag(col("p"), 1).over(w), lit(0)))
        .select(col("doc_id"),
          (row_number().over(w) - 1).as("chunk_idx"),
          col("chunk_start"),
          (col("p") - col("chunk_start")).as("chunk_len"),
          md5(col("text").substr(col("chunk_start") + 1, col("p") - col("chunk_start"))).as("chunk_fp"))
    },
    Some("""WITH d AS (
              SELECT doc_id, text, length(text) AS len FROM documents
              WHERE doc_id < 40 AND length(text) > 0
            ), b AS (
              -- closed-form window hash at each end position p:
              -- sum(code * 31^(7-k)) mod 2^20, boundary iff % 37 = 0
              SELECT doc_id, text, p FROM d,
                unnest(generate_series(8, len - 1)) AS t(p)
              WHERE ((unicode(substring(text, CAST(p AS INT) - 7, 1)) * 77023
                    + unicode(substring(text, CAST(p AS INT) - 6, 1)) * 408385
                    + unicode(substring(text, CAST(p AS INT) - 5, 1)) * 317599
                    + unicode(substring(text, CAST(p AS INT) - 4, 1)) * 923521
                    + unicode(substring(text, CAST(p AS INT) - 3, 1)) * 29791
                    + unicode(substring(text, CAST(p AS INT) - 2, 1)) * 961
                    + unicode(substring(text, CAST(p AS INT) - 1, 1)) * 31
                    + unicode(substring(text, CAST(p AS INT), 1))) % 1048576) % 37 = 0
            ), e AS (
              SELECT doc_id, text, CAST(p AS BIGINT) AS p FROM b
              UNION ALL
              SELECT doc_id, text, CAST(len AS BIGINT) AS p FROM d
            ), c AS (
              SELECT doc_id, text, p,
                coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) AS chunk_start,
                row_number() OVER (PARTITION BY doc_id ORDER BY p) - 1 AS chunk_idx
              FROM e
            )
            SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
              CAST(chunk_start AS INT) AS chunk_start,
              CAST(p - chunk_start AS INT) AS chunk_len,
              md5(substring(text, CAST(chunk_start AS INT) + 1, CAST(p - chunk_start AS INT))) AS chunk_fp
            FROM c""")
  )

  /** D1×m2 — REAL PNG decode in the pipeline (VERDICT r11 next #4): the
    * image analogue of d1_tiff_decode. Greyscale grids are encoded under
    * every scanline filter type (None/Sub/Up/Average/Paeth — one per
    * product, so each unfilter path must be exercised for its row to
    * match) plus one RGB product and one corrupt payload; bytes travel
    * as a BinaryType column, [[graft.ops.PngCodec]] decodes executor-
    * side, pixels explode WITH their position, and the position-weighted
    * checksum proves sample ORDER, not just the multiset. The oracle
    * reproduces the pixel formula directly — matching proves zlib
    * round-trip + unfiltering + channel interleaving end-to-end. */
  val m7 = Q(
    "m7_png_decode",
    "Real PNG decode: grey grids under all 5 scanline filters + RGB + corrupt payload; executor-side zlib+unfilter, position-weighted checksum vs formula oracle.",
    (s, _) => {
      import s.implicits._
      import graft.ops.PngCodec
      val w = 13; val h = 11
      def greyPx(p: Int): Array[Int] =
        Array.tabulate(w * h)(i => ((i / w) * 23 + (i % w) * 31 + p * 7) % 251)
      val rgbPx: Array[Int] = Array.tabulate(w * h * 3) { i =>
        val pix = i / 3; val k = i % 3
        ((pix / w) * 23 + (pix % w) * 31 + k * 11 + 35) % 251
      }
      val rows =
        (0 until 5).map(p => (s"grey_filter$p", PngCodec.encode(w, h, 1, greyPx(p), _ => p))) ++
          Seq(("rgb_mixed", PngCodec.encode(w, h, 3, rgbPx, r => r % 5, chunkPerRow = true)),
            ("corrupt", "<html>upstream error</html>".getBytes("UTF-8")))
      val decodeUdf = udf { (b: Array[Byte]) =>
        PngCodec.decode(b).map(_.pixels.toSeq).orNull
      }
      rows.toDF("product", "png")
        .withColumn("pixels", decodeUdf(col("png")))
        .withColumn("decoded", col("pixels").isNotNull)
        .select(col("product"), col("decoded"),
          posexplode_outer(col("pixels")).as(Seq("pos", "px")))
        .groupBy(col("product"), col("decoded"))
        .agg(count(col("px")).as("n_px"),
          coalesce(min(col("px")), lit(-1)).cast("long").as("min_px"),
          coalesce(max(col("px")), lit(-1)).cast("long").as("max_px"),
          coalesce(sum(col("px")), lit(0)).cast("long").as("sum_px"),
          coalesce(sum(col("px") * (col("pos") + 1)), lit(0)).cast("long").as("pos_checksum"))
    },
    Some("""WITH grey AS (
              SELECT 'grey_filter' || CAST(p AS VARCHAR) AS product,
                     CAST(r*13 + c AS BIGINT) AS pos,
                     CAST((r*23 + c*31 + p*7) % 251 AS BIGINT) AS px
              FROM generate_series(0, 4) ps(p),
                   generate_series(0, 10) rs(r), generate_series(0, 12) cs(c)
            ), rgb AS (
              SELECT 'rgb_mixed' AS product,
                     CAST((r*13 + c)*3 + k AS BIGINT) AS pos,
                     CAST((r*23 + c*31 + k*11 + 35) % 251 AS BIGINT) AS px
              FROM generate_series(0, 10) rs(r), generate_series(0, 12) cs(c),
                   generate_series(0, 2) ks(k)
            ), px AS (
              SELECT product, true AS decoded, pos, px FROM grey
              UNION ALL SELECT product, true, pos, px FROM rgb
              UNION ALL SELECT 'corrupt', false, NULL, NULL
            )
            SELECT product, decoded, count(px) AS n_px,
              CAST(coalesce(min(px), -1) AS BIGINT) AS min_px,
              CAST(coalesce(max(px), -1) AS BIGINT) AS max_px,
              CAST(coalesce(sum(px), 0) AS BIGINT) AS sum_px,
              CAST(coalesce(sum(px * (pos + 1)), 0) AS BIGINT) AS pos_checksum
            FROM px GROUP BY product, decoded""")
  )

  /** D1×m5 — REAL WAV decode in the pipeline: RIFF/PCM payloads
    * synthesized from a closed-form signal (16-bit mono and stereo,
    * 8-bit unsigned-on-disk, one with an ancillary LIST chunk, one
    * corrupt), decoded by [[graft.ops.WavCodec]] executor-side, samples
    * exploded with position — the checksum proves interleaving order and
    * the 8-bit re-centering, the same way m7 proves unfiltering. */
  val m8 = Q(
    "m8_wav_decode",
    "Real WAV decode: 16-bit mono/stereo + 8-bit PCM + LIST-chunk + corrupt payloads; executor-side RIFF parse, position-weighted checksum vs formula oracle.",
    (s, _) => {
      import s.implicits._
      import graft.ops.WavCodec
      def sig16(p: Int, n: Int): Array[Int] =
        Array.tabulate(n)(t => ((t * 37 + p * 11) % 2003) - 1001)
      val sig8: Array[Int] = Array.tabulate(64)(t => ((t * 13 + 7) % 241) - 120)
      val rows = Seq(
        ("mono_p0", WavCodec.encode(sig16(0, 240), 8000, 1)),
        ("mono_p1", WavCodec.encode(sig16(1, 240), 16000, 1, junkChunk = true)),
        ("stereo", WavCodec.encode(sig16(2, 480), 44100, 2)),
        ("pcm8", WavCodec.encode(sig8, 8000, 1, bits = 8)),
        ("corrupt", "<html>upstream error</html>".getBytes("UTF-8")))
      val decodeUdf = udf { (b: Array[Byte]) =>
        WavCodec.decode(b).map(w => (w.sampleRate, w.channels, w.samples.toSeq)).orNull
      }
      rows.toDF("product", "wav")
        .withColumn("d", decodeUdf(col("wav")))
        .withColumn("decoded", col("d").isNotNull)
        .select(col("product"), col("decoded"),
          coalesce(col("d._1"), lit(-1)).as("sample_rate"),
          coalesce(col("d._2"), lit(-1)).as("channels"),
          posexplode_outer(col("d._3")).as(Seq("pos", "smp")))
        .groupBy(col("product"), col("decoded"), col("sample_rate"), col("channels"))
        .agg(count(col("smp")).as("n_samples"),
          coalesce(min(col("smp")), lit(0)).cast("long").as("min_smp"),
          coalesce(max(col("smp")), lit(0)).cast("long").as("max_smp"),
          coalesce(sum(col("smp")), lit(0)).cast("long").as("sum_smp"),
          coalesce(sum(col("smp") * (col("pos") + 1)), lit(0)).cast("long").as("pos_checksum"))
    },
    Some("""WITH s16 AS (
              SELECT p, CAST(t AS BIGINT) AS pos,
                     CAST((t*37 + p*11) % 2003 - 1001 AS BIGINT) AS smp
              FROM generate_series(0, 2) ps(p), generate_series(0, 479) ts(t)
              WHERE p = 2 OR t < 240
            ), named AS (
              SELECT CASE p WHEN 0 THEN 'mono_p0' WHEN 1 THEN 'mono_p1' ELSE 'stereo' END AS product,
                     CASE p WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS sample_rate,
                     CASE p WHEN 2 THEN 2 ELSE 1 END AS channels,
                     pos, smp
              FROM s16
            ), s8 AS (
              SELECT 'pcm8' AS product, 8000 AS sample_rate, 1 AS channels,
                     CAST(t AS BIGINT) AS pos,
                     CAST((t*13 + 7) % 241 - 120 AS BIGINT) AS smp
              FROM generate_series(0, 63) ts(t)
            ), allrows AS (
              SELECT product, true AS decoded, sample_rate, channels, pos, smp FROM named
              UNION ALL SELECT product, true, sample_rate, channels, pos, smp FROM s8
              UNION ALL SELECT 'corrupt', false, -1, -1, NULL, NULL
            )
            SELECT product, decoded, sample_rate, channels, count(smp) AS n_samples,
              CAST(coalesce(min(smp), 0) AS BIGINT) AS min_smp,
              CAST(coalesce(max(smp), 0) AS BIGINT) AS max_smp,
              CAST(coalesce(sum(smp), 0) AS BIGINT) AS sum_smp,
              CAST(coalesce(sum(smp * (pos + 1)), 0) AS BIGINT) AS pos_checksum
            FROM allrows GROUP BY product, decoded, sample_rate, channels""")
  )

  def all: Seq[Q] = Seq(m1, m2, m3, m4, m5, m6, m6Native, m7, m8)
}
