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
  * The decode/feature-extract step (no image libs in this container) is a
  * deterministic stub in [[graft.ops.MultimodalStub]] — the Spark-side
  * plumbing (schema, batch partitioning, per-partition iteration) is real
  * and unit-tested; only the codec kernel is fake.
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

  def all: Seq[Q] = Seq(m1, m2, m3, m4, m5, m6, m6Native)
}
