package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, Corpus, Dedup, Multimodal, Prep, Quality, Relational, Similarity, TextAnalysis, Warehouse}
import graft.sources.Tables

/** Multimodal family: `SparkEntry.queries` registrations + their DuckDB
  * oracles (round-17 verdict task 6 — the 8k-line single-file registry
  * split per family; `SparkEntry` folds every family back into the one
  * driver-contract map, and OracleCoverageSpec still guards that every
  * query has its oracle).
  */
private[graft] object MultimodalEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_multimodal_meta" -> (Multimodal.meta _),
    "q27_multimodal_decode" -> (Multimodal.decodeFeatures _),
    "q36_mm_resize" -> (Multimodal.resizeThumbnail _),
    "q37_mm_frame_sample" -> ((s, d) => Multimodal.frameSample(s, d)),
    // q302: corpus modality inventory over the real container headers
    "q302_media_census" -> (Multimodal.mediaCensus _),
    "q69_mm_png_roundtrip" -> (Multimodal.pngRoundtrip _),
    "q72_mm_wav_roundtrip" -> (Multimodal.wavRoundtrip _),
    "q277_image_dhash_dups" -> ((s, d) => Multimodal.imageDHashDups(s, d)),
    "q278_audio_fp_dups" -> ((s, d) => Multimodal.audioFpDups(s, d)),
    "q279_scene_cuts" -> ((s, d) => Multimodal.sceneCuts(s, d)),
    "q280_dup_evidence" -> ((s, d) => Multimodal.dupEvidence(s, d)),
    "q281_clip_dups" -> ((s, d) => Multimodal.clipDups(s, d)),
    "q284_audio_vad" -> ((s, d) => Multimodal.audioVad(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  private val q277OracleSql: String =
      """WITH ids AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id >= 1 AND doc_id % 17 = 3 THEN doc_id - 1 ELSE doc_id END AS base,
        |    (doc_id >= 1 AND doc_id % 17 = 3) AS planted
        |  FROM documents
        |), dims AS (
        |  SELECT doc_id, base, planted,
        |    16 + base % 48 AS w, 16 + (base * 7) % 48 AS h
        |  FROM ids
        |), px AS (
        |  SELECT d.doc_id,
        |    (9 * x.x + 8) // d.w AS ci, (8 * y.y + 7) // d.h AS cj,
        |    ( (CASE WHEN d.planted THEN ((x.x*31 + y.y*17 + d.base) % 256 + 6) % 256
        |            ELSE (x.x*31 + y.y*17 + d.base) % 256 END)
        |    + (CASE WHEN d.planted THEN ((x.x*13 + y.y*29 + d.base*3) % 256 + 6) % 256
        |            ELSE (x.x*13 + y.y*29 + d.base*3) % 256 END)
        |    + (CASE WHEN d.planted THEN ((x.x*7 + y.y*11 + d.base*5) % 256 + 6) % 256
        |            ELSE (x.x*7 + y.y*11 + d.base*5) % 256 END) ) // 3 AS gray
        |  FROM dims d, range(0, 63) x(x), range(0, 63) y(y)
        |  WHERE x.x < d.w AND y.y < d.h
        |), cells AS (
        |  SELECT doc_id, ci, cj, SUM(gray) // COUNT(*) AS cv
        |  FROM px GROUP BY 1, 2, 3
        |), bits AS (
        |  SELECT a.doc_id, a.cj * 8 + a.ci AS pos
        |  FROM cells a JOIN cells b
        |    ON b.doc_id = a.doc_id AND b.cj = a.cj AND b.ci = a.ci + 1
        |  WHERE a.ci <= 7 AND b.cv > a.cv
        |), hashes AS (
        |  -- the SUM is HUGEINT; cast back to the signed-64 domain or a
        |  -- negative hash drags 64 sign-extension bits into bit_count
        |  SELECT i.doc_id, CAST(COALESCE(s.hsh, 0) AS BIGINT) AS dhash
        |  FROM ids i LEFT JOIN (
        |    SELECT doc_id, SUM(CASE WHEN pos = 63 THEN -9223372036854775807 - 1
        |                            ELSE (CAST(1 AS BIGINT) << pos) END) AS hsh
        |    FROM bits GROUP BY 1) s ON s.doc_id = i.doc_id
        |), bandk AS (
        |  SELECT h.doc_id, h.dhash, b.b, (h.dhash >> (16 * b.b)) & 65535 AS k,
        |    ROW_NUMBER() OVER (PARTITION BY b.b, (h.dhash >> (16 * b.b)) & 65535
        |                       ORDER BY h.doc_id) AS rn
        |  FROM hashes h, range(0, 4) b(b)
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    x.dhash AS ha, y.dhash AS hb
        |  FROM bandk x JOIN bandk y
        |    ON x.b = y.b AND x.k = y.k
        |   AND y.rn > x.rn AND y.rn <= x.rn + 8
        |)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 10""".stripMargin

  private val q278OracleSql: String =
      """WITH ids AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id >= 1 AND doc_id % 19 = 5 THEN doc_id - 1 ELSE doc_id END AS base,
        |    (doc_id >= 1 AND doc_id % 19 = 5) AS planted
        |  FROM documents
        |), dims AS (
        |  SELECT doc_id, base, planted, 256 + base % 512 AS n FROM ids
        |), smp AS (
        |  SELECT doc_id, (65 * t + 64) // n AS f,
        |    ABS(CASE WHEN planted THEN v - (v >> 4) ELSE v END) AS av
        |  FROM (
        |    SELECT d.doc_id, d.planted, d.n, t.t AS t,
        |      CAST(( (d.base * 25173 % 65536 + t.t * 13849) % 65536
        |           + (d.base * 12289 % 65536 + t.t * 31397) % 65536 ) % 65536
        |           - 32768 AS BIGINT) AS v
        |    FROM dims d, range(0, 768) t(t) WHERE t.t < d.n
        |  )
        |), frames AS (
        |  SELECT doc_id, f, SUM(av) // COUNT(*) AS fv FROM smp GROUP BY 1, 2
        |), bits AS (
        |  SELECT a.doc_id, a.f AS pos
        |  FROM frames a JOIN frames b ON b.doc_id = a.doc_id AND b.f = a.f + 1
        |  WHERE a.f <= 63 AND b.fv > a.fv
        |), hashes AS (
        |  SELECT i.doc_id, CAST(COALESCE(s.hsh, 0) AS BIGINT) AS afp
        |  FROM ids i LEFT JOIN (
        |    SELECT doc_id, SUM(CASE WHEN pos = 63 THEN -9223372036854775807 - 1
        |                            ELSE (CAST(1 AS BIGINT) << pos) END) AS hsh
        |    FROM bits GROUP BY 1) s ON s.doc_id = i.doc_id
        |), bandk AS (
        |  SELECT h.doc_id, h.afp, b.b, (h.afp >> (16 * b.b)) & 65535 AS k,
        |    ROW_NUMBER() OVER (PARTITION BY b.b, (h.afp >> (16 * b.b)) & 65535
        |                       ORDER BY h.doc_id) AS rn
        |  FROM hashes h, range(0, 4) b(b)
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    x.afp AS ha, y.afp AS hb
        |  FROM bandk x JOIN bandk y
        |    ON x.b = y.b AND x.k = y.k
        |   AND y.rn > x.rn AND y.rn <= x.rn + 8
        |)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 4""".stripMargin

  private val q281OracleSql: String =
      """WITH cdims AS (
        |  SELECT doc_id,
        |    (doc_id >= 1 AND doc_id % 23 = 7) AS planted,
        |    CASE WHEN doc_id >= 1 AND doc_id % 23 = 7 THEN doc_id - 1 ELSE doc_id END AS base
        |  FROM documents
        |), cframes AS (
        |  SELECT doc_id, planted, base,
        |    CASE WHEN planted THEN 1 + base % 7 ELSE 2 + base % 7 END AS nf
        |  FROM cdims
        |), cpx AS (
        |  -- the trimmed twin's frame f is the base clip's frame f+1, +2
        |  -- brightness; pixel = multiply-xorshift-multiply hash of
        |  -- (base, scene, raster index), replayed arithmetic-for-arithmetic
        |  SELECT d.doc_id, f.f AS f, i.i AS i,
        |    CAST(CASE WHEN d.planted THEN f.f + 1 ELSE f.f END AS BIGINT) AS bf,
        |    (bf // 3) AS p,
        |    ((d.base * 2654435761 + p * 40503) % 2147483648 * 48271) % 2147483647 AS seed,
        |    (seed + (i.i + 1) * 69621) % 2147483647 AS v1,
        |    (v1 * 16807) % 2147483647 AS v2,
        |    xor(v2, v2 >> 16) AS v3,
        |    (v3 * 48271) % 2147483647 AS v4,
        |    (v4 % 256 + 3 * bf + CASE WHEN d.planted THEN 2 ELSE 0 END) % 256 AS g
        |  FROM cframes d, range(0, 8) f(f), range(0, 64) i(i)
        |  WHERE f.f < d.nf
        |), cbits AS (
        |  SELECT a.doc_id, a.f, a.i AS pos
        |  FROM cpx a JOIN cpx b ON b.doc_id = a.doc_id AND b.f = a.f AND b.i = a.i + 1
        |  WHERE a.i <= 62 AND b.g > a.g
        |), cfps AS (
        |  SELECT d.doc_id, fr.f AS frame, COALESCE(CAST(s.h AS BIGINT), 0) AS fp
        |  FROM cframes d JOIN range(0, 8) fr(f) ON fr.f < d.nf
        |  LEFT JOIN (SELECT doc_id, f, SUM(CAST(1 AS BIGINT) << pos) AS h
        |             FROM cbits GROUP BY 1, 2) s
        |    ON s.doc_id = d.doc_id AND s.f = fr.f
        |), cmarked AS (
        |  SELECT doc_id, frame, fp,
        |    CASE WHEN LAG(fp) OVER (PARTITION BY doc_id ORDER BY frame) IS NULL THEN 999
        |         ELSE bit_count(xor(fp, LAG(fp) OVER (PARTITION BY doc_id ORDER BY frame))) END
        |      AS hamming_prev
        |  FROM cfps
        |), csig AS (
        |  -- scene keyframes: frame 0 or a Hamming jump > 8 (q279's rule)
        |  SELECT doc_id, fp,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY frame) AS scene
        |  FROM cmarked WHERE hamming_prev = 999 OR hamming_prev > 8
        |), cpacks AS (
        |  SELECT doc_id, COUNT(*) AS n FROM csig GROUP BY 1
        |), cbandk AS (
        |  SELECT s.doc_id, s.fp, b.b, (s.fp >> (16 * b.b)) & 65535 AS k,
        |    ROW_NUMBER() OVER (PARTITION BY b.b, (s.fp >> (16 * b.b)) & 65535
        |                       ORDER BY s.doc_id, s.fp) AS rn
        |  FROM csig s, range(0, 4) b(b)
        |), ccand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM cbandk x JOIN cbandk y
        |    ON x.b = y.b AND x.k = y.k
        |   AND y.rn > x.rn AND y.rn <= x.rn + 8
        |  WHERE x.doc_id < y.doc_id
        |), cmatched AS (
        |  -- per-element EXISTS: an element of a's signature matches if
        |  -- SOME element of b's is within Hamming 10
        |  SELECT doc_a, doc_b, COUNT(*) AS m FROM (
        |    SELECT DISTINCT c.doc_a, c.doc_b, sa.scene
        |    FROM ccand c
        |    JOIN csig sa ON sa.doc_id = c.doc_a
        |    JOIN csig sb ON sb.doc_id = c.doc_b
        |     AND bit_count(xor(sa.fp, sb.fp)) <= 10
        |  ) GROUP BY 1, 2
        |)
        |SELECT m.doc_a, m.doc_b,
        |  CAST(pa.n AS INT) AS n_a, CAST(pb.n AS INT) AS n_b,
        |  CAST(m.m AS INT) AS matched
        |FROM cmatched m
        |JOIN cpacks pa ON pa.doc_id = m.doc_a
        |JOIN cpacks pb ON pb.doc_id = m.doc_b
        |WHERE 2 * m.m >= GREATEST(pa.n, pb.n)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    // q26: the Spark side sniffs real container magic bytes and reads
    // dimensions/frame counts out of the actual PNG/GIF/WAVE structures
    // (header-only, javax.imageio/javax.sound); the oracle recomputes
    // them from the synthesis closed forms per modality.
    "q26_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'wav' END AS container,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(16 + doc_id % 48 AS INT)
        |                  WHEN 1 THEN CAST(8 AS INT) ELSE CAST(NULL AS INT) END AS width,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(16 + (doc_id * 7) % 48 AS INT)
        |                  WHEN 1 THEN CAST(8 AS INT) ELSE CAST(NULL AS INT) END AS height,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(1 AS INT)
        |                  WHEN 1 THEN CAST(1 + doc_id % 8 AS INT)
        |                  ELSE CAST(256 + doc_id % 512 AS INT) END AS n_frames
        |FROM documents""".stripMargin,

    // q27: full real decode per modality — PNG pixel sums (q69's closed
    // form), GIF pixel sums across ALL frames (q37's form summed over
    // the frame axis), WAVE abs-sample sums (q72's form) — unioned.
    "q27_multimodal_decode" ->
      """WITH png AS (
        |  SELECT doc_id, CAST(16 + doc_id % 48 AS INT) AS width,
        |    CAST(16 + (doc_id * 7) % 48 AS INT) AS height
        |  FROM documents WHERE doc_id % 3 = 0
        |), png_sum AS (
        |  SELECT p.doc_id, 'png' AS format, p.width, p.height, CAST(1 AS INT) AS frames,
        |    CAST(SUM( (x * 31 + y * 17 + p.doc_id) % 256
        |            + (x * 13 + y * 29 + p.doc_id * 3) % 256
        |            + (x * 7 + y * 11 + p.doc_id * 5) % 256) AS BIGINT) AS content_sum
        |  FROM png p,
        |  LATERAL (SELECT unnest(range(0, p.width)) AS x) tx,
        |  LATERAL (SELECT unnest(range(0, p.height)) AS y) ty
        |  GROUP BY 1, 2, 3, 4, 5
        |), gif AS (
        |  SELECT doc_id, CAST(1 + doc_id % 8 AS INT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 1
        |), gif_sum AS (
        |  SELECT g.doc_id, 'gif' AS format, CAST(8 AS INT) AS width,
        |    CAST(8 AS INT) AS height, g.n_frames AS frames,
        |    CAST(SUM((x * 31 + y * 17 + g.doc_id + f * 7) % 256) AS BIGINT) AS content_sum
        |  FROM gif g,
        |  LATERAL (SELECT unnest(range(0, g.n_frames)) AS f) tf,
        |  LATERAL (SELECT unnest(range(0, 8)) AS x) tx,
        |  LATERAL (SELECT unnest(range(0, 8)) AS y) ty
        |  GROUP BY 1, 2, 3, 4, 5
        |), wav AS (
        |  SELECT doc_id, CAST(256 + doc_id % 512 AS INT) AS n_samples
        |  FROM documents WHERE doc_id % 3 = 2
        |), wav_sum AS (
        |  SELECT w.doc_id, 'wav' AS format, CAST(NULL AS INT) AS width,
        |    CAST(NULL AS INT) AS height, w.n_samples AS frames,
        |    CAST(SUM(ABS((w.doc_id * 31 + t * 17) % 65536 - 32768)) AS BIGINT) AS content_sum
        |  FROM wav w,
        |  LATERAL (SELECT unnest(range(0, w.n_samples)) AS t) tt
        |  GROUP BY 1, 2, 3, 4, 5
        |)
        |SELECT * FROM png_sum UNION ALL SELECT * FROM gif_sum UNION ALL SELECT * FROM wav_sum""".stripMargin,

    // q36: the Spark side decodes the q69 synthetic PNG, box-downscales
    // 2×2 with integer floor, re-encodes + re-decodes the thumbnail, and
    // sums its pixels; the oracle recomputes the identical integer math
    // from the closed-form source pixels (PNG is lossless), so a hash
    // match proves real resize work on really decoded pixels.
    "q36_mm_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST((16 + doc_id % 48) // 2 AS INT) AS width,
        |    CAST((16 + (doc_id * 7) % 48) // 2 AS INT) AS height
        |  FROM documents
        |)
        |SELECT d.doc_id, d.width, d.height,
        |  CAST(SUM(
        |    ( ((2*x) * 31 + (2*y) * 17 + d.doc_id) % 256
        |    + ((2*x+1) * 31 + (2*y) * 17 + d.doc_id) % 256
        |    + ((2*x) * 31 + (2*y+1) * 17 + d.doc_id) % 256
        |    + ((2*x+1) * 31 + (2*y+1) * 17 + d.doc_id) % 256 ) // 4
        |  + ( ((2*x) * 13 + (2*y) * 29 + d.doc_id * 3) % 256
        |    + ((2*x+1) * 13 + (2*y) * 29 + d.doc_id * 3) % 256
        |    + ((2*x) * 13 + (2*y+1) * 29 + d.doc_id * 3) % 256
        |    + ((2*x+1) * 13 + (2*y+1) * 29 + d.doc_id * 3) % 256 ) // 4
        |  + ( ((2*x) * 7 + (2*y) * 11 + d.doc_id * 5) % 256
        |    + ((2*x+1) * 7 + (2*y) * 11 + d.doc_id * 5) % 256
        |    + ((2*x) * 7 + (2*y+1) * 11 + d.doc_id * 5) % 256
        |    + ((2*x+1) * 7 + (2*y+1) * 11 + d.doc_id * 5) % 256 ) // 4
        |  ) AS BIGINT) AS px_sum
        |FROM dims d,
        |LATERAL (SELECT unnest(range(0, d.width)) AS x) tx,
        |LATERAL (SELECT unnest(range(0, d.height)) AS y) ty
        |GROUP BY 1, 2, 3""".stripMargin,

    // q37: the Spark side writes a real multi-frame GIF (256-gray
    // indexed, lossless), decodes it back, and emits every 2nd frame
    // with its decoded pixel sum; the oracle recomputes from the
    // closed-form frame-pixel function.
    "q37_mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, CAST(1 + doc_id % 8 AS INT) AS n_frames FROM documents
        |)
        |SELECT f.doc_id, CAST(fi AS INT) AS frame_idx, f.n_frames,
        |  CAST(SUM((x * 31 + y * 17 + f.doc_id + fi * 7) % 256) AS BIGINT) AS px_sum
        |FROM f,
        |LATERAL (SELECT unnest(range(0, f.n_frames, 2)) AS fi) tf,
        |LATERAL (SELECT unnest(range(0, 8)) AS x) tx,
        |LATERAL (SELECT unnest(range(0, 8)) AS y) ty
        |GROUP BY 1, 2, 3""".stripMargin,

    // q69: the Spark side synthesizes a real PNG per doc and DECODES it
    // with javax.imageio; width/height/pixel-sum come from the decoded
    // image. The oracle recomputes them from the closed-form pixel
    // function (PNG is lossless), so a hash match proves genuine binary
    // codec work round-tripped exactly.
    "q69_mm_png_roundtrip" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(16 + doc_id % 48 AS INT) AS width,
        |    CAST(16 + (doc_id * 7) % 48 AS INT) AS height
        |  FROM documents
        |)
        |SELECT d.doc_id, d.width, d.height,
        |  CAST(SUM( (x * 31 + y * 17 + d.doc_id) % 256
        |          + (x * 13 + y * 29 + d.doc_id * 3) % 256
        |          + (x * 7 + y * 11 + d.doc_id * 5) % 256) AS BIGINT) AS px_sum
        |FROM dims d,
        |LATERAL (SELECT unnest(range(0, d.width)) AS x) tx,
        |LATERAL (SELECT unnest(range(0, d.height)) AS y) ty
        |GROUP BY 1, 2, 3""".stripMargin,

    // q72: the Spark side synthesizes a real RIFF/WAVE file per doc and
    // DECODES it with javax.sound.sampled; count/sum/abs-sum come from
    // the decoded PCM frames. The oracle recomputes them from the
    // closed-form sample function (WAV PCM is lossless), so a hash match
    // proves genuine audio codec work round-tripped exactly.
    "q72_mm_wav_roundtrip" ->
      """WITH lens AS (
        |  SELECT doc_id, CAST(256 + doc_id % 512 AS INT) AS n_samples
        |  FROM documents
        |)
        |SELECT l.doc_id, l.n_samples,
        |  CAST(SUM((l.doc_id * 31 + t * 17) % 65536 - 32768) AS BIGINT) AS sample_sum,
        |  CAST(SUM(ABS((l.doc_id * 31 + t * 17) % 65536 - 32768)) AS BIGINT) AS sample_abs_sum
        |FROM lens l,
        |LATERAL (SELECT unnest(range(0, l.n_samples)) AS t) tt
        |GROUP BY 1, 2""".stripMargin,

    // q277: image perceptual-hash near-dup. The Spark side synthesizes
    // real PNGs (docs ≡ 3 mod 17 carry a +6-brightness mod-256 re-encode
    // of doc_id-1's image), decodes them, and dHashes the decoded
    // pixels; the oracle rebuilds the SAME hashes from the closed-form
    // pixel function (PNG is lossless), then replays the 4×16-bit
    // Hamming-band LSH and the bit_count verify. A hash match therefore
    // proves the whole codec→hash→band→verify chain.
    "q277_image_dhash_dups" ->
      q277OracleSql,

    // q278: audio perceptual-fingerprint near-dup — q277's pipeline over
    // the WAV side. The Spark kernel decodes real RIFF/WAVE PCM (docs
    // ≡ 5 mod 19 carry a 63/64-gain re-encode of doc_id-1's audio) and
    // fingerprints 65 frame-mean-|amplitude|s by sign of delta; the
    // oracle rebuilds the samples closed-form (WAV PCM is lossless) and
    // replays frames → bits → bands → bounded window → bit_count.
    "q278_audio_fp_dups" ->
      q278OracleSql,

    // q279: GIF scene-cut detection. Spark decodes real multi-frame GIF
    // bytes and fingerprints each frame (63-bit raster sign-of-delta);
    // the oracle rebuilds the frames closed-form (indexed gray is
    // lossless) and replays lag/threshold/scene numbering. Scene changes
    // rotate the gradient direction; within-scene drift is additive and
    // must NOT cut.
    "q279_scene_cuts" ->
      """WITH dims AS (
        |  SELECT doc_id, 2 + doc_id % 7 AS n FROM documents
        |), px AS (
        |  SELECT d.doc_id, f.f AS f, y.y * 8 + x.x AS i,
        |    (x.x * (31 + 37 * (f.f // 3)) + y.y * (17 + 53 * (f.f // 3))
        |     + d.doc_id + f.f * 3) % 256 AS g
        |  FROM dims d, range(0, 8) f(f), range(0, 8) x(x), range(0, 8) y(y)
        |  WHERE f.f < d.n
        |), bits AS (
        |  SELECT a.doc_id, a.f, a.i AS pos
        |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.f = a.f AND b.i = a.i + 1
        |  WHERE a.i <= 62 AND b.g > a.g
        |), fps AS (
        |  SELECT d.doc_id, fr.f AS frame,
        |    COALESCE(CAST(s.h AS BIGINT), 0) AS fp
        |  FROM dims d
        |  JOIN range(0, 8) fr(f) ON fr.f < d.n
        |  LEFT JOIN (SELECT doc_id, f, SUM(CAST(1 AS BIGINT) << pos) AS h
        |             FROM bits GROUP BY 1, 2) s
        |    ON s.doc_id = d.doc_id AND s.f = fr.f
        |), marked AS (
        |  SELECT doc_id, frame,
        |    CASE WHEN LAG(fp) OVER (PARTITION BY doc_id ORDER BY frame) IS NULL
        |         THEN -1
        |         ELSE bit_count(xor(fp, LAG(fp) OVER (PARTITION BY doc_id ORDER BY frame))) END
        |      AS hamming_prev
        |  FROM fps
        |)
        |SELECT doc_id, CAST(frame AS INT) AS frame,
        |  CAST(hamming_prev AS INT) AS hamming_prev,
        |  (hamming_prev = -1 OR hamming_prev > 8) AS new_scene,
        |  CAST(SUM(CASE WHEN hamming_prev = -1 OR hamming_prev > 8 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY frame) AS BIGINT) AS scene_id
        |FROM marked""".stripMargin,

    // q280: multimodal dup-evidence fusion — the q277, q278, and q281
    // verdict chains composed verbatim as CTEs (the oracle literally
    // reuses the three independently-gated queries) and FULL OUTER
    // joined on the pair key; absent verdicts surface as -1 so the
    // table hash-compares.
    "q280_dup_evidence" ->
      s"""WITH img AS (
         |$q277OracleSql
         |), aud AS (
         |$q278OracleSql
         |), vid AS (
         |$q281OracleSql
         |), ia AS (
         |SELECT COALESCE(i.doc_a, a.doc_a) AS doc_a,
         |  COALESCE(i.doc_b, a.doc_b) AS doc_b,
         |  i.hamming AS ih, a.hamming AS ah
         |FROM img i FULL OUTER JOIN aud a
         |  ON i.doc_a = a.doc_a AND i.doc_b = a.doc_b
         |)
         |SELECT COALESCE(x.doc_a, v.doc_a) AS doc_a,
         |  COALESCE(x.doc_b, v.doc_b) AS doc_b,
         |  CAST(COALESCE(x.ih, -1) AS INT) AS img_hamming,
         |  CAST(COALESCE(x.ah, -1) AS INT) AS aud_hamming,
         |  CAST(COALESCE(v.matched, -1) AS INT) AS vid_matched,
         |  CAST((CASE WHEN x.ih IS NULL THEN 0 ELSE 1 END)
         |     + (CASE WHEN x.ah IS NULL THEN 0 ELSE 1 END)
         |     + (CASE WHEN v.doc_a IS NULL THEN 0 ELSE 1 END) AS INT)
         |    AS n_modalities
         |FROM ia x FULL OUTER JOIN vid v
         |  ON x.doc_a = v.doc_a AND x.doc_b = v.doc_b""".stripMargin,

    // q281: clip-level video near-dup. Spark decodes real multi-frame
    // GIF bytes (the planted twins are TRIMMED + brightness-ridden
    // re-encodes of their neighbour's actual bytes), extracts scene
    // keyframes partition-locally, and band-joins + set-overlap
    // verifies; the oracle rebuilds every frame from the closed-form
    // pixel hash (indexed gray is lossless) and replays the identical
    // cut rule, banding, bounded window, and overlap verdict.
    "q281_clip_dups" ->
      q281OracleSql,

    // q284: audio VAD segmentation. Spark decodes a real RIFF/WAVE
    // round trip and segments voiced runs inside the kernel; the oracle
    // replays the closed-form per-sample waveform (16-bit PCM is
    // lossless), the integer window energies, and the gaps-and-islands
    // run decomposition.
    "q284_audio_vad" ->
      """WITH d AS (
        |  SELECT doc_id, 512 + doc_id % 512 AS n,
        |    (doc_id * 25173) % 65536 AS p1, (doc_id * 12289) % 65536 AS p2
        |  FROM documents
        |), smp AS (
        |  SELECT d.doc_id, t.t // 64 AS w,
        |    abs(CASE WHEN (d.doc_id * 31 + (t.t // 64) * 17) % 5 >= 2
        |      THEN ((d.p1 + t.t * 13849) % 65536
        |            + (d.p2 + t.t * 31397) % 65536) % 65536 - 32768
        |      ELSE (d.p1 + t.t * 13849) % 128 - 64 END) AS av
        |  FROM d, range(0, 1024) t(t) WHERE t.t < d.n
        |), wins AS (
        |  SELECT doc_id, w, (SUM(av) // COUNT(*) >= 4096) AS on_w
        |  FROM smp GROUP BY 1, 2
        |), isl AS (
        |  SELECT doc_id, w,
        |    w - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS grp
        |  FROM wins WHERE on_w
        |), segs AS (
        |  SELECT doc_id, grp, COUNT(*) AS len FROM isl GROUP BY 1, 2
        |), perdoc AS (
        |  SELECT doc_id, COUNT(*) AS n_windows,
        |    SUM(CASE WHEN on_w THEN 1 ELSE 0 END) AS voiced_windows
        |  FROM wins GROUP BY 1
        |)
        |SELECT p.doc_id,
        |  CAST(p.n_windows AS BIGINT) AS n_windows,
        |  CAST(p.voiced_windows AS BIGINT) AS voiced_windows,
        |  CAST(COALESCE(s.n_segments, 0) AS BIGINT) AS n_segments,
        |  CAST(COALESCE(s.longest_voiced, 0) AS BIGINT) AS longest_voiced,
        |  CAST((1000000 * p.voiced_windows) // p.n_windows AS BIGINT)
        |    AS voiced_ratio_micro
        |FROM perdoc p LEFT JOIN (
        |  SELECT doc_id, COUNT(*) AS n_segments, MAX(len) AS longest_voiced
        |  FROM segs GROUP BY 1) s ON s.doc_id = p.doc_id""".stripMargin,

    // q302: q26's per-modality closed forms, aggregated per container
    // (Spark's sum(int) widens to bigint; CAST matches; max over the
    // all-NULL wav dimensions is NULL on both engines).
    "q302_media_census" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'wav' END AS container,
        |    CASE doc_id % 3 WHEN 0 THEN CAST(16 + doc_id % 48 AS INT)
        |                    WHEN 1 THEN CAST(8 AS INT) ELSE CAST(NULL AS INT) END AS width,
        |    CASE doc_id % 3 WHEN 0 THEN CAST(16 + (doc_id * 7) % 48 AS INT)
        |                    WHEN 1 THEN CAST(8 AS INT) ELSE CAST(NULL AS INT) END AS height,
        |    CASE doc_id % 3 WHEN 0 THEN CAST(1 AS INT)
        |                    WHEN 1 THEN CAST(1 + doc_id % 8 AS INT)
        |                    ELSE CAST(256 + doc_id % 512 AS INT) END AS n_frames
        |  FROM documents
        |)
        |SELECT container, COUNT(*) AS n_objects,
        |  CAST(SUM(n_frames) AS BIGINT) AS total_frames,
        |  MAX(width) AS max_width, MAX(height) AS max_height
        |FROM m GROUP BY 1""".stripMargin,
  )
}
