"""Q-MM: multimodal binary-column queries (north-star family, no reference
analogue — BASELINE.json "multimodal columns").

Payloads are synthesized deterministically from `documents`
(operators/multimodal.attach_payloads: 4-byte modality magic + UTF-8 text
bytes, modality = doc_id mod 3), so every stage — including the
mapInPandas codec stand-ins — is oracle-checkable: the DuckDB SQL
recomputes the same deterministic formulas from octet_length(text).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_payloads,
    audio_features,
    decode_image_meta,
    resize_images,
    sample_frames,
    synthesize_wav_payloads,
    synthesize_y4m_payloads,
)
from ..tables import table
from .registry import query

# n_bytes as the oracle sees it: 4-byte magic + UTF-8 text bytes.
_NB = "(4 + octet_length(encode(text)))"


@query(
    "mm_payload_meta", python_boundary=True,
    category="multimodal",
    oracle=f"""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS modality,
           CASE doc_id % 3 WHEN 0 THEN 'image/fake' WHEN 1 THEN 'audio/fake'
                           ELSE 'video/fake' END AS mime,
           {_NB} AS n_bytes
    FROM documents
    """,
)
def mm_payload_meta(spark, sf_dir):
    """Typed-metadata projection over the binary carrier table: metadata is
    queryable without touching payload bytes (column pruning drops the
    binary column from the scan entirely)."""
    p = attach_payloads(table(spark, sf_dir, "documents"))
    return p.select(
        "doc_id", "modality", F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


@query(
    "mm_image_decode", python_boundary=True,
    category="multimodal",
    oracle=f"""
    SELECT doc_id, {_NB} AS n_bytes,
           16 * (1 + {_NB} % 64) AS width,
           16 * (1 + {_NB} % 48) AS height,
           3 AS channels,
           FALSE AS parsed
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def mm_image_decode(spark, sf_dir):
    """Image metadata decode via Arrow-batched mapInPandas (binary in,
    typed struct out). Header parsing is REAL (stdlib PNG/JPEG/GIF/BMP,
    operators/multimodal.parse_image_header, unit-tested on genuine
    headers); the synthetic fixture payloads carry no codec header, so
    every row falls back to the deterministic stand-in with parsed=false —
    which is exactly what the oracle asserts."""
    p = attach_payloads(table(spark, sf_dir, "documents"))
    return decode_image_meta(p)


@query(
    "mm_image_resize", python_boundary=True,
    category="multimodal",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, {_NB} AS n_bytes,
             16 * (1 + {_NB} % 64) AS w, 16 * (1 + {_NB} % 48) AS h
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id,
           CAST(ROUND(w * LEAST(256.0 / GREATEST(w, h), 1.0)) AS INT) AS out_width,
           CAST(ROUND(h * LEAST(256.0 / GREATEST(w, h), 1.0)) AS INT) AS out_height,
           GREATEST(4, n_bytes // 2) AS out_bytes
    FROM dims
    """,
)
def mm_image_resize(spark, sf_dir):
    """Aspect-preserving resize, binary→binary mapInPandas; the output
    payload length (not its stub content) is the oracle-checked part."""
    p = attach_payloads(table(spark, sf_dir, "documents"))
    out = resize_images(p, max_side=256)
    return out.select(
        "doc_id", "out_width", "out_height",
        F.length("payload").cast("bigint").alias("out_bytes"),
    )


@query(
    "mm_audio_features", python_boundary=True,
    category="multimodal",
    oracle=f"""
    SELECT doc_id, {_NB} AS n_bytes,
           -- exact integer half-up to 6 dp: k samples at 16 kHz is k*62.5
           -- millionths of a second = (k*125 + 1) // 2 (float ROUND lands
           -- exactly on .5 boundaries here, e.g. k=125 -> 0.0078125 s)
           ((GREATEST({_NB} - 4, 0) // 2) * 125 + 1) // 2 / 1000000.0
             AS duration_s,
           16000 AS sample_rate
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def mm_audio_features(spark, sf_dir):
    """Per-clip audio features via mapInPandas (stand-in duration math over
    an assumed 16 kHz mono s16le payload)."""
    p = attach_payloads(table(spark, sf_dir, "documents"))
    return audio_features(p)


@query(
    "mm_audio_wav_decode", python_boundary=True,
    category="multimodal",
    oracle=f"""
    SELECT doc_id,
           44 + 2 * (octet_length(encode(text)) // 2) AS n_bytes,
           (octet_length(encode(text)) // 2) * 125 AS duration_us,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(1 AS BIGINT) AS n_channels,
           TRUE AS parsed
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def mm_audio_wav_decode(spark, sf_dir):
    """REAL audio codec end-to-end: synthesize a GENUINE mono s16le WAV
    per audio document (stdlib wave writer, samples = the text's UTF-8
    bytes — operators/multimodal.synthesize_wav_payloads), then FULLY
    decode it back with the stdlib wave codec (audio_features(real=True)
    → decode_wav: samples read and length-checked, not header-sniffed).
    EXACT oracle: the canonical 44-byte RIFF header plus 2 bytes per
    frame at 8 kHz makes every decoded field a pure integer function of
    octet_length(text). This is the driver-checked proof that the real
    audio tier decodes genuine media — the mm-family codec gates
    (soundfile for compressed audio) extend the same path."""
    p = synthesize_wav_payloads(table(spark, sf_dir, "documents"))
    return audio_features(p, real=True)


@query(
    "mm_video_y4m_frames", python_boundary=True,
    category="multimodal",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, 1 + octet_length(encode(text)) % 8 AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id, i AS frame_idx,
           i * 250000 AS frame_ts_us,
           sha256(repeat(chr(CAST(32 + (doc_id * 7 + i) % 95 AS INT)), 24))
             AS frame_fingerprint,
           CAST(4 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
           TRUE AS decoded
    FROM v, LATERAL UNNEST(generate_series(0, n_frames - 1)) AS t(i)
    """,
)
def mm_video_y4m_frames(spark, sf_dir):
    """REAL video demux end-to-end: synthesize a GENUINE YUV4MPEG2
    stream per video document (spec header + raw 4:2:0 frames with
    deterministic fills — operators/multimodal.synthesize_y4m_payloads),
    then demux it back with the from-scratch stdlib Y4M parser
    (sample_frames(real=True) → demux_y4m: every frame's raw planes
    length-checked against the header geometry). EXACT oracle: frame
    count, container-rate timestamps (4 fps → i*250000 µs, exact
    integers), geometry, and the sha256 of each DECODED frame's bytes
    are all recomputed by DuckDB from the synthesis law. The PyAV gate
    (_av_decode_frames) extends the same path to compressed
    containers."""
    p = synthesize_y4m_payloads(table(spark, sf_dir, "documents"))
    return sample_frames(p, fps=4.0, max_frames=8, real=True)


@query(
    "mm_video_frame_sample", python_boundary=True,
    category="multimodal",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, {_NB} AS n_bytes, 1 + {_NB} % 8 AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id, i AS frame_idx,
           ROUND(i / 4.0, 4) AS frame_ts_s,
           sha256(doc_id || ':' || i) AS frame_fingerprint
    FROM v, LATERAL UNNEST(generate_series(0, n_frames - 1)) AS t(i)
    """,
)
def mm_video_frame_sample(spark, sf_dir):
    """Video → sampled-frame rows (sequence + posexplode, whole-stage
    codegen; no Python in the plan)."""
    p = attach_payloads(table(spark, sf_dir, "documents"))
    return sample_frames(p, fps=4.0, max_frames=8)


@query(
    "mm_payload_exact_dedup", python_boundary=True,
    category="multimodal",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             sha256(CASE doc_id % 3 WHEN 0 THEN 'IMG0'
                              WHEN 1 THEN 'AUD0'
                              ELSE 'VID0' END || text) AS digest
      FROM documents
    )
    SELECT digest, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
    FROM p GROUP BY digest
    """,
)
def mm_payload_exact_dedup(spark, sf_dir):
    """Binary-payload exact dedup: sha2 over the raw payload BYTES (not a
    text proxy) with min-id keeper election — the first pass of any
    multimodal corpus pipeline (identical images re-crawled under
    different URLs collapse here before expensive perceptual hashing).
    The digest runs payload-column-only (metadata untouched); the oracle
    reconstructs the same bytes as the VARCHAR concat magic || text
    (DuckDB's sha256 hashes the string's UTF-8 bytes, which ARE the
    payload bytes) because the
    carrier table is synthesized deterministically
    (operators/multimodal.attach_payloads)."""
    p = attach_payloads(table(spark, sf_dir, "documents"))
    return p.groupBy(F.sha2("payload", 256).alias("digest")).agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@query("mm_image_phash_dedup", python_boundary=True, category="multimodal", check="SMOKE")
def mm_image_phash_dedup(spark, sf_dir):
    """Perceptual-hash image near-dup pairs: 64-bit pHash per image
    payload (operators/multimodal.image_phash — real DCT/median/pack over
    the documented histogram pixel stand-in), then banding the hash into
    four 16-bit bands and expanding in-bucket pairs (dedup.in_bucket_pairs
    — fine-grained 2^16 buckets, so the array expansion never
    concentrates), verified by exact popcount Hamming <= 6. This is the
    tier above mm_payload_exact_dedup: re-encoded/resized copies that
    break byte equality still collide here. SMOKE (the mapInPandas hash
    isn't ANSI-SQL); determinism and the byte-identical⇒Hamming-0
    invariant are pytest-asserted in tests/test_multimodal.py.

    Scaling note (measured, sf1.0): the OUTPUT pair list itself grows
    ~quadratically on this fixture (46 k pairs at 5 k images → 4.7 M at
    50 k, 20 s — the synthetic payload space is tiny, so collision
    density is fixture-high); per-output-row cost is flat. On a corpus
    with DIVERSE payloads and planted perturbed-copy near-dups
    (tools/gen_zipf.py payloads.parquet) the same pipeline
    (operators/multimodal.phash_near_dup_pairs) measures near-linear —
    bench_records/r7_zipf_scaling.json. A production corpus keeps
    banding selective; when it doesn't, the downstream consumer is the
    connected-components keeper election, which never materializes
    pairs to the driver."""
    from ..operators.multimodal import phash_near_dup_pairs

    p = attach_payloads(table(spark, sf_dir, "documents"))
    return phash_near_dup_pairs(p, max_hamming=6)


@query(
    "mm_video_scene_cuts", python_boundary=True,
    category="multimodal",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, 1 + {_NB} % 8 AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    ),
    frames AS (
      SELECT doc_id, i AS frame_idx,
             ('0x' || substr(sha256(doc_id || ':' || i), 1, 2))::BIGINT AS feat
      FROM v, LATERAL UNNEST(generate_series(0, n_frames - 1)) AS t(i)
    )
    SELECT doc_id, frame_idx, feat,
           CASE WHEN frame_idx > 0 AND ABS(feat - LAG(feat) OVER
                  (PARTITION BY doc_id ORDER BY frame_idx)) >= 128
                THEN 1 ELSE 0 END AS is_cut
    FROM frames
    """,
)
def mm_video_scene_cuts(spark, sf_dir):
    """Scene-cut detection over sampled video frames — the shot-boundary
    pass a video-curation pipeline runs between frame sampling
    (mm_video_frame_sample) and per-shot dedup/captioning: a cut fires
    where consecutive frames' feature distance jumps past a threshold.
    The frame FEATURE here is derived from the deterministic frame
    fingerprint (the documented codec stand-in discipline of the mm_
    family — a real deployment swaps in a decoded histogram/embedding
    behind the same column), so the Spark plumbing under test is real:
    frame explosion, per-video ordered lag window, threshold compare —
    one doc_id exchange, whole-stage codegen, no Python. EXACT: the
    oracle replays fingerprints, features, and the lag threshold."""
    p = attach_payloads(table(spark, sf_dir, "documents"))
    frames = sample_frames(p, fps=4.0, max_frames=8).select(
        "doc_id",
        "frame_idx",
        F.conv(F.substring("frame_fingerprint", 1, 2), 16, 10)
        .cast("long")
        .alias("feat"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("frame_idx")
    return frames.select(
        "doc_id",
        "frame_idx",
        "feat",
        F.when(
            (F.col("frame_idx") > 0)
            & (F.abs(F.col("feat") - F.lag("feat").over(w)) >= 128),
            1,
        )
        .otherwise(0)
        .alias("is_cut"),
    )


@query(
    "mm_image_aspect_buckets", python_boundary=True,
    category="multimodal",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             16 * (1 + {_NB} % 64) AS w,
             16 * (1 + {_NB} % 48) AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    b AS (
      SELECT doc_id, w, h, w * 1000 // h AS ar_e3,
             CASE WHEN w * 1000 // h < 667 THEN 'tall'
                  WHEN w * 1000 // h < 910 THEN 'portrait'
                  WHEN w * 1000 // h < 1100 THEN 'square'
                  WHEN w * 1000 // h < 1500 THEN 'landscape'
                  ELSE 'wide' END AS bucket
      FROM dims
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(MIN(ar_e3) AS BIGINT) AS min_ar_e3,
           CAST(MAX(ar_e3) AS BIGINT) AS max_ar_e3,
           CAST(SUM(ar_e3) // COUNT(*) AS BIGINT) AS mean_ar_e3,
           CAST(SUM(w * h) AS BIGINT) AS total_pixels
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def mm_image_aspect_buckets(spark, sf_dir):
    """Aspect-ratio bucketing for batched image training (the
    SDXL/NovelAI recipe: group images into fixed aspect buckets so each
    batch shares one canvas and padding waste stays bounded): per
    bucket, the image count, aspect-ratio envelope, and total pixel
    mass a data loader needs to plan epochs. Dimensions come from the
    SAME deterministic decode stand-in contract as mm_image_decode
    (header-derived w/h in production; w = 16(1+n%64), h = 16(1+n%48)
    over the synthetic payloads — the documented codec boundary), but
    bucketing itself never touches payload bytes: the meta projection
    prunes the binary column from the scan. Bucket edges compare
    flooring integer milli-ratios (w·1000 // h — positive domain, Spark
    DIV ≡ DuckDB //), so bucket membership is integer-exact; the
    rollup is one map-side-combinable aggregation into a buckets-sized
    result."""
    p = attach_payloads(table(spark, sf_dir, "documents"))
    img = p.where(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        (16 * (1 + F.col("meta.n_bytes") % 64)).alias("w"),
        (16 * (1 + F.col("meta.n_bytes") % 48)).alias("h"),
    )
    ar = F.expr("w * 1000 DIV h")
    b = img.select(
        "w", "h", ar.alias("ar_e3"),
        F.when(ar < 667, "tall")
        .when(ar < 910, "portrait")
        .when(ar < 1100, "square")
        .when(ar < 1500, "landscape")
        .otherwise("wide")
        .alias("bucket"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("ar_e3").alias("min_ar_e3"),
            F.max("ar_e3").alias("max_ar_e3"),
            F.expr("SUM(ar_e3) DIV COUNT(*)").alias("mean_ar_e3"),
            F.sum(F.col("w") * F.col("h")).alias("total_pixels"),
        )
        .orderBy("bucket")
    )
