"""Multimodal binary-column plumbing tests: Arrow batch handling, null
payloads, the real-codec gate, and resize invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solis_solarman_clickhouse_spark.operators.multimodal import (
    PAYLOAD_SCHEMA,
    attach_payloads,
    audio_features,
    decode_image_meta,
    resize_images,
    sample_frames,
)
from solis_solarman_clickhouse_spark.tables import table

from .conftest import SF_DIR


def _payloads(spark):
    return attach_payloads(table(spark, SF_DIR, "documents"))


def test_payload_schema_and_magic(spark):
    p = _payloads(spark)
    # simpleString compares names/types, ignoring nullability flags
    assert p.schema.simpleString() == PAYLOAD_SCHEMA.simpleString()
    row = p.filter(F.col("modality") == "image").first()
    assert bytes(row["payload"])[:4] == b"IMG0"
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_decode_handles_null_payloads(spark):
    df = spark.createDataFrame(
        [(1, "image", None, ("image/fake", 0)), (4, "image", b"IMG0abc", ("image/fake", 7))],
        PAYLOAD_SCHEMA,
    )
    out = {r["doc_id"]: r for r in decode_image_meta(df).collect()}
    assert out[1]["n_bytes"] == 0 and out[1]["width"] == 16
    assert out[4]["n_bytes"] == 7 and out[4]["width"] == 16 * (1 + 7 % 64)


def test_decode_survives_small_arrow_batches(spark):
    """mapInPandas must produce identical results regardless of how Arrow
    slices the input into batches."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        small = decode_image_meta(_payloads(spark)).orderBy("doc_id").collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    big = decode_image_meta(_payloads(spark)).orderBy("doc_id").collect()
    assert small == big


def test_real_codec_paths_are_gated(spark):
    from solis_solarman_clickhouse_spark.operators.multimodal import (
        _pil_available,
    )

    p = _payloads(spark)
    if _pil_available():
        # with Pillow installed the gate opens; fixture payloads carry no
        # codec stream, so every row falls back with parsed=false
        assert all(
            not r["parsed"] for r in decode_image_meta(p, real=True).collect()
        )
    else:
        with pytest.raises(NotImplementedError):
            decode_image_meta(p, real=True)
    # audio/video real=True need no gate at all: the stdlib wave codec and
    # the from-scratch Y4M demuxer are always available. Fixture payloads
    # are not WAV/Y4M, so every row falls back with parsed/decoded=false.
    assert not any(r["parsed"] for r in audio_features(p, real=True).collect())
    assert not any(r["decoded"] for r in sample_frames(p, real=True).collect())


def test_resize_bounds_and_aspect(spark):
    meta = {r["doc_id"]: r for r in decode_image_meta(_payloads(spark)).collect()}
    for r in resize_images(_payloads(spark), max_side=256).collect():
        m = meta[r["doc_id"]]
        assert max(r["out_width"], r["out_height"]) <= 256
        # no upscaling
        assert r["out_width"] <= m["width"] and r["out_height"] <= m["height"]
        # aspect preserved within rounding (relative: rounding the short
        # side of an extreme ratio moves the quotient by up to 1/short_side)
        if m["height"] and r["out_height"]:
            got = r["out_width"] / r["out_height"]
            want = m["width"] / m["height"]
            assert abs(got - want) / want <= 0.5 / min(r["out_width"], r["out_height"]) + 1e-9


def test_frame_sampling_counts(spark):
    frames = sample_frames(_payloads(spark), fps=4.0, max_frames=8)
    per_doc = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")
    )
    bad = per_doc.filter((F.col("n") < 1) | (F.col("n") > 8) | (F.col("mx") != F.col("n") - 1))
    assert bad.count() == 0


def _png_header(w, h, color_type=6):
    import struct
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0]) + b"\0" * 8)


def _jpeg_header(w, h, channels=3):
    import struct
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\0" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + bytes([8]) + struct.pack(">HH", h, w) + bytes([channels]) + b"\0" * 9
    return b"\xff\xd8" + app0 + sof0 + b"\0" * 8


def _gif_header(w, h):
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\0" * 8


def _bmp_header(w, h):
    import struct
    return b"BM" + b"\0" * 16 + struct.pack("<ii", w, h) + b"\0" * 8


def test_parse_image_header_real_formats():
    """Header parsing is REAL: genuine PNG/JPEG/GIF/BMP headers built from
    the codec specs must yield their true dimensions and channel counts."""
    from solis_solarman_clickhouse_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_png_header(640, 480, color_type=6)) == (640, 480, 4)
    assert parse_image_header(_png_header(32, 16, color_type=2)) == (32, 16, 3)
    assert parse_image_header(_jpeg_header(1024, 768)) == (1024, 768, 3)
    assert parse_image_header(_gif_header(320, 200)) == (320, 200, 3)
    assert parse_image_header(_bmp_header(800, 600)) == (800, 600, 3)
    assert parse_image_header(_bmp_header(800, -600)) == (800, 600, 3)  # top-down BMP
    assert parse_image_header(b"image/fake not a codec header") is None
    assert parse_image_header(None) is None
    assert parse_image_header(b"\xff\xd8\xff\xe0") is None  # truncated JPEG


def test_decode_image_meta_mixes_real_and_fallback(spark):
    """A batch mixing real codec headers and opaque payloads: real headers
    decode with parsed=true and true dims; opaque ones fall back to the
    deterministic stand-in with parsed=false."""
    from solis_solarman_clickhouse_spark.operators.multimodal import decode_image_meta

    rows = [
        (0, "image", bytearray(_png_header(640, 480))),
        (3, "image", bytearray(_jpeg_header(100, 50))),
        (6, "image", bytearray(b"image/fake opaque bytes")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, modality string, payload binary")
    got = {r["doc_id"]: r for r in decode_image_meta(df).collect()}
    assert got[0]["parsed"] and (got[0]["width"], got[0]["height"], got[0]["channels"]) == (640, 480, 4)
    assert got[3]["parsed"] and (got[3]["width"], got[3]["height"]) == (100, 50)
    assert not got[6]["parsed"]
    n = got[6]["n_bytes"]
    assert got[6]["width"] == 16 * (1 + n % 64)  # deterministic stand-in


def test_image_phash_deterministic_and_exact_dup_invariant(spark):
    """pHash invariants: (a) two runs produce identical hashes; (b)
    byte-identical image payloads hash identically, so every exact-dup
    image pair appears in the phash near-dup pairs at Hamming 0; (c)
    real=True is the documented codec gate."""
    import pytest
    from solis_solarman_clickhouse_spark.operators.multimodal import (
        attach_payloads, image_phash)
    from solis_solarman_clickhouse_spark.queries import REGISTRY
    from solis_solarman_clickhouse_spark.tables import table

    p = attach_payloads(table(spark, SF_DIR, "documents"))
    h1 = {r["doc_id"]: r["phash"] for r in image_phash(p).collect()}
    h2 = {r["doc_id"]: r["phash"] for r in image_phash(p).collect()}
    assert h1 == h2 and len(h1) > 0

    # hash-identical image payload groups must all surface at Hamming 0
    # (byte-identical is a special case; at this SF the histogram triples
    # guarantee at least the deterministic self-consistency groups)
    from collections import defaultdict

    by_hash = defaultdict(list)
    for d, h in h1.items():
        by_hash[h].append(d)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in REGISTRY["mm_image_phash_dedup"].fn(spark, SF_DIR).collect()
    }
    checked = 0
    for ids in by_hash.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert pairs.get((ids[i], ids[j])) == 0
                checked += 1
    assert checked > 0

    from solis_solarman_clickhouse_spark.operators.multimodal import (
        _pil_available,
    )

    if not _pil_available():
        with pytest.raises(NotImplementedError):
            image_phash(p, real=True)


def _tiny_png(arr) -> bytes:
    """A REAL (stdlib-built) 8-bit grayscale PNG: IHDR + zlib IDAT +
    IEND with correct CRCs — decodable by any codec, no Pillow needed
    to WRITE it."""
    import struct
    import zlib

    h, w = arr.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(arr[y]) for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_pixel_decode_with_pillow(spark):
    """Env-gated (skips without Pillow): real=True must FULLY decode
    genuine PNG payloads — true dims with parsed=true from pixel decode,
    and pHash over real pixels puts a perturbed copy of an image at
    small Hamming distance from its source while leaving a structurally
    different image far away. The PNGs are built from the codec spec
    with stdlib zlib/struct, so the payloads are real image streams,
    not stand-ins."""
    pytest.importorskip("PIL")
    import numpy as np

    from solis_solarman_clickhouse_spark.operators.multimodal import (
        decode_image_meta,
        image_phash,
    )

    rng = np.random.default_rng(3)
    grad = (
        np.add.outer(np.arange(48), np.arange(64)) * 255 // (48 + 64 - 2)
    ).astype(np.uint8)
    near = grad.copy()
    noise_at = rng.random(grad.shape) < 0.01
    near[noise_at] = rng.integers(0, 256, int(noise_at.sum()), dtype=np.uint8)
    other = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    rows = [
        (0, "image", bytearray(_tiny_png(grad))),
        (1, "image", bytearray(_tiny_png(near))),
        (2, "image", bytearray(_tiny_png(other))),
        (3, "image", bytearray(b"image/fake opaque")),  # fallback row
    ]
    df = spark.createDataFrame(rows, "doc_id long, modality string, payload binary")

    meta = {r["doc_id"]: r for r in decode_image_meta(df, real=True).collect()}
    for d in (0, 1, 2):
        assert meta[d]["parsed"]
        assert (meta[d]["width"], meta[d]["height"], meta[d]["channels"]) == (64, 48, 1)
    assert not meta[3]["parsed"]

    h = {r["doc_id"]: r["phash"] for r in image_phash(df, real=True).collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(h[0], h[1]) <= 6          # perturbed copy stays near
    assert ham(h[0], h[2]) > 6           # different image stays far
    assert h[3] is not None              # fallback row still hashed

def _wav(n_samples, sr=8000, nch=1):
    """Genuine PCM WAV via the stdlib wave writer."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(bytes(2 * nch) * n_samples)
    return buf.getvalue()


def test_real_wav_decode(spark):
    """audio_features(real=True) FULLY decodes genuine WAV media with the
    stdlib wave codec: true sample rate / channels / floor-µs duration;
    a payload whose data chunk is torn short of its header's promise is
    REJECTED (corrupt past the header), and opaque payloads fall back to
    the deterministic stand-in — all in one mixed batch."""
    from solis_solarman_clickhouse_spark.operators.multimodal import (
        audio_features,
        decode_wav,
    )

    whole = _wav(800)                      # 800 frames @ 8 kHz = 100000 µs
    stereo = _wav(441, sr=44100, nch=2)    # 441 frames @ 44.1 kHz = 10000 µs
    torn = whole[: len(whole) - 100]       # header promises 800, data short
    assert decode_wav(whole) == (8000, 1, 800)
    assert decode_wav(stereo) == (44100, 2, 441)
    assert decode_wav(torn) is None
    assert decode_wav(b"AUD0 opaque") is None

    rows = [
        (0, "audio", bytearray(whole)),
        (1, "audio", bytearray(stereo)),
        (2, "audio", bytearray(torn)),
        (3, "audio", bytearray(b"AUD0 opaque bytes")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, modality string, payload binary")
    got = {r["doc_id"]: r for r in audio_features(df, real=True).collect()}
    assert got[0]["parsed"] and got[0]["duration_us"] == 100000
    assert (got[0]["sample_rate"], got[0]["n_channels"]) == (8000, 1)
    assert got[1]["parsed"] and got[1]["duration_us"] == 10000
    assert (got[1]["sample_rate"], got[1]["n_channels"]) == (44100, 2)
    assert not got[2]["parsed"]  # torn data chunk → rejected, stand-in
    assert not got[3]["parsed"]
    # stand-in math matches the real=False oracle formula, in exact µs
    k = (got[3]["n_bytes"] - 4) // 2
    assert got[3]["duration_us"] == (k * 125 + 1) // 2


def test_real_y4m_demux(spark):
    """sample_frames(real=True) demuxes genuine YUV4MPEG2 streams with the
    from-scratch parser: true geometry, container-rate timestamps, and
    fingerprints over DECODED frame bytes; >max_frames streams are
    stride-sampled at true container indices; torn/corrupt streams and
    opaque payloads fall back with decoded=false."""
    import hashlib

    from solis_solarman_clickhouse_spark.operators.multimodal import (
        demux_y4m,
        make_y4m,
        parse_y4m_header,
        sample_frames,
    )

    v3 = make_y4m(7, 3)          # 3 frames, 4x4 C420 @ 4 fps
    v12 = make_y4m(2, 12)        # 12 frames → stride-sampled to 8
    hdr = parse_y4m_header(v3)
    assert hdr == (4, 4, 4, 1, 24, v3.index(b"\n") + 1)
    w, h, num, den, frames = demux_y4m(v3)
    assert (w, h, num, den, len(frames)) == (4, 4, 4, 1, 3)
    assert frames[1] == bytes([32 + (7 * 7 + 1) % 95]) * 24
    assert demux_y4m(v3[:-5]) is None            # torn final frame
    assert demux_y4m(b"VID0 opaque") is None
    # 25 fps 2x2 mono variant exercises the F and C tags
    mono = b"YUV4MPEG2 W2 H2 F25:1 Cmono\n" + b"FRAME\n" + b"\x11" * 4
    assert demux_y4m(mono) == (2, 2, 25, 1, [b"\x11" * 4])

    rows = [
        (0, "video", bytearray(v3)),
        (1, "video", bytearray(v12)),
        (2, "video", bytearray(b"VID0 opaque bytes")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, modality string, payload binary")
    got = sample_frames(df, fps=4.0, max_frames=8, real=True).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d0 = sorted(by_doc[0], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in d0] == [0, 1, 2]
    assert [r["frame_ts_us"] for r in d0] == [0, 250000, 500000]
    assert all(r["decoded"] and (r["width"], r["height"]) == (4, 4) for r in d0)
    assert d0[1]["frame_fingerprint"] == hashlib.sha256(
        bytes([32 + (7 * 7 + 1) % 95]) * 24
    ).hexdigest()
    d1 = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in d1] == [j * 12 // 8 for j in range(8)]
    assert all(not r["decoded"] for r in by_doc[2])

def test_soundfile_compressed_audio_decode(spark):
    """Env-gated (skips without soundfile; the CI image installs it):
    audio_features(real=True) must decode a genuine FLAC — a compressed
    format the stdlib wave codec rejects — through the libsndfile gate,
    with true sample rate / frames; the WAV-vs-FLAC agreement pins the
    two decode paths to the same feature law."""
    sf_mod = pytest.importorskip("soundfile")
    import io

    import numpy as np

    from solis_solarman_clickhouse_spark.operators.multimodal import (
        audio_features,
        decode_wav,
    )

    data = (np.sin(np.arange(1600) / 10.0) * 0.2).astype("float32")
    buf = io.BytesIO()
    sf_mod.write(buf, data, 8000, format="FLAC")
    flac = buf.getvalue()
    assert decode_wav(flac) is None  # genuinely NOT a WAV

    df = spark.createDataFrame(
        [(0, "audio", bytearray(flac))],
        "doc_id long, modality string, payload binary",
    )
    row = audio_features(df, real=True).collect()[0]
    assert row["parsed"]
    assert row["sample_rate"] == 8000 and row["n_channels"] == 1
    assert row["duration_us"] == 1600 * 1_000_000 // 8000  # 200000 µs


def test_av_compressed_video_frame_sample(spark):
    """Env-gated (skips without PyAV; the CI image installs it):
    sample_frames(real=True) must demux a genuine mpeg4-in-mp4 container
    — a format the Y4M parser rejects — through the ffmpeg gate, with
    container-rate timestamps and pixel-derived fingerprints."""
    av = pytest.importorskip("av")
    import io

    import numpy as np

    from solis_solarman_clickhouse_spark.operators.multimodal import (
        demux_y4m,
        sample_frames,
    )

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as out:
        stream = out.add_stream("mpeg4", rate=4)
        stream.width, stream.height, stream.pix_fmt = 16, 16, "yuv420p"
        for i in range(6):
            img = np.full((16, 16, 3), i * 40, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for pkt in stream.encode(frame):
                out.mux(pkt)
        for pkt in stream.encode():
            out.mux(pkt)
    mp4 = buf.getvalue()
    assert demux_y4m(mp4) is None  # genuinely NOT a Y4M

    df = spark.createDataFrame(
        [(0, "video", bytearray(mp4))],
        "doc_id long, modality string, payload binary",
    )
    rows = sorted(
        sample_frames(df, fps=4.0, max_frames=8, real=True).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert len(rows) == 6
    assert all(r["decoded"] and (r["width"], r["height"]) == (16, 16) for r in rows)
    assert [r["frame_ts_us"] for r in rows] == [i * 250000 for i in range(6)]
    assert len({r["frame_fingerprint"] for r in rows}) == 6  # pixel-derived
