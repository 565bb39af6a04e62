"""Pure-python media codecs against committed binary fixtures, plus the
Spark-side multimodal operators parsing REAL payload dimensions."""

from __future__ import annotations

import os
import struct
import zlib

import pytest

from samza_hello_samza_spark.functions import media
from samza_hello_samza_spark.operators import multimodal
from tests.conftest import SF_DIR

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "media")


def _load(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


@pytest.mark.parametrize(
    "name,fmt,width,height",
    [
        ("gradient_8x5.png", "png", 8, 5),
        ("tiny_3x3_rgba.png", "png", 3, 3),
        ("header_20x12.jpg", "jpeg", 20, 12),
        ("header_33x7.gif", "gif", 33, 7),
    ],
)
def test_parse_image_true_dimensions(name, fmt, width, height):
    info = media.parse_media(_load(name))
    assert (info.format, info.width, info.height) == (fmt, width, height)


@pytest.mark.parametrize(
    "name,channels,rate,dur_ms",
    [
        ("square_1s_8k.wav", 1, 8000, 1000),
        ("stereo_quarter_16k.wav", 2, 16000, 250),
    ],
)
def test_parse_wav_true_params(name, channels, rate, dur_ms):
    info = media.parse_media(_load(name))
    assert (info.format, info.channels, info.sample_rate, info.duration_ms) == (
        "wav",
        channels,
        rate,
        dur_ms,
    )


def test_unknown_payload_raises():
    with pytest.raises(media.UnknownMediaError):
        media.parse_media(b"plain old text, no magic here")


def test_png_decode_all_filters_roundtrip():
    """Decoder must unfilter Sub/Up/Average/Paeth rows, not just filter 0."""
    w, h, ch = 6, 5, 3
    rows = [bytes((x * 17 + y * 29 + c * 5) % 256 for x in range(w) for c in range(ch)) for y in range(h)]
    # hand-build an IDAT using a different filter per row
    stride = w * ch

    def sub(line, prev):
        return bytes((line[i] - (line[i - ch] if i >= ch else 0)) & 0xFF for i in range(stride))

    def up(line, prev):
        return bytes((line[i] - prev[i]) & 0xFF for i in range(stride))

    def avg(line, prev):
        return bytes(
            (line[i] - (((line[i - ch] if i >= ch else 0) + prev[i]) >> 1)) & 0xFF
            for i in range(stride)
        )

    def paeth(line, prev):
        out = bytearray()
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            out.append((line[i] - media._paeth(a, b, c)) & 0xFF)
        return bytes(out)

    filters = [(0, lambda l, p: l), (1, sub), (2, up), (3, avg), (4, paeth)]
    raw = b""
    prev = bytes(stride)
    for y in range(h):
        ftype, enc = filters[y % len(filters)]
        raw += bytes([ftype]) + enc(rows[y], prev)
        prev = rows[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = media.PNG_SIG
    for ctype, data in ((b"IHDR", ihdr), (b"IDAT", zlib.compress(raw)), (b"IEND", b"")):
        png += struct.pack(">I", len(data)) + ctype + data
        png += struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    dw, dh, dch, drows = media.png_decode(png)
    assert (dw, dh, dch) == (w, h, ch)
    assert [bytes(r) for r in drows] == rows


def test_png_resize_nearest_true_dims():
    resized = media.png_resize_nearest(_load("gradient_8x5.png"), 4)
    info = media.parse_media(resized)
    assert (info.format, info.width, info.height) == ("png", 4, 2)
    # still a decodable PNG with consistent scanlines
    w, h, ch, rows = media.png_decode(resized)
    assert (w, h, ch) == (4, 2, 3) and all(len(r) == w * ch for r in rows)


def test_wav_decimate_preserves_duration():
    out = media.wav_decimate(_load("square_1s_8k.wav"), 2)
    info = media.parse_media(out)
    assert (info.sample_rate, info.duration_ms) == (4000, 1000)


def test_wav_window_slices_pcm():
    src = _load("stereo_quarter_16k.wav")
    windows = [media.wav_window(src, i, 4) for i in range(4)]
    infos = [media.parse_media(w) for w in windows]
    assert all(i.format == "wav" and i.channels == 2 for i in infos)
    # windows tile the original: total frames preserved
    total = sum(len(media._wav_pcm(w)[3]) for w in windows)
    assert total == len(media._wav_pcm(src)[3])


# --------------------------------------------------------------------------
# Spark-side: the operators must report REAL parsed dimensions
# --------------------------------------------------------------------------


def test_multimodal_decode_reports_true_dims(spark):
    rows = multimodal.multimodal_decode(spark, SF_DIR).collect()
    assert rows
    by_id = {r.doc_id: r for r in rows}
    # cross-check a sample against driver-side synthesis + parsing
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
        .collect()
    }
    for doc_id, text in docs.items():
        data = text.encode("utf-8")
        expected = (
            multimodal._text_to_png(doc_id, data)
            if doc_id % 2 == 0
            else multimodal._text_to_wav(doc_id, data)
        )
        info = media.parse_media(expected)
        got = by_id[doc_id]
        assert got.format == info.format
        assert got.width == info.width and got.height == info.height
        assert got.sample_rate == info.sample_rate
        assert got.checksum == zlib.crc32(expected)
    # both modalities present, nothing fell back to the stub path
    fmts = {r.format for r in rows}
    assert fmts == {"png", "wav"}


def test_multimodal_resize_real_transforms(spark):
    rows = multimodal.multimodal_resize(spark, SF_DIR).collect()
    assert rows
    for r in rows[:200]:
        if r.format == "png":
            info = media.parse_media(bytes(r.payload))
            assert info.width == r.width and info.height == r.height
            assert max(info.width, info.height) <= multimodal.RESIZE_BOX
        elif r.format == "wav":
            info = media.parse_media(bytes(r.payload))
            assert info.sample_rate == r.sample_rate == 4000


def test_multimodal_frame_sample_wav_windows_real(spark):
    df = multimodal.multimodal_frame_sample(spark, SF_DIR)
    rows = df.filter("doc_id % 2 = 1").limit(40).collect()
    assert rows
    for r in rows:
        info = media.parse_media(bytes(r.frame))
        assert info.format == "wav" and info.channels == 1


# -- GIF frame splitting + real frame sampling ------------------------------


def _fixture(name: str) -> bytes:
    import os

    here = os.path.join(os.path.dirname(__file__), "fixtures", "media", name)
    with open(here, "rb") as f:
        return f.read()


def test_gif_frames_splits_animation():
    """The committed 3-frame animation splits into standalone GIFs with
    true cumulative GCE timestamps (5cs, 7cs, 11cs delays)."""
    blob = _fixture("anim_3f_11x7.gif")
    frames = media.gif_frames(blob)
    assert [pts for pts, _ in frames] == [0, 50, 120]
    for _pts, fb in frames:
        info = media.parse_gif(fb)
        assert (info.width, info.height) == (11, 7)
        assert len(media.gif_frames(fb)) == 1  # each emit is single-frame


def test_gif_frames_rejects_non_gif():
    import pytest as _pytest

    with _pytest.raises(media.UnknownMediaError):
        media.gif_frames(b"PNG no")


def test_sample_frames_gif_png_wav():
    from samza_hello_samza_spark.operators import multimodal

    gif = _fixture("anim_3f_11x7.gif")
    out = multimodal._sample_frames(gif)
    assert len(out) == 3 and out[2][0] == 120

    png = _fixture("gradient_8x5.png")
    bands = multimodal._sample_frames(png)
    assert 1 <= len(bands) <= multimodal.N_FRAMES
    heights = []
    for pts, fb in bands:
        assert pts == 0
        info = media.parse_png(fb)
        assert info.width == 8
        heights.append(info.height)
    assert sum(heights) == 5  # bands tile the image exactly

    wav = _fixture("square_1s_8k.wav")
    wins = multimodal._sample_frames(wav)
    assert len(wins) == multimodal.N_FRAMES
    for _pts, fb in wins:
        assert media.parse_wav(fb).format == "wav"


def test_feature_vectors_are_content_histograms():
    from samza_hello_samza_spark.operators import multimodal

    png = _fixture("gradient_8x5.png")
    v = multimodal._feature_vector(png)
    assert len(v) == multimodal.FEATURE_DIM
    assert abs(sum(v) - 1.0) < 1e-9  # normalized histogram
    assert v == multimodal._feature_vector(png)  # deterministic

    wav = _fixture("square_1s_8k.wav")
    w = multimodal._feature_vector(wav)
    assert abs(sum(w) - 1.0) < 1e-9
    assert w != v
