"""Real header codec: pure-Python PNG/JPEG/GIF parsing
(`decode_image_real`) on handcrafted byte payloads, plus the
end-to-end Arrow-path differential for `multimodal_image_probe`."""

from __future__ import annotations

import pytest

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all
from bigdataentrytask_spark.operators.multimodal import (
    decode_image_real,
    parse_image_header,
)
from tests.conftest import SF_DIR, assert_matches_oracle

load_all()


def _png(w: int, h: int, depth: int = 8, color_type: int = 2) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([depth, color_type, 0, 0, 0])
    )


def _jpeg(w: int, h: int, ncomp: int = 3, progressive: bool = False) -> bytes:
    # SOI + APP0(JFIF) + DQT filler + SOFn frame header
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x01\x02" + b"\x00" * 7
    dqt = b"\xff\xdb" + (4).to_bytes(2, "big") + b"\x00\x00"
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = (
        sof_marker
        + (8 + 3 * ncomp).to_bytes(2, "big")
        + bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([ncomp])
        + b"\x01\x11\x00" * ncomp
    )
    return b"\xff\xd8" + app0 + dqt + sof


def _gif(w: int, h: int, ver: bytes = b"GIF89a") -> bytes:
    return ver + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\xf7\x00\x00"


def test_png_header_roundtrip():
    m = decode_image_real(_png(640, 480))
    assert m == {
        "format": "png", "width": 640, "height": 480,
        "channels": 3, "bit_depth": 8,
    }
    # every color type maps to its channel count
    for ct, ch in [(0, 1), (2, 3), (3, 1), (4, 2), (6, 4)]:
        assert decode_image_real(_png(1, 1, color_type=ct))["channels"] == ch
    # 16-bit greyscale
    assert decode_image_real(_png(9, 7, depth=16, color_type=0))["bit_depth"] == 16


def test_jpeg_baseline_and_progressive():
    m = decode_image_real(_jpeg(1920, 1080))
    assert (m["format"], m["width"], m["height"], m["channels"]) == (
        "jpeg", 1920, 1080, 3,
    )
    # progressive (SOF2) and greyscale single-component
    m2 = decode_image_real(_jpeg(320, 200, ncomp=1, progressive=True))
    assert (m2["width"], m2["height"], m2["channels"]) == (320, 200, 1)


def test_jpeg_skips_restart_and_padding_markers():
    # extra FF padding + a standalone RST marker before the SOF
    payload = b"\xff\xd8" + b"\xff\xff" + b"\xff\xd0" + _jpeg(64, 32)[2:]
    m = decode_image_real(payload)
    assert (m["width"], m["height"]) == (64, 32)


def test_gif_both_versions():
    for ver in (b"GIF87a", b"GIF89a"):
        m = decode_image_real(_gif(500, 300, ver))
        assert (m["format"], m["width"], m["height"]) == ("gif", 500, 300)


def test_unrecognized_payloads():
    assert parse_image_header(b"plain text, not an image") is None
    assert parse_image_header(b"") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\nXXXX") is None  # truncated
    assert parse_image_header(_png(1, 1, color_type=9)) is None  # bad color
    with pytest.raises(ValueError):
        decode_image_real(b"\xff\xd8\x00\x00")  # JPEG SOI then garbage


def test_image_probe_differential(spark, duck):
    assert_matches_oracle(
        REGISTRY["multimodal_image_probe"](spark, SF_DIR),
        duck,
        ORACLES["multimodal_image_probe"],
        "multimodal_image_probe",
    )


def test_parse_wav_header_unit():
    """Round-trip a hand-built canonical PCM WAV header and reject
    malformed payloads."""
    import struct

    from bigdataentrytask_spark.operators.multimodal import parse_wav_header

    def wav(channels=2, rate=44100, bits=16, n_samples=1000):
        block = channels * bits // 8
        data = n_samples * block
        return (
            b"RIFF" + struct.pack("<I", 36 + data) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                    rate * block, block, bits)
            + b"data" + struct.pack("<I", data)
        )

    m = parse_wav_header(wav())
    assert m == {
        "format": "wav", "channels": 2, "sample_rate": 44100,
        "bits": 16, "n_samples": 1000,
        "duration_ms": 1000 * 1000 // 44100,
    }
    assert parse_wav_header(b"RIFF1234WAVE") is None       # truncated
    assert parse_wav_header(b"\x00" * 44) is None          # not RIFF
    bad_fmt = bytearray(wav())
    bad_fmt[20] = 3  # IEEE float, not PCM
    assert parse_wav_header(bytes(bad_fmt)) is None


def test_multimodal_audio_probe_oracle(spark, duck):
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY
    from tests.conftest import SF_DIR, assert_matches_oracle

    assert_matches_oracle(
        REGISTRY["multimodal_audio_probe"](spark, SF_DIR),
        duck,
        ORACLES["multimodal_audio_probe"],
        "multimodal_audio_probe",
    )


def test_decode_video_real_walks_boxes():
    """Unit: the box walker inverts a hand-built ISO-BMFF payload and
    rejects a non-container."""
    import pytest as _pytest

    from bigdataentrytask_spark.operators.multimodal import decode_video_real

    ftyp = (16).to_bytes(4, "big") + b"ftyp" + b"mp42" + b"\x00" * 4
    mvhd_body = b"\x00" * 12 + (600).to_bytes(4, "big") + (1200).to_bytes(4, "big")
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" + mvhd_body
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    meta = decode_video_real(ftyp + moov)
    assert meta == {
        "format": "mp4", "brand": "mp42", "timescale": 600,
        "duration_ms": 2000,
    }
    with _pytest.raises(ValueError):
        decode_video_real(b"not a video at all")


def test_video_probe_matches_oracle(spark, duck):
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY
    from tests.conftest import SF_DIR, assert_matches_oracle

    assert_matches_oracle(
        REGISTRY["multimodal_video_probe"](spark, SF_DIR), duck,
        ORACLES["multimodal_video_probe"], "multimodal_video_probe",
    )
