"""Property tests for the pure-Python container parsers: build
randomized-but-valid PNG / GIF / WAV / MP4 headers byte-by-byte and
require the parsers to invert them exactly, plus malformed-input
rejection. No Spark session needed — these are the kernels the
multimodal Arrow ops call per row."""

from __future__ import annotations

import random
import struct

import pytest

from bigdataentrytask_spark.operators.multimodal import (
    decode_video_real,
    parse_image_header,
    parse_wav_header,
)


@pytest.mark.parametrize("seed", range(20))
def test_png_header_roundtrip(seed):
    rng = random.Random(seed)
    w, h = rng.randint(1, 2**31 - 1), rng.randint(1, 2**31 - 1)
    bit_depth = rng.choice([8, 16])
    color_type, channels = rng.choice([(0, 1), (2, 3), (4, 2), (6, 4)])
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBB", w, h, bit_depth, color_type)
        + b"\x00\x00\x00"
    )
    meta = parse_image_header(payload)
    assert meta == {
        "format": "png",
        "width": w,
        "height": h,
        "channels": channels,
        "bit_depth": bit_depth,
    }


@pytest.mark.parametrize("seed", range(10))
def test_gif_header_roundtrip(seed):
    rng = random.Random(100 + seed)
    w, h = rng.randint(1, 65535), rng.randint(1, 65535)
    ver = rng.choice([b"GIF87a", b"GIF89a"])
    payload = ver + struct.pack("<HH", w, h)
    meta = parse_image_header(payload)
    assert meta["format"] == "gif"
    assert (meta["width"], meta["height"]) == (w, h)


@pytest.mark.parametrize("seed", range(20))
def test_wav_header_roundtrip(seed):
    rng = random.Random(200 + seed)
    channels = rng.choice([1, 2, 6])
    rate = rng.choice([8000, 16000, 44100, 48000])
    bits = rng.choice([8, 16, 24, 32])
    n_samples = rng.randint(0, 10**6)
    block = channels * (bits // 8)
    data_size = n_samples * block
    payload = (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                      rate * block, block, bits)
        + b"data"
        + struct.pack("<I", data_size)
    )
    meta = parse_wav_header(payload)
    assert meta == {
        "format": "wav",
        "channels": channels,
        "sample_rate": rate,
        "bits": bits,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // rate,
    }


@pytest.mark.parametrize("seed", range(20))
def test_mp4_box_walk_roundtrip(seed):
    rng = random.Random(300 + seed)
    brand = rng.choice([b"isom", b"mp42", b"avc1"])
    timescale = rng.choice([600, 1000, 90000])
    duration = rng.randint(0, 2**31 - 1)
    ftyp = struct.pack(">I", 16) + b"ftyp" + brand + b"\x00" * 4
    mvhd_body = b"\x00" * 12 + struct.pack(">II", timescale, duration)
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    # bury mvhd after a sibling box inside moov to prove the walk skips
    junk = struct.pack(">I", 12) + b"iods" + b"\x00" * 4
    moov = struct.pack(">I", 8 + len(junk) + len(mvhd)) + b"moov" + junk + mvhd
    meta = decode_video_real(ftyp + moov)
    assert meta == {
        "format": "mp4",
        "brand": brand.decode(),
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
    }


def test_parsers_reject_garbage():
    assert parse_image_header(b"\x00" * 64) is None
    assert parse_wav_header(b"RIFFxxxxNOPE" + b"\x00" * 40) is None
    with pytest.raises(ValueError):
        decode_video_real(b"\x00" * 64)
