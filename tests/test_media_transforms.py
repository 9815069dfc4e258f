"""resize_images / downsample_audio: real numpy transform round-trips."""

import struct

import numpy as np
import pytest

from stock_market_etl_pipeline_spark.operators.multimodal import (
    AUDIO_SCHEMA,
    RESIZED_SCHEMA,
    _decode_ppm,
    _decode_wav,
    _encode_ppm,
    _encode_wav,
    downsample_audio,
    resize_images,
)


def _ppm_payload():
    # 4×4 RGB gradient: pixel (r, c) = (16r, 16c, 100)
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    for r in range(4):
        for c in range(4):
            px[r, c] = (16 * r, 16 * c, 100)
    return _encode_ppm(px), px


def _wav_payload():
    # stereo, 8 frames: L ramps 0..7000, R constant -123
    frames = np.stack(
        [np.arange(8, dtype=np.int16) * 1000,
         np.full(8, -123, dtype=np.int16)], axis=1
    )
    return _encode_wav(frames, n_channels=2, sample_rate=8000), frames


def _media(spark, payload, mtype):
    return spark.createDataFrame(
        [(0, bytearray(payload), mtype, len(payload))],
        "media_id long, payload binary, media_type string, byte_len long",
    )


def test_resize_nearest_neighbor_picks_expected_pixels(spark):
    payload, px = _ppm_payload()
    out = resize_images(_media(spark, payload, "image/ppm"), 2, 2).collect()[0]
    assert out.width == 2 and out.height == 2
    assert out.byte_len == len(out.payload)
    w, h, _, _ = _decode_ppm(bytes(out.payload), 4)
    assert (w, h) == (2, 2)
    raster = np.frombuffer(
        bytes(out.payload).split(b"\n", 3)[3], dtype=np.uint8
    ).reshape(2, 2, 3)
    # nearest-neighbor with floor mapping: output (r, c) ← input (2r, 2c)
    for r in range(2):
        for c in range(2):
            assert tuple(raster[r, c]) == tuple(px[2 * r, 2 * c])


def test_resize_upscale_replicates(spark):
    payload, px = _ppm_payload()
    out = resize_images(_media(spark, payload, "image/ppm"), 8, 8).collect()[0]
    raster = np.frombuffer(
        bytes(out.payload).split(b"\n", 3)[3], dtype=np.uint8
    ).reshape(8, 8, 3)
    assert tuple(raster[0, 0]) == tuple(raster[1, 1]) == tuple(px[0, 0])
    assert tuple(raster[7, 7]) == tuple(px[3, 3])


def test_resize_schema_and_null_passthrough(spark):
    df = spark.createDataFrame(
        [(1, None, "image/ppm", None)],
        "media_id long, payload binary, media_type string, byte_len long",
    )
    out = resize_images(df, 2, 2)
    assert out.schema == RESIZED_SCHEMA
    row = out.collect()[0]
    assert row.payload is None and row.width is None


def test_resize_codec_format_raises(spark):
    df = _media(spark, b"\x89PNG....", "image/png")
    with pytest.raises(Exception, match="libjpeg"):
        resize_images(df, 2, 2).collect()


def test_downsample_audio_stride_keeps_every_other_frame(spark):
    payload, frames = _wav_payload()
    out = downsample_audio(_media(spark, payload, "audio/wav"), 2).collect()[0]
    assert out.n_frames == 4
    assert out.sample_rate == 4000
    # re-decode through the production decoder: channels preserved
    n_ch, rate_khz, n, _ = _decode_wav(bytes(out.payload), 4)
    assert n_ch == 2 and rate_khz == 4 and n == 4
    data = bytes(out.payload)
    idx = data.rindex(b"data")
    kept = np.frombuffer(
        data[idx + 8: idx + 8 + struct.unpack("<I", data[idx + 4: idx + 8])[0]],
        dtype=np.int16,
    ).reshape(4, 2)
    assert (kept == frames[::2]).all()


def test_downsample_audio_schema(spark):
    payload, _ = _wav_payload()
    out = downsample_audio(_media(spark, payload, "audio/wav"), 2)
    assert out.schema == AUDIO_SCHEMA


def test_downsample_codec_format_raises(spark):
    df = _media(spark, b"ID3\x04mp3bytes", "audio/mp3")
    with pytest.raises(Exception, match="ffmpeg"):
        downsample_audio(df, 2).collect()


def test_encode_decode_ppm_roundtrip_property():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    w, h, nf, feat = _decode_ppm(_encode_ppm(px), 4)
    assert (w, h, nf) == (3, 5, 1)
    assert feat[0] == pytest.approx(px[..., 0].mean() / 255, abs=1e-6)
