"""Pure-numpy baseline JPEG codec (operators/jpeg.py): round-trip
fidelity floors, marker/scan structure, error gates, and the r12
integration points — MJPG AVI frames decode to REAL pixels through the
`uav_video` DataSource, and `decode_real_media` handles image/jpeg with
no native library.

Fidelity floors are JPEG physics, not engine tuning: smooth content at
q=90 4:4:4 lands ~47 dB, chroma subsampling costs a few dB, noise at low
quality is the adversarial case (that's what lossy means). The floors
assert the codec is WORKING, with margin against numeric drift."""

from __future__ import annotations

import numpy as np
import pytest

from uav_streamprocessor_spark.operators.jpeg import (
    JpegFormatError,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def _psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth(h=64, w=48):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.sin(yy / 10) * 100 + 128,
            np.cos(xx / 12) * 100 + 128,
            np.sin((yy + xx) / 15) * 100 + 128,
        ],
        -1,
    ).astype(np.uint8)


def test_solid_color_is_near_exact():
    """A flat field is DC-only; the quantized DC of a constant 128 frame
    is exactly zero, so decode must be bit-exact."""
    img = np.full((24, 40, 3), 128, np.uint8)
    for sub in ("4:4:4", "4:2:2", "4:2:0"):
        out = decode_jpeg(encode_jpeg(img, quality=75, subsampling=sub))
        assert (out == img).all(), sub


@pytest.mark.parametrize(
    "sub,quality,floor",
    [
        ("4:4:4", 75, 40.0),
        ("4:4:4", 90, 45.0),
        ("4:4:4", 95, 48.0),
        ("4:2:2", 90, 39.0),
        ("4:2:0", 90, 36.0),
    ],
)
def test_round_trip_psnr_floor(sub, quality, floor):
    img = _smooth()
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) >= floor


def test_quality_monotone_on_noise():
    """Noise is the hardest content; PSNR must still rise with quality."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (40, 56, 3), np.uint8)
    scores = [
        _psnr(img, decode_jpeg(encode_jpeg(img, quality=q, subsampling="4:4:4")))
        for q in (50, 75, 95, 100)
    ]
    assert scores == sorted(scores)
    assert scores[-1] > 50.0  # q=100 on 4:4:4 is near-transparent


def test_odd_dimensions_crop_back():
    img = _smooth()[:37, :29]
    for sub in ("4:4:4", "4:2:0"):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        assert out.shape == (37, 29, 3)
        assert _psnr(img, out) >= 34.0
    tiny = np.full((1, 1, 3), 77, np.uint8)
    out = decode_jpeg(encode_jpeg(tiny, quality=90, subsampling="4:2:0"))
    assert out.shape == (1, 1, 3) and abs(int(out[0, 0, 0]) - 77) <= 3


def test_grayscale_single_component_scan():
    yy = np.mgrid[0:48, 0:40][0]
    g = (np.sin(yy / 9) * 110 + 128).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=92))
    assert out.shape == (48, 40, 3)
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()
    assert _psnr(np.stack([g] * 3, -1), out) >= 50.0


def test_restart_markers_do_not_change_pixels():
    img = _smooth()
    base = decode_jpeg(encode_jpeg(img, quality=85, subsampling="4:2:0"))
    for dri in (1, 2, 5):
        with_dri = decode_jpeg(
            encode_jpeg(img, quality=85, subsampling="4:2:0", restart_interval=dri)
        )
        assert (with_dri == base).all()
    g = img[..., 0]
    assert (
        decode_jpeg(encode_jpeg(g, quality=85, restart_interval=3))
        == decode_jpeg(encode_jpeg(g, quality=85))
    ).all()


def test_format_gates():
    assert not is_jpeg(b"\x00\x01\x02\x03")
    img = np.full((8, 8, 3), 10, np.uint8)
    buf = encode_jpeg(img)
    assert is_jpeg(buf)
    with pytest.raises(JpegFormatError, match="no SOI"):
        decode_jpeg(b"nope")
    # flip SOF0 to SOF2 (progressive) — must be rejected, not misdecoded
    i = buf.index(b"\xff\xc0")
    with pytest.raises(JpegFormatError, match="baseline"):
        decode_jpeg(buf[:i] + b"\xff\xc2" + buf[i + 2 :])
    with pytest.raises(JpegFormatError):
        decode_jpeg(buf[: len(buf) // 2])  # truncated scan
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, subsampling="4:1:1")


def test_decode_real_media_jpeg_no_longer_gated():
    from uav_streamprocessor_spark.operators.multimodal import decode_real_media

    img = _smooth(24, 24)
    out = decode_real_media(encode_jpeg(img, quality=95, subsampling="4:4:4"),
                            "image/jpeg")
    assert out.shape == (24, 24, 3) and _psnr(img, out) >= 40.0
    with pytest.raises(NotImplementedError):
        decode_real_media(b"RIFFxxxxWAVE", "audio/wav")


def test_mjpg_avi_decodes_to_real_pixels_through_datasource(spark, tmp_path):
    """S2 over the format UAV cameras actually emit: an MJPG AVI whose
    frames are REAL JPEGs decodes to pixels inside DataSource partitions
    — container demux (sources/avi.py) + entropy decode (operators/
    jpeg.py), zero native dependencies, and the result feeds the normal
    detect pipeline."""
    from uav_streamprocessor_spark.operators.pixel import decode_image
    from uav_streamprocessor_spark.sources.avi import FOURCC_MJPG, write_avi
    from uav_streamprocessor_spark.sources.video_source import register

    register(spark)
    frames = [_smooth(36, 64) for _ in range(6)]
    # vary each frame so order is provable
    frames = [np.roll(f, 5 * i, axis=1) for i, f in enumerate(frames)]
    payloads = [encode_jpeg(f, quality=95, subsampling="4:4:4") for f in frames]
    p = write_avi(
        tmp_path / "cam7.avi", payloads, fps=20.0, fourcc=FOURCC_MJPG,
        width=64, height=36,
    )
    df = (
        spark.read.format("uav_video")
        .option("path", p)
        .option("framesPerPartition", "2")
        .load()
    )
    rows = sorted(df.collect(), key=lambda r: r["frame_number"])
    assert [r["frame_number"] for r in rows] == list(range(6))
    assert rows[0]["camera_id"] == "cam7"
    for r, src in zip(rows, frames):
        px = decode_image(bytes(r["image"]))
        assert px.shape == (36, 64, 3)
        assert _psnr(src, px) >= 40.0  # real decode, JPEG-lossy tolerance


def test_media_jpeg_roundtrip_audit_constant_true(spark, duck):
    """The registered accuracy contract: every corpus image's q=95
    round trip clears the calibrated 30 dB floor, matching the
    constant-true oracle derived from documents."""
    from uav_streamprocessor_spark.operators.multimodal import (
        corpus_media,
        jpeg_roundtrip_audit,
    )
    from uav_streamprocessor_spark.fixtures import register_base_tables

    register_base_tables(spark, "/root/testdata/sf0.001")
    rows = jpeg_roundtrip_audit(corpus_media(spark)).collect()
    n_expected = duck.sql(
        "SELECT count(*) FROM documents WHERE doc_id % 3 = 0"
    ).fetchone()[0]
    assert len(rows) == n_expected > 0
    assert all(r["shape_ok"] and r["psnr_ok"] for r in rows)


def test_scan_with_missing_tables_raises_format_error():
    """A scan that references Huffman/quant table ids never defined must
    raise JpegFormatError, not a bare KeyError."""
    buf = bytearray(encode_jpeg(np.full((8, 8, 3), 9, np.uint8)))
    i = buf.index(b"\xff\xc4")  # drop the first DHT segment entirely
    seglen = int.from_bytes(buf[i + 2 : i + 4], "big")
    del buf[i : i + 2 + seglen]
    with pytest.raises(JpegFormatError):
        decode_jpeg(bytes(buf))
