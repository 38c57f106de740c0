"""Pure-NumPy media codecs (multimodal.py): BMP/WAV/VID0 round-trips and
the real decode path feeding features (r3 verdict item 5)."""

import numpy as np
import pyarrow as pa

from orc_ray.functions.multimodal import (
    ImageResizeStage,
    decode_bmp,
    decode_video_frames,
    decode_wav,
    encode_bmp,
    encode_video,
    encode_wav,
    _decode_impl,
    synth_media_table,
)


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(1)
    for w, h in [(1, 1), (3, 5), (16, 16), (33, 7)]:  # odd widths hit stride pad
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        out = decode_bmp(encode_bmp(px))
        assert out is not None and np.array_equal(out, px), (w, h)


def test_bmp_rejects_garbage():
    assert decode_bmp(b"not a bmp at all" * 10) is None
    assert decode_bmp(b"BM\x00\x00") is None


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(2)
    s = rng.integers(-32768, 32767, 1234).astype(np.int16)
    dec = decode_wav(encode_wav(s, 16000))
    assert dec is not None
    got, rate = dec
    assert rate == 16000 and np.array_equal(got, s)


def test_video_container_roundtrip():
    frames = [b"frame-%d" % i for i in range(5)]
    assert decode_video_frames(encode_video(frames)) == frames
    assert decode_video_frames(b"XXXX\x00\x00\x00\x00") is None


def test_synth_corpus_fully_decodable():
    t = synth_media_table(24)
    for p, mt in zip(t.column("payload").to_pylist(), t.column("media_type").to_pylist()):
        if mt == "image":
            assert decode_bmp(p) is not None
        elif mt == "audio":
            assert decode_wav(p) is not None
        else:
            frames = decode_video_frames(p)
            assert frames and all(decode_bmp(f) is not None for f in frames)


def test_features_derive_from_real_pixels():
    """A solid white vs solid black image must produce distinct, exact
    thumbnail features — impossible from the old hash stub."""
    white = encode_bmp(np.full((20, 20, 3), 255, np.uint8))
    black = encode_bmp(np.zeros((20, 20, 3), np.uint8))
    fw = _decode_impl(white, "image")
    fb = _decode_impl(black, "image")
    assert np.allclose(fw, 1.0) and np.allclose(fb, 0.0)


def test_audio_features_track_amplitude():
    loud = encode_wav(np.full(1000, 16000, np.int16), 16000)
    quiet = encode_wav(np.full(1000, 100, np.int16), 16000)
    assert _decode_impl(loud, "audio").mean() > 10 * _decode_impl(quiet, "audio").mean()


def test_resize_produces_valid_bmp_at_target_dims():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (90, 70, 3)).astype(np.uint8)
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([encode_bmp(px)], pa.binary()),
            "media_type": pa.array(["image"]),
            "width": pa.array([70], pa.int32()),
            "height": pa.array([90], pa.int32()),
            "sample_rate": pa.array([0], pa.int32()),
        }
    )
    out = ImageResizeStage(32, 32)(t)
    dec = decode_bmp(out.column("payload")[0].as_py())
    assert dec is not None
    assert dec.shape == (out.column("height")[0].as_py(), out.column("width")[0].as_py(), 3)
    assert dec.shape[0] <= 32 and dec.shape[1] <= 32
    # nearest-neighbour: every output pixel exists in the source
    assert np.isin(dec.reshape(-1, 3), px.reshape(-1, 3)).all()
