"""Audio/video multimodal plumbing (driver brief: binary columns + typed
metadata; decode/feature/frame-sample as mapInPandas; real codecs stubbed,
deterministic formats exercise the full Spark path)."""

import numpy as np
import pytest

from dynaalign_spark import multimodal as mm


def test_audio_features_match_numpy(spark):
    rows = mm.make_audio_rows(8, seed=3)
    df = spark.createDataFrame(rows, mm.AUDIO_SCHEMA)
    got = {r.audio_id: r for r in mm.audio_features(df).collect()}
    assert len(got) == 8
    for r in rows:
        x = mm.decode_audio(bytes(r["bytes"]), "pcm16")
        g = got[r["audio_id"]]
        assert g.duration_s == len(x) / r["sample_rate"]
        assert abs(g.rms - float(np.sqrt(np.mean(x * x)))) < 1e-5
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(len(x), d=1.0 / r["sample_rate"])
        assert abs(g.spectral_centroid - float((freqs * spec).sum() / spec.sum())) < 1e-2
        # seeded sine at f0 dominates: centroid lands in a sane band
        assert 50 < g.spectral_centroid < 4000


def test_frame_sample_stride_and_bytes(spark):
    rows = mm.make_video_rows(5, seed=4, n_frames=12)
    df = spark.createDataFrame(rows, mm.VIDEO_SCHEMA)
    got = mm.frame_sample(df, stride=4).collect()
    by_vid = {}
    for r in got:
        by_vid.setdefault(r.video_id, []).append(r)
    assert set(by_vid) == {r["video_id"] for r in rows}
    for r in rows:
        frames = mm.decode_video(bytes(r["bytes"]), "rawv")
        out = sorted(by_vid[r["video_id"]], key=lambda x: x.frame_idx)
        assert [o.frame_idx for o in out] == [0, 4, 8]
        for o in out:
            f = frames[o.frame_idx]
            assert (o.h, o.w) == f.shape
            assert bytes(o.frame) == f.tobytes()
            assert o.mean_luma == float(f.mean())


def test_unknown_codecs_raise_clear_stub():
    with pytest.raises(NotImplementedError, match="audio codec 'mp3'"):
        mm.decode_audio(b"\x00", "mp3")
    with pytest.raises(NotImplementedError, match="video codec 'h264'"):
        mm.decode_video(b"\x00", "h264")


def test_determinism_across_runs(spark):
    rows = mm.make_audio_rows(4, seed=11)
    df = spark.createDataFrame(rows, mm.AUDIO_SCHEMA)
    a = sorted(map(tuple, mm.audio_features(df).collect()))
    b = sorted(map(tuple, mm.audio_features(df).collect()))
    assert a == b
