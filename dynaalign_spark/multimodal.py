"""Multimodal binary columns: audio and video as opaque ``binary`` + typed
metadata, with decode / feature-extract / frame-sample as Arrow-batched
``mapInPandas`` stages (driver brief: make the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — real; stub the real-world codecs,
which this sandbox has no libraries for, behind clearly-marked
NotImplementedError while a deterministic uncompressed format exercises the
full path end-to-end).

The image twin lives in codec.py / operators/simhash.py; this module adds:

- ``decode_audio``  — "pcm16" (uncompressed little-endian int16 mono)
  decodes for real with numpy; "mp3"/"flac"/... raise the codec stub.
- ``decode_video``  — "rawv" (12-byte header n_frames/h/w + uint8 luma
  frames) decodes for real; "h264"/... raise the codec stub.
- ``audio_features``— mapInPandas: (audio_id, duration_s, rms, zcr,
  spectral_centroid) per row — pure numpy (rfft), no per-row Python.
- ``frame_sample``  — mapInPandas row-expander: every ``stride``-th frame
  (always including frame 0) as (video_id, frame_idx, h, w, mean_luma,
  frame png-free raw bytes) — the training-pipeline "sample frames for the
  vision encoder" step. One narrow stage; output rows >> input rows, which
  is exactly what mapInPandas (unlike a scalar UDF) can express.

At 100 TB both ops are narrow maps over the binary column: no shuffle, scan
parallelism = input splits, and column pruning keeps ``bytes`` out of every
other tier's scan (same discipline as the pixel tier, plan-property
tested)."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_SCHEMA = "audio_id string, bytes binary, fmt string, sample_rate int"
VIDEO_SCHEMA = "video_id string, bytes binary, fmt string"


def encode_pcm16(samples: np.ndarray) -> bytes:
    """float [-1, 1] -> little-endian int16 bytes (the deterministic fmt)."""
    return (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """-> float64 mono samples in [-1, 1]."""
    if fmt == "pcm16":
        return np.frombuffer(bytes(data), dtype="<i2").astype(np.float64) / 32767.0
    raise NotImplementedError(
        f"audio codec '{fmt}' needs an external decoder (libsndfile/ffmpeg), "
        "not available in this sandbox — plumbing is exercised via 'pcm16'"
    )


def encode_rawv(frames: np.ndarray) -> bytes:
    """(n, h, w) uint8 luma frames -> header + raw bytes."""
    n, h, w = frames.shape
    head = np.array([n, h, w], dtype="<i4").tobytes()
    return head + frames.astype(np.uint8).tobytes()


def decode_video(data: bytes, fmt: str) -> np.ndarray:
    """-> (n_frames, h, w) uint8 luma frames."""
    if fmt == "rawv":
        b = bytes(data)
        n, h, w = np.frombuffer(b[:12], dtype="<i4")
        return np.frombuffer(b[12:], dtype=np.uint8).reshape(int(n), int(h), int(w))
    raise NotImplementedError(
        f"video codec '{fmt}' needs an external decoder (ffmpeg), not "
        "available in this sandbox — plumbing is exercised via 'rawv'"
    )


def audio_features(audio: DataFrame) -> DataFrame:
    """(audio_id, duration_s, rms, zcr, spectral_centroid) per row.

    Arrow-batched mapInPandas; all math is vectorized numpy per batch. The
    spectral centroid uses a single rfft per row (frequency in Hz via the
    row's sample_rate)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in it:
            ids, dur, rms, zcr, cent = [], [], [], [], []
            for aid, data, fmt, sr in zip(
                pdf["audio_id"], pdf["bytes"], pdf["fmt"], pdf["sample_rate"]
            ):
                x = decode_audio(data, fmt)
                n = len(x)
                ids.append(aid)
                dur.append(n / float(sr))
                # RMS over the int16 sample lattice with exact integer
                # accumulation, then one fixed-order float chain
                # (sqrt(s2/n)/32767): bit-reproducible by the driver's SQL
                # oracle (no pairwise-vs-sequential float-sum ordering
                # hazard). np.rint recovers the exact int16 for pcm16
                # (x*32767 is within an ulp of the integer) and quantizes
                # any other codec's floats to the same lattice.
                si = np.rint(x * 32767.0).astype(np.int64)
                s2 = int((si * si).sum())
                rms.append(math.sqrt(float(s2) / n) / 32767.0 if n else 0.0)
                zcr.append(
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if n > 1 else 0.0
                )
                if n > 1:
                    spec = np.abs(np.fft.rfft(x))
                    freqs = np.fft.rfftfreq(n, d=1.0 / float(sr))
                    tot = spec.sum()
                    cent.append(float((freqs * spec).sum() / tot) if tot > 0 else 0.0)
                else:
                    cent.append(0.0)
            # full-precision outputs: rounding is presentation, done by the
            # caller (the driver queries round with F.round so Spark's
            # HALF_UP matches DuckDB's; np.round here would be banker's)
            yield pd.DataFrame(
                {"audio_id": ids, "duration_s": dur,
                 "rms": rms, "zcr": zcr, "spectral_centroid": cent}
            )

    return audio.mapInPandas(
        batches,
        "audio_id string, duration_s double, rms double, zcr double, "
        "spectral_centroid double",
    )


def frame_sample(video: DataFrame, stride: int = 4) -> DataFrame:
    """Every ``stride``-th frame (frame 0 always included) as its own row:
    (video_id, frame_idx, h, w, mean_luma, frame) with ``frame`` the raw
    uint8 luma bytes — the row-expanding shape a scalar UDF cannot produce.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vid, idx, hh, ww, ml, fb = [], [], [], [], [], []
            for vd, data, fmt in zip(pdf["video_id"], pdf["bytes"], pdf["fmt"]):
                frames = decode_video(data, fmt)
                for i in range(0, frames.shape[0], stride):
                    f = frames[i]
                    vid.append(vd)
                    idx.append(i)
                    hh.append(f.shape[0])
                    ww.append(f.shape[1])
                    # exact: integer pixel sum / count (float64 sums of
                    # uint8 are exact integers at any accumulation order);
                    # rounding is the caller's (round() here would be
                    # banker's — k/256 means DO hit exact 4-dp halves)
                    ml.append(int(f.sum(dtype=np.int64)) / float(f.size))
                    fb.append(f.tobytes())
            yield pd.DataFrame(
                {"video_id": vid, "frame_idx": idx, "h": hh, "w": ww,
                 "mean_luma": ml, "frame": fb}
            )

    return video.mapInPandas(
        batches,
        "video_id string, frame_idx int, h int, w int, mean_luma double, "
        "frame binary",
    )


def make_audio_rows(n: int, seed: int = 7, sr: int = 8000,
                    secs: float = 0.5) -> list[dict]:
    """Deterministic synthetic audio corpus: seeded sine + noise mixes."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    t = np.arange(int(sr * secs)) / sr
    for i in range(n):
        f0 = float(rng.uniform(100, 2000))
        x = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.1 * rng.standard_normal(len(t))
        rows.append(dict(audio_id=f"aud{i:06d}", bytes=bytearray(encode_pcm16(x)),
                         fmt="pcm16", sample_rate=sr))
    return rows


def make_video_rows(n: int, seed: int = 9, n_frames: int = 12,
                    hw: tuple[int, int] = (16, 16)) -> list[dict]:
    """Deterministic synthetic video corpus: seeded drifting gradients."""
    rng = np.random.Generator(np.random.PCG64(seed))
    h, w = hw
    rows = []
    for i in range(n):
        base = rng.integers(0, 200, size=(h, w), dtype=np.uint8)
        frames = np.stack(
            [np.clip(base.astype(int) + 4 * k, 0, 255).astype(np.uint8)
             for k in range(n_frames)]
        )
        rows.append(dict(video_id=f"vid{i:06d}",
                         bytes=bytearray(encode_rawv(frames)), fmt="rawv"))
    return rows
