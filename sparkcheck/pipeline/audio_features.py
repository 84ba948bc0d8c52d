"""Audio feature extraction over opaque binary columns (multimodal pipeline).

When materializing these over parquet-stored payloads, wrap the action in
``sparkcheck.metrics.audio.payload_batch_guard`` — it bounds the vectorized
reader's columnar batches by bytes instead of Spark's row-count default,
which anti-scales on wide binary columns at high parallelism.

All operators are Arrow-batched `mapInPandas` over the (clip_id, bytes, ...)
table — no per-row Python UDFs, no driver collection. WAV/PCM16 decode is real
(sparkcheck.metrics.audio.decode_pcm); compressed codecs are stubbed behind
`strict_codecs` exactly like the SNR invariant (the codec libraries are not in
this container, the Spark plumbing — schema, batching, partitioning — is real
and tested).

Scale: each operator is a single scan of the binary column, embarrassingly
parallel; output rows carry only scalar features, so the expensive decode
happens exactly once per clip and nothing binary is shuffled.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401 (callers compose on outputs)

from ..metrics.audio import decode_pcm

FEATURE_SCHEMA = ("clip_id string, n_samples bigint, header_sr int, "
                  "rms double, peak double, clipping_ratio double, "
                  "header_dur_ms double, decode_ok boolean")


def wav_header_sr(payload: bytes | None) -> int | None:
    """Sample rate from the RIFF fmt chunk — header-only, no PCM decode."""
    if payload is None or len(payload) < 36 or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if cid == b"fmt " and pos + 16 <= n:
            return int.from_bytes(payload[pos + 12:pos + 16], "little")
        pos += 8 + size + (size & 1)
    return None


def extract_audio_features(df: DataFrame, *, id_col: str = "clip_id",
                           bytes_col: str = "bytes", codec_col: str = "codec",
                           clip_threshold: float = 0.999,
                           strict_codecs: bool = False) -> DataFrame:
    """Per-clip scalar features: sample count, header sample rate, RMS, peak,
    clipping ratio, header-derived duration."""

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            out = {
                "clip_id": pdf[id_col],
                "n_samples": np.zeros(n, dtype=np.int64),
                "header_sr": pd.array([None] * n, dtype="Int32"),
                "rms": np.full(n, np.nan),
                "peak": np.full(n, np.nan),
                "clipping_ratio": np.full(n, np.nan),
                "header_dur_ms": np.full(n, np.nan),
                "decode_ok": np.zeros(n, dtype=bool),
            }
            for i in range(n):
                payload = pdf[bytes_col].iloc[i]
                pcm = decode_pcm(payload, pdf[codec_col].iloc[i], strict_codecs)
                if pcm is None or len(pcm) == 0:
                    continue
                sr = wav_header_sr(bytes(payload))
                out["decode_ok"][i] = True
                out["n_samples"][i] = len(pcm)
                if sr:
                    out["header_sr"][i] = sr
                    out["header_dur_ms"][i] = 1000.0 * len(pcm) / sr
                out["rms"][i] = float(np.sqrt(np.dot(pcm, pcm) / len(pcm)))
                absmax = np.abs(pcm)
                out["peak"][i] = float(absmax.max())
                out["clipping_ratio"][i] = float((absmax >= clip_threshold).mean())
            yield pd.DataFrame(out)

    cols = [id_col, bytes_col, codec_col]
    return df.select(*cols).mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_rms(df: DataFrame, *, id_col: str = "clip_id", bytes_col: str = "bytes",
              codec_col: str = "codec", frame_ms: int = 25, hop_ms: int = 10,
              max_frames: int = 1000, strict_codecs: bool = False) -> DataFrame:
    """Frame-sampled RMS energy (frame_ms window, hop_ms stride) — the audio
    analogue of video frame-sampling. One row per (clip, frame); vectorized
    via a strided reshape per clip."""

    def gen(batches):
        for pdf in batches:
            ids, fidx, t0, vals = [], [], [], []
            for i in range(len(pdf)):
                payload = pdf[bytes_col].iloc[i]
                pcm = decode_pcm(payload, pdf[codec_col].iloc[i], strict_codecs)
                if pcm is None or len(pcm) == 0:
                    continue
                sr = wav_header_sr(bytes(payload)) or 16000
                win = max(1, int(sr * frame_ms / 1000))
                hop = max(1, int(sr * hop_ms / 1000))
                n_frames = min(max_frames, max(0, 1 + (len(pcm) - win) // hop))
                if n_frames <= 0:
                    continue
                idx = (np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :])
                frames = pcm[idx]
                rms = np.sqrt(np.mean(frames * frames, axis=1))
                ids.extend([pdf[id_col].iloc[i]] * n_frames)
                fidx.extend(range(n_frames))
                t0.extend((np.arange(n_frames) * hop_ms).tolist())
                vals.extend(rms.tolist())
            yield pd.DataFrame({"clip_id": ids, "frame_idx": fidx,
                                "start_ms": t0, "rms": vals})

    return (df.select(id_col, bytes_col, codec_col)
            .mapInPandas(gen, schema="clip_id string, frame_idx int, start_ms int, rms double"))
