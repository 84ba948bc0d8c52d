"""Closed-form fixture arithmetic — numpy-only, NO pyspark/pandas imports.

This module exists so `__spark_entry__.oracle_sql()` can be evaluated in a
bare DuckDB oracle environment where pyspark is not importable (VERDICT r3
item 1): it replays the synthetic audio fixture's violation-injection index
arithmetic (FIXTURES.md §4) and the decode math (sine → int16 → float32) in
a completely separate single-process code path, producing the literal
expected values the driver's DuckDB oracle compares against the distributed
Spark run.

The distributed generator lives in sparkcheck/io.py (mapInPandas over
spark.range) and re-exports everything here for backward compatibility;
keep the two in arithmetic lockstep — tests/test_audio_and_checkpoint.py
asserts the Spark run matches these closed forms end-to-end.

IMPORTANT: importing this module must never import pyspark, directly or
transitively (tests/test_oracle_pysparkfree.py runs it in a subprocess with
pyspark import-blocked).
"""

from __future__ import annotations

import numpy as np

_WORDS = (
    "the quick brown fox jumps over lazy dog audio clip speech model data "
    "table spark valid check sound wave noise signal clean test word token "
    "phrase record sample rate codec frame byte stream label text time"
).split()

_SR_CHOICES = np.array([8000, 16000, 22050, 44100, 48000])
_CODECS = np.array(["wav", "flac", "mp3", "opus"])

# violation sites (FIXTURES.md §4: fixed index arithmetic)
DUP_MOD, DUP_REM = 1000, 7            # duplicate of row i-1
NULLID_MOD, NULLID_REM = 2000, 13     # NULL clip_id
BADID_MOD, BADID_REM = 5000, 21       # malformed clip_id
BADSR_MOD, BADSR_REM = 2000, 17       # out-of-range sr_hz
BADCODEC_MOD, BADCODEC_REM = 3333, 11  # out-of-set codec
NULLTR_MOD, NULLTR_REM = 5000, 29     # NULL transcript
DIFFTR_MOD, DIFFTR_REM = 1000, 3      # transcript differs from reference
BADBYTES_MOD, BADBYTES_REM = 1000, 5  # corrupted payload (SNR < 30dB)
NULLBYTES_MOD, NULLBYTES_REM = 5000, 33  # NULL payload
ORPHAN_MOD, ORPHAN_REM = 10000, 41    # clip_id not present in reference


def _u01(idx: np.ndarray, salt: int, seed: int) -> np.ndarray:
    """Deterministic uniform [0,1) per index — splitmix64-style mix."""
    x = (idx.astype(np.uint64) * np.uint64(6364136223846793005)
         + np.uint64(salt * 1442695040888963407 + seed * 2654435761)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(33)
    x = (x * np.uint64(0xFF51AFD7ED558CCD)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(33)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _base_fields(idx: np.ndarray, seed: int) -> dict[str, np.ndarray]:
    """Clean content for each index (shared by dirty + reference tables)."""
    u_sr = _u01(idx, 1, seed)
    sr = np.where(u_sr < 0.70, 16000,
                  _SR_CHOICES[(u_sr * 1e6).astype(np.int64) % 5])
    # lognormal(ln 3000, 0.5) via Box-Muller, clipped [200, 30000]
    u1 = np.clip(_u01(idx, 2, seed), 1e-12, 1.0)
    u2 = _u01(idx, 3, seed)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    dur = np.clip(np.exp(np.log(3000.0) + 0.5 * z), 200, 30000).astype(np.int64)
    u_codec = _u01(idx, 4, seed)
    codec = np.where(u_codec < 0.80, "wav",
                     _CODECS[1 + (u_codec * 1e6).astype(np.int64) % 3])
    n_words = 3 + (_u01(idx, 9, seed) * 18).astype(np.int64)
    return {"sr_hz": sr.astype(np.int64), "dur_ms": dur, "codec": codec,
            "n_words": n_words}


def _transcript(i: int, n_words: int, seed: int) -> str:
    ws = []
    for k in range(n_words):
        h = (i * 1000003 + k * 10007 + seed * 31) % len(_WORDS)
        ws.append(_WORDS[h])
    return " ".join(ws)


def expected_counts(n_rows: int) -> dict[str, int]:
    """Closed-form violation counts for the dirty table at n_rows (tests).

    Computed by replaying the exact injection arithmetic, including overlaps
    (e.g. a duplicate index that is also a bad-codec index).
    """
    i = np.arange(n_rows)
    dup = (i % DUP_MOD == DUP_REM) & (i > 0)
    null_id = i % NULLID_MOD == NULLID_REM
    bad_id = i % BADID_MOD == BADID_REM
    orphan = i % ORPHAN_MOD == ORPHAN_REM
    # id-affecting violations overwrite in this order: null > bad > orphan
    # (bad/orphan masks applied after null in the generator; null wins only
    # where masks overlap — replicate generator order: null, bad, orphan)
    cid_null = null_id & ~bad_id & ~orphan
    # duplicate pairs: row i (dup) shares id with row i-1 unless its id was overwritten
    dup_effective = dup & ~null_id & ~bad_id & ~orphan
    return {
        "rows": n_rows,
        "null_clip_id": int(cid_null.sum()),
        "dup_rows_marked": int(2 * dup_effective.sum()),  # both rows of each pair
        "bad_clip_id": int((bad_id & ~null_id).sum()),
        "orphan_clip_id": int((orphan & ~null_id & ~bad_id).sum()),
        "bad_sr": int((i % BADSR_MOD == BADSR_REM).sum()),
        "bad_codec": int((i % BADCODEC_MOD == BADCODEC_REM).sum()),
        "null_transcript": int((i % NULLTR_MOD == NULLTR_REM).sum()),
        "diff_transcript": int(((i % DIFFTR_MOD == DIFFTR_REM)
                                & ~(i % NULLTR_MOD == NULLTR_REM)).sum()),
        "corrupted_bytes": int(((i % BADBYTES_MOD == BADBYTES_REM)
                                & ~(i % NULLBYTES_MOD == NULLBYTES_REM)).sum()),
        "null_bytes": int((i % NULLBYTES_MOD == NULLBYTES_REM).sum()),
    }


def _violation_masks(n_rows: int) -> dict[str, np.ndarray]:
    i = np.arange(n_rows)
    return {
        "i": i,
        "dup": (i % DUP_MOD == DUP_REM) & (i > 0),
        "null_id": i % NULLID_MOD == NULLID_REM,
        "bad_id": i % BADID_MOD == BADID_REM,
        "orphan": i % ORPHAN_MOD == ORPHAN_REM,
        "bad_sr": i % BADSR_MOD == BADSR_REM,
        "bad_codec": i % BADCODEC_MOD == BADCODEC_REM,
        "null_tr": i % NULLTR_MOD == NULLTR_REM,
        "diff_tr": i % DIFFTR_MOD == DIFFTR_REM,
        "bad_bytes": i % BADBYTES_MOD == BADBYTES_REM,
        "null_bytes": i % NULLBYTES_MOD == NULLBYTES_REM,
    }


def expected_snr_summary(n_rows: int, *, min_snr_db: float = 30.0) -> dict:
    """(element, unexpected, success) for expect_audio_snr_vs_reference:
    unexpected = non-null-bytes rows with a missing/unjoinable reference id
    (null/bad/orphan clip_id) or corrupted payload (detuned sine, SNR<30)."""
    m = _violation_masks(n_rows)
    nn = ~m["null_bytes"]
    no_ref = m["null_id"] | m["bad_id"] | m["orphan"]
    bad = nn & (no_ref | m["bad_bytes"])
    return {"element_count": n_rows, "unexpected_count": int(bad.sum()),
            "success": int(bad.sum()) == 0}


def expected_payload_summary(n_rows: int) -> dict:
    """(element, unexpected, success) for expect_audio_payload_to_match_
    reference: unexpected = non-null-bytes rows with a missing reference id
    or byte-different payload. On THIS fixture the set coincides exactly
    with expected_snr_summary's — every corrupted payload (detuned sine /
    truncated RIFF) both differs byte-wise and scores SNR < 30, and every
    non-corrupted row is byte-identical to its reference twin — but the
    operators differ in general (a byte-different re-encoding can still
    pass SNR)."""
    return expected_snr_summary(n_rows)


def expected_header_summary(n_rows: int) -> dict:
    """expect_audio_header_to_match_metadata: the bytes are encoded with the
    clean base sr, the sr_hz column is corrupted afterwards at the BADSR
    sites, so exactly those (non-null-bytes) rows mismatch."""
    m = _violation_masks(n_rows)
    bad = m["bad_sr"] & ~m["null_bytes"]
    return {"element_count": n_rows, "unexpected_count": int(bad.sum()),
            "success": int(bad.sum()) == 0}


def expected_pcm_duration_summary(n_rows: int, *, cap_ms: int = 120) -> dict:
    """expect_audio_pcm_duration_to_match_metadata over the dirty table with
    ``dur_column`` pointing at least(dur_ms, cap_ms): the payload always
    encodes exactly min(dur_ms, cap_ms) of PCM at the clean base sr (all
    fixture durations are >= 200 > the 120 default cap, and sr*cap/1000 is
    integral for every sr choice, so the byte-implied duration equals the
    capped metadata exactly), while the sr_hz column is corrupted AFTER byte
    synthesis at the BADSR sites — exactly those (non-null-bytes) rows
    mismatch. NULL-payload rows are missing, not unexpected."""
    m = _violation_masks(n_rows)
    bad = m["bad_sr"] & ~m["null_bytes"]
    return {"element_count": n_rows,
            "missing_count": int(m["null_bytes"].sum()),
            "unexpected_count": int(bad.sum()),
            "success": int(bad.sum()) == 0}


def expected_transcript_rate_summary(n_rows: int, *, min_wps: float = 1.0,
                                     max_wps: float = 40.0) -> dict:
    """(element, missing, unexpected) for
    expect_transcript_words_per_second_to_be_between on the dirty table:
    word counts replay the generator exactly (base n_words from the
    EFFECTIVE index — duplicates copy row i-1 — plus one word where the
    ' corrupted' suffix was appended), wps = words / (dur_ms/1000) in the
    same float64 single-division arithmetic Spark uses, null transcripts
    fall outside the domain."""
    m = _violation_masks(n_rows)
    i = m["i"]
    eff = np.where(m["dup"] & (i > 0), i - 1, i)
    base = _base_fields(eff, 42)
    words = base["n_words"] + ((m["diff_tr"] & ~m["null_tr"]).astype(np.int64))
    wps = words.astype(np.float64) / (base["dur_ms"].astype(np.float64) / 1000.0)
    nonnull = ~m["null_tr"]
    bad = nonnull & ~((wps >= min_wps) & (wps <= max_wps))
    return {"element_count": n_rows,
            "missing_count": int((~nonnull).sum()),
            "unexpected_count": int(bad.sum()),
            "success": int(bad.sum()) == 0}


def expected_partition_verdicts(n_rows: int, num_partitions: int) -> list[dict]:
    """Per-partition verdict rows for the metadata contract suite
    (not_null clip_id / between sr_hz 8000..48000 / in_set codec).
    spark.range splits [0, n) into contiguous chunks, so each partition's
    violation counts replay the index arithmetic over its range."""
    m = _violation_masks(n_rows)
    # spark.range contiguous split: partition p covers [floor(p*n/P), floor((p+1)*n/P))
    bounds = [int(n_rows * p / num_partitions) for p in range(num_partitions + 1)]
    null_id = m["null_id"]
    bad_sr = m["bad_sr"]
    bad_codec = m["bad_codec"]
    rows = []
    for p in range(num_partitions):
        lo, hi = bounds[p], bounds[p + 1]
        for etype, domain, mask in (
                ("expect_column_values_to_not_be_null", "clip_id", null_id),
                ("expect_column_values_to_be_between", "sr_hz", bad_sr),
                ("expect_column_values_to_be_in_set", "codec", bad_codec)):
            u = int(mask[lo:hi].sum())
            rows.append({"partition_id": p, "expectation_type": etype,
                         "domain": domain, "success": u == 0,
                         "unexpected_count": u})
    return rows


def _clean_pcm(i: int, sr: int, dur_ms: int, *, cap_ms: int) -> np.ndarray:
    """float32 PCM exactly as decode_pcm(encode_wav_pcm16(...)) produces it:
    int16 quantization then /32768 in float32."""
    ms = min(int(dur_ms), cap_ms)
    n = max(1, int(sr * ms / 1000))
    freq = 200.0 + (i % 200)
    t = np.arange(n, dtype=np.float64) / sr
    samples = (0.5 * np.sin(2 * np.pi * freq * t) * 32767.0).astype(np.int16)
    v = samples.astype(np.float32)
    v /= np.float32(32768.0)
    return v


def expected_features_summary(n_rows: int, *, seed: int = 42,
                              cap_ms: int = 120, round_nd: int = 4) -> dict:
    """Aggregate of extract_audio_features over the CLEAN table: replays the
    sine/int16/float32 math per clip (same ops as the engine's decode)."""
    idx = np.arange(n_rows)
    base = _base_fields(idx, seed)
    total, rms_vals, peak = 0, [], 0.0
    for i in range(n_rows):
        pcm = _clean_pcm(i, int(base["sr_hz"][i]), int(base["dur_ms"][i]),
                         cap_ms=cap_ms)
        total += len(pcm)
        rms_vals.append(float(np.sqrt(np.dot(pcm, pcm) / len(pcm))))
        peak = max(peak, float(np.abs(pcm).max()))
    return {"n_clips": n_rows, "decoded": n_rows,
            "avg_rms": round(float(np.mean(np.array(rms_vals, dtype=np.float64))), round_nd),
            "max_peak": round(peak, round_nd), "total_samples": total}


def expected_frame_rms_summary(n_rows: int, *, seed: int = 42, cap_ms: int = 120,
                               frame_ms: int = 25, hop_ms: int = 10,
                               max_frames: int = 8, round_nd: int = 4) -> dict:
    """Aggregate of frame_rms over the CLEAN table (same strided-window math
    as the pipeline operator, replayed serially in float32)."""
    idx = np.arange(n_rows)
    base = _base_fields(idx, seed)
    vals = []
    n_clips = 0
    for i in range(n_rows):
        sr = int(base["sr_hz"][i])
        pcm = _clean_pcm(i, sr, int(base["dur_ms"][i]), cap_ms=cap_ms)
        win = max(1, int(sr * frame_ms / 1000))
        hop = max(1, int(sr * hop_ms / 1000))
        n_frames = min(max_frames, max(0, 1 + (len(pcm) - win) // hop))
        if n_frames <= 0:
            continue
        n_clips += 1
        w = (np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :])
        frames = pcm[w]
        vals.extend(np.sqrt(np.mean(frames * frames, axis=1)).tolist())
    return {"n_frames": len(vals),
            "avg_rms": round(float(np.mean(np.array(vals, dtype=np.float64))), round_nd),
            "n_clips": n_clips}


def make_hyperplanes(dim: int, n_planes: int, *, seed: int = 42,
                     round_digits: int = 6) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-random-projection LSH
    (Charikar, STOC 2002). Rounded so the same literals embed bit-identically
    in Spark expressions and oracle SQL. Lives here (not in
    pipeline/similarity.py, which re-exports it) so the LSH oracle SQL can be
    built without importing pyspark."""
    rng = np.random.RandomState(seed)
    h = rng.standard_normal((n_planes, dim))
    return [[round(float(v), round_digits) for v in row] for row in h]
