"""Deterministic synthetic audio-clip fixture generator + table IO.

Implements /root/repo/FIXTURES.md: the `audio_clips` table
(clip_id:string, bytes:binary, sr_hz:int, dur_ms:int, codec:string,
transcript:string), its clean reference twin, and the codecs dim. Everything
is a pure function of (row index, seed) — regenerating at any scale yields
identical tables, and every violation is injected at fixed index arithmetic so
exact unexpected counts are computable in closed form (expected_counts below).

Generation is distributed: spark.range -> mapInPandas (Arrow batches, numpy
vectorized; the only per-row Python is WAV byte assembly). At 10^12-clip scale
this generator IS the scan — there is no driver-side materialization.

Iceberg note (SURVEY.md §7 risk 6): the Iceberg runtime jar is not in this
container, so the "table provider" here is parquet + a JSON manifest that
carries (snapshot_id, partition list) — the same lineage fields an Iceberg
snapshot would provide. The engine only consumes the interface.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .fixture_math import (  # noqa: F401 — re-exported for compat
    BADBYTES_MOD, BADBYTES_REM, BADCODEC_MOD, BADCODEC_REM, BADID_MOD,
    BADID_REM, BADSR_MOD, BADSR_REM, DIFFTR_MOD, DIFFTR_REM, DUP_MOD,
    DUP_REM, NULLBYTES_MOD, NULLBYTES_REM, NULLID_MOD, NULLID_REM,
    NULLTR_MOD, NULLTR_REM, ORPHAN_MOD, ORPHAN_REM, _base_fields,
    _clean_pcm, _transcript, _u01, _violation_masks, expected_counts,
    expected_features_summary, expected_frame_rms_summary,
    expected_header_summary, expected_partition_verdicts,
    expected_payload_summary, expected_pcm_duration_summary,
    expected_snr_summary,
)
from .metrics.audio import encode_wav_pcm16

AUDIO_SCHEMA = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
                "codec string, transcript string")


def _clip_bytes(i: int, sr: int, dur_ms: int, *, corrupted: bool, cap_ms: int, seed: int) -> bytes:
    ms = min(int(dur_ms), cap_ms)
    n = max(1, int(sr * ms / 1000))
    freq = 200.0 + (i % 200)
    if corrupted:
        freq = freq * 1.618 + 13.0  # detuned sine => low SNR vs reference
    t = np.arange(n, dtype=np.float64) / sr
    samples = (0.5 * np.sin(2 * np.pi * freq * t) * 32767.0).astype(np.int16)
    return encode_wav_pcm16(samples, sr)


def generate_audio_clips(
    spark: SparkSession,
    n_rows: int,
    *,
    seed: int = 42,
    clean: bool = False,
    with_bytes: bool = True,
    audio_ms_cap: int = 120,
    num_partitions: int = 32,
    dur_drift: float = 0.0,
) -> DataFrame:
    """The synthetic audio table. ``clean=True`` => the golden reference twin
    (canonical ids, no violations — FIXTURES.md §2). ``dur_drift`` shifts the
    lognormal duration mu by that amount (FIXTURES.md: +0.3 triggers the
    KS/PSI/KL drift checks against a clean-profile baseline)."""

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            eff = idx.copy()
            if not clean:
                dup_mask = (idx % DUP_MOD == DUP_REM) & (idx > 0)
                eff = np.where(dup_mask, idx - 1, idx)  # duplicates copy row i-1
            base = _base_fields(eff, seed)
            if dur_drift:
                base["dur_ms"] = np.clip(
                    base["dur_ms"].astype(np.float64) * np.exp(dur_drift),
                    200, 30000).astype(np.int64)
            out = pd.DataFrame({
                "clip_id": [f"clip-{int(e):010d}" for e in eff],
                "sr_hz": base["sr_hz"].astype("int32"),
                "dur_ms": base["dur_ms"].astype("int32"),
                "codec": base["codec"],
                "transcript": [
                    _transcript(int(e), int(nw), seed)
                    for e, nw in zip(eff, base["n_words"])],
            })
            if with_bytes:
                corrupted = (~np.ones_like(idx, bool) if clean
                             else (idx % BADBYTES_MOD == BADBYTES_REM))
                out["bytes"] = [
                    _clip_bytes(int(e), int(sr), int(d), corrupted=bool(c),
                                cap_ms=audio_ms_cap, seed=seed)
                    for e, sr, d, c in zip(eff, base["sr_hz"], base["dur_ms"], corrupted)]
            else:
                out["bytes"] = None
            if not clean:
                i = idx
                cid = out["clip_id"].to_numpy(object)
                cid[i % NULLID_MOD == NULLID_REM] = None
                bad = i % BADID_MOD == BADID_REM
                cid[bad] = [f"bad_{int(x)}" for x in i[bad]]
                orph = i % ORPHAN_MOD == ORPHAN_REM
                cid[orph] = [f"clip-orphan-{int(x)}" for x in i[orph]]
                out["clip_id"] = cid
                sr = out["sr_hz"].to_numpy().copy()
                sr[i % BADSR_MOD == BADSR_REM] = 1234
                out["sr_hz"] = sr
                codec = out["codec"].to_numpy(object)
                codec[i % BADCODEC_MOD == BADCODEC_REM] = "ogg"
                out["codec"] = codec
                tr = out["transcript"].to_numpy(object)
                diff = i % DIFFTR_MOD == DIFFTR_REM
                tr[diff] = [str(t) + " corrupted" for t in tr[diff]]
                tr[i % NULLTR_MOD == NULLTR_REM] = None
                out["transcript"] = tr
                if with_bytes:
                    b = out["bytes"].to_numpy(object)
                    b[i % NULLBYTES_MOD == NULLBYTES_REM] = None
                    out["bytes"] = b
            yield out[["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]]

    return (spark.range(0, n_rows, numPartitions=num_partitions)
            .mapInPandas(gen, schema=AUDIO_SCHEMA))


def codecs_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("wav", True), ("flac", True), ("mp3", False), ("opus", False)],
        "codec string, lossless boolean")


# ------------------------------------------------------ manifest table IO
#
# Parquet + a JSON snapshot log standing in for Iceberg's snapshot/manifest
# machinery (SURVEY.md §7 risk 6: the Iceberg runtime jar is not in this
# container; the engine consumes only the interface). Semantics mirrored:
# - every write commits a new immutable snapshot (its own data dir),
# - `mode="append"` snapshots inherit the parent's files (incremental commit),
# - reads resolve a snapshot id (default: current) => TIME TRAVEL,
# - the snapshot log is committed by atomic rename, like checkpoint.py.


def _load_log(path: str) -> dict:
    log_path = os.path.join(path, "snapshots.json")
    if os.path.exists(log_path):
        with open(log_path) as f:
            return json.load(f)
    return {"snapshots": [], "current": None}


def _commit_log(path: str, log: dict) -> None:
    log_path = os.path.join(path, "snapshots.json")
    tmp = log_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(log, f, indent=1)
    os.replace(tmp, log_path)  # atomic snapshot commit


def write_table(df: DataFrame, path: str, *, snapshot_id: str | None = None,
                mode: str = "overwrite") -> str:
    """Commit `df` as a new snapshot of the table at `path`. Returns the
    snapshot id. ``mode="append"`` makes the new snapshot include the current
    snapshot's files plus the new data (Iceberg append commit)."""
    os.makedirs(path, exist_ok=True)
    log = _load_log(path)
    if snapshot_id is None:
        snapshot_id = f"snap-{len(log['snapshots'])}"
    if any(s["id"] == snapshot_id for s in log["snapshots"]):
        raise ValueError(f"snapshot {snapshot_id} already exists (snapshots are immutable)")
    data_dir = os.path.join(path, "data", snapshot_id)
    df.write.mode("errorifexists").parquet(data_dir)
    dirs = [os.path.join("data", snapshot_id)]
    parent = log["current"]
    if mode == "append" and parent is not None:
        parent_snap = next(s for s in log["snapshots"] if s["id"] == parent)
        dirs = parent_snap["dirs"] + dirs
    log["snapshots"].append({"id": snapshot_id, "mode": mode,
                             "parent": parent, "dirs": dirs})
    log["current"] = snapshot_id
    _commit_log(path, log)
    return snapshot_id


def read_table(spark: SparkSession, path: str,
               snapshot_id: str | None = None) -> tuple[DataFrame, dict]:
    """Read the table at `path` — the current snapshot by default, or any
    committed snapshot id (time travel). Returns (df, manifest) where the
    manifest carries (snapshot_id, parent, lineage) for verdict rows."""
    log = _load_log(path)
    if not log["snapshots"]:
        # legacy single-manifest layout
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        return spark.read.parquet(os.path.join(path, "data")), manifest
    sid = snapshot_id or log["current"]
    snap = next((s for s in log["snapshots"] if s["id"] == sid), None)
    if snap is None:
        raise KeyError(f"unknown snapshot: {sid}")
    # data lineage: the chain of snapshots whose files contribute to this
    # read — append commits extend it, overwrite commits reset it
    lineage = [sid]
    cur = snap
    while cur.get("mode") == "append" and cur.get("parent"):
        lineage.append(cur["parent"])
        cur = next(s for s in log["snapshots"] if s["id"] == cur["parent"])
    df = spark.read.parquet(*[os.path.join(path, d) for d in snap["dirs"]])
    manifest = {"snapshot_id": sid, "format": "parquet",
                "parent": snap.get("parent"), "lineage": lineage}
    return df, manifest


def read_table_delta(spark: SparkSession, path: str, since_snapshot_id: str,
                     snapshot_id: str | None = None) -> tuple[DataFrame, dict]:
    """Incremental read: only the files committed AFTER `since_snapshot_id`
    up to `snapshot_id` (default current) — Iceberg incremental-scan
    semantics. The 10^12-row validation loop validates each append delta
    once and trusts the committed verdicts for earlier snapshots."""
    log = _load_log(path)
    sid = snapshot_id or log["current"]
    target = next((s for s in log["snapshots"] if s["id"] == sid), None)
    base = next((s for s in log["snapshots"] if s["id"] == since_snapshot_id), None)
    if target is None or base is None:
        raise KeyError(f"unknown snapshot: {sid if target is None else since_snapshot_id}")
    delta_dirs = [d for d in target["dirs"] if d not in set(base["dirs"])]
    manifest = {"snapshot_id": sid, "since": since_snapshot_id,
                "format": "parquet", "delta_dirs": delta_dirs}
    if not delta_dirs:
        df = spark.read.parquet(os.path.join(path, target["dirs"][0])).limit(0)
        return df, manifest
    return spark.read.parquet(*[os.path.join(path, d) for d in delta_dirs]), manifest


def snapshots(path: str) -> list[dict]:
    """The committed snapshot log (oldest first)."""
    return _load_log(path)["snapshots"]
