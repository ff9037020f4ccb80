"""Deterministic synthetic audio+transcript corpus generator (FIXTURES.md).

Produces the exact input shape pinned by BASELINE.json:input_hint:

    corpus(clip_id: string, bytes: binary, sr_hz: int, dur_ms: int,
           codec: string, transcript: string)

plus ground-truth side tables (truth_components, truth_pairs, pcm_ref).
Everything is seeded (numpy default_rng) — no external data. The generator is
pure numpy/stdlib and writes parquet via pyarrow in batches so large corpora
never materialize in memory.

Planted duplicate structure (FIXTURES.md §2):
  singleton 70% | exact 8% | audio_near 8% (same audio + noise @ SNR 35dB,
  reworded transcript) | text_near 8% (1-word substitution keeping 5-shingle
  Jaccard >= 0.8) | text_substr 4% (transcript embedded verbatim in a longer
  one) | hotband ~2% (one ~N/50 group sharing near-identical audio spectrum
  and an identical short transcript -> adversarial bucket skew).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SR_CHOICES = (8000, 16000, 44100)
VOCAB_SIZE = 512
_LETTERS = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def make_vocab(rng: np.random.Generator) -> list[str]:
    vocab = []
    seen = set()
    while len(vocab) < VOCAB_SIZE:
        ln = int(rng.integers(3, 9))
        w = "".join(_LETTERS[rng.integers(0, 26, ln)])
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


@dataclass
class RowSpec:
    group_id: str
    kind: str                      # singleton|exact|audio_near|text_near|text_substr|hotband
    sr_hz: int
    dur_ms: int
    freqs: np.ndarray              # sinusoid frequencies (Hz)
    amps: np.ndarray
    phases: np.ndarray
    noise_seed: int                # per-row seed for the additive noise draw
    extra_noise_db: float          # SNR of extra noise vs signal; inf = none
    words: list[str] = field(default_factory=list)
    clip_id: str = ""


def _render_pcm(spec: RowSpec) -> np.ndarray:
    """Render int16 PCM samples for a row spec. Deterministic."""
    n = int(spec.sr_hz * spec.dur_ms / 1000)
    t = np.arange(n, dtype=np.float64) / spec.sr_hz
    sig = np.zeros(n)
    for f, a, p in zip(spec.freqs, spec.amps, spec.phases):
        sig += a * np.sin(2 * np.pi * f * t + p)
    peak = np.max(np.abs(sig)) or 1.0
    sig *= 0.45 / peak
    rms = np.sqrt(np.mean(sig**2)) or 1.0
    nrng = np.random.default_rng(spec.noise_seed)
    # base noise floor at -40 dB vs signal RMS (FIXTURES §1)
    sig = sig + nrng.normal(0.0, rms * 10 ** (-40 / 20), n)
    if np.isfinite(spec.extra_noise_db):
        sig = sig + nrng.normal(0.0, rms * 10 ** (-spec.extra_noise_db / 20), n)
    return np.clip(sig * 32767.0, -32768, 32767).astype(np.int16)


def _wav_bytes(pcm: np.ndarray, sr_hz: int) -> bytes:
    """Minimal RIFF/WAVE container around PCM16 mono samples."""
    data = pcm.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sr_hz, sr_hz * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Reference decode used by tests (pcm_ref / SNR invariant): parse the
    RIFF header, return (float32 samples in [-1,1], sr_hz)."""
    sr_hz = struct.unpack_from("<I", buf, 24)[0]
    n_bytes = struct.unpack_from("<I", buf, 40)[0]
    pcm = np.frombuffer(buf, dtype=np.int16, count=n_bytes // 2, offset=44)
    return pcm.astype(np.float32) / 32768.0, int(sr_hz)


def _base_audio(rng: np.random.Generator, row_i: int) -> dict:
    n_sin = int(rng.integers(2, 5))
    return dict(
        sr_hz=int(SR_CHOICES[rng.integers(0, len(SR_CHOICES))]),
        dur_ms=int(rng.integers(500, 3001)),
        freqs=rng.uniform(60.0, 3800.0, n_sin),
        amps=rng.uniform(0.3, 1.0, n_sin),
        phases=rng.uniform(0, 2 * np.pi, n_sin),
        noise_seed=int(rng.integers(0, 2**31)) ,
        extra_noise_db=np.inf,
    )


def _transcript(rng: np.random.Generator, vocab: list[str], lo: int = 5, hi: int = 60) -> list[str]:
    n = int(rng.integers(lo, hi + 1))
    return [vocab[i] for i in rng.integers(0, VOCAB_SIZE, n)]


def _zipf_size(rng: np.random.Generator) -> int:
    return int(np.clip(rng.zipf(2.5) + 1, 2, 20))


def build_specs(n_rows: int, seed: int = 42) -> list[RowSpec]:
    """Plan all rows (cheap; audio rendered later per batch)."""
    rng = np.random.default_rng(seed)
    vocab = make_vocab(rng)
    specs: list[RowSpec] = []
    gid = 0

    def new_gid(kind: str) -> str:
        nonlocal gid
        gid += 1
        return f"g_{kind}_{gid:06d}"

    # --- hotband: one group of ~N/50 rows, shared spectrum + shared phrase ---
    hot_n = max(4, n_rows // 50)
    hot_audio = _base_audio(rng, 0)
    hot_words = _transcript(rng, vocab, 5, 7)
    g = new_gid("hotband")
    for j in range(hot_n):
        a = dict(hot_audio)
        a["noise_seed"] = int(rng.integers(0, 2**31))
        a["extra_noise_db"] = 10.0  # heavy noise: distinct bytes, same spectrum
        specs.append(RowSpec(group_id=g, kind="hotband", words=list(hot_words), **a))

    budget = n_rows - hot_n
    quotas = {"exact": 0.08, "audio_near": 0.08, "text_near": 0.08, "text_substr": 0.04}

    for kind, share in quotas.items():
        target = int(round(n_rows * share))
        made = 0
        while made < target and budget - (target - made) >= 0:
            size = min(_zipf_size(rng), target - made)
            if size < 2:
                size = 2
            g = new_gid(kind)
            base_audio = _base_audio(rng, len(specs))
            if kind == "text_near":
                base_words = _transcript(rng, vocab, 54, 60)  # long enough that a
                # 1-word substitution keeps 5-shingle Jaccard >= 0.8 (FIXTURES §2)
            else:
                base_words = _transcript(rng, vocab)
            specs.append(RowSpec(group_id=g, kind=kind, words=list(base_words), **base_audio))
            for j in range(size - 1):
                if kind == "exact":
                    specs.append(RowSpec(group_id=g, kind=kind, words=list(base_words), **base_audio))
                elif kind == "audio_near":
                    a = dict(base_audio)
                    a["noise_seed"] = int(rng.integers(0, 2**31))
                    a["extra_noise_db"] = 35.0
                    specs.append(RowSpec(group_id=g, kind=kind,
                                         words=_transcript(rng, vocab), **a))
                elif kind == "text_near":
                    w = list(base_words)
                    pos = int(rng.integers(0, len(w)))
                    w[pos] = vocab[int(rng.integers(0, VOCAB_SIZE))]
                    specs.append(RowSpec(group_id=g, kind=kind, words=w,
                                         **_base_audio(rng, len(specs))))
                elif kind == "text_substr":
                    pre = _transcript(rng, vocab, 3, 12)
                    post = _transcript(rng, vocab, 3, 12)
                    specs.append(RowSpec(group_id=g, kind=kind,
                                         words=pre + list(base_words) + post,
                                         **_base_audio(rng, len(specs))))
            made += size
        budget -= made

    while len(specs) < n_rows:
        specs.append(RowSpec(group_id=new_gid("singleton"), kind="singleton",
                             words=_transcript(rng, vocab), **_base_audio(rng, len(specs))))

    specs = specs[:n_rows]
    order = rng.permutation(len(specs))
    shuffled = [specs[i] for i in order]
    for i, s in enumerate(shuffled):
        s.clip_id = f"clip_{i:08d}"
    return shuffled


CORPUS_SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("bytes", pa.binary()),
    ("sr_hz", pa.int32()),
    ("dur_ms", pa.int32()),
    ("codec", pa.string()),
    ("transcript", pa.string()),
])


def _render_rows(chunk: list[RowSpec]) -> tuple[dict, int]:
    rows = {k: [] for k in ("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")}
    nbytes = 0
    for s in chunk:
        pcm = _render_pcm(s)
        buf = _wav_bytes(pcm, s.sr_hz)
        nbytes += len(buf)
        rows["clip_id"].append(s.clip_id)
        rows["bytes"].append(buf)
        rows["sr_hz"].append(s.sr_hz)
        rows["dur_ms"].append(s.dur_ms)
        rows["codec"].append("pcm_s16le")
        rows["transcript"].append(" ".join(s.words))
    return rows, nbytes


def _render_part(args: tuple[str, list[RowSpec], int]) -> int:
    """Worker: render one contiguous spec slice into its own parquet part
    file. Rendering is deterministic per spec (all randomness is in the
    specs), so the parallel layout is value-identical to the sequential
    single-file layout up to row order."""
    out_path, specs_chunk, batch_rows = args
    writer = pq.ParquetWriter(out_path, CORPUS_SCHEMA, compression="zstd")
    total = 0
    for lo in range(0, len(specs_chunk), batch_rows):
        rows, nbytes = _render_rows(specs_chunk[lo:lo + batch_rows])
        total += nbytes
        writer.write_table(pa.table(rows, schema=CORPUS_SCHEMA))
    writer.close()
    return total


def write_corpus(
    n_rows: int,
    out_dir: str,
    seed: int = 42,
    batch_rows: int = 1000,
    write_pcm_ref: bool = False,
    procs: int = 1,
) -> dict:
    """Generate and write corpus + truth tables as parquet under out_dir.

    Returns summary counters. Idempotent for a given (n_rows, seed).
    procs > 1 renders in parallel, writing corpus.parquet as a DIRECTORY of
    part files (audio rendering is the bottleneck for bench-scale corpora);
    requires write_pcm_ref=False.
    """
    os.makedirs(out_dir, exist_ok=True)
    specs = build_specs(n_rows, seed)

    corpus_path = os.path.join(out_dir, "corpus.parquet")
    if procs > 1 and not write_pcm_ref:
        import multiprocessing as mp
        import shutil

        if os.path.isfile(corpus_path):
            # an earlier sequential run wrote a single FILE here; rmtree
            # would silently no-op and makedirs would raise
            os.remove(corpus_path)
        elif os.path.exists(corpus_path):
            shutil.rmtree(corpus_path, ignore_errors=True)
        os.makedirs(corpus_path)
        bounds = [(i * len(specs) // procs, (i + 1) * len(specs) // procs)
                  for i in range(procs)]
        jobs = [
            (os.path.join(corpus_path, f"part-{i:04d}.parquet"),
             specs[lo:hi], batch_rows)
            for i, (lo, hi) in enumerate(bounds) if hi > lo
        ]
        with mp.Pool(procs) as pool:
            total_bytes = sum(pool.map(_render_part, jobs))
        _write_truth(out_dir, specs)
        return _summary(specs, total_bytes)

    writer = pq.ParquetWriter(corpus_path, CORPUS_SCHEMA, compression="zstd")
    pcm_writer = None
    if write_pcm_ref:
        pcm_schema = pa.schema([("clip_id", pa.string()), ("pcm", pa.list_(pa.float32()))])
        pcm_writer = pq.ParquetWriter(os.path.join(out_dir, "pcm_ref.parquet"), pcm_schema)

    total_bytes = 0
    for lo in range(0, len(specs), batch_rows):
        chunk = specs[lo:lo + batch_rows]
        rows = {k: [] for k in ("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")}
        pcm_rows = {"clip_id": [], "pcm": []}
        for s in chunk:
            pcm = _render_pcm(s)
            buf = _wav_bytes(pcm, s.sr_hz)
            total_bytes += len(buf)
            rows["clip_id"].append(s.clip_id)
            rows["bytes"].append(buf)
            rows["sr_hz"].append(s.sr_hz)
            rows["dur_ms"].append(s.dur_ms)
            rows["codec"].append("pcm_s16le")
            rows["transcript"].append(" ".join(s.words))
            if pcm_writer is not None:
                pcm_rows["clip_id"].append(s.clip_id)
                pcm_rows["pcm"].append(pcm.astype(np.float32) / 32768.0)
        writer.write_table(pa.table(rows, schema=CORPUS_SCHEMA))
        if pcm_writer is not None:
            pcm_writer.write_table(pa.table(pcm_rows, schema=pcm_schema))
    writer.close()
    if pcm_writer is not None:
        pcm_writer.close()

    _write_truth(out_dir, specs)
    return _summary(specs, total_bytes)


def _write_truth(out_dir: str, specs: list[RowSpec]) -> None:
    comp = pa.table({
        "clip_id": [s.clip_id for s in specs],
        "component_id": [s.group_id for s in specs],
        "kind": [s.kind for s in specs],
    })
    pq.write_table(comp, os.path.join(out_dir, "truth_components.parquet"))

    by_group: dict[str, list[RowSpec]] = {}
    for s in specs:
        by_group.setdefault(s.group_id, []).append(s)
    pa_a, pa_b, pa_kind = [], [], []
    for g, members in by_group.items():
        if len(members) < 2:
            continue
        ids = sorted(m.clip_id for m in members)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pa_a.append(ids[i]); pa_b.append(ids[j]); pa_kind.append(members[0].kind)
    pq.write_table(pa.table({"a": pa_a, "b": pa_b, "kind": pa_kind}),
                   os.path.join(out_dir, "truth_pairs.parquet"))


def _summary(specs: list[RowSpec], total_bytes: int) -> dict:
    kinds: dict[str, int] = {}
    for s in specs:
        kinds[s.kind] = kinds.get(s.kind, 0) + 1
    n_pairs = sum(
        v * (v - 1) // 2
        for v in __import__("collections").Counter(s.group_id for s in specs).values()
    )
    return {"n_rows": len(specs), "kinds": kinds, "truth_pairs": n_pairs,
            "bytes": total_bytes}
