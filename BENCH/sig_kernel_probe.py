"""Signature-kernel microbench: measures per-clip decode+fingerprint+simhash
variants at 1 and 8 concurrent processes on realistic corpus clips.

The 2->8-core scaling gate (BENCH/BASELINE.md) is bounded by the signature
stage; this probe isolates the numpy kernel from Spark so candidate
memory-traffic reductions can be A/B'd in minutes instead of full pipeline
runs. Usage: python BENCH/sig_kernel_probe.py [n_clips_per_proc]
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relieff_lsh_spark.config import DedupConfig
from relieff_lsh_spark.functions import audio as A
from relieff_lsh_spark.sources import corpus as C


def make_clips(n: int, seed: int) -> list[tuple[bytes, str]]:
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        kw = C._base_audio(rng, i)
        spec = C.RowSpec(group_id=f"g{i}", kind="singleton", clip_id=f"c{i}", **kw)
        pcm = C._render_pcm(spec)
        out.append((C._wav_bytes(pcm, spec.sr_hz), "pcm_s16le"))
    return out


def _fingerprint_variant(x, sr_hz, cfg, *, f64_in=False, einsum_pow=False,
                         block=None):
    """Copy of audio.spectral_fingerprint with the A/B'd kernel knobs."""
    n_fft, hop = cfg.fft_window, cfg.fft_hop
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(n_frames, n_fft),
        strides=(x.strides[0] * hop, x.strides[0]), writeable=False,
    )
    if n_frames > cfg.max_fft_frames:
        idx = np.linspace(0, n_frames - 1, cfg.max_fft_frames).astype(np.int64)
        frames = frames[idx]
        n_frames = cfg.max_fft_frames
    win, los, his, valid = A._fp_constants(n_fft, sr_hz, cfg)
    BLK = block or A._FFT_BLOCK
    acc = np.zeros(n_fft // 2 + 1, dtype=np.float64)
    dt = np.float64 if f64_in else np.float32
    wbuf = np.empty((min(BLK, n_frames), n_fft), dtype=dt)
    for lo in range(0, n_frames, BLK):
        blk = frames[lo:lo + BLK]
        np.multiply(blk, win, out=wbuf[: blk.shape[0]])
        r = np.fft.rfft(wbuf[: blk.shape[0]], axis=1)
        if einsum_pow:
            v3 = r.view(np.float64).reshape(r.shape[0], -1, 2)
            acc += np.einsum("ijk,ijk->j", v3, v3)
        else:
            sp = np.abs(r) ** 2
            for rr in range(sp.shape[0]):
                acc += sp[rr]
    mean_spec = acc / n_frames
    band = np.zeros(cfg.n_freq_bands, dtype=np.float64)
    add_reduce = np.add.reduce
    for i in range(cfg.n_freq_bands):
        if valid[i]:
            lo, hi = los[i], his[i]
            band[i] = add_reduce(mean_spec[lo:hi]) / (hi - lo)
    logb = np.log10(band + 1e-20)
    logb = np.maximum(logb, logb.max() - 3.0)
    logb -= logb.mean()
    norm = np.linalg.norm(logb)
    return logb / norm if norm > 0 else logb


VARIANTS = {
    "head": None,
    "f64in": dict(f64_in=True),
    "einsum": dict(einsum_pow=True),
    "f64+einsum": dict(f64_in=True, einsum_pow=True),
    "f64+einsum+blk16": dict(f64_in=True, einsum_pow=True, block=16),
    "f64+einsum+blk64": dict(f64_in=True, einsum_pow=True, block=64),
    "einsum+blk16": dict(einsum_pow=True, block=16),
    "f64+einsum+blk8": dict(f64_in=True, einsum_pow=True, block=8),
}


def run_variant(variant: str, clips, cfg, planes) -> float:
    kw = VARIANTS[variant]
    if kw is None:
        fp = A.spectral_fingerprint
    else:
        fp = lambda x, sr, c: _fingerprint_variant(x, sr, c, **kw)  # noqa: E731
    t0 = time.perf_counter()
    acc = 0
    for buf, codec in clips:
        x, sr = A.decode_pcm(buf, codec)
        acc ^= A.simhash64(fp(x, sr, cfg), planes)
    dt = time.perf_counter() - t0
    return dt, acc


def worker(variant, clips, cfg, planes, q):
    dt, acc = run_variant(variant, clips, cfg, planes)
    q.put((dt, acc))


def measure_inproc(variant, clips, cfg, planes):
    dt, acc = run_variant(variant, clips, cfg, planes)
    return {"procs": 1, "wall": round(dt, 3),
            "clips_per_sec": round(len(clips) / dt, 1), "acc": acc}


def measure(variant: str, clips, cfg, planes, procs: int) -> dict:
    q = mp.Queue()
    ps = [
        mp.Process(target=worker, args=(variant, clips, cfg, planes, q))
        for _ in range(procs)
    ]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    results = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    total_clips = len(clips) * procs
    return {
        "procs": procs,
        "wall": round(wall, 3),
        "clips_per_sec": round(total_clips / wall, 1),
        "acc": results[0][1],
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    cfg = DedupConfig(seed=42)
    planes = A.simhash_planes(cfg)
    clips = make_clips(n, seed=7)
    avg_bytes = sum(len(b) for b, _ in clips) / len(clips)
    print(f"n={n}/proc avg_clip={avg_bytes/1024:.1f}KB", flush=True)
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(VARIANTS)
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    best: dict[tuple, float] = {}
    accs: dict[str, int] = {}
    # interleaved repeats, best-per-cell: the shared host shows bursty
    # noisy-neighbor interference (same protocol as BENCH/scaling.py)
    for rep in range(reps):
        for variant in names:
            for procs in (1, 8):
                r = measure(variant, clips, cfg, planes, procs)
                key = (variant, procs)
                best[key] = max(best.get(key, 0.0), r["clips_per_sec"])
                accs[variant] = r["acc"]
    for variant in names:
        row = {
            "variant": variant,
            "cps_1p": best[(variant, 1)],
            "cps_8p": best[(variant, 8)],
            "scale_1_8": round(best[(variant, 8)] / (8 * best[(variant, 1)]), 3),
            "acc": accs[variant],
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
