"""Generator correctness: determinism, schema, planted structure, decode."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from relieff_lsh_spark.sources.corpus import build_specs, decode_wav, write_corpus


def test_specs_deterministic():
    a = build_specs(200, seed=11)
    b = build_specs(200, seed=11)
    assert [s.clip_id for s in a] == [s.clip_id for s in b]
    assert [s.words for s in a] == [s.words for s in b]
    assert [s.noise_seed for s in a] == [s.noise_seed for s in b]


def test_specs_seed_sensitivity():
    a = build_specs(200, seed=11)
    b = build_specs(200, seed=12)
    assert [s.words for s in a] != [s.words for s in b]


def test_corpus_schema_and_kinds(small_corpus_dir):
    d = small_corpus_dir
    cols = duckdb.sql(f"describe select * from '{d}/corpus.parquet'").fetchall()
    assert [(c[0], c[1]) for c in cols] == [
        ("clip_id", "VARCHAR"), ("bytes", "BLOB"), ("sr_hz", "INTEGER"),
        ("dur_ms", "INTEGER"), ("codec", "VARCHAR"), ("transcript", "VARCHAR"),
    ]
    kinds = dict(duckdb.sql(
        f"select kind, count(*) from '{d}/truth_components.parquet' group by 1"
    ).fetchall())
    n = sum(kinds.values())
    assert n == 1000
    assert kinds["singleton"] / n == pytest.approx(0.70, abs=0.03)
    for k in ("exact", "audio_near", "text_near"):
        assert kinds[k] / n == pytest.approx(0.08, abs=0.02)
    assert kinds["text_substr"] / n == pytest.approx(0.04, abs=0.02)
    assert kinds["hotband"] == 1000 // 50


def test_wav_decodes_and_pcm_ref_snr(small_corpus_dir):
    """Per-row invariant (BASELINE.json input_hint): decoded PCM vs the
    generator's reference decode at SNR >= 30 dB (here: exact)."""
    d = small_corpus_dir
    corpus = pd.read_parquet(os.path.join(d, "corpus.parquet")).head(50)
    ref = pd.read_parquet(os.path.join(d, "pcm_ref.parquet")).set_index("clip_id")
    for _, row in corpus.iterrows():
        x, sr = decode_wav(bytes(row["bytes"]))
        assert sr == row["sr_hz"]
        assert len(x) == int(row["sr_hz"] * row["dur_ms"] / 1000)
        r = np.asarray(ref.loc[row["clip_id"], "pcm"], dtype=np.float32)
        noise = x - r
        sig_p = float(np.mean(r**2))
        noise_p = float(np.mean(noise**2))
        snr_db = 10 * np.log10(sig_p / noise_p) if noise_p > 0 else np.inf
        assert snr_db >= 30.0


def test_truth_pairs_consistent(small_corpus_dir):
    d = small_corpus_dir
    bad = duckdb.sql(f"select count(*) from '{d}/truth_pairs.parquet' where a >= b").fetchone()[0]
    assert bad == 0
    # every pair's endpoints share a truth component
    n_cross = duckdb.sql(f"""
        select count(*) from '{d}/truth_pairs.parquet' p
        join '{d}/truth_components.parquet' ca on p.a = ca.clip_id
        join '{d}/truth_components.parquet' cb on p.b = cb.clip_id
        where ca.component_id != cb.component_id
    """).fetchone()[0]
    assert n_cross == 0
