"""DedupConfig validation: structural constraints + analytic recall budget."""

from __future__ import annotations

import pytest

from relieff_lsh_spark.config import DedupConfig


def test_canonical_config_clears_recall_budget():
    cfg = DedupConfig()
    # 1-(1-j^r)^b at j=0.8, r=4, b=32
    assert cfg.text_recall_at_threshold == pytest.approx(
        1.0 - (1.0 - 0.8**4) ** 32
    )
    assert cfg.text_recall_at_threshold >= 0.99
    # worst-case all-buckets-salted bound is exposed, not hidden
    assert 0.0 < cfg.text_recall_salted < cfg.text_recall_at_threshold


def test_insufficient_banding_rejected():
    # b=4, r=4 at j=0.8: recall 1-(1-0.4096)^4 ~= 0.878 < 0.99
    with pytest.raises(ValueError, match="recall"):
        DedupConfig(bands=4, rows_per_band=4, n_perms=16)


def test_band_shape_must_factor():
    with pytest.raises(ValueError, match="n_perms"):
        DedupConfig(bands=3, rows_per_band=4, n_perms=128)


def test_pigeonhole_guard():
    with pytest.raises(ValueError, match="multi-index"):
        DedupConfig(simhash_bands=2, hamming_max=3)
