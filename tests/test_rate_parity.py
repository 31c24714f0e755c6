"""Rate-parity self-consistency: the published entropy models, coded tightly.

In-env evidence for the headline rate claim (reference README.md:53 —
1506.50 bits/img via hub/compressor.py:150-207): samples drawn from the
published b005 model's own quantized-CDF tables must code at the model's
entropy + escape-nibble cost + a constant per-message rANS flush, and the
model's self-entropy must lower-bound the published real-data rate from
below within its neighborhood. See bin/rate_parity.py and RATE_PARITY.json.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "bin"))

from rate_parity import check_beta, model_entropy_bits, sample_from_tables

HUB = Path("/root/reference/hub")

needs_hub = pytest.mark.skipif(not HUB.exists(),
                               reason="published reference checkpoints absent")


@needs_hub
def test_b005_coded_rate_matches_model_entropy():
    rec = check_beta("b005", n=4000)
    # coder tight against its own model: constant flush only (~48 bits),
    # and the grouped rate shows the flush amortize to <0.02 bits/symbol
    assert 0.0 <= rec["flush_overhead_bits"] <= 80.0, rec
    assert abs(rec["per_symbol_excess_bits"]) < 0.02, rec
    # the model's self-entropy lower-bounds the published real-data rate
    # (cross-entropy >= entropy) and lands in its neighborhood
    assert 0.80 <= rec["entropy_over_published"] <= 1.0, rec
    # sanity: b005's entropy is ~1366 bits (fixed by the published params)
    assert abs(rec["model_entropy_bits_per_img"] - 1365.6) < 1.0, rec


@needs_hub
def test_sampler_matches_quantized_tables():
    """Inverse-CDF sampling reproduces the tables' own frequencies."""
    from lossyless_tpu.coding import entropy_bottleneck as eb
    from lossyless_tpu.hub.load_reference import load_factorized_rate

    ebp, _, _ = load_factorized_rate("b005")
    tables = eb.build_cdf_tables(ebp)
    n = 50000
    syms = sample_from_tables(tables, n, seed=1)
    c = 0  # spot-check one channel's empirical pmf against the table
    row = tables.quantized_cdf[c, : tables.cdf_length[c]].astype(np.int64)
    freqs = np.diff(row)
    slots = syms[:, c] - tables.offset[c]
    assert slots.min() >= 0 and slots.max() < len(freqs)
    emp = np.bincount(slots, minlength=len(freqs)) / n
    p = freqs / 65536.0
    # multinomial noise: ~4-sigma bound per slot at n=50k
    assert np.all(np.abs(emp - p) < 4 * np.sqrt(p * (1 - p) / n) + 1e-4)

    H, per_chan, esc = model_entropy_bits(tables)
    assert H > 0 and len(per_chan) == 512 and 0 <= esc < 512
