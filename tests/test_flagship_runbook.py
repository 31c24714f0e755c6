"""Dry-run of the RUNBOOK flagship claim chain (bin/stl10_flagship.py).

Exercises the exact command the first person with egress will run
(compress STL10 train+test -> decode -> LinearSVC) with the tiny tower and
synthetic data, asserting the plumbing and the honesty flags.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "bin"))


def test_flagship_chain_dry_run(tmp_path):
    import stl10_flagship

    out = tmp_path / "flagship.json"
    r = stl10_flagship.main(["--tiny", "--n", "96", "--batch", "48",
                             "--out", str(out)])
    # all four claim fields measured
    for k in ("rate_bits_per_img", "encode_img_per_sec",
              "decode_img_per_sec", "stl10_accuracy"):
        assert r[k] > 0, (k, r)
    assert r["train_n"] == r["test_n"] == 96
    # a dry run must NEVER present itself as the published verification
    assert r["weights_synthetic"] and r["tiny_tower"]
    assert r["comparable_to_published"] is False
    assert out.exists()
    # decoded features feed a real probe: accuracy is a valid probability
    assert 0.0 <= r["stl10_accuracy"] <= 1.0
