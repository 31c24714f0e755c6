"""Drive EVERY experiment preset end-to-end on CPU with tiny overrides.

One command to validate that each of the presets (one per reference bin/
experiment group) still trains, evaluates and writes artifacts after a
change — the full 3-stage pipeline on synthetic data with small towers,
asserting every reported metric is finite. This sweep caught a preset that
crashed at data load (banana BINCE equiv_x) and a NaN-on-first-update bug
(cosine-normalization gradient at zero rows) that unit suites missed.

Usage: python bin/preset_sweep.py [preset ...]   (default: all)
Runtime: ~25 min for all 28 on a small CPU host; each line prints as it
finishes. Exit code 1 if any preset fails or reports non-finite metrics.
"""

import contextlib
import io
import math
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

TINY_VIT = ['encoder.arch_kwargs.width=64', 'encoder.arch_kwargs.layers=2',
            'encoder.arch_kwargs.heads=2', 'encoder.z_dim=16']
TINY_RN50 = ['encoder.arch_kwargs.width=16', 'encoder.arch_kwargs.heads=4',
             'encoder.arch_kwargs.layers=(1,1,1,1)', 'encoder.z_dim=16']
SYN = ['data_feat.kwargs.synthetic=True', 'data_feat.kwargs.synthetic_n=64',
       'data_feat.batch_size=16', 'data_feat.n_epochs=1',
       'predictor.n_epochs=2', 'trainer.log_every=0']
SYN_PRED = ['data_pred.kwargs.synthetic=True', 'data_pred.kwargs.synthetic_n=64',
            'data_pred.n_epochs=1', 'data_pred.batch_size=16']
TINY_CNN = ['encoder.arch=cnn', 'encoder.arch_kwargs.hid_dim=16',
            'distortion.arch_kwargs.hid_dim=16', 'online.arch_kwargs.hid_dim=32']
TINY_BALLE = ['encoder.arch_kwargs.hid_dim=16', 'distortion.arch_kwargs.hid_dim=16',
              'online.arch_kwargs.hid_dim=32', 'data_feat.batch_size=8',
              'data_feat.kwargs.synthetic_n=32', 'data_pred.kwargs.synthetic_n=32']


def overrides(name: str) -> list[str]:
    if name.startswith('banana'):
        return ['data_feat.n_epochs=1', 'data_feat.kwargs.length=4096',
                'predictor.n_epochs=2', 'trainer.log_every=0']
    o = list(SYN)
    if 'mnist' in name or name.startswith('augmnist'):
        o += TINY_CNN
    elif name.startswith('stl10'):
        o += SYN_PRED
        o += TINY_BALLE if name == 'stl10_balle' else TINY_CNN
    elif name.startswith('galaxy'):
        o += SYN_PRED + TINY_BALLE
    elif name.startswith('ssl_'):
        o += TINY_RN50 + ['data_feat.name=stl10']
        if 'eval' in name:
            o += ['data_pred.name=stl10'] + SYN_PRED
        else:
            o += ['is_only_feat=True']
    elif name.startswith('clip'):
        o += TINY_VIT
        if 'pretrain' in name or name == 'clip_hub':
            o += ['data_feat.name=stl10']
        if 'eval' in name:
            o += ['data_pred.name=stl10'] + SYN_PRED
    return o


def main(argv=None) -> int:
    import os

    # pin BOTH the config and the env: cli.main's respect_platform_env()
    # re-asserts JAX_PLATFORMS from the environment, so a shell that pins
    # it to the accelerator would otherwise silently override the config
    # update and run the whole "CPU" sweep on the chip
    os.environ['JAX_PLATFORMS'] = 'cpu'
    jax.config.update('jax_platforms', 'cpu')
    from lossyless_tpu.cli import main as cli_main
    from lossyless_tpu.pipeline.config import available_presets

    names = (argv or sys.argv[1:]) or available_presets()
    tmp = tempfile.mkdtemp(prefix='preset_sweep_')
    n_ok = 0
    for name in names:
        ov = overrides(name) + [f'out_dir={tmp}/{name}/r',
                                f'ckpt_dir={tmp}/{name}/c']
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                m = cli_main([name] + ov)
            bad = [k for k, v in m.items()
                   if hasattr(v, '__float__') and not math.isfinite(float(v))]
            status = 'OK' if not bad else f'NONFINITE: {bad[:4]}'
        except Exception as e:  # noqa: BLE001 — report and continue
            status = f'FAIL {type(e).__name__}: {str(e)[:140]}'
        n_ok += status == 'OK'
        print(f'{name:35s} {status}', flush=True)
    print(f'== {n_ok}/{len(names)} OK ==')
    return 0 if n_ok == len(names) else 1


if __name__ == '__main__':
    sys.exit(main())
