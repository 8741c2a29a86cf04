"""On-TPU equivalence spot-check for the M4C decode kernels: greedy
trajectories + scores with the fused kernel-D path vs the XLA incremental
path at reference-ish dims (interpret-mode CPU equivalence lives in
tests/test_fused_m4c_step.py; this checks the Mosaic-compiled kernel on
the real chip, where both paths round matmul operands to bf16).

Usage: python scripts/check_decode_kernel_tpu.py [--bs 16]
       [--arch MMF_IterativeM4C]   # kernel A+E fused path instead
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np


def _run_child(kernel: str, out_path: str, bs: int, arch: str) -> None:
    env = dict(os.environ)
    env["OPENVIVQA_DECODE_KERNEL"] = kernel
    here = os.path.dirname(os.path.abspath(__file__))
    code = (
        "import sys\n"
        f"sys.path.insert(0, {here!r})\n"
        f"sys.path.insert(0, {os.path.dirname(here)!r})\n"
        "import numpy as np, jax\n"
        "from bench_m4c_decode import _config, _batch, _Vocab\n"
        "from openvivqa_tpu.builders import populate, META_ARCHITECTURE\n"
        "populate()\n"
        f"batch = _batch({bs}, 12)\n"
        f"model = META_ARCHITECTURE.get({arch!r})("
        "config=_config(DECODING_MODE='incremental'), vocab=_Vocab(12))\n"
        "v = jax.jit(lambda r, b: model.init({'params': r, 'dropout': r},"
        " b, train=False))(jax.random.PRNGKey(0), batch)\n"
        "out = jax.jit(lambda p, b: model.apply({'params': p}, b,"
        " method='greedy_decode'))(v['params'], batch)\n"
        f"np.savez('{out_path}', prev_inds=np.asarray(out['prev_inds']),"
        " scores=np.asarray(out['scores']))\n"
    )
    subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--arch", default="MMF_M4C")
    args = ap.parse_args()

    _run_child("1", "/tmp/kd_on.npz", args.bs, args.arch)
    _run_child("0", "/tmp/kd_off.npz", args.bs, args.arch)
    on = np.load("/tmp/kd_on.npz")
    off = np.load("/tmp/kd_off.npz")

    tok_agree = (on["prev_inds"] == off["prev_inds"]).mean()
    score_diff = np.abs(on["scores"] - off["scores"]).max()
    print(f"token agreement: {tok_agree:.4f}")
    print(f"max |score diff|: {score_diff:.3e}")
    if tok_agree < 1.0:
        print("WARN: greedy trajectories diverge (near-tie argmax flips)")
    assert score_diff < 5e-2, "kernel-D scores out of family vs XLA path"
    print("OK")


if __name__ == "__main__":
    main()
