"""Two-process multi-host smoke test (CPU jax.distributed).

The multi-host claims (DataLoader process sharding, gather_eval_dicts)
were previously exercised only via parameter injection; this launches two
REAL processes with jax.distributed.initialize over localhost and checks:
* every host sees process_count()==2;
* DataLoader shards batches round-robin disjointly and together covers
  the dataset;
* gather_eval_dicts merges per-host string dicts onto every host (the
  pickle->uint8-blob allgather path).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")

    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2

    import numpy as np

    from openvivqa_tpu.data.loader import DataLoader
    from openvivqa_tpu.parallel.multihost import gather_eval_dicts
    from openvivqa_tpu.utils.instance import Instance

    class TinyDataset:
        def __len__(self):
            return 12

        def __getitem__(self, idx):
            return Instance(x=np.asarray([idx], np.int32))

    loader = DataLoader(
        TinyDataset(), batch_size=2, shuffle=False, num_workers=1,
        prefetch=1,
    )
    seen = [
        [int(v) for v in batch["x"][:, 0]]
        for batch in loader
    ]

    gts = {f"q{pid}": [f"ground truth {pid}"]}
    gens = {f"q{pid}": [f"càfé generated {pid}"]}  # non-ascii through pickle
    merged_gts, merged_gens = gather_eval_dicts(gts, gens)

    print(
        "RESULT " + json.dumps(
            {
                "pid": pid,
                "batches": seen,
                "gts": merged_gts,
                "gens": merged_gens,
            },
            ensure_ascii=False,
        )
    )
    """
)


def test_two_process_sharding_and_eval_gather(tmp_path):
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        port = sock.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual 8-device mesh inside workers
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=300)
        assert proc.returncode == 0, out
        outputs.append(out)

    results = {}
    for out in outputs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out
        payload = json.loads(lines[-1][len("RESULT "):])
        results[payload["pid"]] = payload

    # disjoint round-robin batch shards covering all 12 samples
    flat0 = [i for batch in results[0]["batches"] for i in batch]
    flat1 = [i for batch in results[1]["batches"] for i in batch]
    assert not (set(flat0) & set(flat1))
    assert sorted(flat0 + flat1) == list(range(12))

    # both hosts hold the fully merged eval dicts
    for pid in (0, 1):
        assert results[pid]["gens"] == {
            "h0_q0": ["càfé generated 0"], "h1_q1": ["càfé generated 1"],
        }
        assert results[pid]["gts"] == {
            "h0_q0": ["ground truth 0"], "h1_q1": ["ground truth 1"],
        }
