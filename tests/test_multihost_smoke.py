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


_TRAIN_WORKER = textwrap.dedent(
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
    assert jax.process_count() == 2 and len(jax.devices()) == 2

    import jax.numpy as jnp
    import numpy as np
    import flax.linen as nn

    from openvivqa_tpu.parallel import mesh as pmesh

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Dense(32)(x))
            return nn.Dense(8)(x)

    model = Tiny()
    rng = np.random.default_rng(0)  # same seed on both hosts
    x = rng.normal(size=(8, 16)).astype(np.float32)
    y = rng.normal(size=(8, 8)).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    def loss_fn(p, bx, by):
        return jnp.mean((model.apply(p, bx) - by) ** 2)

    def step(p, bx, by):
        loss, grads = jax.value_and_grad(loss_fn)(p, bx, by)
        return jax.tree.map(lambda w, g: w - 0.1 * g, p, grads), loss

    # single-device reference on the LOCAL device over the full batch
    ref_params, ref_loss = jax.jit(step)(params, jnp.asarray(x), jnp.asarray(y))
    ref_leaves = [np.asarray(l) for l in jax.tree.leaves(ref_params)]

    mode = sys.argv[3] if len(sys.argv) > 3 else "dp"
    if mode == "dp":
        # 2-device global data mesh (one device per process), params
        # replicated, batch sharded -> GSPMD psum over processes
        mesh = pmesh.get_mesh()
        d_params = jax.tree.map(
            lambda l: jax.device_put(l, pmesh.replicate_spec(mesh)), params
        )
        batch = pmesh.shard_batch({"x": x, "y": y}, mesh)
        out_spec = pmesh.replicate_spec(mesh)
    else:
        # (data=1, model=2) mesh: column-parallel kernels split across the
        # two PROCESSES, batch replicated -> cross-process TP collectives
        from jax.sharding import NamedSharding
        mesh = pmesh.get_mesh_2d(model_parallel=2)
        d_params = jax.tree.map(
            lambda l: jax.device_put(
                l, NamedSharding(mesh, pmesh.param_partition_spec(l, mesh))
            ),
            params,
        )
        assert any(  # the test is vacuous unless something actually shards
            pmesh.param_partition_spec(l, mesh) != jax.sharding.PartitionSpec()
            for l in jax.tree.leaves(params)
        )
        batch = pmesh.shard_batch({"x": x, "y": y}, mesh)  # data axis is 1
        out_spec = pmesh.replicate_spec(mesh)
    dist_step = jax.jit(step, out_shardings=(out_spec, out_spec))
    d_updated, d_loss = dist_step(d_params, batch["x"], batch["y"])
    d_leaves = [
        np.asarray(l.addressable_data(0)) for l in jax.tree.leaves(d_updated)
    ]
    d_loss = float(np.asarray(d_loss.addressable_data(0)))

    max_err = max(
        float(np.max(np.abs(a - b))) for a, b in zip(ref_leaves, d_leaves)
    )
    checksum = float(sum(float(np.sum(l)) for l in d_leaves))
    print(
        "RESULT " + json.dumps(
            {
                "pid": pid,
                "loss_ref": float(ref_loss),
                "loss_dist": d_loss,
                "max_param_err": max_err,
                "checksum": checksum,
            }
        )
    )
    """
)


def _run_two_process(tmp_path, script, *extra_args):
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        port = sock.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    worker = tmp_path / "worker.py"
    worker.write_text(script)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual 8-device mesh inside workers
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid), *extra_args],
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
    return results


def test_two_process_dp_train_step_matches_single_process(tmp_path):
    """Each host holds half the global batch; the GSPMD-psum'd update
    (params replicated, batch sharded via parallel/mesh.py) must equal a
    single-device full-batch step on both hosts."""
    results = _run_two_process(tmp_path, _TRAIN_WORKER, "dp")
    for pid in (0, 1):
        r = results[pid]
        # mean-of-8 vs psum-of-two-mean-of-4: f32 reduction-order noise only
        assert abs(r["loss_ref"] - r["loss_dist"]) < 1e-6, r
        assert r["max_param_err"] < 1e-6, r
    # both hosts hold the identical replicated updated params
    assert results[0]["checksum"] == results[1]["checksum"]


def test_two_process_tp_train_step_matches_single_process(tmp_path):
    """Column-parallel kernels split ACROSS the two processes
    ((data=1, model=2) mesh): the jitted step's cross-process TP
    collectives must reproduce the single-device full-batch update."""
    results = _run_two_process(tmp_path, _TRAIN_WORKER, "tp")
    for pid in (0, 1):
        r = results[pid]
        assert abs(r["loss_ref"] - r["loss_dist"]) < 1e-6, r
        assert r["max_param_err"] < 1e-6, r
    assert results[0]["checksum"] == results[1]["checksum"]


def test_two_process_sharding_and_eval_gather(tmp_path):
    results = _run_two_process(tmp_path, _WORKER)

    # disjoint round-robin batch shards covering all 12 samples
    flat0 = [i for batch in results[0]["batches"] for i in batch]
    flat1 = [i for batch in results[1]["batches"] for i in batch]
    assert not (set(flat0) & set(flat1))
    assert sorted(flat0 + flat1) == list(range(12))

    # both hosts hold the fully merged eval dicts under RAW keys (callers
    # key by global sample id — BaseTask.eval_key — so wrapped duplicate
    # batches merge instead of double-counting; a host prefix would
    # defeat that)
    for pid in (0, 1):
        assert results[pid]["gens"] == {
            "q0": ["càfé generated 0"], "q1": ["càfé generated 1"],
        }
        assert results[pid]["gts"] == {
            "q0": ["ground truth 0"], "q1": ["ground truth 1"],
        }
