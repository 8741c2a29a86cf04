"""TRAINING.REMAT: gradients identical with and without rematerialisation."""

import jax
import jax.numpy as jnp
import numpy as np

from openvivqa_tpu.builders import build_task, populate
from openvivqa_tpu.config import ConfigNode

from test_classification_e2e import _saaa_config


def test_remat_gradients_match(synthetic_data, tmp_path):
    populate()
    base = _saaa_config(synthetic_data, tmp_path)
    task = build_task(base)
    batch = task.put_batch(next(iter(task.train_dataloader)))
    rng = jax.random.PRNGKey(0)

    plain_state, plain_loss = jax.jit(task._train_step)(task.state, batch, rng)

    remat_cfg = base.merged(
        {"TRAINING": {"REMAT": True},
         "MODEL": {"NAME": "saaa_remat"}}
    )
    remat_task = build_task(remat_cfg)
    # identical init: reuse the first task's params
    remat_task.state = remat_task.state.replace(params=task_params(task))
    remat_state, remat_loss = jax.jit(remat_task._train_step)(
        remat_task.state, batch, rng
    )
    np.testing.assert_allclose(
        float(plain_loss), float(remat_loss), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(plain_state.params), jax.tree.leaves(remat_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def task_params(task):
    return task.state.params
