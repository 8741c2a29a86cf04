"""Position-wise feed-forward with post-LN residual
(parity: /root/reference/models/modules/positionwise_feed_forward.py:5-28;
GELU is the exact erf form, matching torch's nn.GELU default).

Submodules carry their historical auto-names (Dense_0/Dense_1/LayerNorm_0)
so the param tree is unchanged; setup-style definition lets the decode path
read the weights directly for the fused FFN step kernel
(ops/decode_step.fused_ffn_step — Dense -> GELU -> Dense -> residual LN in
one op on the op-latency-bound decode loop)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

_xavier = nn.initializers.xavier_uniform()


class PositionWiseFeedForward(nn.Module):
    config: Any

    def setup(self):
        c = self.config
        self.fc1 = nn.Dense(c.D_FF, kernel_init=_xavier, name="Dense_0")
        self.fc2 = nn.Dense(c.D_MODEL, kernel_init=_xavier, name="Dense_1")
        self.layer_norm = nn.LayerNorm(name="LayerNorm_0")
        self.dropout = nn.Dropout(rate=c.DROPOUT)

    def fused_weights(self) -> dict:
        """Param values for the decode megakernels."""
        params_of = lambda m: m.variables["params"]  # noqa: E731
        ln = params_of(self.layer_norm)
        return {
            "w1": params_of(self.fc1)["kernel"],
            "b1": params_of(self.fc1)["bias"],
            "w2": params_of(self.fc2)["kernel"],
            "b2": params_of(self.fc2)["bias"],
            "ln_scale": ln["scale"],
            "ln_bias": ln["bias"],
        }

    def __call__(
        self, inputs: jnp.ndarray, train: bool = False, decode: bool = False
    ) -> jnp.ndarray:
        if decode and not train and inputs.ndim == 3 and inputs.shape[1] == 1:
            from ...ops.decode_step import (
                decode_kernel_mode,
                decode_kernel_parts,
                ffn_step_viable,
            )

            mode = decode_kernel_mode()
            if mode != "off" and "ffn" in decode_kernel_parts() and ffn_step_viable(
                inputs.shape[0], inputs.shape[2], self.config.D_FF
            ):
                from ...ops.decode_step import fused_ffn_step

                w = self.fused_weights()  # one source for param plumbing
                y = fused_ffn_step(
                    inputs[:, 0, :],
                    w["w1"], w["b1"], w["w2"], w["b2"],
                    w["ln_scale"], w["ln_bias"],
                    interpret=mode == "interpret",
                )
                return y[:, None, :]
        hidden = self.fc1(inputs)
        hidden = jax.nn.gelu(hidden, approximate=False)
        hidden = self.dropout(hidden, deterministic=not train)
        out = self.fc2(hidden)
        out = self.dropout(out, deterministic=not train)
        return self.layer_norm(inputs + out)
