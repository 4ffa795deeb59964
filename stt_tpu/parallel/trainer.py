"""Sharded fine-tune train step for Whisper (DP x TP over a device mesh).

The reference framework is inference-only, but its nearest training
analogue — "adapt the model to a domain then serve it" — needs a train
step that composes with the same mesh the server decodes on. This is that
step: teacher-forced cross-entropy on ``decoder_forward``, AdamW from
optax, everything jitted with NamedShardings so XLA GSPMD handles the
data-parallel gradient reduction and tensor-parallel collectives.

Also the target of the driver's ``dryrun_multichip`` check
(``__graft_entry__.py``).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.whisper import WhisperConfig, decoder_forward, encode
from .sharding import (
    DATA_AXIS,
    named_shardings,
    whisper_param_specs,
)


class TrainBatch(NamedTuple):
    """One teacher-forced batch.

    mel: (B, n_mels, T_frames) log-mel features
    tokens: (B, T) int32 decoder inputs (sot prompt + transcript + eot)
    loss_mask: (B, T) float32, 1.0 on positions whose NEXT token is a label
    """

    mel: jnp.ndarray
    tokens: jnp.ndarray
    loss_mask: jnp.ndarray


def loss_fn(
    params: Dict[str, Any],
    batch: TrainBatch,
    config: WhisperConfig,
) -> jnp.ndarray:
    """Masked next-token cross entropy."""
    enc_out = encode(params, batch.mel, config.n_audio_head)
    logits = decoder_forward(params, batch.tokens, enc_out, config.n_text_head)
    # predict position i+1 from position i
    logits = logits[:, :-1, :]
    labels = batch.tokens[:, 1:]
    mask = batch.loss_mask[:, 1:]
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    token_lp = jnp.take_along_axis(logprobs, labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1.0)
    return -(token_lp * mask).sum() / denom


def make_optimizer(
    learning_rate: float = 1e-5, weight_decay: float = 0.01
) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, weight_decay=weight_decay)


class ShardedTrainer:
    """Owns the jitted, mesh-sharded train step."""

    def __init__(
        self,
        config: WhisperConfig,
        mesh: Mesh,
        optimizer: Optional[optax.GradientTransformation] = None,
    ) -> None:
        self.config = config
        self.mesh = mesh
        self.optimizer = optimizer or make_optimizer()
        self._step = None

    def init_state(self, params: Dict[str, Any]) -> Tuple[Dict[str, Any], Any]:
        """Shard params over the mesh and build a matching opt state."""
        param_shardings = named_shardings(
            self.mesh, whisper_param_specs(params)
        )
        params = jax.device_put(params, param_shardings)
        opt_state = jax.jit(
            self.optimizer.init,
            # optimizer state mirrors the param tree; let GSPMD lay it out
            # to match the (already sharded) params it closes over
        )(params)
        self._param_shardings = param_shardings
        return params, opt_state

    def _build_step(self):
        config = self.config
        optimizer = self.optimizer
        batch_sh = NamedSharding(self.mesh, P(DATA_AXIS))
        scalar_sh = NamedSharding(self.mesh, P())

        def step(params, opt_state, batch: TrainBatch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, config)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(
            step,
            in_shardings=(
                self._param_shardings,
                None,  # opt state layout inferred from init
                TrainBatch(batch_sh, batch_sh, batch_sh),
            ),
            out_shardings=(self._param_shardings, None, scalar_sh),
            donate_argnums=(0, 1),
        )

    def train_step(
        self, params, opt_state, batch: TrainBatch
    ) -> Tuple[Dict[str, Any], Any, jnp.ndarray]:
        if self._step is None:
            self._step = self._build_step()
        return self._step(params, opt_state, batch)


__all__ = ["ShardedTrainer", "TrainBatch", "loss_fn", "make_optimizer"]
