"""Train state: params + batch stats + optimizer state in one pytree."""

from typing import Any

import flax
import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState extended with BatchNorm running statistics."""

    batch_stats: Any = None

    def replace_batch_stats(self, batch_stats):
        return self.replace(batch_stats=batch_stats)


def create_train_state(model, sample_args, tx, rng=None, train=True):
    """Initialize model variables (jitted — eager init dispatches thousands of
    tiny ops through the device tunnel) and wrap them in a TrainState."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    # host copies: device-array closure constants would need a D2H at
    # lowering time, which the tunneled runtime sometimes refuses
    sample_args = jax.tree_util.tree_map(
        lambda a: jax.device_get(a) if hasattr(a, "devices") else a,
        tuple(sample_args))

    @jax.jit
    def _init():
        return model.init(rngs, *sample_args, train=train)

    variables = _init()
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
