"""Train state: params + frozen stats + optimizer state as one pytree."""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    frozen: Any          # FrozenBatchNorm statistics etc. ('frozen' collection)
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @property
    def variables(self) -> dict:
        v = {"params": self.params}
        if self.frozen:
            v["frozen"] = self.frozen
        return v

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)


def create_train_state(model, example_args: tuple, tx_factory: Callable,
                       seed: int = 0) -> TrainState:
    """Initialize variables with jitted init and build the optimizer.

    tx_factory(params) -> optax transformation (so freezing masks can see the
    param tree).
    """
    import jax.numpy as jnp

    variables = jax.jit(model.init)(jax.random.key(seed), *example_args)
    params = variables["params"]
    frozen = variables.get("frozen", {})
    tx = tx_factory(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, frozen=frozen,
                      opt_state=tx.init(params), tx=tx)
