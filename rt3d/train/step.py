"""Sharded train step: dp (batch) x fsdp (parameters) over a Mesh."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rt3d.models.yolo.model import YoloSeg
from rt3d.parallel.mesh import fsdp_param_shardings
from rt3d.train.loss import seg_detection_loss


@struct.dataclass
class TrainState:
    params: dict
    opt_state: tuple
    step: jax.Array


def make_train_step(
    model: YoloSeg,
    optimizer: Optional[optax.GradientTransformation] = None,
    mesh: Optional[Mesh] = None,
):
    """Returns (init_fn(rng) -> TrainState, step_fn(state, batch) -> (state, metrics)).

    With a mesh: params/opt state shard FSDP-style over the 'fsdp' axis and
    the batch shards over 'dp'; XLA inserts the all-gathers/reduce-scatters.
    Without a mesh: single-device jit.
    """
    optimizer = optimizer or optax.adamw(1e-4)

    def init_fn(rng) -> TrainState:
        params = model.init(rng)
        return TrainState(
            params=params, opt_state=optimizer.init(params), step=jnp.int32(0)
        )

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        def loss_fn(p):
            return seg_detection_loss(model, p, batch["images"], batch)

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, opt_state=new_opt, step=state.step + 1
        )
        return new_state, {"loss": loss, **parts}

    if mesh is None:
        return init_fn, jax.jit(step_fn)

    # sharded: params FSDP over 'fsdp', batch over 'dp'
    abs_state = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    param_sh = fsdp_param_shardings(abs_state.params, mesh, "fsdp")
    opt_sh = jax.tree_util.tree_map(
        lambda x: (
            fsdp_param_shardings({"x": x}, mesh, "fsdp")["x"]
            if hasattr(x, "shape")
            else NamedSharding(mesh, P())
        ),
        abs_state.opt_state,
    )
    state_sh = TrainState(
        params=param_sh, opt_state=opt_sh, step=NamedSharding(mesh, P())
    )
    batch_sh = NamedSharding(mesh, P("dp"))

    init_jit = jax.jit(init_fn, out_shardings=state_sh)
    step_jit = jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
    return init_jit, step_jit
