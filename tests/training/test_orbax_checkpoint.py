"""Orbax backend: sharded save/restore preserves values AND layouts."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from allrank_tpu.config import ParallelConfig
from allrank_tpu.parallel.mesh import make_mesh
from allrank_tpu.training.orbax_checkpoint import OrbaxTrainCheckpointer


def test_sharded_roundtrip_restores_values_and_shardings(tmp_path):
    mesh = make_mesh(ParallelConfig(data=4, model=2))
    params = {
        "w": jax.device_put(
            jnp.arange(64.0).reshape(8, 8),
            NamedSharding(mesh, P(None, "model")),
        ),
        "b": jax.device_put(jnp.ones(8), NamedSharding(mesh, P())),
    }
    opt_state = {
        "mu": jax.device_put(
            jnp.full((8, 8), 0.5), NamedSharding(mesh, P(None, "model"))
        ),
        "count": jnp.asarray(3),
        "fn": lambda x: x,  # non-array leaf: kept from the template
    }

    ck = OrbaxTrainCheckpointer()
    ck.save(str(tmp_path), params, opt_state)
    ck.wait_until_finished()
    assert OrbaxTrainCheckpointer.exists(str(tmp_path))

    # fresh (zeroed) templates with the same shardings
    t_params = jax.tree.map(
        lambda x: jax.device_put(jnp.zeros_like(x), x.sharding), params
    )
    t_opt = {"mu": jax.device_put(jnp.zeros_like(opt_state["mu"]),
                                  opt_state["mu"].sharding),
             "count": jnp.asarray(0), "fn": opt_state["fn"]}
    r_params, r_opt = ck.restore(str(tmp_path), t_params, t_opt)

    np.testing.assert_array_equal(np.asarray(r_params["w"]),
                                  np.arange(64.0).reshape(8, 8))
    np.testing.assert_array_equal(np.asarray(r_opt["mu"]), 0.5)
    assert int(r_opt["count"]) == 3
    assert r_opt["fn"] is opt_state["fn"]
    # layouts come back from the live template, not a host gather
    assert r_params["w"].sharding == params["w"].sharding
    assert r_opt["mu"].sharding.spec == P(None, "model")

    # overwrite with new values (the save_partial cadence)
    ck.save(str(tmp_path), jax.tree.map(lambda x: x + 1.0, params), opt_state)
    ck.wait_until_finished()
    r2, _ = ck.restore(str(tmp_path), t_params, t_opt)
    np.testing.assert_array_equal(
        np.asarray(r2["b"]), np.full(8, 2.0))
