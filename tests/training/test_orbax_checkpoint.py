"""Orbax backend: sharded save/restore preserves values AND layouts, and the
epoch-dir snapshot scheme keeps a committed snapshot at all times."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from allrank_tpu.config import ParallelConfig
from allrank_tpu.parallel.mesh import make_mesh
from allrank_tpu.training.orbax_checkpoint import (
    STATE_PREFIX,
    OrbaxTrainCheckpointer,
)


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
    ck.save(str(tmp_path), params, opt_state, epoch=1,
            loop_state={"epoch": 1, "tag": "first"})
    ck.wait_until_finished()
    assert OrbaxTrainCheckpointer.exists(str(tmp_path))

    # fresh (zeroed) templates with the same shardings
    t_params = jax.tree.map(
        lambda x: jax.device_put(jnp.zeros_like(x), x.sharding), params
    )
    t_opt = {"mu": jax.device_put(jnp.zeros_like(opt_state["mu"]),
                                  opt_state["mu"].sharding),
             "count": jnp.asarray(0), "fn": opt_state["fn"]}
    r_params, r_opt, epoch, loop_state = ck.restore_latest(
        str(tmp_path), t_params, t_opt)

    assert epoch == 1 and loop_state["tag"] == "first"
    np.testing.assert_array_equal(np.asarray(r_params["w"]),
                                  np.arange(64.0).reshape(8, 8))
    np.testing.assert_array_equal(np.asarray(r_opt["mu"]), 0.5)
    assert int(r_opt["count"]) == 3
    assert r_opt["fn"] is opt_state["fn"]
    # layouts come back from the live template, not a host gather
    assert r_params["w"].sharding == params["w"].sharding
    assert r_opt["mu"].sharding.spec == P(None, "model")


def test_snapshot_rotation_keeps_a_committed_snapshot(tmp_path):
    ck = OrbaxTrainCheckpointer()
    params = {"w": jnp.ones(4)}
    opt = {"count": jnp.asarray(0)}

    ck.save(str(tmp_path), params, opt, epoch=1, loop_state={"epoch": 1})
    ck.wait_until_finished()
    ck.save(str(tmp_path), {"w": jnp.full(4, 2.0)}, opt, epoch=3,
            loop_state={"epoch": 3})
    ck.wait_until_finished()

    # newest finalized snapshot wins; epoch-1 is pruned at the NEXT save
    # (it must survive until epoch-3 has committed)
    _, _, epoch, ls = ck.restore_latest(str(tmp_path), params, opt)
    assert epoch == 3 and ls["epoch"] == 3

    ck.save(str(tmp_path), {"w": jnp.full(4, 3.0)}, opt, epoch=5,
            loop_state={"epoch": 5})
    ck.wait_until_finished()
    dirs = [d for d in os.listdir(tmp_path) if d.startswith(STATE_PREFIX)]
    assert f"{STATE_PREFIX}1" not in dirs  # pruned after 3 committed
    r, _, epoch, _ = ck.restore_latest(str(tmp_path), params, opt)
    assert epoch == 5 and float(np.asarray(r["w"])[0]) == 3.0


def test_unfinalized_snapshot_is_ignored_and_cleaned(tmp_path):
    """A crash mid-write leaves an unfinalized dir: resume must use the
    previous committed snapshot, and the next save clears the debris."""
    ck = OrbaxTrainCheckpointer()
    params = {"w": jnp.ones(4)}
    opt = {"count": jnp.asarray(0)}
    ck.save(str(tmp_path), params, opt, epoch=2, loop_state={"epoch": 2})
    ck.wait_until_finished()

    # crash debris as orbax leaves it: the commit IS the atomic rename from
    # the tmp name, so an interrupted write leaves a tmp-suffixed dir
    debris = os.path.join(str(tmp_path),
                          f"{STATE_PREFIX}4.orbax-checkpoint-tmp-12345")
    os.makedirs(os.path.join(debris, "d"))
    with open(os.path.join(str(tmp_path), "loop_state_e4.json"), "w") as f:
        f.write('{"epoch": 4}')

    out = ck.restore_latest(str(tmp_path), params, opt)
    assert out is not None and out[2] == 2  # epoch-4 debris ignored

    ck.save(str(tmp_path), params, opt, epoch=6, loop_state={"epoch": 6})
    ck.wait_until_finished()
    assert not os.path.isdir(debris)  # cleaned by the pre-save prune
    assert ck.restore_latest(str(tmp_path), params, opt)[2] == 6
