"""REAL multi-process training: 2-process jax.distributed cluster runs the
full fit loop (per-process batch assembly -> jitted SPMD train/eval steps
with gradient reduction over the global data axis). Both cluster processes
must observe bit-identical global results (one compiled program), and the
run must match a single-process run over the same 4-device global mesh up
to XLA's cross-process-reduction rounding (the collective's fp summation
tree differs between topologies; the data, updates, and metrics are the
same math).

This is the step the data-pipeline test (tests/data/test_multiprocess_e2e)
stops short of: it proves the gradient/metric reductions themselves are
process-layout-invariant.
"""

import os
import socket
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

_WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
n_procs = int(sys.argv[2])
coord = sys.argv[3]
devices_per_proc = 4 // n_procs

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={devices_per_proc}"
)
import jax
jax.config.update("jax_platforms", "cpu")
if n_procs > 1:
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n_procs, process_id=proc_id)
assert jax.device_count() == 4

from allrank_tpu.config import (FCConfig, ModelConfig, ParallelConfig,
                                PostModelConfig)
from allrank_tpu.data.batching import SlateBatcher
from allrank_tpu.data.dataset import SlateDataset
from allrank_tpu.data.dummy import generate_dummy_data
from allrank_tpu.losses import get_loss
from allrank_tpu.models.factory import init_params, make_model
from allrank_tpu.parallel import (batch_shardings, make_mesh,
                                  param_shardings, process_local_rows)
from allrank_tpu.training import fit, make_optimizer

rng = np.random.RandomState(5)
X, y, qid = generate_dummy_data(40, 8, 4, 10, rng)
ds = SlateDataset(X.astype(np.float32), y.astype(np.float32), qid)

mdef = make_model(ModelConfig(
    fc_model=FCConfig(sizes=[12], input_norm=False, activation="ReLU",
                      dropout=0.0),
    transformer=None,
    post_model=PostModelConfig(d_output=1)), n_features=10)

mesh = make_mesh(ParallelConfig(data=-1))
G = 8  # global batch over the 4-device data axis
local_rows = process_local_rows(G, mesh)
assert len(local_rows) == G // n_procs

params = init_params(jax.random.PRNGKey(0), mdef)
params = jax.device_put(params, param_shardings(params, mesh))
loss_fn, needs_rng = get_loss("listNet")

out_dir = sys.argv[4] if len(sys.argv) > 4 else None
kw = dict(slate_length=8, batch_size=G, seed=9, local_rows=local_rows)
with mesh:
    result = fit(
        epochs=3, params=params, mdef=mdef, loss_fn=loss_fn,
        loss_kwargs={}, needs_rng=needs_rng,
        optimizer=make_optimizer("Adam", {"lr": 1e-2}), scheduler=None,
        train_batcher=SlateBatcher(ds, shuffle=True, **kw),
        val_batcher=SlateBatcher(ds, shuffle=False, **kw),
        metrics={"ndcg": [5]}, val_metric="ndcg_5",
        early_stopping_patience=0, gradient_clipping_norm=None,
        output_dir=out_dir, batch_shardings=batch_shardings(mesh),
        # orbax saves are cross-process collectives: this exercises the
        # pod checkpoint path (every process writes its own shards)
        checkpoint_every=2 if out_dir else None,
        checkpoint_backend="orbax" if out_dir else "npz",
    )
if out_dir:
    from allrank_tpu.training.orbax_checkpoint import OrbaxTrainCheckpointer
    import os as _os
    assert OrbaxTrainCheckpointer.exists(_os.path.join(out_dir, "partial")), \
        "no finalized orbax snapshot after multi-process training"


checksum = float(sum(float(np.sum(np.asarray(l)))
                     for l in jax.tree.leaves(result["params"])))
print(f"RESULT proc={proc_id} ndcg5={result['val_metrics']['ndcg_5']:.10f} "
      f"loss-free-checksum={checksum:.10f}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(n_procs, tmp_path, checkpoint_dir=None):
    tmp_path.mkdir(exist_ok=True)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    extra = [checkpoint_dir] if checkpoint_dir else []
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(n_procs), coord] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=_REPO_ROOT,
        )
        for i in range(n_procs)
    ]
    lines = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        text = out.decode()
        assert p.returncode == 0, f"proc {i}/{n_procs} failed:\n{text}"
        lines += [ln for ln in text.splitlines() if ln.startswith("RESULT")]
    return lines


def test_two_process_fit_matches_single_process(tmp_path):
    single = _run(1, tmp_path / "single")
    double = _run(2, tmp_path / "double")
    assert len(single) == 1 and len(double) == 2

    def parse(line):
        ndcg = float(line.split("ndcg5=")[1].split()[0])
        checksum = float(line.split("checksum=")[1])
        return ndcg, checksum

    # both cluster processes observe identical global results (one program)
    assert line_payload(double[0]) == line_payload(double[1])
    # ...and the cluster matches the single-process 4-device run: metrics to
    # fp precision, the 3-epoch Adam-updated param checksum to the rounding
    # drift of a different collective reduction tree
    (n1, c1), (n2, c2) = parse(single[0]), parse(double[0])
    assert abs(n1 - n2) < 1e-6
    assert abs(c1 - c2) <= 5e-3 * max(1.0, abs(c1))


def line_payload(line):
    return line.split("ndcg5=")[1]


def test_two_process_orbax_checkpointing_commits(tmp_path):
    """The orbax save is a cross-process collective: both processes call it,
    training does not deadlock, and a finalized snapshot lands on disk."""
    ck_dir = tmp_path / "ckpt"
    ck_dir.mkdir()
    lines = _run(2, tmp_path / "cluster", checkpoint_dir=str(ck_dir))
    assert len(lines) == 2
    from allrank_tpu.training.orbax_checkpoint import _finalized_epochs

    assert _finalized_epochs(str(ck_dir / "partial")) != []
