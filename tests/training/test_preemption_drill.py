"""Preemption drill on a REAL multi-process cluster: SIGKILL every process
mid-epoch (a real pod preemption — no atexit, no flushing), restart with
``resume=True`` from the last committed Orbax snapshot, and require the
resumed run's tail to be BIT-IDENTICAL to an uninterrupted run.

Also scales the multi-process fit proof to a 4-process / 1-device-per-process
cluster (the most fragmented layout 4 CPU devices allow) with a tail batch
that pads (dataset % global batch != 0), matching the single-process run.

Beyond-reference territory: the reference has no mid-training checkpointing
at all (allrank/utils/command_executor.py just reruns the whole job).
"""

import os
import socket
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

_WORKER = r"""
import os, signal, sys
import numpy as np

proc_id = int(sys.argv[1])
n_procs = int(sys.argv[2])
coord = sys.argv[3]
ck_dir = sys.argv[4]
mode = sys.argv[5]          # "full" | "die" | "resume"
n_queries = int(sys.argv[6])

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
X, y, qid = generate_dummy_data(n_queries, 8, 4, 10, rng)
ds = SlateDataset(X.astype(np.float32), y.astype(np.float32), qid)

mdef = make_model(ModelConfig(
    fc_model=FCConfig(sizes=[12], input_norm=False, activation="ReLU",
                      dropout=0.0),
    transformer=None,
    post_model=PostModelConfig(d_output=1)), n_features=10)

mesh = make_mesh(ParallelConfig(data=-1))
G = 8
local_rows = process_local_rows(G, mesh)
assert len(local_rows) == G // n_procs

params = init_params(jax.random.PRNGKey(0), mdef)
params = jax.device_put(params, param_shardings(params, mesh))
loss_fn, needs_rng = get_loss("listNet")


class PreemptingBatcher:
    '''Delegates to a SlateBatcher; during the die_epoch's (0-based, tracked
    via fit's set_epoch calls) first iteration it yields a couple of batches
    and then SIGKILLs the process — a real mid-epoch preemption with no
    python-level cleanup. Dying in the LAST epoch guarantees earlier async
    Orbax saves have finalized (each save() waits for the previous).'''

    def __init__(self, inner, die_epoch, die_after_batches):
        self._inner = inner
        self._epoch = -1
        self._die_epoch = die_epoch
        self._die_after = die_after_batches

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def set_epoch(self, epoch):
        self._epoch = epoch
        self._inner.set_epoch(epoch)

    def __len__(self):
        return len(self._inner)

    def __iter__(self):
        if self._epoch == self._die_epoch:
            def gen():
                for i, b in enumerate(self._inner):
                    if i == self._die_after:
                        os.kill(os.getpid(), signal.SIGKILL)
                    yield b
            return gen()
        return iter(self._inner)


kw = dict(slate_length=8, batch_size=G, seed=9, local_rows=local_rows)
train_batcher = SlateBatcher(ds, shuffle=True, **kw)
if mode == "die":
    # die mid-epoch-3 (0-based last): epochs 0-1 are finalized commits,
    # epoch 2's async write may or may not have landed
    train_batcher = PreemptingBatcher(train_batcher, die_epoch=3,
                                      die_after_batches=2)

with mesh:
    result = fit(
        epochs=4, params=params, mdef=mdef, loss_fn=loss_fn,
        loss_kwargs={}, needs_rng=needs_rng,
        optimizer=make_optimizer("Adam", {"lr": 1e-2}), scheduler=None,
        train_batcher=train_batcher,
        val_batcher=SlateBatcher(ds, shuffle=False, **kw),
        metrics={"ndcg": [5]}, val_metric="ndcg_5",
        early_stopping_patience=0, gradient_clipping_norm=None,
        output_dir=ck_dir, batch_shardings=batch_shardings(mesh),
        checkpoint_every=1, checkpoint_backend="orbax",
        resume=(mode == "resume"),
    )

checksum = float(sum(float(np.sum(np.asarray(l)))
                     for l in jax.tree.leaves(result["params"])))
print(f"RESULT proc={proc_id} ndcg5={result['val_metrics']['ndcg_5']:.10f} "
      f"checksum={checksum:.10f}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(n_procs, tmp_path, ck_dir, mode, n_queries=40,
         expect_failure=False):
    tmp_path.mkdir(parents=True, exist_ok=True)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(n_procs), coord,
             str(ck_dir), mode, str(n_queries)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=_REPO_ROOT,
        )
        for i in range(n_procs)
    ]
    lines, codes = [], []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        text = out.decode()
        codes.append(p.returncode)
        if not expect_failure:
            assert p.returncode == 0, f"proc {i}/{n_procs} failed:\n{text}"
        lines += [ln for ln in text.splitlines() if ln.startswith("RESULT")]
    return lines, codes


def _payload(line):
    return line.split("ndcg5=")[1]


def test_preemption_kill_and_resume_bit_identical(tmp_path):
    """SIGKILL the whole 2-process cluster mid-epoch-3 (the last); resume
    from the latest finalized Orbax commit (epoch 1 or 2 — whichever the
    async write raced to); the 4-epoch result must be bit-identical to an
    uninterrupted 4-epoch run (params checksum AND metric digits)."""
    full_ck = tmp_path / "full_ck"
    full_lines, _ = _run(2, tmp_path / "full", full_ck, "full")
    assert len(full_lines) == 2

    drill_ck = tmp_path / "drill_ck"
    _, codes = _run(2, tmp_path / "die", drill_ck, "die",
                    expect_failure=True)
    # a real kill: at least the preempted processes die hard (-SIGKILL or a
    # distributed-peer failure), none may "succeed"
    assert all(c != 0 for c in codes), f"kill did not take: {codes}"
    # the last committed snapshot survived the kill
    from allrank_tpu.training.orbax_checkpoint import _finalized_epochs

    committed = _finalized_epochs(str(drill_ck / "partial"))
    # epochs 0 and 1 are guaranteed durable (each save waits for the
    # previous async write); epoch 2's write raced the kill
    assert committed and max(committed) in (1, 2), committed

    resumed_lines, _ = _run(2, tmp_path / "resume", drill_ck, "resume")
    assert len(resumed_lines) == 2
    # both processes agree, and the tail is bit-reproducible
    assert _payload(resumed_lines[0]) == _payload(resumed_lines[1])
    assert _payload(resumed_lines[0]) == _payload(full_lines[0])


def test_four_process_fit_matches_single_process(tmp_path):
    """4 processes x 1 device each (max fragmentation on 4 CPU devices),
    with a padding tail batch (44 queries % G=8 != 0): global results match
    the single-process 4-device run."""
    single, _ = _run(1, tmp_path / "single", tmp_path / "ck1", "full",
                     n_queries=44)
    quad, _ = _run(4, tmp_path / "quad", tmp_path / "ck4", "full",
                   n_queries=44)
    assert len(single) == 1 and len(quad) == 4
    # every cluster process observes identical global results
    assert all(_payload(q) == _payload(quad[0]) for q in quad)

    def parse(line):
        ndcg = float(line.split("ndcg5=")[1].split()[0])
        checksum = float(line.split("checksum=")[1])
        return ndcg, checksum

    (n1, c1), (n4, c4) = parse(single[0]), parse(quad[0])
    # metrics to fp precision; the raw param-sum checksum is a
    # cancellation-prone probe, and a 4-rank all-reduce tree's fp32
    # rounding compounds over 3 Adam epochs more than the 2-rank case —
    # measured ~2e-2 drift on a |sum| of ~1.6
    assert abs(n1 - n4) < 1e-6
    assert abs(c1 - c4) <= 3e-2 * max(1.0, abs(c1))
