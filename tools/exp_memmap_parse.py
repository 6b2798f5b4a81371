"""Memmap-direct first parse under a memory budget smaller than the corpus.

Round-5 capacity proof: the binary cache's FIRST parse fills X straight
into the .npy sidecar via a writable np.memmap (data/dataset.py
``_parse_direct_to_memmap``), so the dense [N, F] matrix never exists as
anonymous host RAM — dirty pages are file-backed and the kernel writes
them back / evicts under pressure. The reference (and our own fallback
path) densifies in RAM unconditionally
(reference: allrank/data/dataset_loading.py:118-133).

Proof protocol (needs writable cgroup v1 memory controller, root):
  1. synthesize a libsvm corpus whose DENSE matrix exceeds the budget;
  2. run the memmap-direct parse in a child process confined to a memory
     cgroup with limit < dense bytes  -> must SUCCEED;
  3. run the in-RAM parse under the same cgroup                -> OOM-kill.

Usage: python tools/exp_memmap_parse.py [--rows 3000000] [--features 136]
           [--limit-mb 768] [--workdir /tmp/memmap_exp]
Prints one JSON line per arm + a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CG_ROOT = "/sys/fs/cgroup/memory"


def make_corpus(path: str, rows: int, features: int, chunk: int = 200_000):
    """Write a dense synthetic libsvm corpus with the native writer."""
    from allrank_tpu.data.native import write_svmlight_native

    rng = np.random.RandomState(0)
    t0 = time.time()
    with open(path, "wb") as out:
        done = 0
        part = path + ".part"
        while done < rows:
            n = min(chunk, rows - done)
            # 2-decimal values keep the text compact (parse speed) while
            # exercising the full fill path; ~30 docs per slate
            x = np.round(rng.rand(n, features) * 9.99, 2).astype(np.float32)
            y = rng.randint(0, 5, size=n).astype(np.float32)
            qid = (np.arange(n, dtype=np.int64) + done) // 30 + 1
            assert write_svmlight_native(x, y, qid, part)
            with open(part, "rb") as f:
                shutil.copyfileobj(f, out, 1 << 24)
            done += n
    os.unlink(part)
    return time.time() - t0


def run_confined(mode: str, corpus: str, limit_mb: int) -> dict:
    """Run one parse arm in a child confined to a fresh memory cgroup."""
    cg = os.path.join(CG_ROOT, f"allrank_memmap_{os.getpid()}_{mode}")
    os.makedirs(cg, exist_ok=True)
    with open(os.path.join(cg, "memory.limit_in_bytes"), "w") as f:
        f.write(str(limit_mb << 20))
    child_code = r"""
import json, resource, sys
sys.path.insert(0, ".")
sys.stdin.readline()  # wait until the parent has confined us
corpus, mode = sys.argv[1], sys.argv[2]
import numpy as np
if mode == "direct":
    from allrank_tpu.data.dataset import parse_svmlight_cached
    x, y, qids = parse_svmlight_cached(corpus)
    ok = isinstance(x, np.memmap) and not x.flags.writeable
    probe = [float(x[0, 0]), float(x[-1, -1]), float(y.sum()), int(qids[-1])]
else:
    from allrank_tpu.data.dataset import parse_svmlight
    x, y, qids = parse_svmlight(corpus)
    ok = True
    probe = [float(x[0, 0]), float(x[-1, -1]), float(y.sum()), int(qids[-1])]
print(json.dumps({"ok": ok, "probe": probe,
                  "peak_rss_mb": resource.getrusage(
                      resource.RUSAGE_SELF).ru_maxrss // 1024}))
"""
    t0 = time.time()
    proc = subprocess.Popen([sys.executable, "-c", child_code, corpus, mode],
                            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)
    try:
        with open(os.path.join(cg, "cgroup.procs"), "w") as f:
            f.write(str(proc.pid))
        proc.stdin.write("go\n")
        proc.stdin.flush()
        out, err = proc.communicate(timeout=1800)
    finally:
        # empty cgroups delete cleanly; a failed rmdir is non-fatal
        try:
            os.rmdir(cg)
        except OSError:
            pass
    wall = time.time() - t0
    res = {"mode": mode, "limit_mb": limit_mb, "wall_s": round(wall, 1),
           "returncode": proc.returncode, "oom_killed": proc.returncode == -9}
    if proc.returncode == 0 and out.strip():
        res.update(json.loads(out.strip().splitlines()[-1]))
    elif err:
        res["stderr_tail"] = err.strip().splitlines()[-1][:200]
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=3_000_000)
    ap.add_argument("--features", type=int, default=136)
    ap.add_argument("--limit-mb", type=int, default=768)
    ap.add_argument("--workdir", default="/tmp/memmap_exp")
    args = ap.parse_args()

    dense_mb = args.rows * args.features * 4 >> 20
    assert dense_mb > args.limit_mb * 1.5, (
        f"dense matrix {dense_mb} MB must clearly exceed the {args.limit_mb} "
        "MB budget for the proof to mean anything")
    if not os.access(CG_ROOT, os.W_OK):
        print(json.dumps({"skipped": "memory cgroup not writable"}))
        return

    os.makedirs(args.workdir, exist_ok=True)
    corpus = os.path.join(args.workdir, "corpus.txt")
    if not os.path.exists(corpus):
        gen_s = make_corpus(corpus, args.rows, args.features)
        print(json.dumps({"corpus": corpus, "gen_s": round(gen_s, 1)}))
    text_mb = os.path.getsize(corpus) >> 20
    print(json.dumps({"rows": args.rows, "features": args.features,
                      "text_mb": text_mb, "dense_x_mb": dense_mb,
                      "limit_mb": args.limit_mb}))

    # fresh cache for the direct arm
    for suffix in (".meta.json", ".X.npy", ".y.npy", ".qids.npy"):
        p = corpus + ".npycache" + suffix
        if os.path.exists(p):
            os.unlink(p)
    direct = run_confined("direct", corpus, args.limit_mb)
    print(json.dumps(direct))
    inram = run_confined("inram", corpus, args.limit_mb)
    print(json.dumps(inram))

    verdict = {
        "memmap_direct_parses_over_budget": bool(direct.get("ok")),
        "inram_parse_oom_under_same_budget":
            bool(inram.get("oom_killed")) or inram.get("returncode") != 0,
    }
    print(json.dumps({"verdict": verdict}))


if __name__ == "__main__":
    main()
