"""Run every paper reproducibility config on the WEB30K-shaped surrogate.

MSLR-WEB30K itself is unreachable from this environment (zero egress), so
this runs the *full* paper recipe — normalize_features output → each config
under reproducibility/configs/ — on the surrogate dataset
(tools/make_web30k_surrogate.py) and collects best/final val metrics per
config into a markdown table. Proves every published config trains at
WEB30K scale end-to-end (tower, loss, schedule, bucketed O(L²) eval,
checkpointing) with stable numerics; the NDCG values gate the *recipe*,
not the published numbers (surrogate labels are more learnable).

Usage::

    python tools/run_surrogate_matrix.py --data /tmp/web30k_synth_normalized \
        [--epochs 12] [--configs ndcgloss2pp ordinal ...] [--job-dir /tmp/matrix]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ALL_CONFIGS = [
    "contextaware_web30k/ndcgloss2pp.json",
    "contextaware_web30k/ndcgloss2pp_mlp.json",
    "contextaware_web30k/ordinal.json",
    "contextaware_web30k/ordinal_mlp.json",
    "neuralndcg_web30k/neuralndcg_atmax.json",
    "neuralndcg_web30k/lambdarank_atmax.json",
    "neuralndcg_web30k/approxndcg.json",
]


def patch_config(path: str, data_dir: str, epochs: int) -> dict:
    cfg = json.load(open(path))
    cfg = copy.deepcopy(cfg)
    cfg["data"]["path"] = data_dir
    cfg["data"]["num_workers"] = 3
    cfg["data"]["eval_buckets"] = 6
    # flat features resident in HBM; steps are fed [B, L] gather indices —
    # ~60x epoch time on tunneled chips (see BENCHMARKS.md)
    cfg["data"]["device_cache"] = True
    # parse-once sidecars: config 2..N load the multi-GB splits via mmap
    cfg["data"]["binary_cache"] = True
    cfg["training"]["epochs"] = epochs
    # tunneled-chip economics: amortize per-batch dispatch latency
    # (lax.scan over 8 stacked batches; value-identical, tested by
    # tests/training/test_scan_steps.py) and skip the reference's second
    # full train pass for train metrics — the gate metric is val ndcg
    cfg["training"]["scan_steps"] = 8
    cfg["training"]["metrics_on_train"] = False
    # gates are recorded, not asserted, on the surrogate
    cfg.pop("expected_metrics", None)
    return cfg


def run_one(name: str, cfg: dict, job_dir: str):
    run_id = name.replace("/", "_").replace(".json", "")
    cfg_path = os.path.join(job_dir, f"{run_id}.json")
    os.makedirs(job_dir, exist_ok=True)
    json.dump(cfg, open(cfg_path, "w"), indent=1)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "allrank_tpu.main", "--job-dir", job_dir,
         "--run-id", run_id, "--config-file-name", cfg_path],
        cwd=REPO, capture_output=True, text=True)
    wall = time.time() - t0
    result_path = os.path.join(job_dir, "results", run_id,
                               "experiment_result.json")
    row = {"config": run_id, "wall_s": round(wall, 1),
           "rc": proc.returncode}
    if proc.returncode != 0:
        row["error"] = proc.stderr[-2000:]
        return row
    res = json.load(open(result_path))
    for k in ("val_metrics/ndcg_5", "val_metrics/ndcg_10",
              "best_val_metrics/ndcg_5"):
        if k in res:
            row[k.split("/")[-1] + ("_best" if "best" in k else "_final")] = \
                round(float(res[k]), 4)
    # the fit loop logs best-so-far val metric in experiment_result under
    # num_params etc.; fall back to parsing training.log for the best epoch
    log_path = os.path.join(job_dir, "results", run_id, "training.log")
    best5 = best10 = None
    if os.path.exists(log_path):
        for line in open(log_path):
            if "Val ndcg_5" in line:
                try:
                    v5 = float(line.split("Val ndcg_5")[1].split()[0])
                    v10 = float(line.split("Val ndcg_10")[1].split()[0])
                except (IndexError, ValueError):
                    continue
                if best5 is None or v5 > best5:
                    best5, best10 = v5, v10
    if best5 is not None:
        row["ndcg_5_best"] = round(best5, 4)
        row["ndcg_10_at_best"] = round(best10, 4)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--job-dir", default="/tmp/surrogate_matrix")
    ap.add_argument("--configs", nargs="*", default=None,
                    help="basename filters, e.g. ndcgloss2pp ordinal")
    args = ap.parse_args()

    selected = ALL_CONFIGS
    if args.configs:
        selected = [c for c in ALL_CONFIGS
                    if any(f in c for f in args.configs)]
    rows = []
    for name in selected:
        cfg_path = os.path.join(REPO, "reproducibility", "configs", name)
        cfg = patch_config(cfg_path, args.data, args.epochs)
        print(f"=== {name} (epochs={args.epochs}) ===", flush=True)
        row = run_one(name, cfg, args.job_dir)
        print(json.dumps(row), flush=True)
        rows.append(row)

    out = os.path.join(args.job_dir, "matrix.json")
    json.dump(rows, open(out, "w"), indent=1)
    print("\n| config | best val ndcg_5 | ndcg_10 @ best | wall |")
    print("|---|---|---|---|")
    for r in rows:
        if r["rc"] != 0:
            print(f"| {r['config']} | FAILED | — | {r['wall_s']}s |")
        else:
            print(f"| {r['config']} | {r.get('ndcg_5_best', '?')} "
                  f"| {r.get('ndcg_10_at_best', '?')} | {r['wall_s']}s |")
    print(f"\nwritten: {out}")


if __name__ == "__main__":
    main()
