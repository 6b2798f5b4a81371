"""Reference-checkpoint interop: torch ``model.pkl`` state_dict -> our npz.

The reference persists trained models as a pickled ``state_dict``
(reference: allrank/training/train_utils.py:139) and reloads them for
rank-and-click (reference: allrank/models/model_utils.py:56-60). This module
lets a reference user bring an already-trained model to this framework
without retraining: it maps every reference parameter tensor onto this
framework's params pytree (transposing ``nn.Linear`` weights, fusing the
three separate Q/K/V projections into the fused QKV matrix, and renaming the
custom-LayerNorm ``a_2``/``b_2`` pairs) and writes a standard ``model.npz``
that ``rank_and_click``, ``evaluate``, and ``serving`` load as-is.

The reverse direction (``params_to_torch_state_dict`` / ``--direction
export``) emits a reference-layout state_dict from a params tree, so a model
trained here drops back into a torch serving stack.

CLI:
    python -m allrank_tpu.interop \
        --config-file-name config.json --n-features 136 \
        --input-model-path model.pkl --output-model-path model.npz \
        [--direction import|export]

The mapping (reference state_dict key -> params tree path):

    input_layer.input_norm.{weight,bias}        -> fc.input_norm.{scale,bias}
    input_layer.layers.{i}.{weight,bias}        -> fc.layers[i].{w^T,b}
    encoder.layers.{i}.self_attn.linears.{0,1,2}-> transformer.layers[i].qkv
                                                   (w = [Wq^T | Wk^T | Wv^T])
    encoder.layers.{i}.self_attn.linears.3      -> transformer.layers[i].out
    encoder.layers.{i}.feed_forward.w_{1,2}     -> transformer.layers[i].ff{1,2}
    encoder.layers.{i}.sublayer.{0,1}.norm      -> transformer.layers[i].ln{1,2}
    encoder.norm.{a_2,b_2}                      -> transformer.final_ln
    encoder.position.pe[.weight]                -> transformer.pe.table
    output_layer.w_1.{weight,bias}              -> output.{w^T,b}

A ``module.``-prefixed state_dict (saved through the reference's
CustomDataParallel wrapper, reference: allrank/models/model_utils.py:13-27)
is handled transparently.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Mapping

import numpy as np


def _to_numpy(t: Any) -> np.ndarray:
    """torch.Tensor | ndarray | array-like -> float32/orig-dtype ndarray."""
    if hasattr(t, "detach"):  # torch tensor, without importing torch here
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _strip_module_prefix(state: Mapping[str, Any]) -> Dict[str, Any]:
    if state and all(k.startswith("module.") for k in state):
        return {k[len("module."):]: v for k, v in state.items()}
    return dict(state)


def _take(state: Dict[str, Any], key: str) -> np.ndarray:
    if key not in state:
        raise KeyError(
            f"reference checkpoint is missing '{key}' — wrong config for "
            f"this checkpoint? (have e.g. {sorted(state)[:6]}...)"
        )
    return _to_numpy(state.pop(key))


def _linear(state: Dict[str, Any], prefix: str, d_in: int, d_out: int) -> dict:
    """nn.Linear(d_in, d_out) -> our dense {w: [d_in, d_out], b: [d_out]}."""
    w = _take(state, f"{prefix}.weight")
    b = _take(state, f"{prefix}.bias")
    if w.shape != (d_out, d_in):
        raise ValueError(
            f"'{prefix}.weight' has shape {w.shape}, expected {(d_out, d_in)}"
        )
    return {"w": np.ascontiguousarray(w.T), "b": b}


def _std_norm(state: Dict[str, Any], prefix: str, dim: int) -> dict:
    """Reference custom LayerNorm (a_2/b_2) -> our {scale, bias}."""
    a = _take(state, f"{prefix}.a_2")
    b = _take(state, f"{prefix}.b_2")
    if a.shape != (dim,):
        raise ValueError(f"'{prefix}.a_2' has shape {a.shape}, expected {(dim,)}")
    return {"scale": a, "bias": b}


def torch_state_dict_to_params(state_dict: Mapping[str, Any], mdef) -> dict:
    """Convert a reference LTRModel state_dict into this framework's params
    pytree for the model described by ``mdef`` (from ``make_model``).

    Raises with a precise message on any missing/extra/mis-shaped tensor, so
    a config/checkpoint mismatch fails loudly rather than scoring garbage.
    """
    state = _strip_module_prefix(dict(state_dict))
    params: dict = {}

    if mdef.fc:
        dims = (mdef.fc.n_features,) + tuple(mdef.fc.sizes)
        fc: dict = {
            "layers": [
                _linear(state, f"input_layer.layers.{i}", dims[i], dims[i + 1])
                for i in range(len(mdef.fc.sizes))
            ]
        }
        if mdef.fc.input_norm:
            # torch nn.LayerNorm: weight -> scale, bias -> bias
            fc["input_norm"] = {
                "scale": _take(state, "input_layer.input_norm.weight"),
                "bias": _take(state, "input_layer.input_norm.bias"),
            }
        params["fc"] = fc

    if mdef.transformer:
        tdef = mdef.transformer
        d = tdef.d_model
        layers = []
        for i in range(tdef.N):
            at = f"encoder.layers.{i}.self_attn.linears"
            q = _linear(state, f"{at}.0", d, d)
            k = _linear(state, f"{at}.1", d, d)
            v = _linear(state, f"{at}.2", d, d)
            layers.append({
                "qkv": {
                    "w": np.concatenate([q["w"], k["w"], v["w"]], axis=1),
                    "b": np.concatenate([q["b"], k["b"], v["b"]]),
                },
                "out": _linear(state, f"{at}.3", d, d),
                "ff1": _linear(
                    state, f"encoder.layers.{i}.feed_forward.w_1", d, tdef.d_ff
                ),
                "ff2": _linear(
                    state, f"encoder.layers.{i}.feed_forward.w_2", tdef.d_ff, d
                ),
                "ln1": _std_norm(state, f"encoder.layers.{i}.sublayer.0.norm", d),
                "ln2": _std_norm(state, f"encoder.layers.{i}.sublayer.1.norm", d),
            })
        tr: dict = {
            "layers": layers,
            "final_ln": _std_norm(state, "encoder.norm", d),
        }
        pe_rows = tdef.max_indices + 1
        if tdef.positional_encoding == "learned":
            table = _take(state, "encoder.position.pe.weight")
            if table.shape != (pe_rows, d):
                raise ValueError(
                    f"learned positional table has shape {table.shape}, "
                    f"expected {(pe_rows, d)} (max_indices={tdef.max_indices})"
                )
            tr["pe"] = {"table": table}
        elif tdef.positional_encoding == "fixed":
            # the sin/cos table is a buffer in the reference state_dict;
            # carry it over verbatim so scores match bit-for-bit
            table = _take(state, "encoder.position.pe")
            if table.shape != (pe_rows, d):
                raise ValueError(
                    f"fixed positional table has shape {table.shape}, "
                    f"expected {(pe_rows, d)} (max_indices={tdef.max_indices})"
                )
            tr["pe"] = {"table": table}
        params["transformer"] = tr

    params["output"] = _linear(
        state, "output_layer.w_1", mdef.output.d_model, mdef.output.d_output
    )

    if state:
        raise ValueError(
            f"reference checkpoint has {len(state)} unmapped tensor(s): "
            f"{sorted(state)} — config does not describe this checkpoint"
        )
    return params


def params_to_torch_state_dict(params: Mapping[str, Any], mdef) -> Dict[str, np.ndarray]:
    """Inverse of ``torch_state_dict_to_params``: export this framework's
    params pytree as a reference-layout state_dict (numpy values), so a model
    trained (or fine-tuned) here drops back into a torch serving stack that
    expects the reference's LTRModel naming."""
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix: str, dense: Mapping[str, Any]) -> None:
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(dense["w"]).T)
        sd[f"{prefix}.bias"] = np.asarray(dense["b"])

    def put_std_norm(prefix: str, ln: Mapping[str, Any]) -> None:
        sd[f"{prefix}.a_2"] = np.asarray(ln["scale"])
        sd[f"{prefix}.b_2"] = np.asarray(ln["bias"])

    if mdef.fc:
        fc = params["fc"]
        if mdef.fc.input_norm:
            sd["input_layer.input_norm.weight"] = np.asarray(fc["input_norm"]["scale"])
            sd["input_layer.input_norm.bias"] = np.asarray(fc["input_norm"]["bias"])
        for i, layer in enumerate(fc["layers"]):
            put_linear(f"input_layer.layers.{i}", layer)

    if mdef.transformer:
        tdef = mdef.transformer
        d = tdef.d_model
        tr = params["transformer"]
        for i, lp in enumerate(tr["layers"]):
            at = f"encoder.layers.{i}.self_attn.linears"
            qkv_w = np.asarray(lp["qkv"]["w"])  # [d, 3d]
            qkv_b = np.asarray(lp["qkv"]["b"])
            for j in range(3):
                sd[f"{at}.{j}.weight"] = np.ascontiguousarray(
                    qkv_w[:, j * d:(j + 1) * d].T
                )
                sd[f"{at}.{j}.bias"] = qkv_b[j * d:(j + 1) * d]
            put_linear(f"{at}.3", lp["out"])
            put_linear(f"encoder.layers.{i}.feed_forward.w_1", lp["ff1"])
            put_linear(f"encoder.layers.{i}.feed_forward.w_2", lp["ff2"])
            put_std_norm(f"encoder.layers.{i}.sublayer.0.norm", lp["ln1"])
            put_std_norm(f"encoder.layers.{i}.sublayer.1.norm", lp["ln2"])
        put_std_norm("encoder.norm", tr["final_ln"])
        if tdef.positional_encoding == "learned":
            sd["encoder.position.pe.weight"] = np.asarray(tr["pe"]["table"])
        elif tdef.positional_encoding == "fixed":
            sd["encoder.position.pe"] = np.asarray(tr["pe"]["table"])

    put_linear("output_layer.w_1", params["output"])
    return sd


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a reference ``model.pkl`` (a pickled torch state_dict).

    Uses ``weights_only=True`` (tensor-only unpickling, no arbitrary code
    execution) where the installed torch supports it.
    """
    import torch

    try:
        state = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # torch < 1.13 has no weights_only
        import logging

        logging.getLogger("allrank_tpu").warning(
            "installed torch lacks weights_only: falling back to full "
            "unpickling of %s — only load checkpoints you trust", path,
        )
        state = torch.load(path, map_location="cpu")
    return {k: _to_numpy(v) for k, v in state.items()}


def parse_args():
    p = argparse.ArgumentParser(
        description="Convert checkpoints between the reference (allRank "
        "torch model.pkl) and this framework (model.npz)"
    )
    p.add_argument("--config-file-name", required=True,
                   help="the config the checkpoint was trained with")
    p.add_argument("--input-model-path", required=True,
                   help="model.pkl (import) or model.npz (export)")
    p.add_argument("--output-model-path", required=True,
                   help="model.npz (import) or model.pkl (export)")
    p.add_argument("--n-features", required=True, type=int,
                   help="feature dimensionality of the training data")
    p.add_argument("--direction", choices=("import", "export"),
                   default="import",
                   help="'import': reference pkl -> npz (default); "
                   "'export': npz -> reference-layout pkl")
    return p.parse_args()


def run() -> None:
    import jax

    from allrank_tpu.config import Config
    from allrank_tpu.models.factory import init_params, make_model, num_params
    from allrank_tpu.training.checkpoint import load_params, save_params
    from allrank_tpu.utils.ltr_logging import get_logger

    args = parse_args()
    config = Config.from_json(args.config_file_name)
    mdef = make_model(config.model, n_features=args.n_features)
    if args.direction == "import":
        state = load_torch_state_dict(args.input_model_path)
        params = torch_state_dict_to_params(state, mdef)
        save_params(params, args.output_model_path)
        get_logger().info(
            "imported %d reference tensors -> %s (%d parameters)",
            len(state), args.output_model_path, num_params(params),
        )
    else:
        import torch

        template = init_params(jax.random.PRNGKey(0), mdef)
        params = load_params(template, args.input_model_path)
        sd = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in params_to_torch_state_dict(params, mdef).items()
        }
        torch.save(sd, args.output_model_path)
        get_logger().info(
            "exported %d parameters -> %s (%d reference tensors)",
            num_params(params), args.output_model_path, len(sd),
        )


if __name__ == "__main__":
    run()
