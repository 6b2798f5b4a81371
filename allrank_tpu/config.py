"""Typed experiment configuration parsed from JSON.

Keeps the exact JSON schema of the reference framework so its experiment
configs carry over unchanged (reference: allrank/config.py:8-119 and
allrank/config_template.json). Uses stdlib dataclasses instead of attrs.

TPU-specific additions (all optional, default to single-chip behavior):
  * ``data.shuffle_seed`` — host-side RNG seed for slate sampling/shuffles.
  * ``training.compute_dtype`` — "float32" (default) or "bfloat16" tower math.
  * ``parallel`` — mesh axis sizes for data/model parallel execution.
"""

from __future__ import annotations

import json
from collections import defaultdict
from dataclasses import dataclass, field, asdict
from typing import Any, Dict, List, Optional


class MetricConfigError(Exception):
    pass


@dataclass
class PositionalEncodingConfig:
    strategy: str
    max_indices: int


@dataclass
class TransformerConfig:
    N: int
    d_ff: int
    h: int
    positional_encoding: Optional[PositionalEncodingConfig]
    dropout: float


@dataclass
class FCConfig:
    sizes: List[int]
    input_norm: bool
    activation: Optional[str]
    dropout: Optional[float]


@dataclass
class PostModelConfig:
    d_output: int
    output_activation: Optional[str] = None


@dataclass
class ModelConfig:
    fc_model: Optional[FCConfig]
    transformer: Optional[TransformerConfig]
    post_model: PostModelConfig


@dataclass
class DataConfig:
    path: str
    num_workers: int
    batch_size: int
    slate_length: int
    validation_ds_role: str
    shuffle_seed: int = 42
    eval_buckets: int = 0  # >0: group validation slates into that many
    # length buckets (one compiled eval shape per bucket) instead of padding
    # every slate to the split's longest — metric-invariant, but the O(L^2)+
    # eval-loss terms run near each slate's true length
    binary_cache: bool = False  # parse each split once, then load .npy
    # sidecars with X memory-mapped: ~0 re-load time on multi-GB files and
    # no second dense host-RAM copy (the OS pages features on demand);
    # invalidates automatically when the source .txt changes
    device_cache: bool = False  # keep the flat feature matrices in HBM and
    # feed steps [B, L] int32 gather indices instead of [B, L, F] rows —
    # eliminates the per-step host->device feature stream (the training
    # bottleneck on slow interconnects); slate-fixing randomness unchanged
    device_cache_dtype: str = "auto"  # store dtype for the HBM feature
    # table: "auto" follows training.compute_dtype (bf16 table for bf16
    # runs — bit-identical downstream, half the upload and resident HBM);
    # or explicit "float32"/"bfloat16"
    device_cache_sharding: str = "replicated"  # "replicated": full table on
    # every device (local gather, right when it fits per-chip HBM);
    # "sharded": row-shard the table over the mesh's data axis — per-chip
    # footprint / data_size, the step gather becomes all-gather(indices) +
    # psum_scatter(rows) over ICI; bit-identical results either way


@dataclass
class TrainingConfig:
    epochs: int
    gradient_clipping_norm: Optional[float]
    early_stopping_patience: int = 0
    compute_dtype: str = "float32"
    checkpoint_every: Optional[int] = None  # mid-training checkpoint cadence
    checkpoint_backend: str = "npz"  # "npz" (portable, synchronous) or
    # "orbax" (async sharded snapshots: each process writes its own shards,
    # the epoch loop never blocks on the write — the pod-scale choice)
    resume: bool = False  # resume from <output_dir>/partial if present
    init_from: Optional[str] = None  # warm-start: load model weights from a
    # model.npz (local or gs://) before training — e.g. fine-tune a
    # checkpoint imported from the reference via allrank_tpu.interop;
    # optimizer/scheduler state start fresh (unlike resume)
    profiler_trace_dir: Optional[str] = None  # jax.profiler trace of epoch 1
    metrics_on_train: bool = True  # False skips the per-epoch train-split
    # metrics pass (the reference iterates the train set twice per epoch)
    scan_steps: int = 1  # optimizer steps per device dispatch (lax.scan over
    # stacked batches; amortizes host dispatch for small models)
    accumulation_steps: int = 1  # micro-batches per optimizer step (gradient
    # accumulation: ~A x lower peak activation memory, same update)


@dataclass
class NameArgsConfig:
    name: str
    args: Dict[str, Any] = field(default_factory=dict)


@dataclass
class ParallelConfig:
    """Mesh layout. data * model * sequence must equal the device count used."""

    data: int = -1  # -1 = all available devices on the data axis
    model: int = 1
    sequence: int = 1  # slate-axis sharding of the O(L^2) soft-sort loss
    # tensors (NeuralNDCG): each device holds an [L/sequence, L] row block


@dataclass
class Config:
    model: ModelConfig
    data: DataConfig
    optimizer: NameArgsConfig
    training: TrainingConfig
    loss: NameArgsConfig
    metrics: Dict[str, List[int]]
    lr_scheduler: NameArgsConfig
    val_metric: Optional[str] = None
    expected_metrics: Dict[str, Dict[str, float]] = field(default_factory=dict)
    detect_anomaly: bool = False
    click_model: Optional[NameArgsConfig] = None
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    @classmethod
    def from_json(cls, config_path: str) -> "Config":
        with open(config_path) as config_file:
            return cls.from_dict(json.load(config_file))

    @classmethod
    def from_dict(cls, config: Dict[str, Any]) -> "Config":
        config = dict(config)
        model = dict(config["model"])
        fc = model.get("fc_model")
        transformer = model.get("transformer")
        if transformer:
            transformer = dict(transformer)
            pe = transformer.get("positional_encoding")
            transformer["positional_encoding"] = (
                PositionalEncodingConfig(**pe) if pe else None
            )
            transformer = TransformerConfig(**transformer)
        else:
            transformer = None
        config["model"] = ModelConfig(
            fc_model=FCConfig(**fc) if fc else None,
            transformer=transformer,
            post_model=PostModelConfig(**model["post_model"]),
        )
        config["data"] = DataConfig(**config["data"])
        config["optimizer"] = NameArgsConfig(**config["optimizer"])
        config["training"] = TrainingConfig(**config["training"])
        config["metrics"] = cls._parse_metrics(config["metrics"])
        config["lr_scheduler"] = NameArgsConfig(**config["lr_scheduler"])
        config["loss"] = NameArgsConfig(**config["loss"])
        if config.get("click_model") is not None:
            config["click_model"] = NameArgsConfig(**config["click_model"])
        if config.get("parallel") is not None:
            config["parallel"] = ParallelConfig(**config["parallel"])
        else:
            config.pop("parallel", None)
        return cls(**config)

    @staticmethod
    def _parse_metrics(metrics: List[str]) -> Dict[str, List[int]]:
        """Parse ["ndcg_5", "mrr_10"] into {"ndcg": [5], "mrr": [10]}."""
        metrics_dict: Dict[str, List[int]] = defaultdict(list)
        for metric_string in metrics:
            try:
                name, at = metric_string.split("_")
                metrics_dict[name].append(int(at))
            except (ValueError, TypeError):
                raise MetricConfigError(
                    f"Wrong metric format '{metric_string}'. Expected <name>_<at> "
                    "where name is a valid metric name and at is an int"
                )
        return dict(metrics_dict)

    def to_dict(self) -> Dict[str, Any]:
        return asdict(self)
