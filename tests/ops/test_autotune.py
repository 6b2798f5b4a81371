"""Per-device-kind dispatch-threshold table (ops/autotune.py): defaults
without a cache, tuned-table override, fake-device-kind re-tune, and the
dispatchers actually reading through it."""

import json
import os

import pytest

from allrank_tpu.ops import autotune


@pytest.fixture(autouse=True)
def isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("ALLRANK_TPU_CACHE_DIR", str(tmp_path / "cache"))
    autotune.invalidate_cache()
    yield
    autotune.invalidate_cache()


def test_defaults_without_a_cache():
    for name, val in autotune.DEFAULTS.items():
        assert autotune.get(name) == val
    assert autotune.effective() == autotune.DEFAULTS


def test_tuned_table_overrides_defaults(monkeypatch):
    os.makedirs(autotune.cache_dir(), exist_ok=True)
    with open(autotune.table_path(), "w") as f:
        json.dump({autotune.device_key(): {"ring_attention_min_len": 2048}},
                  f)
    autotune.invalidate_cache()
    assert autotune.get("ring_attention_min_len") == 2048
    # untouched names keep their defaults
    assert autotune.get("fused_attention_min_len") == \
        autotune.DEFAULTS["fused_attention_min_len"]


def test_other_device_kinds_entry_is_ignored():
    os.makedirs(autotune.cache_dir(), exist_ok=True)
    with open(autotune.table_path(), "w") as f:
        json.dump({"TPU v9 imaginarium": {"ring_attention_min_len": 64}}, f)
    autotune.invalidate_cache()
    assert autotune.get("ring_attention_min_len") == \
        autotune.DEFAULTS["ring_attention_min_len"]


def test_fake_device_kind_retunes_its_own_entry(monkeypatch):
    """A new hardware generation gets its own table row; existing rows
    survive. Probes are mocked (CPU backend keeps defaults anyway)."""
    monkeypatch.setattr(autotune, "device_key", lambda: "TPU vX test")
    values = autotune.run_autotune(verbose=False)
    assert values == autotune.DEFAULTS  # non-tpu backend -> defaults kept
    table = json.load(open(autotune.table_path()))
    assert "TPU vX test" in table

    # a second kind tunes alongside without clobbering the first
    monkeypatch.setattr(autotune, "device_key", lambda: "TPU vY test")
    monkeypatch.setattr(autotune, "_probe_attention_crossover", lambda: 368)
    monkeypatch.setattr(autotune, "_probe_lambda_crossover",
                        lambda: 64 * 768 * 768)
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    values = autotune.run_autotune(verbose=False)
    assert values["fused_attention_bf16_min_len"] == 368
    assert values["lambda_pair_crossover_elems"] == 64 * 768 * 768
    table = json.load(open(autotune.table_path()))
    assert set(table) >= {"TPU vX test", "TPU vY test"}
    assert autotune.get("fused_attention_bf16_min_len") == 368


def test_dispatchers_read_through_the_table(monkeypatch):
    """The real dispatch seams honor a tuned entry: lambda's pair crossover
    and the attention policy flip when the table says so."""
    from allrank_tpu.models.transformer import _kernel_beats_xla
    from allrank_tpu.ops.lambda_tiled import tiled_lambda_preferred

    import jax.numpy as jnp

    os.makedirs(autotune.cache_dir(), exist_ok=True)
    with open(autotune.table_path(), "w") as f:
        json.dump({autotune.device_key(): {
            "lambda_pair_crossover_elems": 10,
            "fused_attention_bf16_min_len": 10_000,
        }}, f)
    autotune.invalidate_cache()

    # crossover of 10 elements: even a tiny shape clears the bar; the
    # remaining gate is availability (False on CPU), proving the threshold
    # itself was read from the table (default 32M would return False before
    # ever reaching the availability check — distinguishable via a huge
    # availability=True stub)
    import allrank_tpu.ops.lambda_tiled as lt

    monkeypatch.setattr(lt, "tiled_lambda_available", lambda L, b: True)
    assert tiled_lambda_preferred(8, 4) is True
    # attention: a min-len of 10k pushes the paper shape out of the window
    assert _kernel_beats_xla(240, 64, 4, jnp.bfloat16) is False

    with open(autotune.table_path(), "w") as f:
        json.dump({autotune.device_key(): {
            "lambda_pair_crossover_elems": 32 * 1024 * 1024,
            "fused_attention_bf16_min_len": 120,
        }}, f)
    autotune.invalidate_cache()
    assert tiled_lambda_preferred(8, 4) is False
    assert _kernel_beats_xla(240, 64, 4, jnp.bfloat16) is True
