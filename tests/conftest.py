"""Test configuration: run everything on a virtual 8-device CPU mesh.

SURVEY.md section 4 item 4: distributed tests without a cluster — force 8 host
devices so the DP/CP shard_map paths are exercised for real (collectives execute,
shardings propagate) while the single real TPU chip stays free for benchmarking.
Must run before jax initializes its backends, hence module-level in conftest.
"""

import os

# NOTE: on this box the axon TPU plugin ignores the JAX_PLATFORMS env var; only the
# jax.config knob reliably forces CPU (see .claude/skills/verify/SKILL.md).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent XLA compilation cache: the suite is dominated by CPU compiles of the
# full model, so re-runs hit the cache and drop sharply. Set via env so the
# CLI-subprocess tests inherit it, AND via jax.config.update below: the axon
# sitecustomize (/root/.axon_site) imports jax at interpreter startup, BEFORE
# this module runs, so config defaults snapshot the env too early and the
# env-only setup silently left the cache disabled in the main pytest process.
_JAX_CACHE = os.path.join(os.path.dirname(__file__), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _JAX_CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs",
                  float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))
jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                  int(os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"]))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fvta_memexqa_tpu.config import Config, DataConfig  # noqa: E402
from fvta_memexqa_tpu.data import load_pack, make_synthetic, pack  # noqa: E402


def small_data_config() -> DataConfig:
    return DataConfig(
        max_albums=2,
        max_photos=4,
        max_question_len=10,
        max_answer_len=4,
        max_sent_len=6,
        max_album_text_len=8,
        max_word_len=8,
        image_feat_dim=64,
        word_emb_dim=100,
    )


@pytest.fixture(scope="session")
def pack_dir(tmp_path_factory):
    """Synthetic mini-dataset packed to disk once per test session."""
    out = str(tmp_path_factory.mktemp("pack"))
    qas, albums, feats, test_ids, glove = make_synthetic(seed=0)
    pack(qas, albums, feats, test_ids, glove, out, small_data_config(), seed=0)
    return out


@pytest.fixture(scope="session")
def packed_synth(pack_dir):
    return load_pack(pack_dir)


@pytest.fixture(scope="session")
def small_config(packed_synth) -> Config:
    cfg = Config()
    return cfg.replace(
        data=packed_synth.cfg,
        model=cfg.model.__class__(hidden_dim=16, char_emb_dim=8, char_cnn_filters=16),
    )


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
