"""Tests for multihost helpers and metrics logging."""

import json

import jax
import pytest

from flash_attention_tpu.parallel import assert_same_across_hosts, topology
from flash_attention_tpu.training import MetricsLogger


def test_topology():
    t = topology()
    assert t["process_count"] == 1
    assert t["global_devices"] >= 1
    assert t["local_devices"] == t["global_devices"]


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_assert_same_across_hosts():
    assert_same_across_hosts(7, "test")  # must not raise


def test_metrics_jsonl(tmp_path):
    m = MetricsLogger(str(tmp_path))
    m.log({"iter": 0, "train_loss": 1.5})
    m.summary({"final_loss": 1.2})
    m.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["train_loss"] == 1.5 and "ts" in rec


def test_metrics_wandb_graceful_without_wandb(tmp_path):
    # wandb not installed in this image: must warn, not raise
    m = MetricsLogger(str(tmp_path), wandb_log=True)
    m.log({"x": 1})
    m.close()


def test_measure_chain_timer_and_ab():
    """chain_timer/ab_compare protocol: positive per-call times, all
    variants present, the recheck row exists (drift-band discipline)."""
    import jax.numpy as jnp
    from flash_attention_tpu.utils.measure import ab_compare, chain_timer

    x = jnp.ones((8, 128), jnp.float32)

    dt = chain_timer(lambda c: c * 1.0001, x, depth=8, iters=2)
    assert dt > 0

    res = ab_compare(
        {"a": lambda c: c * 1.0001, "b": lambda c: c + 1e-4},
        x,
        depth=8,
        iters=2,
    )
    assert set(res) == {"a", "b", "a+recheck"}
    assert all(v > 0 for v in res.values())
