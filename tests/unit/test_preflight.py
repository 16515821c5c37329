"""Kernel preflight failure handling (kernels/preflight.py).

The class of bug this guards (round-2 9a0c76c: silently-wrong Mosaic
lowerings) is only fully reproducible on a real chip — the on-chip leg
uses URMAP_PREFLIGHT_FAKE_BREAK (see BASELINE.md round-3). What IS
CPU-testable: the exception path. Forcing on_tpu()=True on the CPU
backend makes the probe's Pallas compile fail, which must flip ALL
three escape hatches (attribution unknown) and record the error, so a
broken platform degrades to slower-but-correct jnp instead of crashing
or shipping wrong SAM.
"""

import os

import pytest


@pytest.fixture()
def clean_env(monkeypatch):
    for var in ("URMAP_NO_SEED_KERNEL", "URMAP_NO_VOTE_KERNEL",
                "URMAP_NO_DP_KERNEL", "URMAP_NO_KERNEL_PREFLIGHT",
                "URMAP_PREFLIGHT_FAKE_BREAK"):
        monkeypatch.delenv(var, raising=False)
    yield
    for var in ("URMAP_NO_SEED_KERNEL", "URMAP_NO_VOTE_KERNEL",
                "URMAP_NO_DP_KERNEL"):
        os.environ.pop(var, None)


def test_probe_failure_flips_all_hatches(clean_env, monkeypatch):
    from urmap_tpu.kernels import preflight
    from urmap_tpu.map import dp

    monkeypatch.setattr(dp, "on_tpu", lambda: True)
    monkeypatch.setattr(preflight, "_DONE", False)
    monkeypatch.setattr(preflight, "_RESULT", None)
    preflight.ensure_kernels()   # Pallas on CPU backend → compile error
    res = preflight.last_result()
    assert res is not None and res["error"] is not None
    assert not res["seed_ok"] and not res["dp_ok"]
    for var in ("URMAP_NO_SEED_KERNEL", "URMAP_NO_VOTE_KERNEL",
                "URMAP_NO_DP_KERNEL"):
        assert os.environ.get(var) == "1", var
    # and the dispatches actually take the jnp paths now
    monkeypatch.setattr(dp, "_ON_TPU", True)
    from urmap_tpu.map.seed import extract_seed_slots_words_dispatch
    # (smoke: dispatch must not raise trying to lower Pallas on CPU)
    import jax.numpy as jnp
    import numpy as np

    from urmap_tpu import genome_pack as gpk

    codes = np.zeros((8, 64), np.uint8)
    lens = np.full(8, 64, np.int32)
    rp, rn = gpk.pack_reads(jnp.asarray(codes), jnp.asarray(lens), 4)
    extract_seed_slots_words_dispatch(rp, rn, jnp.asarray(lens), 64,
                                      k=24, q=4, slot_bits=16)


def test_skip_flag_short_circuits(clean_env, monkeypatch):
    from urmap_tpu.kernels import preflight

    monkeypatch.setenv("URMAP_NO_KERNEL_PREFLIGHT", "1")
    monkeypatch.setattr(preflight, "_DONE", False)
    monkeypatch.setattr(preflight, "_RESULT", None)
    preflight.ensure_kernels()
    assert preflight.last_result() is None
    assert os.environ.get("URMAP_NO_SEED_KERNEL") is None
