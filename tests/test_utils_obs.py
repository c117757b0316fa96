"""Observability utilities: ScalarWriter (train.py:109-120 semantics) and
profiling helpers (SURVEY.md §5)."""

import json
import os

import jax
import jax.numpy as jnp


def test_scalar_writer_wipes_and_writes(tmp_path):
    from detectinblur_tpu.utils.logging import ScalarWriter

    path = str(tmp_path / "tb")
    os.makedirs(path)
    stale = os.path.join(path, "stale.bin")
    with open(stale, "w") as f:
        f.write("old")

    w = ScalarWriter(path)  # wipe=True default, rank 0 in tests
    assert not os.path.exists(stale), "path must be wiped on start"
    w.add_scalar("losses/total", 1.5, 0)
    w.add_scalar("Normal/AP", 0.37, 1)
    w.close()

    # Either a tensorboard event file or the JSONL fallback must exist and
    # carry both scalars.
    files = os.listdir(path)
    assert files
    jsonl = os.path.join(path, "scalars.jsonl")
    if os.path.exists(jsonl):
        rows = [json.loads(line) for line in open(jsonl)]
        assert {r["tag"] for r in rows} == {"losses/total", "Normal/AP"}
        assert rows[0]["value"] == 1.5 and rows[0]["step"] == 0
    else:
        assert any(f.startswith("events") for f in files)


def test_scalar_writer_none_path_noop():
    from detectinblur_tpu.utils.logging import ScalarWriter

    w = ScalarWriter(None)
    w.add_scalar("x", 1.0, 0)  # must not raise
    w.close()


def test_step_timer_syncs_device_work():
    from detectinblur_tpu.utils.profiling import step_timer

    x = jnp.ones((256, 256))
    with step_timer(sync_tree=None) as t_nosync:
        y = x @ x
    with step_timer(sync_tree=y) as t:
        y = x @ x
    assert t.seconds >= 0.0 and t_nosync.seconds >= 0.0


def test_trace_writes_profile(tmp_path):
    from detectinblur_tpu.utils.profiling import trace

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jax.block_until_ready(jnp.ones((64, 64)) * 2.0)
    found = []
    for root, _, files in os.walk(logdir):
        found += [f for f in files if f.endswith((".trace.json.gz", ".xplane.pb"))]
    assert found, "no trace artifacts written"


def test_device_memory_stats_shape():
    from detectinblur_tpu.utils.profiling import device_memory_stats

    stats = device_memory_stats()
    # CPU backends may expose nothing; the contract is dict-with-known-keys
    # or empty.
    assert isinstance(stats, dict)
    if stats:
        assert set(stats) == {"bytes_in_use", "peak_bytes_in_use",
                              "bytes_limit"}
