"""Test configuration: force an 8-virtual-device CPU platform.

This is the JAX-native substitute for "multi-node without a cluster"
(SURVEY.md §4): sharding/pjit paths are exercised on 8 fake CPU devices.
Must run before jax is imported anywhere.
"""

import os
import sys

# The axon TPU plugin hooks every interpreter via a sitecustomize.py on
# PYTHONPATH (/root/.axon_site) and routes XLA compilation through a remote
# tunnel — slowing CPU-only compiles ~20x and deadlocking when two
# processes share the relay. sitecustomize runs before conftest, so the
# only reliable fix is to re-exec pytest with a cleaned environment.
if any(".axon_site" in p for p in sys.path) and "DIB_TPU_CLEAN" not in os.environ:
    env = dict(os.environ)
    env["DIB_TPU_CLEAN"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and ".axon_site" not in p
    )
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_")):
            del env[k]

    # By conftest-import time pytest's global capture has already dup2'ed a
    # temp FILE onto fds 1/2; the exec'ed process would write its entire
    # output there, invisibly. pytest keeps dups of the original fds open —
    # find the first non-regular-file fd and restore it onto 1/2.
    import stat as _stat

    try:
        if _stat.S_ISREG(os.fstat(1).st_mode):
            best = None
            for _fd in range(3, 64):
                try:
                    _st = os.fstat(_fd)
                except OSError:
                    continue
                try:
                    _link = os.readlink(f"/proc/self/fd/{_fd}")
                except OSError:
                    _link = ""
                if _link == "/dev/null":
                    continue  # pytest's saved stdin target
                if _stat.S_ISFIFO(_st.st_mode):
                    best = _fd
                    break
                if best is None and _stat.S_ISCHR(_st.st_mode):
                    best = _fd
            if best is not None:
                os.dup2(best, 1)
                os.dup2(best, 2)
    except OSError:
        pass
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (the real chip),
# but unit tests must run on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# On few-core hosts the 8 virtual devices serialize; XLA:CPU's collective
# rendezvous (default 20s warn / 40s TERMINATE-the-process) then
# false-positives on the 8-device train-step program. Raise both.
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = flags

# Persistent compilation cache: XLA:CPU compiles some ops (scale_and_translate,
# the detector graph) in tens of seconds on this 1-core box; cache across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1337)
