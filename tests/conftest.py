"""Test configuration: run everything on an 8-device virtual CPU mesh.

This is the TPU-native answer to the reference's mp.spawn+gloo distributed
tests (reference: tests/distributed/utils.py:12-38): instead of forking
processes, XLA exposes 8 virtual CPU devices in one process and all
mesh/pjit/collective code paths run for real.
"""

import os

# Force local CPU: the ambient environment registers a remote-TPU PJRT plugin
# at interpreter startup (sitecustomize) and force-sets jax_platforms to
# "axon,cpu", which would make every test compile over the network.  Set
# S2T_TEST_TPU=1 to deliberately run the suite on the real chip.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if not os.environ.get("S2T_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite re-jits the same programs every
# run (and across tests in one run only jax's in-memory cache helps).  With
# the disk cache, the second `pytest` run skips nearly all compiles.
import jax as _jax  # noqa: E402

# key the cache by CPU feature set: XLA:CPU AOT entries compiled on another
# machine type fail to load (and can SIGILL) when the host lacks ISA
# extensions the compiling box had
def _cpu_tag() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "generic"


# XLA 0.9's cpu_aot_loader cross-checks the cached executable's compile-time
# target features against host cpuid and logs an ERROR for
# `+prefer-no-scatter` / `+prefer-no-gather` — which are XLA-synthesized
# LLVM tuning *hints*, not ISA features, so cpuid can never report them and
# the check false-positives on EVERY cache hit, including entries compiled
# seconds earlier by the same process on the same machine (verified by
# probe).  No cache tag can fix a check that fails same-machine reloads;
# real cross-machine safety is what the cpuinfo-keyed directory above
# provides.  Filter exactly this known-false-positive line out of stderr so
# genuine XLA errors stay visible.
def _install_aot_noise_filter() -> None:
    import threading

    real_fd = os.dup(2)
    r, w = os.pipe()
    os.dup2(w, 2)
    os.close(w)

    def pump():
        buf = b""
        while True:
            chunk = os.read(r, 65536)
            if not chunk:
                break
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                if b"cpu_aot_loader" not in line:
                    os.write(real_fd, line + b"\n")
        if buf and b"cpu_aot_loader" not in buf:
            os.write(real_fd, buf)

    threading.Thread(target=pump, daemon=True, name="aot-noise-filter").start()


_install_aot_noise_filter()


_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", f"/tmp/s2t_xla_cache_{_cpu_tag()}"
)
_jax.config.update("jax_compilation_cache_dir", _cache_dir)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
try:
    _jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:  # option renamed/absent in some jax versions
    pass

import faulthandler  # noqa: E402
import signal  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Per-test runtime ceiling: a compile/dispatch stall must be a FAILURE, not a
# suite that never terminates.  SIGALRM raises TimeoutError in the test; if
# the main thread is wedged inside a C call that never returns to the
# interpreter, the faulthandler backstop dumps all stacks and exits the
# process a grace period later.  Override with S2T_TEST_TIMEOUT=0 to disable
# (e.g. when debugging under pdb).
DEFAULT_TEST_TIMEOUT = int(os.environ.get("S2T_TEST_TIMEOUT", "600"))


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    timeout = DEFAULT_TEST_TIMEOUT
    marker = item.get_closest_marker("timeout")
    if marker and marker.args:
        timeout = int(marker.args[0])
    if timeout <= 0 or not hasattr(signal, "SIGALRM"):
        return (yield)

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"{item.nodeid} exceeded the {timeout}s per-test timeout"
        )

    old = signal.signal(signal.SIGALRM, _on_alarm)
    faulthandler.dump_traceback_later(timeout + 120, exit=True)
    signal.alarm(timeout)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        faulthandler.cancel_dump_traceback_later()
        signal.signal(signal.SIGALRM, old)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
