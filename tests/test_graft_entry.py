"""Regression tests for the driver entry points (__graft_entry__.py).

Round 1's multi-chip check failed because dryrun_multichip never forced
the virtual CPU platform (VERDICT.md weak #1). These tests pin both the
in-process path (conftest already set up the 8-device CPU mesh) and the
subprocess fallback used when jax backends were initialized first.
"""

import os
import subprocess
import sys

import jax


def _load_entry_module():
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(root, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_single_device():
    g = _load_entry_module()
    fn, args = g.entry()
    out = jax.jit(fn).lower(*args).compile()(*args)
    assert out.ndim == 2 and out.shape[0] == args[0].shape[0]


def test_dryrun_multichip_in_process():
    # conftest has already forced the 8-device CPU platform, so the
    # in-process path must be taken (no subprocess).
    g = _load_entry_module()
    assert g._env_is_usable(8)
    g.dryrun_multichip(8)


def test_dryrun_multichip_from_preinitialized_process():
    # Simulate the driver importing jax (and initializing backends with
    # the default 1-device CPU platform) before calling dryrun_multichip.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import os; os.environ.pop('XLA_FLAGS', None)\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) < 8\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('SUBPROC_DRYRUN_OK')\n"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [root] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=1200, cwd=root,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "SUBPROC_DRYRUN_OK" in proc.stdout
