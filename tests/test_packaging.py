"""Packaging: the framework installs as a real package (VERDICT r4 #3).

The reference ships its world as a conda env pin (requirements.yaml —
SURVEY §0 calls the diffusers==0.8.0 pin load-bearing); the rebuild's
equivalent is pyproject.toml with pinned jax/flax/optax/orbax versions, a
console entry point, and the native IO source staged into wheels so
utils/native.py can JIT-build it post-install.

The slow test does a real `pip install` into a temp prefix and exercises
import + console script from OUTSIDE the repo root (so nothing resolves via
cwd); fast tests validate the metadata without installing.
"""

import os
import subprocess
import sys
import sysconfig
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_pyproject_pins_jax_stack():
    deps = _pyproject()["project"]["dependencies"]
    for pkg in ("jax", "flax", "optax", "orbax-checkpoint"):
        pin = [d for d in deps if d.split("==")[0] == pkg]
        assert pin and "==" in pin[0], f"{pkg} must be exact-pinned: {deps}"


def test_console_script_points_at_main():
    scripts = _pyproject()["project"]["scripts"]
    assert scripts["stablekeypoints-tpu"] == "stablekeypoints_tpu.main:main"
    # the target resolves
    from stablekeypoints_tpu.main import main  # noqa: F401


def test_version_attr_matches_dynamic_config():
    import stablekeypoints_tpu

    assert _pyproject()["tool"]["setuptools"]["dynamic"]["version"]["attr"] == (
        "stablekeypoints_tpu.__version__"
    )
    assert stablekeypoints_tpu.__version__


@pytest.mark.slow
def test_pip_install_import_and_entrypoint(tmp_path):
    """pip install . into a clean prefix; import + run the console script
    from a cwd outside the repo (nothing may resolve via the checkout)."""
    prefix = tmp_path / "prefix"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-build-isolation",
         "--no-deps", "--prefix", str(prefix), REPO],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    rel = sysconfig.get_path("purelib", vars={"base": str(prefix), "platbase": str(prefix)})
    site = rel if os.path.isdir(rel) else None
    if site is None:  # layout fallback (some distros use lib/pythonX.Y)
        hits = [dp for dp, dns, _ in os.walk(prefix) if "stablekeypoints_tpu" in dns]
        assert hits, f"installed package not found under {prefix}"
        site = hits[0]
    pkg = os.path.join(site, "stablekeypoints_tpu")
    assert os.path.isfile(os.path.join(pkg, "__init__.py"))
    # the build_py hook staged the native source into the wheel
    assert os.path.isfile(os.path.join(pkg, "_native_src", "image_io.cpp"))

    env = dict(os.environ, PYTHONPATH=site)
    outside = str(tmp_path)  # not the repo root
    r = subprocess.run(
        [sys.executable, "-c",
         "import stablekeypoints_tpu, os; "
         "assert 'prefix' in os.path.dirname(stablekeypoints_tpu.__file__), "
         "stablekeypoints_tpu.__file__; "
         "print(stablekeypoints_tpu.__version__)"],
        capture_output=True, text=True, cwd=outside, env=env, timeout=120,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.strip()

    script = os.path.join(prefix, "bin", "stablekeypoints-tpu")
    assert os.path.exists(script), os.listdir(os.path.join(prefix, "bin"))
    r = subprocess.run(
        [script, "--help"], capture_output=True, text=True,
        cwd=outside, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "--num_tokens" in r.stdout  # the reference flag surface is there
