"""Packaging smoke test (VERDICT r4 #8): the pyproject.toml metadata
(658a313) must actually build and expose the console entry points.

Installs the repo with ``pip install --no-deps --no-build-isolation
--target <tmp>`` (wheel built by the in-env setuptools; no venv mutation,
no network) and runs the generated ``svdformer-pcn --help`` script —
covering metadata parse, package discovery, package-data inclusion, and
entry-point resolution (reference CLI surface: main_pcn.py:31-46).
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.heavy
def test_pip_install_and_console_script(tmp_path):
    if shutil.which("pip") is None and shutil.which("pip3") is None:
        pytest.skip("pip unavailable")
    pip = shutil.which("pip") or shutil.which("pip3")
    target = tmp_path / "site"
    r = subprocess.run(
        [pip, "install", "--no-deps", "--no-build-isolation", "--quiet",
         "--target", str(target), REPO],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"pip install failed:\n{r.stdout}\n{r.stderr}"
    pkg = target / "svdformer_pointsea_tpu"
    assert pkg.is_dir(), sorted(os.listdir(target))
    # Bundled C++ source ships with the package (package-data).
    assert (pkg / "native" / "pcdio.cpp").is_file()

    script = target / "bin" / "svdformer-pcn"
    assert script.is_file(), sorted(os.listdir(target / "bin"))
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{target}{os.pathsep}" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, str(script), "--help"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr
    assert "--test" in r.stdout and "--weights" in r.stdout, r.stdout
