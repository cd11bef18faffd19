"""The examples/ walkthroughs stay runnable (reference repo examples role)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, **kw):
    from tests.envutil import cpu_env

    env = cpu_env()
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True,
        timeout=600, **kw,
    )


def test_examples_query_and_syng(tmp_path):
    d = str(tmp_path / "demo")
    r = _run([sys.executable, "examples/make_data.py", d])
    assert r.returncode == 0, r.stderr
    for script in ("examples/01_query.sh", "examples/03_syng.sh"):
        r = _run(["bash", script, d])
        assert r.returncode == 0, (script, r.stderr[-2000:])
        assert r.stdout.strip().endswith("OK"), script
