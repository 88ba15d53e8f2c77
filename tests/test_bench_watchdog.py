"""The bench tunnel watchdog must emit a parseable fallback line and exit 2.

The TPU sits behind a shared remote tunnel that can wedge outright (blocked
RPCs are uninterruptible from Python), so ``bench.py`` arms a daemon timer
that emits a tunnel-independent CPU-proxy JSON line instead of hanging the
driver forever. ``fire()`` ends with ``os._exit(2)``, so the test runs it in
a subprocess.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = """
import bench, os, time
bench._run_cpu_proxy = lambda: {'cpu_proxy_sec_per_image': 11.5}
os.environ['SDSM_BENCH_DEADLINE'] = '0.2'
bench._arm_tunnel_watchdog()
time.sleep(10)
raise SystemExit('watchdog never fired')
"""


def test_watchdog_emits_fallback_and_exits_2():
    proc = subprocess.run(
        [sys.executable, '-c', SNIPPET], cwd=REPO,
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu'))
    assert proc.returncode == 2, proc.stderr
    lines = [l for l in proc.stdout.splitlines() if l.startswith('{')]
    assert len(lines) == 1
    result = json.loads(lines[0])
    assert result['metric'] == 'cpu_proxy_sec_per_image_FALLBACK_tunnel_wedged'
    assert result['value'] == 11.5
    assert result['unit'] == 's'
    assert result['vs_baseline'] > 0
    assert 'wedged' in proc.stderr


def test_watchdog_disarmed_by_zero_deadline():
    proc = subprocess.run(
        [sys.executable, '-c',
         "import bench, os\n"
         "os.environ['SDSM_BENCH_DEADLINE'] = '0'\n"
         "assert bench._arm_tunnel_watchdog() is None\n"
         "print('disarmed')\n"],
        cwd=REPO, capture_output=True, text=True, timeout=60,
        env=dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu'))
    assert proc.returncode == 0, proc.stderr
    assert 'disarmed' in proc.stdout
