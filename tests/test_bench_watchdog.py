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


RAISE_SNIPPET = """
import bench, os, time
def boom():
    raise OSError('proxy subprocess failed')
bench._run_cpu_proxy = boom
os.environ['SDSM_BENCH_DEADLINE'] = '0.2'
bench._arm_tunnel_watchdog()
time.sleep(10)
raise SystemExit('watchdog never fired')
"""


def test_watchdog_exits_2_even_when_proxy_raises():
    """ADVICE r3 (medium): a failing fallback path must still abort the
    process — a dead timer thread would resume the hang the watchdog
    exists to prevent."""
    proc = subprocess.run(
        [sys.executable, '-c', RAISE_SNIPPET], cwd=REPO,
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu'))
    assert proc.returncode == 2, proc.stderr
    lines = [l for l in proc.stdout.splitlines() if l.startswith('{')]
    assert len(lines) == 1
    assert json.loads(lines[0])['value'] == -1.0


PET_SNIPPET = """
import bench, os, time
bench._run_cpu_proxy = lambda: {'cpu_proxy_sec_per_image': 11.5}
os.environ['SDSM_BENCH_DEADLINE'] = '1.0'
wd = bench._arm_tunnel_watchdog()
for _ in range(4):          # keep petting past the original deadline
    time.sleep(0.5)
    wd.pet()
wd.complete()
time.sleep(1.5)             # a live timer would fire in here
print('petted-through')
"""


def test_watchdog_pet_rearms_and_complete_disarms():
    """ADVICE r3 (low): progress resets the deadline, so slow-but-advancing
    cold runs are not misreported as wedges; complete() disarms for good."""
    proc = subprocess.run(
        [sys.executable, '-c', PET_SNIPPET], cwd=REPO,
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu'))
    assert proc.returncode == 0, proc.stderr
    assert 'petted-through' in proc.stdout
    assert not [l for l in proc.stdout.splitlines() if l.startswith('{')]


RACE_SNIPPET = """
import bench, os, time, threading
release = threading.Event()
def slow_proxy():
    release.wait(30)        # hold _fire mid-flight
    return {'cpu_proxy_sec_per_image': 11.5}
bench._run_cpu_proxy = slow_proxy
os.environ['SDSM_BENCH_DEADLINE'] = '0.2'
wd = bench._arm_tunnel_watchdog()
time.sleep(1.0)             # timer has fired; _fire is inside slow_proxy
wd.complete()               # bench 'finishes' while _fire is mid-flight
release.set()
time.sleep(1.0)             # give _fire a chance to misbehave
print('{"metric": "real_result"}')
"""


def test_watchdog_completion_wins_race_against_inflight_fire():
    """ADVICE r3 (low): a bench completing while _fire is already running
    must not produce a second JSON line or an exit(2)."""
    proc = subprocess.run(
        [sys.executable, '-c', RACE_SNIPPET], cwd=REPO,
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu'))
    assert proc.returncode == 0, proc.stderr
    lines = [l for l in proc.stdout.splitlines() if l.startswith('{')]
    assert lines == ['{"metric": "real_result"}']


PET_RACE_SNIPPET = """
import bench, os, time, threading
release = threading.Event()
def slow_proxy():
    release.wait(30)        # hold _fire mid-flight
    return {'cpu_proxy_sec_per_image': 11.5}
bench._run_cpu_proxy = slow_proxy
os.environ['SDSM_BENCH_DEADLINE'] = '0.2'
wd = bench._arm_tunnel_watchdog()
time.sleep(1.0)             # timer has fired; _fire is inside slow_proxy
wd._deadline = 60           # the re-armed timer must stay quiet for the test
wd.pet()                    # a rep completes while _fire is mid-flight
release.set()
time.sleep(1.0)             # give the stale _fire a chance to misbehave
wd.complete()
print('{"metric": "real_result"}')
"""


def test_watchdog_pet_wins_race_against_inflight_fire():
    """ADVICE r4 (low): a rep completing just as the deadline expires must
    abort the already-started _fire — the generation captured at arm time
    no longer matches after pet()."""
    proc = subprocess.run(
        [sys.executable, '-c', PET_RACE_SNIPPET], cwd=REPO,
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu'))
    assert proc.returncode == 0, proc.stderr
    lines = [l for l in proc.stdout.splitlines() if l.startswith('{')]
    assert lines == ['{"metric": "real_result"}']


def test_trim_spikes_reruns_wedged_rep():
    """VERDICT r3 item 5: a synthetic 10 s stall in one rep must move the
    trimmed p50 by < 5%."""
    import bench
    times = [0.95, 10.54, 0.91, 0.83, 0.95, 0.89, 0.97]
    reruns = []

    def rerun(i):
        reruns.append(i)
        return 0.92

    trimmed, n = bench._trim_spikes(times, rerun)
    assert n == 1 and reruns == [1]
    assert trimmed[1] == 0.92
    import numpy as np
    clean_p50 = float(np.median([0.95, 0.92, 0.91, 0.83, 0.95, 0.89, 0.97]))
    assert abs(float(np.median(trimmed)) - clean_p50) / clean_p50 < 0.05
    # no spikes: population untouched, no reruns
    trimmed2, n2 = bench._trim_spikes([1.0, 1.1, 0.9], rerun)
    assert n2 == 0 and trimmed2 == [1.0, 1.1, 0.9] and len(reruns) == 1


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
