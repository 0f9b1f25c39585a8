"""Unit tests for bench.py's measurement logic (no device needed).

_measure_rate is the driver-visible headline-number path; these lock the
slope math and the degraded-fallback guard (VERDICT r2 #8: a wild
two-point slope through tunnel jitter must not be published)."""

import numpy as np

import bench


class FakeClock:
    def __init__(self, t0=1000.0):
        self.now = t0

    def __call__(self):
        return self.now


def _with_fake_clock(monkeypatch):
    clock = FakeClock()
    monkeypatch.setattr(bench.time, "time", clock)
    # keep the wall budget far away so _remaining() never gates points
    monkeypatch.setattr(bench, "_T0", clock.now)
    monkeypatch.setattr(bench, "WALL_DEADLINE_S", 1e9)
    return clock


def test_measure_rate_cancels_fixed_overhead(monkeypatch):
    clock = _with_fake_clock(monkeypatch)
    per_step, overhead, work = 1e-4, 0.3, 6400.0

    def run(tau, seed):
        clock.now += overhead + per_step * tau

    rate, info = bench._measure_rate(run, (1000, 3000, 5000), work)
    # slope timing must recover work/per_step exactly despite the 0.3 s
    # fixed overhead (one-shot at tau=1000 would be off by 75%)
    assert np.isclose(rate, work / per_step, rtol=1e-6)
    assert not info.get("degraded")
    assert info["points"] == 3


def test_measure_rate_degrades_on_wild_slope(monkeypatch):
    clock = _with_fake_clock(monkeypatch)
    work = 6400.0
    # pathological timings: a large-tau call that is FASTER than the
    # small-tau one (tunnel jitter) makes the slope negative
    times = {100: 5.0, 300: 1.0}

    def run(tau, seed):
        clock.now += times[tau]

    rate, info = bench._measure_rate(run, (100, 300), work)
    assert info.get("degraded")
    # fallback is the conservative single-shot rate at the largest tau
    assert np.isclose(rate, work * 300 / times[300], rtol=1e-6)


def test_measure_rate_keeps_two_point_slope_under_budget(monkeypatch):
    clock = _with_fake_clock(monkeypatch)
    per_step, work = 1e-3, 100.0

    def run(tau, seed):
        clock.now += 0.1 + per_step * tau

    # shrink the remaining budget after construction so the third point
    # is skipped but the first two still form a slope
    rate, info = bench._measure_rate(
        run, (1000, 2000, 4000), work, min_budget=1e12
    )
    assert info["points"] == 2
    assert np.isclose(rate, work / per_step, rtol=1e-6)


def test_last_validated_loads_committed_record():
    lv = bench._last_validated()
    # the committed record must exist, be dated, and carry the headline
    # fields the outage fallback advertises
    assert lv is not None
    assert lv["validated_utc"].startswith("20")
    assert lv["line"]["value"] > 1e10
    assert lv["line"]["piqmc_attempts_per_sec"] > 1e10


def test_supervise_outage_line_is_parseable(monkeypatch, capsys):
    """A total tunnel outage (child never prints) must still end with one
    parseable JSON line carrying the honest zero + the dated last
    hardware-validated record (the BENCH_r02 rc=124 failure mode)."""
    import json
    import subprocess

    class DeadChild:
        stdout = iter(())  # no output ever

        def __init__(self, *a, **k):
            self._polls = 0

        def poll(self):
            return None

        def kill(self):
            pass

        def wait(self, timeout=None):
            return 0

    monkeypatch.setattr(subprocess, "Popen", DeadChild)
    monkeypatch.setattr(bench, "INIT_PROBE_S", 0.0)
    monkeypatch.setattr(bench, "WALL_DEADLINE_S", 0.0)  # exhaust instantly
    assert bench._supervise() == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    final = json.loads(lines[-1])
    assert final["value"] == 0.0
    assert "no live hardware measurement" in final["note"]
    assert final["last_hw_validated"]["line"]["value"] > 1e10


def test_starved_arms_full_run_is_clean():
    # every arm measured (or failed with a recorded error) => nothing starved
    final = {f"{n}_attempts_per_sec": 1e10 for n in (
        "piqmc", "svmc", "piqmc_bath", "pallas_sa", "pallas_piqmc",
        "pallas_svmc", "pallas_piqmc_bath")}
    final["wolff_cluster_ms"] = 9.5
    assert bench._starved_arms(final) == []
    # an arm that errored out is attributable, not starved
    del final["svmc_attempts_per_sec"]
    final["error_svmc"] = "RuntimeError('tunnel')"
    assert bench._starved_arms(final) == []
    # the cluster arm's markers are ORed: either timing suffices
    del final["wolff_cluster_ms"]
    final["sw_bath_sweep_ms"] = 5.7
    assert bench._starved_arms(final) == []


def test_gate_degrades_before_skipping():
    # VERDICT r4 #4: below the full gate an arm must run the shrunk
    # configuration, not be skipped; only below the light floor may it skip
    assert bench._gate(300.0, 240, 70) == "full"
    assert bench._gate(100.0, 240, 70) == "light"
    assert bench._gate(50.0, 240, 70) == "skip"
    assert bench._gate(71.0, 240, 70) == "light"


def test_every_arm_accepts_light_mode():
    # the degrade path calls arm(problem, light=True); every arm in the
    # table (and the SA/cluster arms outside it) must accept the kwarg
    import inspect

    for fn in (bench._sa_arm, bench._piqmc_arm, bench._svmc_arm,
               bench._piqmc_bath_arm, bench._pallas_arm,
               bench._pallas_qmc_arm, bench._pallas_svmc_arm,
               bench._pallas_bath_arm, bench._cluster_arm):
        assert "light" in inspect.signature(fn).parameters, fn.__name__


def test_starved_arms_names_every_missing_arm():
    # the 2026-08-19 18:34 failure mode: SA measured, everything after
    # starved by a degrading tunnel — every later arm must be named
    final = {"value": 5.8e10, "piqmc_attempts_per_sec": 3.3e10}
    starved = bench._starved_arms(final)
    assert "piqmc" not in starved
    assert set(starved) == {
        "svmc", "piqmc_bath", "pallas_sa", "pallas_piqmc",
        "pallas_svmc", "pallas_piqmc_bath", "cluster",
    }
