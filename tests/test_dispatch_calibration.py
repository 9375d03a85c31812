"""Kernel-dispatch calibration (round-3 item 9): the crossover table is
generated from measurements (here: a fake timer), cached to disk, and
use_triangular honors it over the frozen defaults."""

import json

import pytest

from chromosome3d_tpu.ops.calibrate import calibrate_dispatch
from chromosome3d_tpu.ops.pallas_energy import (
    _DISPATCH_CACHE,
    dispatch_table_fingerprint,
    use_triangular,
)


@pytest.fixture()
def table_path(tmp_path, monkeypatch):
    p = str(tmp_path / "dispatch.json")
    monkeypatch.setenv("CHROM3D_DISPATCH_TABLE", p)
    _DISPATCH_CACHE.clear()
    yield p
    _DISPATCH_CACHE.clear()


def fake_timer(times):
    def timer(variant, L):
        return times.get((variant, L))

    return timer


def test_calibration_writes_and_flips_dispatch(table_path):
    # timings that INVERT the frozen defaults: tri loses everywhere
    times = {}
    for L in (1024, 2048, 4096):
        times[("fused", L)] = 0.10 if L <= 2048 else None  # infeasible at 4096
        times[("semi", L)] = 0.50
        times[("tri_unfused", L)] = 0.50
        times[("row_unfused", L)] = 0.10
    table = calibrate_dispatch(
        lengths=(1024, 2048, 4096), repeats=5,
        timer=fake_timer(times), device_kind="fakeTPU",
    )
    assert "fakeTPU" in table
    entries = {e["L"]: e for e in table["fakeTPU"]["entries"]}
    assert entries[4096]["fused_s"] == float("inf")
    with open(table_path) as f:
        assert json.load(f)["fakeTPU"]["repeats"] == 5

    import chromosome3d_tpu.ops.pallas_energy as pe

    orig_kind = pe._device_kind
    pe._device_kind = lambda: "fakeTPU"
    try:
        # measured: tri loses -> dispatch stays on fused/row at every L
        assert not use_triangular(2048)
        assert not use_triangular(4096, for_unfused=True)
        # except where the fused step cannot lower: tri is the only option
        assert use_triangular(4096)
    finally:
        pe._device_kind = orig_kind


def test_calibration_tri_wins_everywhere(table_path):
    times = {}
    for L in (512, 1024):
        times[("fused", L)] = 0.50
        times[("semi", L)] = 0.10
        times[("tri_unfused", L)] = 0.10
        times[("row_unfused", L)] = 0.50
    calibrate_dispatch(lengths=(512, 1024), repeats=3,
                       timer=fake_timer(times), device_kind="fakeTPU")

    import chromosome3d_tpu.ops.pallas_energy as pe

    orig_kind = pe._device_kind
    pe._device_kind = lambda: "fakeTPU"
    try:
        # measured: tri wins from 512 (frozen default said 2048) — but the
        # structural >= 3 block requirement still gates it
        assert use_triangular(1024)
        tm = pe._pick_tile_tri(512)
        structurally_ok = pe._round_up(512, tm) // tm >= 3
        assert use_triangular(512) == structurally_ok
    finally:
        pe._device_kind = orig_kind


def test_without_table_frozen_defaults(monkeypatch, tmp_path):
    monkeypatch.setenv(
        "CHROM3D_DISPATCH_TABLE", str(tmp_path / "missing.json")
    )
    _DISPATCH_CACHE.clear()
    assert dispatch_table_fingerprint() == "none"
    assert not use_triangular(1024)          # fused default wins wherever feasible
    assert not use_triangular(2048)
    assert use_triangular(2176)              # past the fused VMEM cap
    assert use_triangular(1024, for_unfused=True)
    monkeypatch.setenv("CHROM3D_NO_TRI", "1")
    assert not use_triangular(4096)
    _DISPATCH_CACHE.clear()


def test_merge_preserves_other_lengths(table_path):
    t1 = {("fused", 1024): 0.1, ("semi", 1024): 0.2,
          ("tri_unfused", 1024): 0.2, ("row_unfused", 1024): 0.1}
    calibrate_dispatch(lengths=(1024,), repeats=2,
                       timer=fake_timer(t1), device_kind="fakeTPU")
    t2 = {("fused", 2048): 0.3, ("semi", 2048): 0.1,
          ("tri_unfused", 2048): 0.1, ("row_unfused", 2048): 0.3}
    table = calibrate_dispatch(lengths=(2048,), repeats=2,
                               timer=fake_timer(t2), device_kind="fakeTPU")
    Ls = [e["L"] for e in table["fakeTPU"]["entries"]]
    assert Ls == [1024, 2048]
    assert dispatch_table_fingerprint() != "none"
