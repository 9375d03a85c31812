"""Kernel-dispatch calibration (round-3 item 9, round-4 schema): the
crossover table is generated from measurements (here: a fake timer), cached
to disk as strict JSON with per-entry (L, B), and use_triangular honors it
over the frozen defaults — with a 2x log-L distance bound so a sparse table
cannot steer shapes it never measured."""

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
    def timer(variant, L, B):
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
    assert entries[4096]["fused_s"] is None     # infeasible: strict-JSON null
    assert entries[1024]["B"] == 4
    with open(table_path) as f:
        text = f.read()
    assert "Infinity" not in text               # valid for strict parsers
    assert json.loads(text)["fakeTPU"]["repeats"] == 5

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


def test_merge_distinguishes_batches(table_path):
    """Same L at different B are separate entries, and dispatch picks the
    nearest-B entry (the production bucket runs B=10/20 while the at-scale
    probes run B=4 — round-3 VERDICT weak #4)."""

    def timer_b(variant, L, B):
        # at B=16 the semi step wins; at B=2 the fused step wins
        if variant == "fused":
            return 0.10 if B <= 8 else 0.50
        if variant == "semi":
            return 0.50 if B <= 8 else 0.10
        return 0.60

    calibrate_dispatch(cases=((1024, 2), (1024, 16)), repeats=2,
                       timer=timer_b, device_kind="fakeTPU")
    table = json.load(open(__import__("os").environ["CHROM3D_DISPATCH_TABLE"]))
    pairs = [(e["L"], e["B"]) for e in table["fakeTPU"]["entries"]]
    assert pairs == [(1024, 2), (1024, 16)]

    import chromosome3d_tpu.ops.pallas_energy as pe

    orig_kind = pe._device_kind
    pe._device_kind = lambda: "fakeTPU"
    try:
        assert not use_triangular(1024, batch=2)     # fused wins at small B
        assert use_triangular(1024, batch=20)        # semi wins at large B
        # batch unknown: first (nearest-L) entry applies deterministically
        assert use_triangular(1024) in (True, False)
    finally:
        pe._device_kind = orig_kind


def test_sparse_table_distance_bound(table_path):
    """An entry >2x away in log-L must NOT decide dispatch: a table with
    only L=4096 (where fused is infeasible -> semi trivially 'wins') would
    otherwise route fused-feasible L=1024 onto the slower semi path
    (round-3 ADVICE finding)."""
    times = {("fused", 4096): None, ("semi", 4096): 0.1,
             ("tri_unfused", 4096): 0.1, ("row_unfused", 4096): 0.5}
    calibrate_dispatch(lengths=(4096,), repeats=2,
                       timer=fake_timer(times), device_kind="fakeTPU")

    import chromosome3d_tpu.ops.pallas_energy as pe

    orig_kind = pe._device_kind
    pe._device_kind = lambda: "fakeTPU"
    try:
        # L=1024 is 4x from the only entry: frozen defaults apply
        assert not use_triangular(1024)
        assert not use_triangular(1024, for_unfused=False)
        # L=4096 itself still follows the measurement
        assert use_triangular(4096)
        assert use_triangular(4096, for_unfused=True)
        # within 2x (L=2176, fused infeasible): entry applies, tri wins
        assert use_triangular(2176)
    finally:
        pe._device_kind = orig_kind


def test_feasible_query_ignores_infeasible_entry(table_path):
    """A nearest entry whose fused_s is null (measured where the fused step
    could not lower) says nothing about a query length where it CAN: the
    frozen default (fused) must apply, not a trivial semi 'win'."""
    times = {("fused", 2560): None, ("semi", 2560): 0.1,
             ("tri_unfused", 2560): 0.1, ("row_unfused", 2560): 0.5}
    calibrate_dispatch(lengths=(2560,), repeats=2,
                       timer=fake_timer(times), device_kind="fakeTPU")

    import chromosome3d_tpu.ops.pallas_energy as pe

    orig_kind = pe._device_kind
    pe._device_kind = lambda: "fakeTPU"
    try:
        # 2048 is within 2x of 2560 and fused-feasible: frozen default
        assert not use_triangular(2048)
        # 2560 itself: fused infeasible -> tri
        assert use_triangular(2560)
    finally:
        pe._device_kind = orig_kind


def test_legacy_table_with_infinity_loads_and_merges(table_path):
    """Round-3 tables stored Infinity and no B: they must still load
    (Python json accepts the token), decide dispatch (inf = infeasible),
    and be rewritten as strict JSON on the next merge."""
    legacy = {
        "fakeTPU": {
            "entries": [{
                "L": 4096,
                "fused_s": float("inf"), "semi_s": 0.1,
                "tri_unfused_s": 0.1, "row_unfused_s": 0.5,
                "rel_spread": {},
            }],
            "repeats": 5, "steps": 24, "batch": 4,
        }
    }
    import os

    path = os.environ["CHROM3D_DISPATCH_TABLE"]
    with open(path, "w") as f:
        f.write(json.dumps(legacy))          # emits the Infinity token
    _DISPATCH_CACHE.clear()

    import chromosome3d_tpu.ops.pallas_energy as pe

    orig_kind = pe._device_kind
    pe._device_kind = lambda: "fakeTPU"
    try:
        assert use_triangular(4096)          # legacy inf reads as infeasible
        t1 = {("fused", 1024): 0.1, ("semi", 1024): 0.5,
              ("tri_unfused", 1024): 0.5, ("row_unfused", 1024): 0.1}
        table = calibrate_dispatch(lengths=(1024,), repeats=2,
                                   timer=fake_timer(t1),
                                   device_kind="fakeTPU")
        pairs = [(e["L"], e.get("B", None)) for e in table["fakeTPU"]["entries"]]
        assert pairs == [(1024, 4), (4096, None)]   # legacy row kept as-is
        text = open(path).read()
        assert "Infinity" not in text        # sanitized to null on rewrite
        assert use_triangular(4096)          # and still decides the same
    finally:
        pe._device_kind = orig_kind


# ---------------------------------------------------------------------------
# round-5: packaged-table precedence, poisoning defenses, provenance
# ---------------------------------------------------------------------------

def _write_table(path, kind, L, fused_s, semi_s, tri_s=0.5, row_s=0.5, B=4):
    entry = {"L": L, "B": B, "fused_s": fused_s, "semi_s": semi_s,
             "tri_unfused_s": tri_s, "row_unfused_s": row_s,
             "rel_spread": {}}
    with open(path, "w") as f:
        json.dump({kind: {"entries": [entry], "repeats": 2, "steps": 24}}, f)


@pytest.fixture()
def dispatch_sources(tmp_path, monkeypatch):
    """No env override; packaged + user table paths both point into tmp."""
    import chromosome3d_tpu.ops.pallas_energy as pe

    monkeypatch.delenv("CHROM3D_DISPATCH_TABLE", raising=False)
    pkg = tmp_path / "packaged.json"
    # the user-cache path is ~/.cache/... — point HOME into tmp so the real
    # _dispatch_sources (incl. its env-var precedence) is what gets tested
    monkeypatch.setenv("HOME", str(tmp_path))
    usr = tmp_path / ".cache" / "chromosome3d" / "dispatch.json"
    usr.parent.mkdir(parents=True)
    monkeypatch.setattr(pe, "packaged_dispatch_path", lambda: str(pkg))
    _DISPATCH_CACHE.clear()
    yield str(pkg), str(usr)
    _DISPATCH_CACHE.clear()


def test_packaged_table_precedes_user_cache(dispatch_sources):
    """A fresh machine routes from the COMMITTED table even when a (possibly
    poisoned) ~/.cache table exists for the same device kind (round-4
    VERDICT item 1: routing must be deterministic and reproducible)."""
    pkg, usr = dispatch_sources
    # packaged: fused wins at 1024; user cache claims semi wins (poisoned)
    _write_table(pkg, "fakeTPU", 1024, fused_s=0.10, semi_s=0.50)
    _write_table(usr, "fakeTPU", 1024, fused_s=0.50, semi_s=0.10)

    import chromosome3d_tpu.ops.pallas_energy as pe

    orig = pe._device_kind
    pe._device_kind = lambda: "fakeTPU"
    try:
        assert not use_triangular(1024)          # packaged verdict: fused
        entries, src = pe._active_dispatch("fakeTPU")
        assert src == "packaged"
        # an uncovered device kind falls through to the user cache
        _write_table(usr, "otherTPU", 1024, fused_s=0.50, semi_s=0.10)
        _DISPATCH_CACHE.clear()
        entries, src = pe._active_dispatch("otherTPU")
        assert src == "user" and entries
        # fingerprint is precedence-aware: for a kind the packaged table
        # covers, the SHADOWED user file must NOT contribute (a
        # routing-inert calibrate write would otherwise invalidate every
        # AOT blob) ...
        fp = dispatch_table_fingerprint()
        assert "packaged:" in fp and "user:" not in fp
        before = fp
        _write_table(usr, "fakeTPU", 1024, fused_s=0.99, semi_s=0.99)
        _DISPATCH_CACHE.clear()
        assert dispatch_table_fingerprint() == before
        # ... but for an UNCOVERED kind the user file steers routing and
        # must fingerprint
        pe._device_kind = lambda: "otherTPU"
        fp2 = dispatch_table_fingerprint()
        assert "packaged:" in fp2 and "user:" in fp2
    finally:
        pe._device_kind = orig


def test_env_override_wins_over_packaged(dispatch_sources, monkeypatch,
                                         tmp_path):
    pkg, _usr = dispatch_sources
    _write_table(pkg, "fakeTPU", 1024, fused_s=0.10, semi_s=0.50)
    override = tmp_path / "override.json"
    _write_table(str(override), "fakeTPU", 1024, fused_s=0.50, semi_s=0.10)
    monkeypatch.setenv("CHROM3D_DISPATCH_TABLE", str(override))
    _DISPATCH_CACHE.clear()

    import chromosome3d_tpu.ops.pallas_energy as pe

    orig = pe._device_kind
    pe._device_kind = lambda: "fakeTPU"
    try:
        assert use_triangular(1024)              # env verdict: semi
        fp = dispatch_table_fingerprint()
        assert fp.startswith("env:") and "packaged" not in fp
    finally:
        pe._device_kind = orig
        _DISPATCH_CACHE.clear()


def test_spread_gate_rejects_poisoned_case(table_path):
    """The recorded poisoning incident, simulated: one case's repeats spread
    2x (concurrent load). The write must be refused for that case — the
    previous entry stays in force — and recorded in the audit trail."""
    # first, a clean calibration: fused wins at 1024
    clean = {("fused", 1024): 0.10, ("semi", 1024): 0.20,
             ("tri_unfused", 1024): 0.20, ("row_unfused", 1024): 0.20}
    calibrate_dispatch(lengths=(1024,), repeats=3,
                       timer=fake_timer(clean), device_kind="fakeTPU")

    # poisoned re-run: fused timings alternate 2x (load contention);
    # min would say semi wins — but the spread gate rejects the case
    calls = {"n": 0}

    def poisoned(variant, L, B):
        if variant == "fused":
            calls["n"] += 1
            return 0.30 if calls["n"] % 2 else 0.60      # spread 1.0
        return 0.25

    table = calibrate_dispatch(lengths=(1024,), repeats=4,
                               timer=poisoned, device_kind="fakeTPU")
    entries = {e["L"]: e for e in table["fakeTPU"]["entries"]}
    assert entries[1024]["fused_s"] == 0.10              # previous entry kept
    assert table["fakeTPU"]["rejected"][0]["L"] == 1024  # audit trail

    import chromosome3d_tpu.ops.pallas_energy as pe

    orig = pe._device_kind
    pe._device_kind = lambda: "fakeTPU"
    try:
        assert not use_triangular(1024)                  # still fused
    finally:
        pe._device_kind = orig


def test_quiet_host_check():
    from chromosome3d_tpu.ops.calibrate import _check_quiet_host

    _check_quiet_host(1e9)                               # always quiet
    try:
        import os

        os.getloadavg()
    except (AttributeError, OSError):
        pytest.skip("no getloadavg on this platform")
    with pytest.raises(RuntimeError, match="not quiet"):
        _check_quiet_host(-1.0)                          # never quiet


def test_verify_dispatch_reports_drift(table_path):
    from chromosome3d_tpu.ops.calibrate import verify_dispatch

    clean = {("fused", 1024): 0.10, ("semi", 1024): 0.20,
             ("tri_unfused", 1024): 0.20, ("row_unfused", 1024): 0.20}
    calibrate_dispatch(lengths=(1024,), repeats=2,
                       timer=fake_timer(clean), device_kind="fakeTPU")
    # the machine drifted: semi now wins at 1024
    drifted = {("fused", 1024): 0.30, ("semi", 1024): 0.05,
               ("tri_unfused", 1024): 0.20, ("row_unfused", 1024): 0.20}
    report = verify_dispatch(repeats=2, timer=fake_timer(drifted),
                             device_kind="fakeTPU")
    assert report["source"] == "env"
    (row,) = report["entries"]
    assert row["fused"]["drift_pct"] == 200.0
    assert row["choice_stored"] == "fused"
    assert row["choice"] == "semi"
    assert row["choice_changed"]


def test_describe_dispatch_matches_anneal(table_path):
    """describe_dispatch (bench provenance) must mirror solver.anneal's
    fused/semi selection: same use_triangular + fused_step_feasible calls,
    so a table that flips the solver's route flips the description too."""
    from chromosome3d_tpu.ops.pallas_energy import (
        describe_dispatch,
        fused_step_feasible,
    )

    times = {}
    for L in (1024, 2048):
        times[("fused", L)] = 0.50
        times[("semi", L)] = 0.10
        times[("tri_unfused", L)] = 0.10
        times[("row_unfused", L)] = 0.50
    calibrate_dispatch(lengths=(1024, 2048), repeats=2,
                       timer=fake_timer(times), device_kind="fakeTPU")

    import chromosome3d_tpu.ops.pallas_energy as pe

    orig = pe._device_kind
    pe._device_kind = lambda: "fakeTPU"
    try:
        d = describe_dispatch(1024, batch=20, exact=True)
        # semi won the measurement -> anneal's `fused` gate
        # (not use_triangular and fused_step_feasible) is False
        assert d["route"] == "semi"
        assert d["route"] == (
            "fused"
            if (not use_triangular(1024, batch=20)
                and fused_step_feasible(1024))
            else "semi"
        )
        assert d["table_source"] == "env"
        assert d["table_entry"]["L"] == 1024
        # beyond the fused VMEM cap the route is semi no matter the table
        assert describe_dispatch(8192, batch=4)["route"] == "semi"
        assert not describe_dispatch(8192, batch=4)["fused_feasible"]
        # general (windowed) restraints: whole-matrix kernel + companion
        assert describe_dispatch(512, batch=20, exact=False)["route"] == (
            "semi_general"
        )
        # unfusable configs ride the unfused scan
        assert describe_dispatch(512, batch=20, fusable=False)["route"] in (
            "unfused_tri", "unfused_row"
        )
    finally:
        pe._device_kind = orig


def test_frozen_defaults_describe(monkeypatch, tmp_path):
    """Without any table: the headline shape (L=456 pads to 512) must route
    FUSED — the measured-fastest route for the shipped bucket — and the
    description must say the frozen defaults decided."""
    monkeypatch.setenv("CHROM3D_DISPATCH_TABLE",
                       str(tmp_path / "missing.json"))
    _DISPATCH_CACHE.clear()
    from chromosome3d_tpu.ops.pallas_energy import describe_dispatch

    d = describe_dispatch(456, batch=20, exact=True)
    assert d["route"] == "fused"
    assert d["table_source"] == "none"
    assert d["table_fingerprint"] == "none"
    _DISPATCH_CACHE.clear()


def test_verify_uses_each_entrys_protocol(table_path):
    """A table mixing 24-step (legacy) and 960-step entries must be
    re-timed per entry at ITS OWN scan length — otherwise drift_pct
    reports ~40x phantom drift for the legacy rows (round-5 review)."""
    import json as _json
    import os as _os

    from chromosome3d_tpu.ops.calibrate import verify_dispatch

    table = {"fakeTPU": {"entries": [
        {"L": 1024, "B": 4, "steps": 24, "fused_s": 0.10, "semi_s": 0.20,
         "tri_unfused_s": 0.20, "row_unfused_s": 0.20, "rel_spread": {}},
        {"L": 2048, "B": 4, "steps": 960, "fused_s": 4.00, "semi_s": 8.00,
         "tri_unfused_s": 8.00, "row_unfused_s": 8.00, "rel_spread": {}},
    ], "repeats": 2, "steps": 960}}
    with open(_os.environ["CHROM3D_DISPATCH_TABLE"], "w") as f:
        _json.dump(table, f)
    _DISPATCH_CACHE.clear()

    seen = []

    # the injected timer records which (L, B) was probed; in the real
    # path timer_for builds one _real_timer per distinct entry steps —
    # assert the per-entry steps ride through to the report rows
    def timer(variant, L, B):
        seen.append((variant, L, B))
        return {1024: 0.1, 2048: 4.0}[L] * (2.0 if variant != "fused" else 1.0)

    report = verify_dispatch(repeats=1, timer=timer, device_kind="fakeTPU")
    rows = {r["L"]: r for r in report["entries"]}
    assert rows[1024]["steps"] == 24
    assert rows[2048]["steps"] == 960
    # measured == stored -> zero drift for both protocols
    assert rows[1024]["fused"]["drift_pct"] == 0.0
    assert rows[2048]["fused"]["drift_pct"] == 0.0
    assert not rows[1024]["choice_changed"]


def test_verify_choice_mirrors_reader(table_path):
    """choice_stored must model the reader: fused-infeasible L -> semi
    regardless of the entry; a null fused_s at a fused-feasible L -> the
    frozen default (fused), not a trivial 'semi' (round-5 review)."""
    import json as _json
    import os as _os

    from chromosome3d_tpu.ops.calibrate import verify_dispatch

    table = {"fakeTPU": {"entries": [
        # fused-feasible L, entry silent on fused: reader routes FUSED
        {"L": 2048, "B": 4, "steps": 960, "fused_s": None, "semi_s": 1.0,
         "tri_unfused_s": 1.0, "row_unfused_s": 1.0, "rel_spread": {}},
        # fused-INfeasible L: semi is structural, whatever the numbers say
        {"L": 4096, "B": 4, "steps": 960, "fused_s": None, "semi_s": 1.0,
         "tri_unfused_s": 1.0, "row_unfused_s": 2.0, "rel_spread": {}},
    ], "repeats": 2, "steps": 960}}
    with open(_os.environ["CHROM3D_DISPATCH_TABLE"], "w") as f:
        _json.dump(table, f)
    _DISPATCH_CACHE.clear()

    def timer(variant, L, B):
        return None if variant == "fused" else 1.0

    report = verify_dispatch(repeats=1, timer=timer, device_kind="fakeTPU")
    rows = {r["L"]: r for r in report["entries"]}
    assert rows[2048]["choice_stored"] == "fused"
    assert rows[4096]["choice_stored"] == "semi"
    assert not rows[2048]["choice_changed"]
    assert not rows[4096]["choice_changed"]
