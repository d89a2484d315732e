"""The bench stdout contract (round-3 regression guard).

The round-end driver tail-captures bench stdout and parses the LAST line as
the judged JSON record.  Round 3's single giant line (inline utilization +
x64 + rep arrays) overflowed the capture window and ``BENCH_r03.json``
recorded ``parsed: null``.  Since round 4 ``bench.emit`` prints ONE compact
headline line and writes everything bulky to ``bench_detail.json``; these
tests pin that contract.
"""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _representative_headline():
    # worst-case realistic widths for every field the real main() emits
    return {
        "metric": "evolving_chained_wall_clock_per_fss_timestep_1.66M_dof_3d",
        "value": 7777.77,
        "unit": "ms",
        "vs_baseline": 111475.9,
        "steady_ms": 7777.77,
        "steady_vs_baseline": 111475.9,
        "scan_ms_per_step": 7777.77,
        "evolving_scan_ms_per_step": 7777.77,
        "synced_ms_per_step": 7777.77,
        "x64_reference_tol_ms": 77777.77,
        "vs_baseline_x64": 111475.9,
        "d2_ms": 7777.77,
        "d2_evolving_ms": 7777.77,
        "d2_scan_ms": 7777.77,
        "detail": "bench_detail.json",
    }


def test_headline_fits_capture_window(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench, "DETAIL_FILE", str(tmp_path / "detail.json"))
    monkeypatch.setattr(bench, "CACHE_FILE", str(tmp_path / "cache.json"))
    line = bench.emit(_representative_headline(),
                      {"utilization": {"op": {"ms": 1.0}}})
    assert len(line) <= bench.HEADLINE_MAX_BYTES
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, "bench must print exactly ONE stdout line"
    parsed = json.loads(out[-1])
    assert parsed["value"] == 7777.77
    assert parsed["vs_baseline"] == 111475.9
    # no headline key was dropped for a representative record
    assert set(parsed) == set(_representative_headline())


def test_emit_writes_detail_sidecar(tmp_path, monkeypatch):
    detail_file = tmp_path / "detail.json"
    monkeypatch.setattr(bench, "DETAIL_FILE", str(detail_file))
    monkeypatch.setattr(bench, "CACHE_FILE", str(tmp_path / "cache.json"))
    big = {"utilization": {f"op{i}": {"ms": i} for i in range(40)},
           "chained_reps_ms": [1.0, 2.0, 3.0]}
    bench.emit(_representative_headline(), big)
    saved = json.loads(detail_file.read_text())
    assert saved["chained_reps_ms"] == [1.0, 2.0, 3.0]
    assert "op39" in saved["utilization"]
    assert saved["headline"]["value"] == 7777.77


def test_cache_roundtrip_stamps_measured_at(tmp_path, monkeypatch):
    """Slow sections (x64 / 2D) are measured once and cached with a
    measured_at stamp (round-4 verdict #1: re-measuring them inside the
    judged run blew the driver timeout twice)."""
    monkeypatch.setattr(bench, "CACHE_FILE", str(tmp_path / "cache.json"))
    saved = bench._save_cache("d2_at_scale", {"ms_per_step_chained": 3.14})
    assert saved["measured_at"].endswith("Z")
    loaded = bench._load_cache()["d2_at_scale"]
    assert loaded["ms_per_step_chained"] == 3.14
    assert loaded["measured_at"] == saved["measured_at"]
    # second key does not clobber the first
    bench._save_cache("x64_reference_tol", {"ms_per_step_chained": 99.0})
    assert bench._load_cache()["d2_at_scale"]["ms_per_step_chained"] == 3.14


def test_backend_name_reports_selected_path():
    """round-4 weak #4: the 2D record hardcoded 'conv-stencil' while auto
    selected the parity backend — the label must follow the object."""
    class _Disc:
        row_ops = None
        gmg_precond = None
        gmg_precond_rows = None
    d = _Disc()
    assert "Jacobi" in bench._backend_name(d)
    d.gmg_precond = object()
    assert "GMG-Richardson" in bench._backend_name(d)

    class ElasticityParityOps:     # type name is what's sniffed
        pass
    d.row_ops = ElasticityParityOps()
    assert bench._backend_name(d).startswith("parity2d")
    d.gmg_precond_rows = object()
    assert "parity-resident GMG" in bench._backend_name(d)

    class ElasticityRowOps:
        pass
    d.row_ops = ElasticityRowOps()
    assert "pallas row-layout" in bench._backend_name(d)


def test_oversized_headline_degrades_not_breaks(tmp_path, monkeypatch,
                                                capsys):
    monkeypatch.setattr(bench, "DETAIL_FILE", str(tmp_path / "detail.json"))
    monkeypatch.setattr(bench, "CACHE_FILE", str(tmp_path / "cache.json"))
    headline = _representative_headline()
    headline["giant"] = "x" * 5000           # would overflow the capture
    line = bench.emit(headline, {})
    assert len(line) <= bench.HEADLINE_MAX_BYTES
    parsed = json.loads(line)
    assert "giant" not in parsed              # dropped to the sidecar...
    assert parsed["value"] == 7777.77         # ...required keys survive
    saved = json.loads((tmp_path / "detail.json").read_text())
    assert saved["giant"] == "x" * 5000


def test_emit_writes_detail_sidecar_cache_isolated(tmp_path, monkeypatch):
    """emit() must persist the headline for the stale-first-line layer."""
    monkeypatch.setattr(bench, "DETAIL_FILE", str(tmp_path / "detail.json"))
    monkeypatch.setattr(bench, "CACHE_FILE", str(tmp_path / "cache.json"))
    bench.emit(_representative_headline(), {})
    saved = json.loads((tmp_path / "cache.json").read_text())
    assert saved["last_headline"]["value"] == 7777.77
    assert saved["last_headline"]["measured_at"]


def test_stale_headline_layer(tmp_path, monkeypatch, capsys):
    """A wedged run still leaves a parseable LAST stdout line: the
    previous run's headline, flagged stale with its measured_at stamp
    (the tunnel's first d2h pull stall is unbounded in the tail —
    observed wedged past 10 min twice on 2026-08-20)."""
    monkeypatch.setattr(bench, "DETAIL_FILE", str(tmp_path / "detail.json"))
    monkeypatch.setattr(bench, "CACHE_FILE", str(tmp_path / "cache.json"))
    bench._emit_stale_headline()                   # empty cache: no line
    assert capsys.readouterr().out == ""
    bench.emit(_representative_headline(), {})
    capsys.readouterr()
    bench._emit_stale_headline()
    line = capsys.readouterr().out.strip()
    assert len(line) <= bench.HEADLINE_MAX_BYTES + 80
    parsed = json.loads(line)
    assert parsed["stale"] is True
    assert parsed["value"] == 7777.77
    assert parsed["measured_at"]
