"""Dry-run of the on-hardware regression harness (cli/tpu_check.py): the
non-Mosaic checks execute on CPU via --allow-cpu; kernel checks are
reported as skipped. The real run happens on the chip (single command,
one JSON line) — this guards the harness plumbing itself."""

import json

from cli import tpu_check


def test_harness_refuses_cpu_without_flag(capsys):
    rc = tpu_check.main([])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 1 and out["pass"] is False


def test_harness_cpu_dry_run(capsys):
    rc = tpu_check.main([
        "--allow-cpu", "--only",
        "int8_kv_fold", "step_equals_full", "paged_vs_contiguous",
        "flash_fwd",
    ])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0, out
    assert out["pass"] is True
    assert out["int8_kv_fold"]["pass"] is True
    assert out["step_equals_full"]["pass"] is True
    assert out["paged_vs_contiguous"]["pass"] is True
    # Mosaic checks are skipped off-hardware
    assert out["flash_fwd"]["pass"] is None


def test_state_file_written_only_on_full_tpu_runs(tmp_path, monkeypatch,
                                                  capsys):
    """--only subsets and CPU runs must NOT write the bench gate's state
    file; the gate reader surfaces missing/failed states (VERDICT r2
    order 6)."""
    state = tmp_path / "state.json"
    monkeypatch.setenv(tpu_check.STATE_PATH_ENV, str(state))
    tpu_check.main(["--allow-cpu", "--only", "int8_kv_fold"])
    capsys.readouterr()
    assert not state.exists()  # subset run: no state written

    # bench gate accepts a passing record ONLY when its kernel digest
    # matches the current tree (round 4: a digest-less or mismatched
    # record is stale and triggers a re-run — tests/test_bench_gate.py
    # covers the full matrix; here just pin the fresh-record fast path)
    import subprocess

    import bench

    state.write_text(json.dumps(
        {"ts": 0, "git_head": "abc", "pass": True,
         "kernel_digest": tpu_check.kernel_tree_digest()}))
    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: calls.append(a) or (_ for _ in ()).throw(
                            AssertionError("unexpected re-run")))
    out = bench._tpu_check_gate()
    assert out["status"] == "pass" and out["git_head"] == "abc"
    assert not calls

    monkeypatch.setenv("WHISPER_TPU_BENCH_SKIP_CHECK", "1")
    assert bench._tpu_check_gate() == {"status": "skipped (env)"}
