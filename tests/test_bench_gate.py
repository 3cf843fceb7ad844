"""bench.py's kernel-regression gate: staleness semantics.

VERDICT r3 weak 3 / order 5: a tpu_check record written before a kernel
change must not vouch for a BENCH number — the gate re-runs the suite when
the record's content digest of ops/ + models/whisper/ + quantization/
mismatches the current tree, not only when the record is missing or failed.
These tests doctor state files and a fake subprocess to prove each branch.
"""

import json
import subprocess

import pytest

import bench
from cli.tpu_check import STATE_PATH_ENV, kernel_tree_digest


@pytest.fixture()
def state_path(tmp_path, monkeypatch):
    p = tmp_path / "tpu_check_state.json"
    monkeypatch.setenv(STATE_PATH_ENV, str(p))
    monkeypatch.delenv("WHISPER_TPU_BENCH_SKIP_CHECK", raising=False)
    return p


class FakeRun:
    """Stands in for the cli.tpu_check subprocess; optionally rewrites the
    state file the way a real full hardware run would."""

    def __init__(self, state_path, writes=None, returncode=0, raises=None):
        self.calls = 0
        self._path = state_path
        self._writes = writes
        self._returncode = returncode
        self._raises = raises

    def __call__(self, *a, **kw):
        self.calls += 1
        if self._raises is not None:
            raise self._raises
        if self._writes is not None:
            self._path.write_text(json.dumps(self._writes))
        return subprocess.CompletedProcess(a, self._returncode, "", "boom")


def _record(passing=True, digest=None, head="abc1234", ts=1.0):
    return {"ts": ts, "git_head": head, "pass": passing,
            "kernel_digest": digest if digest is not None
            else kernel_tree_digest()}


def test_fresh_passing_record_needs_no_rerun(state_path, monkeypatch):
    state_path.write_text(json.dumps(_record()))
    fake = FakeRun(state_path)
    monkeypatch.setattr(subprocess, "run", fake)
    gate = bench._tpu_check_gate()
    assert gate["status"] == "pass"
    assert fake.calls == 0


def test_stale_digest_triggers_rerun(state_path, monkeypatch):
    # passing record, but recorded over DIFFERENT kernel-tree content —
    # exactly the scenario the r3 gate let through
    state_path.write_text(json.dumps(_record(digest="deadbeefdeadbeef")))
    fake = FakeRun(state_path, writes=_record())  # fresh run passes
    monkeypatch.setattr(subprocess, "run", fake)
    gate = bench._tpu_check_gate()
    assert fake.calls == 1
    assert gate["status"] == "pass"


def test_stale_digest_rerun_still_stale_fails(state_path, monkeypatch):
    state_path.write_text(json.dumps(_record(digest="deadbeefdeadbeef")))
    fake = FakeRun(state_path, writes=None, returncode=1)  # run writes nothing
    monkeypatch.setattr(subprocess, "run", fake)
    gate = bench._tpu_check_gate()
    assert fake.calls == 1
    assert gate["status"] == "fail"
    assert gate["stale_digest"]["record"] == "deadbeefdeadbeef"
    assert gate["stale_digest"]["tree"] == kernel_tree_digest()
    assert "tpu_check exit 1" in gate["rerun_error"]


def test_missing_record_triggers_rerun(state_path, monkeypatch):
    fake = FakeRun(state_path, writes=_record())
    monkeypatch.setattr(subprocess, "run", fake)
    gate = bench._tpu_check_gate()
    assert fake.calls == 1
    assert gate["status"] == "pass"


def test_failing_record_triggers_rerun(state_path, monkeypatch):
    state_path.write_text(json.dumps(_record(passing=False)))
    fake = FakeRun(state_path, writes=_record())
    monkeypatch.setattr(subprocess, "run", fake)
    gate = bench._tpu_check_gate()
    assert fake.calls == 1
    assert gate["status"] == "pass"


def test_rerun_crash_is_reported_not_swallowed(state_path, monkeypatch):
    # ADVICE r3: a TimeoutExpired/crash in the re-run must surface in the
    # gate dict, not vanish behind a bare except
    fake = FakeRun(state_path,
                   raises=subprocess.TimeoutExpired(cmd="tpu_check",
                                                    timeout=3600))
    monkeypatch.setattr(subprocess, "run", fake)
    gate = bench._tpu_check_gate()
    assert gate["status"] == "missing"
    assert "TimeoutExpired" in gate["rerun_error"]


def test_digest_tracks_kernel_tree_content(tmp_path):
    # digest changes when any covered file's content changes
    import os
    import shutil

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fake_root = tmp_path / "repo"
    for d in ("whisper_trtllm_tpu/ops", "whisper_trtllm_tpu/models/whisper",
              "whisper_trtllm_tpu/quantization"):
        shutil.copytree(os.path.join(root, d), fake_root / d)
    d0 = kernel_tree_digest(str(fake_root))
    assert d0 == kernel_tree_digest(str(fake_root))  # deterministic
    target = fake_root / "whisper_trtllm_tpu/ops/attention.py"
    target.write_text(target.read_text() + "\n# touched\n")
    assert kernel_tree_digest(str(fake_root)) != d0
