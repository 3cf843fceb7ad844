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
