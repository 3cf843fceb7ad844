"""Guard: git must never ignore the trained-weight artifact files.

Round 5 postmortem: the artifact commits (VERDICT r4 order 2) landed
config.json + eval wavs while `.gitignore`'s blanket `*.msgpack` rule
silently excluded `params.msgpack` — the 41 MB of trained weights never
entered git and died with the machine reset. This test runs regardless
of whether the artifact is currently built, so the trap cannot reopen.
"""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_git_would_not_ignore_artifact_weights():
    paths = [
        "artifacts/tiny_en_synth_int8/params.msgpack",
        "artifacts/micro_draft_bf16/params.msgpack",
        "artifacts/eval/utt00.wav",
        "artifacts/expected.json",
    ]
    out = subprocess.run(
        ["git", "check-ignore", *paths],
        cwd=REPO, capture_output=True, text=True)
    # exit 1 == nothing ignored; anything on stdout is a regression
    assert out.stdout.strip() == "", (
        f"git would silently drop artifact files:\n{out.stdout}")


def test_committed_artifact_dirs_contain_weights_if_tracked():
    """If a checkpoint dir's config.json is tracked, its params.msgpack
    must be tracked too — a config-only commit is how the weights were
    lost the first time."""
    tracked = subprocess.run(
        ["git", "ls-files", "artifacts"],
        cwd=REPO, capture_output=True, text=True).stdout.splitlines()
    for f in tracked:
        if os.path.basename(f) == "config.json":
            ckpt_dir = os.path.dirname(f)
            weights = f"{ckpt_dir}/params.msgpack"
            assert weights in tracked, (
                f"{ckpt_dir} has a tracked config.json but untracked "
                f"weights — rebuild via scripts/make_artifact.py and "
                f"git add the msgpack (gitignore exception exists)")
