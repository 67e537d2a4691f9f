"""CLI surface: argument parsing of the installed console entry.

The reference's only "CLI" is ``python3 <module>.py`` self-test blocks
(README.md:26-28); this framework ships a real console script
(``sfm-tpu`` via pyproject.toml) wrapping ``__main__.main``. The heavy
paths (reconstruct/selftest execution) are covered by the e2e tests and
smoke runs; these tests pin the entry point and parser contract.
"""

import pytest

from structure_from_motion_tpu.__main__ import main


def test_help_exits_zero(capsys):
    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "reconstruct" in out and "selftest" in out


def test_subcommand_required(capsys):
    with pytest.raises(SystemExit) as e:
        main([])
    assert e.value.code == 2


def test_reconstruct_requires_intrinsics(capsys):
    # --fx/--fy/--cx/--cy are required: the reference hard-codes K
    # (ba_processor.py:457-459); here it is a contract of the CLI.
    with pytest.raises(SystemExit) as e:
        main(["reconstruct", "--images", "/tmp/x", "--out", "/tmp/y"])
    assert e.value.code == 2
    assert "--fx" in capsys.readouterr().err
